"""pandas_udf factory for the DOCX sink. No ``from __future__ import
annotations`` here on purpose: pandas_udf requires evaluated (non-string)
type hints to infer the scalar eval type."""

import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_docx_udf(docx_bytes):
    @pandas_udf("binary")
    def _ser(spans: pd.Series) -> pd.Series:
        out = []
        for arr in spans:
            pages = {s["offset"]: s["text"] for s in arr}
            out.append(docx_bytes(pages))
        return pd.Series(out)

    return _ser
