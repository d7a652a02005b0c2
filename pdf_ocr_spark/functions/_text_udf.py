"""pandas_udf for the full-fidelity (unicode NFKD) filename securing.

Separate module without ``from __future__ import annotations`` so
pandas_udf can read evaluated type hints. The column-expression version
(functions/text.py) covers ASCII inputs JVM-side; this Arrow-batched
variant adds werkzeug's NFKD unicode fold for non-ASCII filenames.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def secure_clean_filename_udf(names: pd.Series) -> pd.Series:
    from pdf_ocr_spark.oracle.textfuncs import secure_clean_filename

    return names.map(lambda v: secure_clean_filename(v) if v is not None else None)
