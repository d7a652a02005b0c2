"""Pure-Python oracle implementations of the reference semantics.

These functions are the executable *specification*: they reproduce, input
for input, the behavior of the reference's scalar kernels and serializers
(citations in each docstring point into ``/root/reference``).  The Spark
column expressions in :mod:`pdf_ocr_spark.functions` are tested against
them on golden vectors and randomized corpora.

They are deliberately driver/test-side only — the engine's hot path never
calls them per row.
"""

from pdf_ocr_spark.oracle.textfuncs import (  # noqa: F401
    allowed_file,
    fix_common_ocr_errors,
    html_escape,
    map_language_codes,
    sanitize_text,
    secure_clean_filename,
    select_dpi,
)
from pdf_ocr_spark.oracle.serializers import (  # noqa: F401
    serialize_html,
    serialize_markdown,
    serialize_txt,
)
