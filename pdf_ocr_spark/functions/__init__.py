from pdf_ocr_spark.functions.text import (  # noqa: F401
    allowed_file_col,
    fix_ocr_errors_col,
    html_escape_col,
    lang_map_col,
    normalize_text_col,
    sanitize_text_col,
    secure_clean_filename_col,
    select_dpi_col,
    strip_col,
)
from pdf_ocr_spark.functions.serialize import (  # noqa: F401
    html_doc_col,
    markdown_doc_col,
    txt_doc_col,
)
