from pdf_ocr_spark.streaming.stream import stream_extract, stream_normalize  # noqa: F401
