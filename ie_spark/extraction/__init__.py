from ie_spark.extraction.extractor import extract_turn, Mention, Triple  # noqa: F401
from ie_spark.extraction.pandas_api import extract_batch  # noqa: F401
