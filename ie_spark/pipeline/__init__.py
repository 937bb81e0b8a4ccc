from ie_spark.pipeline.extract import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    MENTION_SCHEMA,
    TRIPLE_SCHEMA,
    extract_triples,
    extract_mentions,
    extract_all,
    transcripts_from_pandas,
)
