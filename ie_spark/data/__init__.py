from ie_spark.data.synthetic import generate_corpus, corpus_to_pandas  # noqa: F401
