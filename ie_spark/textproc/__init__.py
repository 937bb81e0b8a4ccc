from ie_spark.textproc.preprocess import preprocess_sentence, split_sentences  # noqa: F401
from ie_spark.textproc.lexicon import lemmatize_verb, lemmatize_noun  # noqa: F401
