from .generate import make_corpus, png_encode, corpus_to_spark  # noqa: F401
