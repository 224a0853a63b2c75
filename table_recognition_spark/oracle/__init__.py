from .extract import run_kernel, extract_document, extract_corpus  # noqa: F401
