from .extract import extract  # noqa: F401
