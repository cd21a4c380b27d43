from . import preprocess, sampling  # noqa: F401
