from . import meters  # noqa: F401
