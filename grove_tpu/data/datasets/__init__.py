from . import base, howto100m  # noqa: F401
