from . import captions, iground, pointing, vidstg  # noqa: F401
