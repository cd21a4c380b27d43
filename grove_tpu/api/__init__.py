from .processor import GroveProcessor, DEFAULT_INSTRUCTION  # noqa: F401
