from .server import BatchingEngine, GroveServer, serve  # noqa: F401
