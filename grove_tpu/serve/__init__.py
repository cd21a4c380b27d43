from .server import BatchingEngine, GroveServer, serve  # noqa: F401
from .continuous import ContinuousEngine, ContinuousService  # noqa: F401
