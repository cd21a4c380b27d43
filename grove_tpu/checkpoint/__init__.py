from . import torch_convert  # noqa: F401
