from .arch import TensorMask
from .config import add_tensormask_config

__all__ = ["TensorMask", "add_tensormask_config"]
