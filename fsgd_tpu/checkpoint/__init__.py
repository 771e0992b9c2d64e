from .catalog import ModelCatalog, resolve_checkpoint_path
from .checkpointer import Checkpointer, PeriodicCheckpointer

# API-compatibility alias with the reference name
DetectionCheckpointer = Checkpointer

__all__ = [
    "Checkpointer",
    "DetectionCheckpointer",
    "ModelCatalog",
    "PeriodicCheckpointer",
    "resolve_checkpoint_path",
]
