from .checkpointer import Checkpointer, PeriodicCheckpointer

# API-compatibility alias with the reference name
DetectionCheckpointer = Checkpointer

__all__ = ["Checkpointer", "DetectionCheckpointer", "PeriodicCheckpointer"]
