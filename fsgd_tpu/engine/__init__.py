from .train_loop import HookBase, SimpleTrainer, TrainerBase
from . import hooks

__all__ = ["HookBase", "SimpleTrainer", "TrainerBase", "hooks"]
