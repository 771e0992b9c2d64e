from .train_loop import HookBase, SimpleTrainer, TrainerBase
from .defaults import DefaultPredictor, DefaultTrainer, default_argument_parser, default_setup
from .launch import launch
from . import hooks

__all__ = [
    "HookBase",
    "SimpleTrainer",
    "TrainerBase",
    "DefaultPredictor",
    "DefaultTrainer",
    "default_argument_parser",
    "default_setup",
    "launch",
    "hooks",
]
