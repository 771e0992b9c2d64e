from .build import build_optimizer, build_sgd_optimizer, classify_params
from .lr_scheduler import WarmupCosineLR, WarmupMultiStepLR, build_lr_scheduler, get_warmup_factor_at_iter

__all__ = [
    "build_optimizer",
    "build_sgd_optimizer",
    "classify_params",
    "WarmupCosineLR",
    "WarmupMultiStepLR",
    "build_lr_scheduler",
    "get_warmup_factor_at_iter",
]
