from .registry import Registry
from .logger import setup_logger, log_first_n, log_every_n, log_every_n_seconds
from .env import seed_all_rng, collect_env_info
from .memory import retry_if_oom, retry_if_cuda_oom

__all__ = [
    "Registry",
    "setup_logger",
    "log_first_n",
    "log_every_n",
    "log_every_n_seconds",
    "seed_all_rng",
    "collect_env_info",
    "retry_if_oom",
    "retry_if_cuda_oom",
]
