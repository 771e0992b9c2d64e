"""Environment helpers: RNG seeding and environment info collection.

Parity with detectron2/utils/env.py:15-70 (``seed_all_rng``) and
detectron2/utils/collect_env.py (``collect_env_info``), adapted to JAX.
"""

import datetime
import os
import random
import sys

import numpy as np

__all__ = ["seed_all_rng", "collect_env_info"]


def seed_all_rng(seed=None):
    """Seed python, numpy and derive the root JAX PRNGKey seed.

    Returns the seed used, so callers can build ``jax.random.PRNGKey(seed)``.
    """
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
    seed = int(seed) % (2 ** 31)
    np.random.seed(seed)
    random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    return seed


def collect_env_info() -> str:
    lines = []
    lines.append(("sys.platform", sys.platform))
    lines.append(("Python", sys.version.replace("\n", "")))
    lines.append(("numpy", np.__version__))
    try:
        import jax

        lines.append(("jax", jax.__version__))
        lines.append(("jax backend", jax.default_backend()))
        lines.append(("jax devices", str(jax.devices())))
        lines.append(("process count", str(jax.process_count())))
    except Exception as e:  # pragma: no cover
        lines.append(("jax", "unavailable: {}".format(e)))
    try:
        import flax
        import optax

        lines.append(("flax", flax.__version__))
        lines.append(("optax", optax.__version__))
    except Exception:
        pass
    import fsgd_tpu

    lines.append(("fsgd_tpu", fsgd_tpu.__version__))
    width = max(len(k) for k, _ in lines)
    return "\n".join("{}  {}".format(k.ljust(width), v) for k, v in lines)
