"""Model size/compute analysis.

Role of the fork's ImbalanceDetection/pytorch_modelsize.py (``SizeEstimator``:
parameter + activation memory estimate) plus a parameter-count helper, for
JAX param pytrees and jitted functions.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["parameter_count", "parameter_count_table", "SizeEstimator"]


def parameter_count(params) -> Dict[str, int]:
    """Parameter counts per top-level scope plus the "" total."""
    counts: Dict[str, int] = defaultdict(int)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        keys = [str(getattr(p, "key", p)) for p in path]
        counts[""] += n
        for i in range(1, len(keys)):
            counts[".".join(keys[:i])] += n
    return dict(counts)


def parameter_count_table(params, max_depth: int = 3) -> str:
    counts = parameter_count(params)
    rows = [("model", counts[""])]
    for name in sorted(counts):
        if name and name.count(".") < max_depth:
            rows.append((name, counts[name]))
    width = max(len(n) for n, _ in rows)
    return "\n".join("{}  {:,}".format(n.ljust(width), c) for n, c in rows)


class SizeEstimator:
    """Estimate parameter/gradient/optimizer and activation memory of a jitted
    step (the fork's SizeEstimator measured torch module + activation bytes)."""

    def __init__(self, params, dtype_bytes: int = 4, optimizer_slots: int = 1):
        self.params = params
        self.dtype_bytes = dtype_bytes
        self.optimizer_slots = optimizer_slots

    def param_bytes(self) -> int:
        total = parameter_count(self.params)[""]
        return total * self.dtype_bytes

    def train_state_bytes(self) -> int:
        # params + grads + optimizer slots (e.g. momentum)
        return self.param_bytes() * (2 + self.optimizer_slots)

    def activation_bytes(self, fn, *example_args) -> int:
        """Upper-bound activation memory from the jitted computation's
        compiled memory analysis (XLA's own estimate)."""
        lowered = jax.jit(fn).lower(*example_args)
        compiled = lowered.compile()
        try:
            stats = compiled.memory_analysis()
            return int(stats.temp_size_in_bytes + stats.output_size_in_bytes)
        except Exception:
            return -1

    def estimate_total(self, fn=None, *example_args) -> Dict[str, Any]:
        out = {
            "param_bytes": self.param_bytes(),
            "train_state_bytes": self.train_state_bytes(),
        }
        if fn is not None:
            out["activation_bytes"] = self.activation_bytes(fn, *example_args)
        return out
