"""Checkpoint save/load for param + optimizer pytrees.

Parity with the reference's fvcore-based ``Checkpointer`` /
``DetectionCheckpointer`` + ``PeriodicCheckpointer``
(detectron2/checkpoint/detection_checkpoint.py:11-59, engine hooks): save
model/optimizer/iteration, ``resume_or_load`` restarts at iteration+1, keeps
``last_checkpoint`` bookkeeping.  Storage format is msgpack of numpy arrays
(flax.serialization) — a single portable file per checkpoint.

The Caffe2/Detectron1 ``.pkl`` zoo-weight converter lives in
:mod:`fsgd_tpu.checkpoint.torch_loader`.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

from ..utils import comm

__all__ = ["Checkpointer", "PeriodicCheckpointer"]


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _cached_download(url: str, logger) -> str:
    """fvcore HTTPURLHandler semantics (the reference's literal download
    branch, detectron2/checkpoint/catalog.py via PathManager): fetch the URL
    into a local cache keyed by its path ($FSGD_CACHE, default
    ~/.fsgd/cache) and reuse it on later loads.  On failure the URL is
    returned unchanged, which the caller reports as a missing checkpoint."""
    import shutil
    from urllib.parse import urlparse
    from urllib.request import urlopen

    cache_root = os.environ.get("FSGD_CACHE", os.path.expanduser("~/.fsgd/cache"))
    rel = urlparse(url).path.lstrip("/")
    dst = os.path.join(cache_root, rel)
    if os.path.isfile(dst):
        logger.info("URL %s cached in %s", url, dst)
        return dst
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    tmp = dst + ".tmp"
    try:
        with urlopen(url, timeout=30) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, dst)
    except Exception as e:
        logger.warning("Download failed for %s: %s", url, e)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return url
    logger.info("Downloaded %s to %s", url, dst)
    return dst


class Checkpointer:
    def __init__(self, save_dir: str = "", *, save_to_disk: bool = True, **checkpointables):
        """
        Args:
            checkpointables: named pytrees (e.g. model=params, optimizer=opt_state).
        """
        self.save_dir = save_dir
        self.save_to_disk = save_to_disk and comm.is_main_process()
        self.checkpointables = dict(checkpointables)
        self.logger = logging.getLogger(__name__)

    def add_checkpointable(self, key: str, tree: Any):
        self.checkpointables[key] = tree

    def save(self, name: str, **kwargs):
        """Dump all checkpointables plus scalar kwargs to ``<name>.ckpt``."""
        if not self.save_to_disk:
            return
        # to_state_dict turns optax NamedTuple states into plain nested dicts
        data = {
            k: serialization.to_state_dict(_to_numpy_tree(v)) for k, v in self.checkpointables.items()
        }
        data["__extra__"] = dict(kwargs)
        os.makedirs(self.save_dir, exist_ok=True)
        basename = "{}.ckpt".format(name)
        path = os.path.join(self.save_dir, basename)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(data))
        self.logger.info("Saved checkpoint to %s", path)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(basename)

    def load(self, path: str) -> Dict:
        """Load a checkpoint; returns the ``__extra__`` scalar dict."""
        if path:
            from .catalog import resolve_checkpoint_path

            path = resolve_checkpoint_path(path)
        if path and path.startswith(("http://", "https://")):
            path = _cached_download(path, self.logger)
        if not path or not os.path.isfile(path):
            self.logger.warning("No checkpoint found at %s; starting from scratch", path)
            return {}
        if path.endswith(".pkl") or path.endswith(".pth"):
            from .torch_loader import load_torch_checkpoint

            return load_torch_checkpoint(self, path)
        with open(path, "rb") as f:
            data = serialization.msgpack_restore(f.read())
        extra = data.pop("__extra__", {})
        for k, tree in data.items():
            if k in self.checkpointables:
                self.checkpointables[k] = _restore_like(self.checkpointables[k], tree)
            else:
                self.logger.warning("Checkpoint key %s has no registered checkpointable", k)
        self.logger.info("Loaded checkpoint from %s", path)
        return extra

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> str:
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                return os.path.join(self.save_dir, f.read().strip())
        except OSError:
            return ""

    def get_all_checkpoint_files(self) -> List[str]:
        return [
            os.path.join(self.save_dir, f)
            for f in os.listdir(self.save_dir)
            if f.endswith(".ckpt")
        ]

    def resume_or_load(self, path: str, *, resume: bool = True) -> Dict:
        """Resume from the latest checkpoint if present, else load ``path``."""
        if resume and self.has_checkpoint():
            return self.load(self.get_checkpoint_file())
        return self.load(path)


def _restore_like(target, loaded):
    """Restore loaded numpy trees into the dtype/structure of target."""
    if target is None:
        return loaded
    try:
        return serialization.from_state_dict(target, loaded)
    except Exception:
        return loaded


class PeriodicCheckpointer:
    """Save every ``period`` iterations + at the end (reference hooks)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: Optional[int] = None,
                 file_prefix: str = "model"):
        self.checkpointer = checkpointer
        self.period = int(period)
        self.max_iter = max_iter
        self.file_prefix = file_prefix

    def step(self, iteration: int, **kwargs):
        iteration = int(iteration)
        extra = {"iteration": iteration}
        extra.update(kwargs)
        if self.period > 0 and (iteration + 1) % self.period == 0:
            self.checkpointer.save("{}_{:07d}".format(self.file_prefix, iteration), **extra)
        if self.max_iter is not None and iteration >= self.max_iter - 1:
            self.checkpointer.save("{}_final".format(self.file_prefix), **extra)

    def save(self, name: str, **kwargs):
        self.checkpointer.save(name, **kwargs)
