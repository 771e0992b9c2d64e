"""Project extensions (reference projects/: TensorMask, TridentNet, DensePose).

The reference ships a dedicated train_net.py per project that calls its
``add_*_config``; the generic fsgd CLIs instead auto-apply the project
extension when the config path names one (``setup_project_cfg``), so every
yaml under ``projects/`` and ``configs/`` works from ``tools/*.py``.
"""

from __future__ import annotations

__all__ = ["setup_project_cfg"]


def setup_project_cfg(cfg, config_file: str):
    """Extend ``cfg`` with the project defaults the yaml at ``config_file``
    needs (matched by path), importing the project so its registries fill."""
    path = config_file.replace("\\", "/").lower()
    if "tensormask" in path:
        from .tensormask import add_tensormask_config

        add_tensormask_config(cfg)
    if "densepose" in path:
        from .densepose import add_densepose_config, register_densepose_datasets

        add_densepose_config(cfg)
        register_densepose_datasets()
    if "tridentnet" in path:
        from .tridentnet import add_tridentnet_config

        add_tridentnet_config(cfg)
    return cfg
