"""Public config entry points: ``get_cfg``, ``global_cfg``, ``set_global_cfg``.

API parity with detectron2/config/config.py:72-105 — ``global_cfg`` is the
process-wide "hack" config that the gambler subsystem reads across module
boundaries (e.g. evaluation unpacks the detector's 4-tuple when
``global_cfg.MODEL.GAMBLER_ON``).
"""

from .cfg_node import CfgNode

global_cfg = CfgNode()


def get_cfg() -> CfgNode:
    """Return a fresh copy of the default config tree."""
    from .defaults import _C

    return _C.clone()


def set_global_cfg(cfg: CfgNode) -> None:
    """Let the global config point to the given cfg (in-place update)."""
    global global_cfg
    global_cfg.clear()
    for k, v in cfg.items():
        dict.__setitem__(global_cfg, k, v)
