from .cfg_node import CfgNode
from .compat import downgrade_config, upgrade_config
from .config import get_cfg, global_cfg, set_global_cfg
from .gambler import add_gambler_config

__all__ = [
    "CfgNode",
    "get_cfg",
    "global_cfg",
    "set_global_cfg",
    "downgrade_config",
    "upgrade_config",
    "add_gambler_config",
]
