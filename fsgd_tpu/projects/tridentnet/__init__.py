from .config import add_tridentnet_config
from .trident_backbone import (
    TridentBottleneckBlock,
    TridentConv,
    build_trident_resnet_backbone,
)

__all__ = [
    "add_tridentnet_config",
    "TridentConv",
    "TridentBottleneckBlock",
    "build_trident_resnet_backbone",
]
from .trident_rcnn import TridentRCNN, merge_branch_instances
