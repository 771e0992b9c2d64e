from ..build import META_ARCH_REGISTRY, build_model
from .retinanet import RetinaNet
from .rcnn import FasterRCNNFocalLoss, GeneralizedRCNN, ProposalNetwork

__all__ = [
    "META_ARCH_REGISTRY",
    "build_model",
    "RetinaNet",
    "GeneralizedRCNN",
    "ProposalNetwork",
    "FasterRCNNFocalLoss",
]
