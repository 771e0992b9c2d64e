from ..build import META_ARCH_REGISTRY, build_model
from .retinanet import RetinaNet
from .rcnn import FasterRCNNFocalLoss, GeneralizedRCNN, ProposalNetwork
from .semantic_seg import SemanticSegmentor, SemSegFPNHead
from .panoptic_fpn import PanopticFPN, combine_semantic_and_instance_outputs

__all__ = [
    "META_ARCH_REGISTRY",
    "build_model",
    "RetinaNet",
    "GeneralizedRCNN",
    "ProposalNetwork",
    "FasterRCNNFocalLoss",
    "SemanticSegmentor",
    "SemSegFPNHead",
    "PanopticFPN",
    "combine_semantic_and_instance_outputs",
]
