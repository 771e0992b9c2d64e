from .build import (
    ANCHOR_GENERATOR_REGISTRY,
    BACKBONE_REGISTRY,
    META_ARCH_REGISTRY,
    PROPOSAL_GENERATOR_REGISTRY,
    ROI_BOX_HEAD_REGISTRY,
    ROI_HEADS_REGISTRY,
    ROI_KEYPOINT_HEAD_REGISTRY,
    ROI_MASK_HEAD_REGISTRY,
    RPN_HEAD_REGISTRY,
    SEM_SEG_HEADS_REGISTRY,
    build_anchor_generator,
    build_backbone,
    build_model,
    build_proposal_generator,
    build_roi_heads,
)
from .anchor_generator import DefaultAnchorGenerator, RotatedAnchorGenerator
from .backbone.resnet import ResNet, build_resnet_backbone
from .backbone.fpn import FPN, build_resnet_fpn_backbone, build_retinanet_resnet_fpn_backbone
from .postprocessing import detector_postprocess, scale_detections, sem_seg_postprocess

# importing these modules populates the component registries
from . import proposal_generator  # noqa: F401
from . import roi_heads  # noqa: F401
from . import meta_arch  # noqa: F401
from .poolers import ROIPooler

__all__ = [k for k in globals().keys() if not k.startswith("_")]
