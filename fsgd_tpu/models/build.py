"""Model component registries and builders.

Parity with the reference's registry glue (SURVEY.md section 1): string name in
cfg -> ``Registry.get(name)(cfg, ...)`` for every pluggable component.
"""

from ..layers import ShapeSpec
from ..utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")
BACKBONE_REGISTRY = Registry("BACKBONE")
PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")
RPN_HEAD_REGISTRY = Registry("RPN_HEAD")
ANCHOR_GENERATOR_REGISTRY = Registry("ANCHOR_GENERATOR")
ROI_HEADS_REGISTRY = Registry("ROI_HEADS")
ROI_BOX_HEAD_REGISTRY = Registry("ROI_BOX_HEAD")
ROI_MASK_HEAD_REGISTRY = Registry("ROI_MASK_HEAD")
ROI_KEYPOINT_HEAD_REGISTRY = Registry("ROI_KEYPOINT_HEAD")
SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")


def build_backbone(cfg, input_shape: ShapeSpec = None):
    if input_shape is None:
        input_shape = ShapeSpec(channels=3)
    return BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg, input_shape)


def build_model(cfg):
    """Build the full detection model named by MODEL.META_ARCHITECTURE."""
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)


def build_anchor_generator(cfg, input_shapes):
    return ANCHOR_GENERATOR_REGISTRY.get(cfg.MODEL.ANCHOR_GENERATOR.NAME)(cfg, input_shapes)


def build_proposal_generator(cfg, input_shapes):
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "PrecomputedProposals":
        return None
    return PROPOSAL_GENERATOR_REGISTRY.get(name)(cfg, input_shapes)


def build_roi_heads(cfg, input_shapes):
    return ROI_HEADS_REGISTRY.get(cfg.MODEL.ROI_HEADS.NAME)(cfg, input_shapes)
