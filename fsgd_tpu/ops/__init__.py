"""Detection hot ops — TPU-native (lax/Pallas) equivalents of the reference's
native C++/CUDA layer (detectron2/layers/csrc + torchvision ops)."""

from .box_transform import Box2BoxTransform, Box2BoxTransformRotated
from .losses import (
    focal_loss_softmax,
    sigmoid_cross_entropy,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from .matcher import Matcher
from .nms import (
    batched_nms,
    batched_nms_mask,
    batched_nms_rotated,
    batched_nms_rotated_mask,
    nms,
    nms_mask,
    nms_rotated,
    nms_rotated_mask,
    nms_topk,
)
from .paste_masks import paste_masks_in_image
from .roi_align import ROIAlign, ROIAlignRotated, roi_align, roi_align_rotated
from .rotated_iou import pairwise_iou_rotated
from .sampling import subsample_labels, subsample_labels_mask

__all__ = [k for k in globals().keys() if not k.startswith("_")]
from .deform_conv import deform_conv2d
from .swap_align2nat import swap_align2nat
