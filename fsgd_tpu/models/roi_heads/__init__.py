from .box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from .fast_rcnn import fast_rcnn_inference_batched, fast_rcnn_losses
from .keypoint_head import KRCNNConvDeconvUpsampleHead, keypoint_rcnn_inference, keypoint_rcnn_loss
from .mask_head import MaskRCNNConvUpsampleHead, mask_rcnn_inference, mask_rcnn_loss
from .roi_heads import ROIHeads, StandardROIHeads, add_ground_truth_to_proposals
from .res5_roi_heads import Res5ROIHeads
from .cascade_rcnn import CascadeROIHeads

__all__ = [k for k in globals().keys() if not k.startswith("_")]
from .rotated_fast_rcnn import RROIHeads, fast_rcnn_inference_rotated_batched
