"""Detection hot ops — TPU-native (lax/Pallas) equivalents of the reference's
native C++/CUDA layer (detectron2/layers/csrc + torchvision ops)."""

from .rotated_iou import pairwise_iou_rotated
