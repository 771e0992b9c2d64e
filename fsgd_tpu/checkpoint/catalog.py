"""``catalog://`` / ``detectron2://`` checkpoint path resolution.

Role of the reference's detectron2/checkpoint/catalog.py:6-132 (``ModelCatalog``,
``ModelCatalogHandler``, ``Detectron2Handler``): every reference config seeds its
backbone from ``catalog://ImageNetPretrained/MSRA/R-50`` (Caffe2 ImageNet
weights) or points at ``detectron2://`` zoo files.  This environment has no
network egress, so both schemes resolve to files under a local mirror rooted at
``$FSGD_MODEL_ZOO`` (laid out exactly like the public buckets); when the mirror
is unset the canonical public URL string is returned so logs stay meaningful.
"""

from __future__ import annotations

import logging
import os

__all__ = ["ModelCatalog", "resolve_checkpoint_path"]

logger = logging.getLogger(__name__)

_S3_C2_PREFIX = "https://dl.fbaipublicfiles.com/detectron"
_S3_D2_PREFIX = "https://dl.fbaipublicfiles.com/detectron2/"


class ModelCatalog:
    """Maps short names to Caffe2/Detectron1 zoo blob paths.

    Reference: detectron2/checkpoint/catalog.py:6-89.  MSRA models have
    STRIDE_IN_1X1=True and fused (affine) BN — load only into FrozenBN models.
    """

    C2_IMAGENET_MODELS = {
        "MSRA/R-50": "ImageNetPretrained/MSRA/R-50.pkl",
        "MSRA/R-101": "ImageNetPretrained/MSRA/R-101.pkl",
        "FAIR/R-50-GN": "ImageNetPretrained/47261647/R-50-GN.pkl",
        "FAIR/R-101-GN": "ImageNetPretrained/47592356/R-101-GN.pkl",
        "FAIR/X-101-32x8d": "ImageNetPretrained/20171220/X-101-32x8d.pkl",
        "FAIR/X-101-64x4d": "ImageNetPretrained/FBResNeXt/X-101-64x4d.pkl",
        "FAIR/X-152-32x8d-IN5k": "ImageNetPretrained/25093814/X-152-32x8d-IN5k.pkl",
    }

    C2_DETECTRON_PATH_FORMAT = "{prefix}/{url}/output/train/{dataset}/{type}/model_final.pkl"
    C2_DATASET_COCO = "coco_2014_train%3Acoco_2014_valminusminival"
    C2_DATASET_COCO_KEYPOINTS = "keypoints_coco_2014_train%3Akeypoints_coco_2014_valminusminival"

    C2_DETECTRON_MODELS = {
        "35857197/e2e_faster_rcnn_R-50-C4_1x": "35857197/12_2017_baselines/e2e_faster_rcnn_R-50-C4_1x.yaml.01_33_49.iAX0mXvW",
        "35857345/e2e_faster_rcnn_R-50-FPN_1x": "35857345/12_2017_baselines/e2e_faster_rcnn_R-50-FPN_1x.yaml.01_36_30.cUF7QR7I",
        "35857890/e2e_faster_rcnn_R-101-FPN_1x": "35857890/12_2017_baselines/e2e_faster_rcnn_R-101-FPN_1x.yaml.01_38_50.sNxI7sX7",
        "36761737/e2e_faster_rcnn_X-101-32x8d-FPN_1x": "36761737/12_2017_baselines/e2e_faster_rcnn_X-101-32x8d-FPN_1x.yaml.06_31_39.5MIHi1fZ",
        "35858791/e2e_mask_rcnn_R-50-C4_1x": "35858791/12_2017_baselines/e2e_mask_rcnn_R-50-C4_1x.yaml.01_45_57.ZgkA7hPB",
        "35858933/e2e_mask_rcnn_R-50-FPN_1x": "35858933/12_2017_baselines/e2e_mask_rcnn_R-50-FPN_1x.yaml.01_48_14.DzEQe4wC",
        "35861795/e2e_mask_rcnn_R-101-FPN_1x": "35861795/12_2017_baselines/e2e_mask_rcnn_R-101-FPN_1x.yaml.02_31_37.KqyEK4tT",
        "36761843/e2e_mask_rcnn_X-101-32x8d-FPN_1x": "36761843/12_2017_baselines/e2e_mask_rcnn_X-101-32x8d-FPN_1x.yaml.06_35_59.RZotkLKI",
        "48616381/e2e_mask_rcnn_R-50-FPN_2x_gn": "GN/48616381/04_2018_gn_baselines/e2e_mask_rcnn_R-50-FPN_2x_gn_0416.13_23_38.bTlTI97Q",
        "37697547/e2e_keypoint_rcnn_R-50-FPN_1x": "37697547/12_2017_baselines/e2e_keypoint_rcnn_R-50-FPN_1x.yaml.08_42_54.kdzV35ao",
        "35998355/rpn_R-50-C4_1x": "35998355/12_2017_baselines/rpn_R-50-C4_1x.yaml.08_00_43.njH5oD9L",
        "35998814/rpn_R-50-FPN_1x": "35998814/12_2017_baselines/rpn_R-50-FPN_1x.yaml.08_06_03.Axg0r179",
        "36225147/fast_R-50-FPN_1x": "36225147/12_2017_baselines/fast_rcnn_R-50-FPN_1x.yaml.08_39_09.L3obSdQ2",
    }

    @staticmethod
    def get(name: str) -> str:
        """Return the blob path (relative to the detectron bucket root)."""
        if name.startswith("ImageNetPretrained/"):
            short = name[len("ImageNetPretrained/"):]
            if short not in ModelCatalog.C2_IMAGENET_MODELS:
                raise RuntimeError("model not present in the catalog: {}".format(name))
            return ModelCatalog.C2_IMAGENET_MODELS[short]
        if name.startswith("Caffe2Detectron/COCO/"):
            short = name[len("Caffe2Detectron/COCO/"):]
            if short not in ModelCatalog.C2_DETECTRON_MODELS:
                raise RuntimeError("model not present in the catalog: {}".format(name))
            url = ModelCatalog.C2_DETECTRON_MODELS[short]
            dataset = (
                ModelCatalog.C2_DATASET_COCO_KEYPOINTS
                if "keypoint_rcnn" in short
                else ModelCatalog.C2_DATASET_COCO
            )
            kind = "rpn" if "35998355/rpn_R-50-C4_1x" in short else "generalized_rcnn"
            return ModelCatalog.C2_DETECTRON_PATH_FORMAT.format(
                prefix="", url=url, dataset=dataset, type=kind
            ).lstrip("/")
        raise RuntimeError("model not present in the catalog: {}".format(name))


def _local_or_url(rel_path: str, url_prefix: str) -> str:
    root = os.environ.get("FSGD_MODEL_ZOO")
    if root:
        return os.path.join(root, rel_path)
    return url_prefix.rstrip("/") + "/" + rel_path


def resolve_checkpoint_path(path: str) -> str:
    """Expand catalog:// and detectron2:// schemes to local paths.

    With ``$FSGD_MODEL_ZOO`` set, both schemes map into that mirror; otherwise
    the public URL is returned (which the loader will then report as missing —
    this environment cannot download).
    """
    if path.startswith("catalog://"):
        rel = ModelCatalog.get(path[len("catalog://"):])
        resolved = _local_or_url(rel, _S3_C2_PREFIX)
        logger.info("Catalog entry %s points to %s", path, resolved)
        return resolved
    if path.startswith("detectron2://"):
        return _local_or_url(path[len("detectron2://"):], _S3_D2_PREFIX)
    return path
