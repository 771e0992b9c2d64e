"""DensePose annotation / result structures (numpy, host-side).

Parity target: projects/DensePose/densepose/structures.py:10-519
(``DensePoseDataRelative``: per-instance chart annotation — normalized point
coords, part labels, U/V, 256x256 coarse segmentation; ``DensePoseTransformData``:
horizontal-flip label/UV symmetry tables; ``DensePoseResult``: compact
PNG-encoded per-box IUV images).

TPU design notes: these are host-side numpy containers used by the data
mapper and the evaluator.  Device code never sees them — the mapper flattens
them into the padded static batch contract (``dp_points``/``dp_uv``/
``dp_valid``/``dp_segm``, see ``roi_head.py``) before anything is traced.
"""

from __future__ import annotations

import base64
import logging
from io import BytesIO
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "DensePoseTransformData",
    "DensePoseDataRelative",
    "DensePoseList",
    "DensePoseResult",
    "iuv_maps_to_result",
]


class DensePoseTransformData:
    """Horizontal-flip symmetry tables (reference structures.py:10-37).

    ``uv_symmetries`` maps, for each of the 24 fine patches, a (256, 256)
    lookup table (indexed by [v_loc, u_loc]) giving the flipped U and V.
    When the official ``UV_symmetry_transforms.mat`` asset is unavailable the
    identity table is used (labels are still swapped); this is an
    approximation only used for from-scratch training without the SMPL
    assets, and it is warned about once.
    """

    # label 0 is background; parts 1..14 / patches 1..24
    MASK_LABEL_SYMMETRIES = [0, 1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13, 12, 14]
    # fmt: off
    POINT_LABEL_SYMMETRIES = [0, 1, 2, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 18, 17, 20, 19, 22, 21, 24, 23]  # noqa: E501
    # fmt: on

    def __init__(self, uv_symmetries: Optional[Dict[str, List[np.ndarray]]] = None):
        self.mask_label_symmetries = self.MASK_LABEL_SYMMETRIES
        self.point_label_symmetries = self.POINT_LABEL_SYMMETRIES
        self.uv_symmetries = uv_symmetries

    @staticmethod
    def load(fpath: str) -> "DensePoseTransformData":
        """Load ``UV_symmetry_transforms.mat`` (reference structures.py:23-37)."""
        import scipy.io

        raw = scipy.io.loadmat(fpath)
        uv_symmetries: Dict[str, List[np.ndarray]] = {}
        for key in ["U_transforms", "V_transforms"]:
            src = raw[key]
            uv_symmetries[key] = [
                np.asarray(src[0, i], dtype=np.float32) for i in range(src.shape[1])
            ]
        return DensePoseTransformData(uv_symmetries)

    _warned = False

    @classmethod
    def default(cls) -> "DensePoseTransformData":
        if not cls._warned:
            logger.warning(
                "UV_symmetry_transforms.mat not available: horizontal flips swap "
                "DensePose part labels but keep U/V unchanged (identity tables)."
            )
            cls._warned = True
        return cls(None)


class DensePoseDataRelative:
    """Chart annotation relative to a bounding box (reference structures.py:40-183).

    Point coords x, y are normalized to [0, 256); ``segm`` is the 256x256
    coarse (14-part + bg) segmentation.  Absolute image coords:
    ``x_img = x0 + x / 256 * w``.
    """

    X_KEY = "dp_x"
    Y_KEY = "dp_y"
    U_KEY = "dp_U"
    V_KEY = "dp_V"
    I_KEY = "dp_I"
    S_KEY = "dp_masks"
    N_BODY_PARTS = 14
    N_PART_LABELS = 24
    MASK_SIZE = 256

    def __init__(self, annotation: Dict, cleanup: bool = False):
        is_valid, reason = self.validate_annotation(annotation)
        assert is_valid, "Invalid DensePose annotations: {}".format(reason)
        self.x = np.asarray(annotation[self.X_KEY], dtype=np.float32)
        self.y = np.asarray(annotation[self.Y_KEY], dtype=np.float32)
        self.i = np.asarray(annotation[self.I_KEY], dtype=np.int32)
        self.u = np.asarray(annotation[self.U_KEY], dtype=np.float32)
        self.v = np.asarray(annotation[self.V_KEY], dtype=np.float32)
        self.segm = self.extract_segmentation_mask(annotation)
        if cleanup:
            self.cleanup_annotation(annotation)

    @staticmethod
    def extract_segmentation_mask(annotation: Dict) -> np.ndarray:
        """Decode per-part RLEs into one labeled 256x256 mask
        (reference structures.py:102-113)."""
        from fsgd_tpu.data import rle as rle_codec

        segm = np.zeros((DensePoseDataRelative.MASK_SIZE,) * 2, dtype=np.float32)
        poly_specs = annotation[DensePoseDataRelative.S_KEY]
        for i in range(DensePoseDataRelative.N_BODY_PARTS):
            poly_i = poly_specs[i] if i < len(poly_specs) else None
            if poly_i:
                if isinstance(poly_i, dict):
                    mask_i = rle_codec.decode(poly_i)
                else:  # polygon spec
                    from fsgd_tpu.structures.masks import polygons_to_bitmask

                    mask_i = polygons_to_bitmask(
                        [np.asarray(p, np.float64) for p in poly_i],
                        DensePoseDataRelative.MASK_SIZE,
                        DensePoseDataRelative.MASK_SIZE,
                    )
                segm[mask_i > 0] = i + 1
        return segm

    @staticmethod
    def validate_annotation(annotation: Dict) -> Tuple[bool, Optional[str]]:
        for key in (
            DensePoseDataRelative.X_KEY,
            DensePoseDataRelative.Y_KEY,
            DensePoseDataRelative.I_KEY,
            DensePoseDataRelative.U_KEY,
            DensePoseDataRelative.V_KEY,
            DensePoseDataRelative.S_KEY,
        ):
            if key not in annotation:
                return False, "no {} data in the annotation".format(key)
        return True, None

    @staticmethod
    def cleanup_annotation(annotation: Dict):
        for key in (
            DensePoseDataRelative.X_KEY,
            DensePoseDataRelative.Y_KEY,
            DensePoseDataRelative.I_KEY,
            DensePoseDataRelative.U_KEY,
            DensePoseDataRelative.V_KEY,
            DensePoseDataRelative.S_KEY,
        ):
            annotation.pop(key, None)

    def apply_transform(self, transforms, densepose_transform_data: DensePoseTransformData):
        """Keep relative annotations consistent with image transforms.

        Only horizontal flip changes relative chart data (reference
        structures.py:142-182); crops/resizes act on the box, which these
        coordinates are relative to.
        """
        from fsgd_tpu.data.transforms.transform import HFlipTransform

        do_hflip = sum(isinstance(t, HFlipTransform) for t in transforms.transforms) % 2 == 1
        if not do_hflip:
            return
        self.x = self.segm.shape[1] - self.x
        self._flip_iuv_semantics(densepose_transform_data)
        self.segm = self.segm[:, ::-1].copy()
        self._flip_segm_semantics(densepose_transform_data)

    def _flip_iuv_semantics(self, tdata: DensePoseTransformData):
        i_old = self.i.copy()
        sym = tdata.point_label_symmetries
        for i in range(self.N_PART_LABELS):
            if sym[i + 1] == i + 1:
                continue
            at = i_old == i + 1
            if not np.any(at):
                continue
            self.i[at] = sym[i + 1]
            if tdata.uv_symmetries is not None:
                u_loc = np.clip((self.u[at] * 255).astype(np.int64), 0, 255)
                v_loc = np.clip((self.v[at] * 255).astype(np.int64), 0, 255)
                self.u[at] = tdata.uv_symmetries["U_transforms"][i][v_loc, u_loc]
                self.v[at] = tdata.uv_symmetries["V_transforms"][i][v_loc, u_loc]

    def _flip_segm_semantics(self, tdata: DensePoseTransformData):
        old = self.segm.copy()
        sym = tdata.mask_label_symmetries
        for i in range(self.N_BODY_PARTS):
            if sym[i + 1] != i + 1:
                self.segm[old == i + 1] = sym[i + 1]


class DensePoseList:
    """Per-instance chart annotations, ``None`` where absent
    (reference structures.py:457-519).  Supports the index forms
    ``Instances.__getitem__`` forwards: int, slice, bool mask, index array."""

    def __init__(self, densepose_datas: List[Optional[DensePoseDataRelative]]):
        for dp in densepose_datas:
            assert dp is None or isinstance(dp, DensePoseDataRelative)
        self.densepose_datas = list(densepose_datas)

    def __len__(self):
        return len(self.densepose_datas)

    def __iter__(self):
        return iter(self.densepose_datas)

    def __getitem__(self, item):
        if isinstance(item, int):
            return self.densepose_datas[item]
        if isinstance(item, slice):
            return DensePoseList(self.densepose_datas[item])
        item = np.asarray(item)
        if item.dtype == bool:
            return DensePoseList([d for d, keep in zip(self.densepose_datas, item) if keep])
        return DensePoseList([self.densepose_datas[int(i)] for i in item])

    def __repr__(self):
        return "DensePoseList(num_instances={})".format(len(self))


def _resize_map(arr: np.ndarray, hw: Tuple[int, int], nearest: bool) -> np.ndarray:
    import cv2

    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(arr.astype(np.float32), (hw[1], hw[0]), interpolation=interp)


def iuv_maps_to_result(
    coarse_segm: np.ndarray,  # (S, S) argmaxed part labels 0..14
    fine_segm: np.ndarray,  # (S, S) argmaxed patch labels 0..24
    u_map: np.ndarray,  # (S, S) in [0, 1]
    v_map: np.ndarray,  # (S, S)
    box_xywh,
) -> np.ndarray:
    """Per-detection (3, h, w) uint8 IUV image over the detection box
    (reference structures.py:373-411 ``DensePoseResult._output_to_result``).

    Label maps are nearest-resized (they are already argmaxed on device —
    the reference interpolates logits then argmaxes; identical away from
    label boundaries), U/V bilinear.
    """
    x, y, w, h = box_xywh
    w = max(int(w), 1)
    h = max(int(h), 1)
    s_box = _resize_map(coarse_segm, (h, w), nearest=True)
    i_box = (_resize_map(fine_segm, (h, w), nearest=True) * (s_box > 0)).astype(np.int64)
    u_box = _resize_map(u_map, (h, w), nearest=False)
    v_box = _resize_map(v_map, (h, w), nearest=False)
    result = np.zeros((3, h, w), dtype=np.uint8)
    result[0] = i_box
    result[1] = np.clip(u_box * 255.0, 0, 255).astype(np.uint8) * (i_box > 0)
    result[2] = np.clip(v_box * 255.0, 0, 255).astype(np.uint8) * (i_box > 0)
    return result


class DensePoseResult:
    """Compact PNG-encoded per-box IUV results (reference structures.py:354-454).

    ``results[k]`` is ``((shape, png_str), box_xywh)`` — the exact contract
    the reference evaluator and ``apply_net`` consume.
    """

    def __init__(self, boxes_xywh: np.ndarray, iuv_images: List[np.ndarray]):
        assert len(iuv_images) == len(boxes_xywh)
        self.boxes_xywh = np.asarray(boxes_xywh, dtype=np.float64).tolist()
        self.results = []
        for arr in iuv_images:
            self.results.append((arr.shape, DensePoseResult.encode_png_data(arr)))

    @staticmethod
    def from_dets(pred_densepose: np.ndarray, boxes_xywh: np.ndarray) -> "DensePoseResult":
        """Build from the model's stacked per-detection banks
        ((N, S, S, 4): coarse segm, fine segm, U, V — the
        ``pred_densepose`` Instances field)."""
        banks = np.asarray(pred_densepose)
        imgs = [
            iuv_maps_to_result(
                banks[k, :, :, 0], banks[k, :, :, 1], banks[k, :, :, 2], banks[k, :, :, 3],
                boxes_xywh[k],
            )
            for k in range(len(boxes_xywh))
        ]
        return DensePoseResult(boxes_xywh, imgs)

    @staticmethod
    def encode_png_data(arr: np.ndarray) -> str:
        assert arr.ndim == 3 and arr.shape[0] == 3 and arr.dtype == np.uint8
        from PIL import Image

        im = Image.fromarray(np.moveaxis(arr, 0, -1))
        stream = BytesIO()
        im.save(stream, format="png", optimize=True)
        return base64.encodebytes(stream.getvalue()).decode()

    @staticmethod
    def decode_png_data(shape, s: str) -> np.ndarray:
        from PIL import Image

        stream = BytesIO(base64.decodebytes(s.encode()))
        im = Image.open(stream)
        data = np.moveaxis(np.array(im.getdata(), dtype=np.uint8), -1, 0)
        return data.reshape(shape)

    def __len__(self):
        return len(self.results)

    def __getitem__(self, item):
        return self.results[item], self.boxes_xywh[item]
