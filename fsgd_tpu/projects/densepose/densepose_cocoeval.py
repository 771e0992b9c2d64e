"""DensePose GPS (Geodesic Point Similarity) COCO evaluation.

Parity target: projects/DensePose/densepose/densepose_coco_evaluation.py:28-953
(``DensePoseCocoEval``) — the fork's modified pycocotools evaluator whose
"IoU" between a detection and a GT person is the mean GPS over the GT's
annotated surface points:  gps = mean_k exp(-d_k^2 / (2 * rho_k^2)),
where d_k is the geodesic distance on the SMPL mesh between the GT point's
closest mesh vertex and the predicted (I, U, V)'s closest mesh vertex, and
rho_k is the per-coarse-part mean geodesic distance.

The matching protocol derives from COCO's greedy matcher (pycocotools,
BSD-2, (c) Piotr Dollar and Tsung-Yi Lin) with the fork's densepose
extensions: zero-GPS pairs never match, images whose GTs are all ignore
mark every detection ignore, and unmatched detections fall back to a
bbox-IoU >= 0.8 match against ignore GTs (reference :522-575).

Geodesic data: the exact SMPL tables (``SMPL_subdiv.mat``,
``SMPL_SUBDIV_TRANSFORM.mat``, ``Pdist_matrix.pkl``) are loaded from
$FSGD_DENSEPOSE_DATA when present.  Without them a documented approximation
is used: intra-part distance is the UV Euclidean distance scaled by the
part's mean geodesic size, inter-part distance is infinite.  The
approximate mode is loudly logged and intended only for pipeline tests —
paper-comparable numbers require the SMPL assets.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import List, Optional

import numpy as np

from fsgd_tpu.data import rle as rle_codec
from fsgd_tpu.evaluation.cocoeval import COCOeval

from .structures import DensePoseResult

logger = logging.getLogger(__name__)

__all__ = ["DensePoseCocoEval", "GeodesicMesh", "ApproxUVMesh", "load_geodesic_mesh"]

# Mean geodesic distances per coarse part (reference :126) and the fine-part
# (24) -> coarse-part (8) table (reference :128-130)
MEAN_DISTANCES = np.array([0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150])
COARSE_PARTS = np.array([0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8])


class GeodesicMesh:
    """Exact SMPL-subdivision geodesic tables (reference _loadGEval :102-130)."""

    N_VERTS = 27554

    def __init__(self, smpl_subdiv: dict, pdist_transform: np.ndarray, pdist_matrix: np.ndarray):
        uv = np.array([smpl_subdiv["U_subdiv"], smpl_subdiv["V_subdiv"]]).squeeze()
        part_ids = np.asarray(smpl_subdiv["Part_ID_subdiv"]).squeeze()
        vert_inds = np.arange(uv.shape[1]) + 1
        self.part_uvs = [uv[:, part_ids == i + 1] for i in range(24)]
        self.part_vert_inds = [vert_inds[part_ids == i + 1] for i in range(24)]
        self.part_ids = part_ids
        self.pdist_transform = np.asarray(pdist_transform).squeeze()
        self.pdist_matrix = pdist_matrix

    @staticmethod
    def load(root: str) -> "GeodesicMesh":
        from scipy.io import loadmat

        subdiv = loadmat(os.path.join(root, "SMPL_subdiv.mat"))
        transform = loadmat(os.path.join(root, "SMPL_SUBDIV_TRANSFORM.mat"))["index"]
        with open(os.path.join(root, "Pdist_matrix.pkl"), "rb") as f:
            pdist = pickle.load(f, encoding="latin1")["Pdist_matrix"]
        return GeodesicMesh(subdiv, transform, pdist)

    def closest_verts(self, u: np.ndarray, v: np.ndarray, i: np.ndarray) -> np.ndarray:
        """Closest subdivided-mesh vertex index (1-based; -1 = background)
        per point (reference findAllClosestVerts :827-858), vectorized per part."""
        out = np.full(i.shape, -1.0)
        for part in range(24):
            at = i == part + 1
            if not np.any(at):
                continue
            pts = np.stack([u[at], v[at]])  # (2, M)
            part_uv = self.part_uvs[part]  # (2, K)
            # squared euclidean argmin over the part's mesh vertices
            d2 = (
                np.sum(part_uv ** 2, axis=0)[:, None]
                - 2.0 * part_uv.T @ pts
                + np.sum(pts ** 2, axis=0)[None, :]
            )
            out[at] = self.part_vert_inds[part][np.argmin(d2, axis=0)]
        return out

    def mean_normalization(self, gt_verts: np.ndarray) -> np.ndarray:
        """rho_k for each GT point, from its mesh part (reference :446-448)."""
        fine = self.part_ids[gt_verts[gt_verts > 0].astype(int) - 1]
        return MEAN_DISTANCES[COARSE_PARTS[fine]]

    def geodesic_distance(self, gt_verts: np.ndarray, dt_verts: np.ndarray) -> np.ndarray:
        """Geodesic distances for GT points with annotation (gt_verts > 0);
        inf where the prediction has no part label (reference getDistances :860-897).

        The reference stores the condensed upper-triangular Pdist row-major
        over REVERSED vertex indices; this reproduces its exact indexing,
        vectorized.
        """
        gt_t = self.pdist_transform[np.clip(gt_verts.astype(int) - 1, 0, None)]
        dt_t = self.pdist_transform[np.clip(dt_verts.astype(int) - 1, 0, None)]
        gt_t = np.where(gt_verts > 0, gt_t, 0)
        dt_t = np.where(dt_verts > 0, dt_t, 0)

        has_gt = gt_t > 0
        gt_sel = gt_t[has_gt].astype(np.int64)
        dt_sel = dt_t[has_gt].astype(np.int64)
        dists = np.full(gt_sel.shape, np.inf)
        both = dt_sel > 0
        gi, dj = gt_sel[both] - 1, dt_sel[both] - 1
        i = np.maximum(gi, dj)
        j = np.minimum(gi, dj)
        n = self.N_VERTS
        ri = n - i - 1
        rj = n - j - 1
        k = (n * (n - 1) // 2) - (n - ri) * ((n - ri) - 1) // 2 + rj - ri - 1
        k = (n * n - n) // 2 - k - 1
        vals = np.where(gi == dj, 0.0, np.asarray(self.pdist_matrix)[k.astype(np.int64)].squeeze())
        dists[both] = vals
        return dists


class ApproxUVMesh:
    """Assets-free approximation: intra-part chordal UV distance scaled by
    the part's mean geodesic size; inter-part = inf.  Pipeline-testing only."""

    def closest_verts(self, u, v, i):
        # encode (part, u, v) directly; "vertex id" = part * 2^20 + quantized uv
        qu = np.clip((u * 511).astype(np.int64), 0, 511)
        qv = np.clip((v * 511).astype(np.int64), 0, 511)
        verts = np.where(i > 0, (i.astype(np.int64) << 20) + (qv << 10) + qu + 1, -1)
        return verts.astype(np.float64)

    def mean_normalization(self, gt_verts):
        fine = (gt_verts[gt_verts > 0].astype(np.int64) - 1) >> 20
        return MEAN_DISTANCES[COARSE_PARTS[np.clip(fine, 0, 24)]]

    def geodesic_distance(self, gt_verts, dt_verts):
        has_gt = gt_verts > 0
        g = gt_verts[has_gt].astype(np.int64) - 1
        d = dt_verts[has_gt].astype(np.int64) - 1
        out = np.full(g.shape, np.inf)
        both = dt_verts[has_gt] > 0
        gp, dp = g >> 20, d >> 20
        gu, du = (g & 1023) / 511.0, (d & 1023) / 511.0
        gv, dv = ((g >> 10) & 1023) / 511.0, ((d >> 10) & 1023) / 511.0
        uv_dist = np.sqrt((gu - du) ** 2 + (gv - dv) ** 2)
        scale = MEAN_DISTANCES[COARSE_PARTS[np.clip(gp, 0, 24)]] * 2.0
        same = both & (gp == dp)
        out[same] = (uv_dist * scale)[same]
        return out


_warned_approx = [False]


def load_geodesic_mesh(root: Optional[str] = None):
    root = root if root is not None else os.environ.get("FSGD_DENSEPOSE_DATA", "")
    if root and os.path.isfile(os.path.join(root, "Pdist_matrix.pkl")):
        return GeodesicMesh.load(root)
    if not _warned_approx[0]:
        logger.warning(
            "SMPL geodesic assets not found (set $FSGD_DENSEPOSE_DATA): DensePose GPS "
            "uses the approximate UV metric — numbers are NOT paper-comparable."
        )
        _warned_approx[0] = True
    return ApproxUVMesh()


class Params:
    """UV evaluation params (reference setUvParams :932-940)."""

    def __init__(self):
        self.imgIds: List[int] = []
        self.catIds: List[int] = []
        self.iouThrs = np.linspace(0.5, 0.95, 10, endpoint=True)
        self.recThrs = np.linspace(0.0, 1.00, 101, endpoint=True)
        self.maxDets = [20]
        self.areaRng = [[0, 1e10], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]]
        self.areaRngLbl = ["all", "medium", "large"]
        self.useCats = 1
        self.iouType = "densepose"
        self.kpt_oks_sigmas = None


class DensePoseCocoEval(COCOeval):
    def __init__(self, cocoGt=None, cocoDt=None, iouType="densepose", mesh=None):
        assert iouType == "densepose"
        super().__init__(cocoGt, cocoDt, iouType="bbox")
        self.params = Params()
        self.params.iouType = "densepose"
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())
        self.mesh = mesh
        self.ignoreThrBB = 0.7
        self.ignoreThrUV = 0.9

    # -- preparation --------------------------------------------------------
    def _prepare(self):
        if self.mesh is None:
            self.mesh = load_geodesic_mesh()
        p = self.params
        gts = self.cocoGt.loadAnns(self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds))
        dts = self.cocoDt.loadAnns(self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds))
        import copy as _copy

        gts = _copy.deepcopy(gts)
        for gt in gts:
            # a person without point annotations cannot contribute GPS
            gt["ignore"] = gt.get("iscrowd", 0) or ("dp_x" not in gt)
        from collections import defaultdict

        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        igrgns = {}
        for gt in gts:
            iid = gt["image_id"]
            if iid not in igrgns:
                igrgns[iid] = self._ignore_region(iid)
            if self._check_ignore(gt, igrgns.get(iid)):
                self._gts[iid, gt["category_id"]].append(gt)
        for dt in dts:
            iid = dt["image_id"]
            if iid not in igrgns:
                igrgns[iid] = self._ignore_region(iid)
            if self._check_ignore(dt, igrgns.get(iid)):
                self._dts[iid, dt["category_id"]].append(dt)

    def _ignore_region(self, img_id) -> Optional[np.ndarray]:
        """Merged ignore-region mask from image metadata (reference :144-159)."""
        img = self.cocoGt.imgs[img_id]
        if not img.get("ignore_regions_x"):
            return None
        polys = []
        for xs, ys in zip(img["ignore_regions_x"], img["ignore_regions_y"]):
            poly = np.empty(2 * len(xs))
            poly[0::2] = xs
            poly[1::2] = ys
            polys.append(poly)
        mask = np.zeros((img["height"], img["width"]), np.uint8)
        for r in rle_codec.frPyObjects([p.tolist() for p in polys], img["height"], img["width"]):
            mask |= rle_codec.decode(r)
        return mask

    def _check_ignore(self, ann, iregion) -> bool:
        """Drop boxes/UVs overwhelmingly inside an ignore region (reference :161-189)."""
        if iregion is None:
            return True
        bb = np.array(ann["bbox"]).astype(int)
        x1, y1 = bb[0], bb[1]
        x2 = min(bb[0] + bb[2], iregion.shape[1])
        y2 = min(bb[1] + bb[3], iregion.shape[0])
        if bb[2] * bb[3] == 0:
            return False
        crop = iregion[y1:y2, x1:x2]
        if crop.sum() == 0:
            return True
        if "densepose" not in ann:
            return crop.sum() / bb[2] / bb[3] < self.ignoreThrBB
        (shape, data), _box = ann["densepose"]
        iuv = DensePoseResult.decode_png_data(shape, data)
        uvmask = (iuv[0] > 0).astype(np.uint8)
        inter = np.logical_and(uvmask[: crop.shape[0], : crop.shape[1]], crop).sum()
        union = np.logical_or(uvmask, 0).sum() + crop.sum() - inter
        return (inter / max(union, 1)) < self.ignoreThrUV

    # -- GPS ----------------------------------------------------------------
    def _gps(self, gt: dict, dt: dict) -> float:
        """Mean geodesic point similarity of one (dt, gt) pair (reference
        computeOgps inner loop :400-453)."""
        g_ = gt["bbox"]
        dx, dy = int(dt["bbox"][2]), int(dt["bbox"][3])
        dp_x = np.array(gt["dp_x"]) * g_[2] / 255.0
        dp_y = np.array(gt["dp_y"]) * g_[3] / 255.0
        py = (dp_y + g_[1] - dt["bbox"][1]).astype(int)
        px = (dp_x + g_[0] - dt["bbox"][0]).astype(int)
        inside = (px >= 0) & (px < dx) & (py >= 0) & (py < dy)
        if inside.size == 0 or not np.any(inside):
            return 0.0
        px = np.clip(px, 0, max(dx - 1, 0))
        py = np.clip(py, 0, max(dy - 1, 0))
        (shape, data), _box = dt["densepose"]
        iuv = DensePoseResult.decode_png_data(shape, data)
        ip = np.where(inside, iuv[0, py, px], 0)
        up = iuv[1, py, px] / 255.0
        vp = iuv[2, py, px] / 255.0
        c_verts = self.mesh.closest_verts(up, vp, ip)
        cg_verts = self.mesh.closest_verts(
            np.array(gt["dp_U"]), np.array(gt["dp_V"]), np.array(gt["dp_I"])
        )
        dist = self.mesh.geodesic_distance(cg_verts, c_verts)
        if dist.size == 0:
            return 0.0
        rho = self.mesh.mean_normalization(cg_verts)
        return float(np.sum(np.exp(-(dist ** 2) / (2.0 * rho ** 2))) / len(dist))

    def computeIoU(self, imgId, catId):
        """(gps, bbox_iou) pair for densepose (reference computeOgps :380-462)."""
        p = self.params
        g = self._gts[imgId, catId]
        d = self._dts[imgId, catId]
        inds = np.argsort([-d_["score"] for d_ in d], kind="mergesort")
        d = [d[i] for i in inds][: p.maxDets[-1]]
        if len(g) == 0 or len(d) == 0:
            return []
        gps = np.zeros((len(d), len(g)))
        for j, gt in enumerate(g):
            if not gt["ignore"]:
                for i, dt in enumerate(d):
                    gps[i, j] = self._gps(gt, dt)
        from fsgd_tpu.evaluation.cocoeval import _bbox_iou_xywh

        iou_bb = _bbox_iou_xywh(
            np.array([dt["bbox"] for dt in d], dtype=np.float64),
            np.array([gt["bbox"] for gt in g], dtype=np.float64),
            [int(gt.get("iscrowd", 0)) for gt in g],
        )
        return gps, iou_bb

    # -- matching -----------------------------------------------------------
    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        pair = self.ious[imgId, catId]
        ious = pair[0][:, gtind] if len(pair) > 0 else np.zeros((len(dt), len(gt)))
        ioubs = pair[1][:, gtind] if len(pair) > 0 else np.zeros((len(dt), len(gt)))

        T = len(p.iouThrs)
        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt]) if G else np.zeros((0,))
        dtIg = np.zeros((T, D))
        # all GTs ignore -> every detection is ignore (reference :522-523)
        if G and np.all(gtIg):
            dtIg[:] = 1

        for tind, t in enumerate(p.iouThrs):
            thr = min(t, 1 - 1e-10)
            for dind in range(D):
                best, m = thr, -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious[dind, gind] < best or ious[dind, gind] == 0.0:
                        continue
                    best, m = ious[dind, gind], gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = dt[dind]["id"]

        # unmatched detections overlapping an ignore GT by bbox IoU >= 0.8
        # become ignore (reference :553-575; note the reference evaluates
        # this with tind left at the last threshold)
        if D and G:
            tind = T - 1
            for dind in range(D):
                if dtm[tind, dind] != 0:
                    continue
                best, m = 0.8, -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if ioubs[dind, gind] < best:
                        continue
                    best, m = ioubs[dind, gind], gind
                if m > -1:
                    dtIg[:, dind] = gtIg[m]
                    if gtIg[m]:
                        dtm[tind, dind] = gt[m]["id"]
                        gtm[tind, m] = dt[dind]["id"]

        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]).reshape((1, D))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # -- summary ------------------------------------------------------------
    def summarize(self):
        """AP/AR at GPS thresholds (reference _summarizeUvs :776-788)."""
        stats = [
            self._summarize(1, maxDets=self.params.maxDets[0]),
            self._summarize(1, iouThr=0.5, maxDets=self.params.maxDets[0]),
            self._summarize(1, iouThr=0.75, maxDets=self.params.maxDets[0]),
            self._summarize(1, areaRng="medium", maxDets=self.params.maxDets[0]),
            self._summarize(1, areaRng="large", maxDets=self.params.maxDets[0]),
            self._summarize(0, maxDets=self.params.maxDets[0]),
            self._summarize(0, iouThr=0.5, maxDets=self.params.maxDets[0]),
            self._summarize(0, iouThr=0.75, maxDets=self.params.maxDets[0]),
            self._summarize(0, areaRng="medium", maxDets=self.params.maxDets[0]),
            self._summarize(0, areaRng="large", maxDets=self.params.maxDets[0]),
        ]
        self.stats = np.array(stats)
        return self.stats
