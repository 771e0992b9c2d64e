"""Data loader construction.

Parity with detectron2/data/build.py:38-464: ``get_detection_dataset_dicts``
(filter crowd-only/keypointless images, class histogram — including the
fork's histogram dump, build.py:163-195), ``build_detection_train_loader``
(infinite sampler + group-homogeneous batches), ``build_detection_test_loader``
(batch=1 exact sharding), ``trivial_batch_collator``.

TPU redesign: the train loader yields *native padded batch dicts* (static
shapes, one per image bucket) ready for the jitted step — the reference's
DataLoader-worker + trivial-collate + per-GPU sharding pipeline becomes a
host thread that maps, buckets, pads, and (optionally) rasterizes GT masks at
``TPU.GT_MASK_STRIDE``.  The test loader keeps the reference's list-of-dicts
contract for ``model(batched_inputs)``.
"""

from __future__ import annotations

import itertools
import logging
import queue
import random
import threading
from typing import Any, Dict, List, Optional

import numpy as np

from ..models.batching import batched_inputs_to_batch, pick_bucket
from ..utils import comm
from .catalog import DatasetCatalog, MetadataCatalog
from .dataset_mapper import DatasetMapper
from .samplers import InferenceSampler, RepeatFactorTrainingSampler, TrainingSampler

logger = logging.getLogger(__name__)

__all__ = [
    "get_detection_dataset_dicts",
    "build_detection_train_loader",
    "build_detection_test_loader",
    "trivial_batch_collator",
    "print_instances_class_histogram",
    "to_native_batch",
]


def filter_images_with_only_crowd_annotations(dataset_dicts):
    num_before = len(dataset_dicts)

    def valid(anns):
        return any(ann.get("iscrowd", 0) == 0 for ann in anns)

    dataset_dicts = [x for x in dataset_dicts if valid(x["annotations"])]
    logger.info(
        "Removed %d images with no usable annotations. %d images left.",
        num_before - len(dataset_dicts),
        len(dataset_dicts),
    )
    return dataset_dicts


def filter_images_with_few_keypoints(dataset_dicts, min_keypoints_per_image):
    num_before = len(dataset_dicts)

    def visible_keypoints_in_image(dic):
        return sum(
            (np.array(ann["keypoints"][2::3]) > 0).sum()
            for ann in dic["annotations"]
            if "keypoints" in ann
        )

    dataset_dicts = [
        x for x in dataset_dicts if visible_keypoints_in_image(x) >= min_keypoints_per_image
    ]
    logger.info(
        "Removed %d images with fewer than %d keypoints.",
        num_before - len(dataset_dicts),
        min_keypoints_per_image,
    )
    return dataset_dicts


def print_instances_class_histogram(dataset_dicts, class_names, output_dir: Optional[str] = None):
    """Log (and optionally dump, fork build.py:163-195) the class histogram."""
    num_classes = len(class_names)
    histogram = np.zeros((num_classes,), dtype=np.int64)
    for entry in dataset_dicts:
        classes = [x["category_id"] for x in entry["annotations"] if not x.get("iscrowd", 0)]
        histogram += np.histogram(classes, bins=np.arange(num_classes + 1))[0]
    total = int(histogram.sum())
    logger.info("Distribution of instances among %d categories (total %d)", num_classes, total)
    if output_dir:
        import os

        os.makedirs(output_dir, exist_ok=True)
        np.save(os.path.join(output_dir, "class_histogram.npy"), histogram)
    return histogram


def get_detection_dataset_dicts(
    dataset_names, filter_empty=True, min_keypoints=0, proposal_files=None
):
    assert len(dataset_names)
    dataset_dicts = [DatasetCatalog.get(name) for name in dataset_names]
    for name, dicts in zip(dataset_names, dataset_dicts):
        assert len(dicts), "Dataset '{}' is empty!".format(name)

    if proposal_files is not None:
        assert len(dataset_names) == len(proposal_files)
        dataset_dicts = [
            load_proposals_into_dataset(d, f) for d, f in zip(dataset_dicts, proposal_files)
        ]
    dataset_dicts = list(itertools.chain.from_iterable(dataset_dicts))

    has_instances = "annotations" in dataset_dicts[0]
    if filter_empty and has_instances:
        dataset_dicts = filter_images_with_only_crowd_annotations(dataset_dicts)
    if min_keypoints > 0 and has_instances:
        dataset_dicts = filter_images_with_few_keypoints(dataset_dicts, min_keypoints)
    if has_instances:
        try:
            class_names = MetadataCatalog.get(dataset_names[0]).thing_classes
            print_instances_class_histogram(dataset_dicts, class_names)
        except AttributeError:
            pass
    return dataset_dicts


def load_proposals_into_dataset(dataset_dicts, proposal_file):
    """Attach precomputed proposals from an .npz/.pkl file (reference build.py:243-281)."""
    import pickle

    logger.info("Loading proposals from: %s", proposal_file)
    with open(proposal_file, "rb") as f:
        proposals = pickle.load(f, encoding="latin1")
    rename_keys = {"indexes": "ids", "scores": "objectness_logits"}
    for key in rename_keys:
        if key in proposals:
            proposals[rename_keys[key]] = proposals.pop(key)
    img_ids = {str(record["image_id"]): i for i, record in enumerate(dataset_dicts)}
    from ..structures import BoxMode

    bbox_mode = BoxMode(proposals["bbox_mode"]) if "bbox_mode" in proposals else BoxMode.XYXY_ABS
    for i in range(len(proposals["ids"])):
        pid = str(proposals["ids"][i])
        if pid in img_ids:
            record = dataset_dicts[img_ids[pid]]
            record["proposal_boxes"] = proposals["boxes"][i]
            record["proposal_objectness_logits"] = proposals["objectness_logits"][i]
            record["proposal_bbox_mode"] = bbox_mode
    return dataset_dicts


def trivial_batch_collator(batch):
    return batch


def _rasterize_gt_masks(instances, bucket, stride: int, max_gt: int) -> np.ndarray:
    """Per-instance GT bitmasks at 1/stride of the padded canvas."""
    mh, mw = bucket[0] // stride, bucket[1] // stride
    out = np.zeros((max_gt, mh, mw), dtype=np.uint8)
    if not instances.has("gt_masks"):
        return out
    gm = instances.gt_masks
    n = min(len(instances), max_gt)
    from ..structures.masks import BitMasks, PolygonMasks, polygons_to_bitmask

    if isinstance(gm, PolygonMasks):
        for i in range(n):
            polys = [p / stride for p in gm.polygons[i]]
            out[i] = polygons_to_bitmask(polys, mh, mw)
    elif isinstance(gm, BitMasks):
        import cv2

        masks = np.asarray(gm.tensor).astype(np.uint8)
        for i in range(n):
            m = masks[i]
            resized = cv2.resize(m, (m.shape[1] // stride, m.shape[0] // stride), interpolation=cv2.INTER_NEAREST)
            out[i, : resized.shape[0], : resized.shape[1]] = resized
    return out


def to_native_batch(
    mapped: List[Dict],
    max_gt: int,
    bucket,
    mask_stride: Optional[int] = None,
    num_keypoints: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Mapped per-image dicts -> one padded native batch dict."""
    batch = batched_inputs_to_batch(mapped, max_gt=max_gt, pad_to=bucket)
    if mask_stride is not None:
        masks = [
            _rasterize_gt_masks(x["instances"], bucket, mask_stride, max_gt)
            if "instances" in x
            else np.zeros((max_gt, bucket[0] // mask_stride, bucket[1] // mask_stride), np.uint8)
            for x in mapped
        ]
        batch["gt_masks"] = np.stack(masks).astype(np.float32)
    if num_keypoints is not None:
        kpts = np.zeros((len(mapped), max_gt, num_keypoints, 3), np.float32)
        for i, x in enumerate(mapped):
            inst = x.get("instances")
            if inst is not None and inst.has("gt_keypoints") and len(inst) > 0:
                k = np.asarray(inst.gt_keypoints.tensor)
                n = min(k.shape[0], max_gt)
                kpts[i, :n] = k[:n]
        batch["gt_keypoints"] = kpts
    if any("sem_seg" in x for x in mapped):
        sem = np.full((len(mapped), bucket[0], bucket[1]), 255, np.int32)
        for i, x in enumerate(mapped):
            if "sem_seg" in x:
                s = np.asarray(x["sem_seg"])
                sem[i, : s.shape[0], : s.shape[1]] = s
        batch["gt_sem_seg"] = sem
    return batch


class TrainLoader:
    """Infinite iterator of native padded batches with optional prefetching."""

    def __init__(self, dataset_dicts, mapper, sampler, batch_size: int, cfg, prefetch: int = 2):
        self.dataset_dicts = dataset_dicts
        self.mapper = mapper
        self.sampler = sampler
        self.batch_size = batch_size
        self.max_gt = cfg.TPU.MAX_GT_PER_IMAGE
        self.buckets = [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]
        self.aspect_grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING
        self.mask_stride = cfg.TPU.GT_MASK_STRIDE if cfg.MODEL.MASK_ON else None
        self.num_keypoints = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS if cfg.MODEL.KEYPOINT_ON else None
        self.prefetch = prefetch
        self._fallback_rng = random.Random(42)
        self._fallback_candidates = set(range(len(dataset_dicts)))

    def _bucket_of(self, image) -> tuple:
        h, w = image.shape[:2]
        return pick_bucket(h, w, self.buckets)

    def collate(self, mapped: List[Dict], bucket) -> Dict[str, np.ndarray]:
        """Mapped per-image dicts -> one padded native batch.  Projects with
        extra GT (e.g. DensePose) override this to extend the contract."""
        return to_native_batch(mapped, self.max_gt, bucket, self.mask_stride, self.num_keypoints)

    def _map_with_fallback(self, idx: int):
        """Reference MapDataset.__getitem__ semantics (data/common.py:34-55):
        when the mapper fails (raises or returns None), retry with random
        OTHER indices drawn from a fallback pool that permanently quarantines
        failing indices — one corrupt image can never kill training."""
        retry_count = 0
        cur_idx = int(idx)
        while True:
            try:
                data = self.mapper(self.dataset_dicts[cur_idx])
            except Exception:
                logger.exception("Mapper raised on index %d", cur_idx)
                data = None
            if data is not None:
                self._fallback_candidates.add(cur_idx)
                return data
            retry_count += 1
            self._fallback_candidates.discard(cur_idx)
            if not self._fallback_candidates:
                raise RuntimeError("every dataset index failed to map")
            cur_idx = self._fallback_rng.sample(sorted(self._fallback_candidates), 1)[0]
            if retry_count >= 3:
                logger.warning(
                    "Failed to apply mapper for idx: %s, retry count: %d",
                    idx, retry_count,
                )

    def _gen(self):
        buffers: Dict[Any, List] = {}
        sampler_iter = iter(self.sampler)
        while True:
            idx = next(sampler_iter)
            mapped = self._map_with_fallback(idx)
            key = self._bucket_of(mapped["image"]) if self.aspect_grouping else self.buckets[0]
            buffers.setdefault(key, []).append(mapped)
            if len(buffers[key]) == self.batch_size:
                batch = self.collate(buffers[key], key)
                buffers[key] = []
                yield batch

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._gen()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for item in self._gen():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


def build_detection_train_loader(cfg, mapper=None):
    """Native-batch infinite train loader (global batch / #processes each)."""
    num_processes = comm.get_world_size()
    images_per_batch = cfg.SOLVER.IMS_PER_BATCH
    assert images_per_batch % num_processes == 0
    images_per_worker = images_per_batch // num_processes

    dataset_dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        min_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE if cfg.MODEL.KEYPOINT_ON else 0,
        proposal_files=cfg.DATASETS.PROPOSAL_FILES_TRAIN if cfg.MODEL.LOAD_PROPOSALS else None,
    )
    if mapper is None:
        mapper = DatasetMapper(cfg, True)

    sampler_name = cfg.DATALOADER.SAMPLER_TRAIN
    logger.info("Using training sampler %s", sampler_name)
    if sampler_name == "TrainingSampler":
        sampler = TrainingSampler(len(dataset_dicts))
    elif sampler_name == "RepeatFactorTrainingSampler":
        sampler = RepeatFactorTrainingSampler(dataset_dicts, cfg.DATALOADER.REPEAT_THRESHOLD)
    else:
        raise ValueError("Unknown training sampler: {}".format(sampler_name))

    return TrainLoader(dataset_dicts, mapper, sampler, images_per_worker, cfg, prefetch=cfg.TPU.PREFETCH)


class TestLoader:
    """Sequential batch=1 list-of-dicts loader with __len__."""

    def __init__(self, dataset_dicts, mapper, sampler):
        self.dataset_dicts = dataset_dicts
        self.mapper = mapper
        self.sampler = sampler

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        for idx in self.sampler:
            mapped = self.mapper(self.dataset_dicts[idx])
            if mapped is None:
                continue
            yield [mapped]


def build_detection_test_loader(cfg, dataset_name, mapper=None):
    dataset_dicts = get_detection_dataset_dicts(
        [dataset_name],
        filter_empty=False,
        proposal_files=[
            cfg.DATASETS.PROPOSAL_FILES_TEST[list(cfg.DATASETS.TEST).index(dataset_name)]
        ]
        if cfg.MODEL.LOAD_PROPOSALS
        else None,
    )
    if mapper is None:
        mapper = DatasetMapper(cfg, False)
    return TestLoader(dataset_dicts, mapper, InferenceSampler(len(dataset_dicts)))
