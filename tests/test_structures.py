"""Structure tests (modeled on reference tests/test_boxes.py and
tests/test_rotated_boxes.py property tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgd_tpu.structures import (
    BitMasks,
    Boxes,
    BoxMode,
    ImageList,
    Instances,
    Keypoints,
    PolygonMasks,
    RotatedBoxes,
    keypoints_to_heatmap,
    matched_boxlist_iou,
    pairwise_iou,
    pairwise_iou_rotated,
    polygons_to_bitmask,
)


class TestBoxMode:
    def test_xywh_to_xyxy(self):
        box = np.array([[10.0, 10.0, 20.0, 30.0]])
        out = BoxMode.convert(box, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
        np.testing.assert_allclose(out, [[10, 10, 30, 40]])

    def test_xyxy_to_xywh_roundtrip(self):
        box = np.random.rand(8, 4) * 100
        box[:, 2:] += box[:, :2]
        mid = BoxMode.convert(box, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        back = BoxMode.convert(mid, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
        np.testing.assert_allclose(back, box, rtol=1e-6)

    def test_single_box_list(self):
        out = BoxMode.convert([10.0, 10.0, 20.0, 30.0], BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
        assert isinstance(out, list)
        assert out == [10.0, 10.0, 30.0, 40.0]

    def test_xywha_to_xyxy(self):
        # 90-degree rotated 20x40 box centered at (50, 50) -> bounds 40x20
        box = np.array([[50.0, 50.0, 20.0, 40.0, 90.0]])
        out = BoxMode.convert(box, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
        np.testing.assert_allclose(out, [[30, 40, 70, 60]], atol=1e-4)


class TestBoxes:
    def test_area_clip_nonempty(self):
        b = Boxes(np.array([[0, 0, 10, 10], [-5, -5, 5, 5], [3, 3, 3, 8]], dtype=np.float32))
        np.testing.assert_allclose(np.asarray(b.area()), [100, 100, 0])
        clipped = b.clip((8, 8))
        np.testing.assert_allclose(np.asarray(clipped.tensor[1]), [0, 0, 5, 5])
        np.testing.assert_array_equal(np.asarray(b.nonempty()), [True, True, False])

    def test_cat_getitem(self):
        b1 = Boxes(np.zeros((2, 4), np.float32))
        b2 = Boxes(np.ones((3, 4), np.float32))
        cat = Boxes.cat([b1, b2])
        assert len(cat) == 5
        sub = cat[np.array([0, 4])]
        assert len(sub) == 2
        empty = Boxes.cat([])
        assert len(empty) == 0

    def test_pairwise_iou(self):
        b1 = Boxes(np.array([[0, 0, 10, 10]], np.float32))
        b2 = Boxes(np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32))
        iou = np.asarray(pairwise_iou(b1, b2))
        np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], rtol=1e-6)

    def test_matched_boxlist_iou(self):
        b1 = Boxes(np.array([[0, 0, 10, 10], [0, 0, 4, 4]], np.float32))
        b2 = Boxes(np.array([[0, 0, 10, 10], [2, 0, 6, 4]], np.float32))
        iou = np.asarray(matched_boxlist_iou(b1, b2))
        np.testing.assert_allclose(iou, [1.0, 2 * 4 / (16.0 + 16 - 8)], rtol=1e-6)

    def test_boxes_jit_pytree(self):
        @jax.jit
        def f(boxes):
            return boxes.clip((5, 5)).area()

        out = f(Boxes(np.array([[0, 0, 10, 10]], np.float32)))
        np.testing.assert_allclose(np.asarray(out), [25.0])


class TestRotatedBoxes:
    @pytest.mark.slow
    def test_angle0_matches_axis_aligned(self):
        rng = np.random.RandomState(0)
        n, m = 20, 15
        cxcywh1 = np.abs(rng.rand(n, 4)) * 50 + 1
        cxcywh2 = np.abs(rng.rand(m, 4)) * 50 + 1
        rb1 = np.concatenate([cxcywh1, np.zeros((n, 1))], axis=1).astype(np.float32)
        rb2 = np.concatenate([cxcywh2, np.zeros((m, 1))], axis=1).astype(np.float32)

        def to_xyxy(b):
            return np.concatenate([b[:, :2] - b[:, 2:4] / 2, b[:, :2] + b[:, 2:4] / 2], axis=1)

        expected = np.asarray(pairwise_iou(Boxes(to_xyxy(cxcywh1)), Boxes(to_xyxy(cxcywh2))))
        got = np.asarray(pairwise_iou_rotated(RotatedBoxes(rb1), RotatedBoxes(rb2)))
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_45deg_squares(self):
        # Unit square and the same square rotated 45 degrees: IoU = 2(sqrt2-1)/(2-(sqrt2-1)*2)
        b1 = RotatedBoxes(np.array([[0, 0, 2, 2, 0]], np.float32))
        b2 = RotatedBoxes(np.array([[0, 0, 2, 2, 45]], np.float32))
        got = float(np.asarray(pairwise_iou_rotated(b1, b2))[0, 0])
        # octagon intersection area = 8*(sqrt(2)-1); areas 4 each
        inter = 8 * (np.sqrt(2) - 1)
        expected = inter / (8 - inter)
        assert abs(got - expected) < 1e-4

    def test_identical_rotated(self):
        b = RotatedBoxes(np.array([[10, 10, 4, 8, 33.0]], np.float32))
        got = float(np.asarray(pairwise_iou_rotated(b, b))[0, 0])
        assert abs(got - 1.0) < 1e-5

    def test_disjoint(self):
        b1 = RotatedBoxes(np.array([[0, 0, 2, 2, 10.0]], np.float32))
        b2 = RotatedBoxes(np.array([[100, 100, 2, 2, 70.0]], np.float32))
        assert float(np.asarray(pairwise_iou_rotated(b1, b2))[0, 0]) == 0.0

    def test_normalize_angles(self):
        b = RotatedBoxes(np.array([[0, 0, 1, 1, 270.0], [0, 0, 1, 1, -540.0]], np.float32))
        a = np.asarray(b.normalize_angles().tensor[:, 4])
        np.testing.assert_allclose(a, [-90.0, 180.0])

    def test_clip_nearly_horizontal(self):
        b = RotatedBoxes(np.array([[5, 5, 20, 20, 0.0], [5, 5, 20, 20, 30.0]], np.float32))
        c = np.asarray(b.clip((10, 10)).tensor)
        # angle-0 box is clipped to the image
        np.testing.assert_allclose(c[0], [5.0, 5.0, 10.0, 10.0, 0.0], atol=1e-5)
        # rotated box untouched
        np.testing.assert_allclose(c[1], [5, 5, 20, 20, 30.0])

    def test_scale_rotates_angle(self):
        b = RotatedBoxes(np.array([[10, 10, 10, 6, 45.0]], np.float32))
        s = np.asarray(b.scale(2.0, 1.0).tensor[0])
        assert s[0] == 20.0 and s[1] == 10.0
        assert s[4] > 45.0  # anisotropic x-scaling tips a 45-degree box toward vertical... angle grows


class TestInstances:
    def test_fields_and_slicing(self):
        inst = Instances((100, 200))
        inst.gt_boxes = Boxes(np.arange(12, dtype=np.float32).reshape(3, 4))
        inst.gt_classes = jnp.array([1, 2, 3])
        assert len(inst) == 3
        assert inst.has("gt_boxes")
        sub = inst[np.array([True, False, True])]
        assert len(sub) == 2
        np.testing.assert_array_equal(np.asarray(sub.gt_classes), [1, 3])

    def test_mismatched_length(self):
        inst = Instances((10, 10))
        inst.a = jnp.zeros((3,))
        with pytest.raises(AssertionError):
            inst.b = jnp.zeros((4,))

    def test_cat(self):
        i1 = Instances((10, 10), scores=jnp.array([1.0]))
        i2 = Instances((10, 10), scores=jnp.array([2.0, 3.0]))
        cat = Instances.cat([i1, i2])
        assert len(cat) == 3

    def test_pytree(self):
        inst = Instances((10, 10), scores=jnp.array([1.0, 2.0]))

        @jax.jit
        def f(x):
            return x.scores * 2

        np.testing.assert_allclose(np.asarray(f(inst)), [2.0, 4.0])


class TestImageList:
    def test_padding_and_sizes(self):
        imgs = [np.ones((10, 15, 3), np.float32), np.ones((20, 8, 3), np.float32)]
        il = ImageList.from_tensors(imgs, size_divisibility=32)
        assert il.tensor.shape == (2, 32, 32, 3)
        assert il.image_sizes == [(10, 15), (20, 8)]
        assert il[0].shape == (10, 15, 3)
        # padded area is zero
        assert float(il.tensor[0, 10:, :, :].sum()) == 0.0

    def test_fixed_bucket(self):
        imgs = [np.ones((10, 15, 3), np.float32)]
        il = ImageList.from_tensors(imgs, size_divisibility=32, pad_to=(64, 96))
        assert il.tensor.shape == (1, 64, 96, 3)


class TestMasks:
    def test_polygons_to_bitmask(self):
        # a 10x10 square polygon
        poly = [np.array([0, 0, 10, 0, 10, 10, 0, 10], dtype=np.float64)]
        mask = polygons_to_bitmask(poly, 20, 20)
        assert mask.dtype == bool
        assert mask[5, 5] and not mask[15, 15]
        assert 90 <= mask.sum() <= 130

    def test_polygon_masks_structure(self):
        polys = [[list(np.array([0, 0, 4, 0, 4, 4, 0, 4], np.float64))]] * 3
        pm = PolygonMasks(polys)
        assert len(pm) == 3
        assert len(pm[np.array([True, False, True])]) == 2
        areas = pm.area()
        np.testing.assert_allclose(areas, [16.0] * 3)
        bb = np.asarray(pm.get_bounding_boxes().tensor)
        np.testing.assert_allclose(bb, [[0, 0, 4, 4]] * 3)

    def test_bitmasks(self):
        arr = np.zeros((2, 8, 8), bool)
        arr[0, 2:6, 2:6] = True
        bm = BitMasks(arr)
        assert len(bm) == 2
        np.testing.assert_array_equal(np.asarray(bm.nonempty()), [True, False])
        bb = np.asarray(bm.get_bounding_boxes().tensor)
        np.testing.assert_allclose(bb[0], [2, 2, 6, 6])


class TestKeypoints:
    def test_to_heatmap(self):
        kpts = Keypoints(np.array([[[5.0, 5.0, 2.0], [100.0, 100.0, 2.0], [0.0, 0.0, 0.0]]]))
        rois = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
        heatmaps, valid = keypoints_to_heatmap(kpts.tensor, jnp.asarray(rois), 4)
        assert heatmaps.shape == (1, 3)
        np.testing.assert_array_equal(np.asarray(valid), [[1, 0, 0]])
        # (5, 5) in a 10x10 roi at heatmap 4 -> bin (2, 2) -> 2*4+2 = 10
        assert int(heatmaps[0, 0]) == 10

    def test_heatmaps_to_keypoints_peak(self):
        from fsgd_tpu.structures import heatmaps_to_keypoints

        maps = np.full((1, 1, 14, 14), -10.0, np.float32)
        maps[0, 0, 7, 3] = 10.0  # peak at y=7, x=3
        rois = np.array([[10.0, 20.0, 38.0, 48.0]], np.float32)  # 28x28 roi
        out = np.asarray(heatmaps_to_keypoints(jnp.asarray(maps), jnp.asarray(rois)))
        assert out.shape == (1, 1, 4)
        x, y = out[0, 0, 0], out[0, 0, 1]
        # peak bin center: (3.5/14)*28 + 10 = 17, (7.5/14)*28 + 20 = 35
        assert abs(x - 17.0) < 1.5 and abs(y - 35.0) < 1.5
        assert out[0, 0, 2] > 0  # logit at peak
