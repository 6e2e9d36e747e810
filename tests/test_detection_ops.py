"""Unit tests for the detection ops: boxes, padded NMS, ROI-align
(SURVEY.md §2.4 native work items, rebuilt as static-shape XLA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.ops.boxes import (
    box_area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    jitter_boxes,
    masks_to_boxes,
    remove_small_boxes_mask,
)
from e_osvos_tpu.ops.nms import batched_nms, nms
from e_osvos_tpu.ops.roi_align import (
    fpn_level_assignment,
    multiscale_roi_align,
    roi_align,
)


class TestBoxes:
    def test_iou_golden(self):
        a = jnp.array([[0, 0, 10, 10]], jnp.float32)
        b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                      jnp.float32)
        iou = np.asarray(box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-6)

    def test_area_and_degenerate(self):
        boxes = jnp.array([[0, 0, 4, 5], [3, 3, 2, 6]], jnp.float32)
        np.testing.assert_allclose(np.asarray(box_area(boxes)), [20.0, 0.0])

    def test_encode_decode_roundtrip(self):
        key = jax.random.PRNGKey(0)
        p = jax.random.uniform(key, (16, 2)) * 50
        proposals = jnp.concatenate([p, p + 10 + jax.random.uniform(key, (16, 2)) * 40], -1)
        gt = proposals + jax.random.normal(jax.random.PRNGKey(1), (16, 4)) * 3
        gt = jnp.concatenate(
            [jnp.minimum(gt[:, :2], gt[:, 2:] - 1), jnp.maximum(gt[:, 2:], gt[:, :2] + 1)],
            -1,
        )
        deltas = encode_boxes(gt, proposals)
        rec = decode_boxes(deltas, proposals)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), rtol=1e-4,
                                   atol=1e-3)

    def test_clip(self):
        boxes = jnp.array([[-5, -5, 200, 90]], jnp.float32)
        out = np.asarray(clip_boxes(boxes, (100, 150)))
        np.testing.assert_allclose(out, [[0, 0, 150, 90]])

    def test_masks_to_boxes(self):
        m = np.zeros((3, 20, 30), np.uint8)
        m[0, 5:10, 7:15] = 1
        m[1, 0:1, 0:1] = 1
        boxes, valid = masks_to_boxes(jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(boxes[0]), [7, 5, 15, 10])
        np.testing.assert_allclose(np.asarray(boxes[1]), [0, 0, 1, 1])
        assert list(np.asarray(valid)) == [True, True, False]
        np.testing.assert_allclose(np.asarray(boxes[2]), [0, 0, 0, 0])

    def test_jitter_bounded(self):
        boxes = jnp.array([[10, 10, 30, 50]], jnp.float32)
        out = np.asarray(jitter_boxes(jax.random.PRNGKey(0), boxes, rel=0.1))
        # width 20, height 40 → max abs jitter 2 / 4
        assert abs(out[0, 0] - 10) <= 2 and abs(out[0, 2] - 30) <= 2
        assert abs(out[0, 1] - 10) <= 4 and abs(out[0, 3] - 50) <= 4

    def test_remove_small(self):
        boxes = jnp.array([[0, 0, 5, 5], [0, 0, 1, 10]], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(remove_small_boxes_mask(boxes, 2.0)), [True, False]
        )


class TestNMS:
    def test_suppresses_overlaps_keeps_best(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.array([0.9, 0.95, 0.5])
        idx, ok = nms(boxes, scores, iou_threshold=0.5, max_out=3)
        kept = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        assert kept == [1, 2]
        assert int(np.asarray(ok).sum()) == 2
        assert int(np.asarray(idx)[2]) == -1

    def test_threshold_boundary(self):
        # IoU exactly at threshold is NOT suppressed (strict >)
        boxes = jnp.array([[0, 0, 10, 10], [5, 0, 15, 10]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        iou = float(np.asarray(box_iou(boxes[:1], boxes[1:]))[0, 0])
        idx, ok = nms(boxes, scores, iou_threshold=iou, max_out=2)
        assert int(np.asarray(ok).sum()) == 2

    def test_valid_mask_excludes_padding(self):
        boxes = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
        scores = jnp.array([0.5, 0.99])
        valid = jnp.array([True, False])
        idx, ok = nms(boxes, scores, 0.5, max_out=2, valid=valid)
        kept = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        assert kept == [0]

    def test_batched_ids_do_not_cross_suppress(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        ids = jnp.array([0, 1])
        _, ok = batched_nms(boxes, scores, ids, 0.5, max_out=2)
        assert int(np.asarray(ok).sum()) == 2

    def test_jittable(self):
        f = jax.jit(lambda b, s: nms(b, s, 0.5, 4))
        boxes = jax.random.uniform(jax.random.PRNGKey(0), (8, 2)) * 20
        boxes = jnp.concatenate([boxes, boxes + 10], -1)
        scores = jax.random.uniform(jax.random.PRNGKey(1), (8,))
        idx, ok = f(boxes, scores)
        assert idx.shape == (4,)


class TestRoiAlign:
    def test_identity_cell_average(self):
        """A 2x2 box aligned to the grid with output 1x1 and sampling 2
        averages exactly the 4 covered pixel centers (linear ramp field)."""
        h = w = 8
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        feat = jnp.asarray((yy + xx)[..., None])
        # box covering pixel centers (1..2, 1..2): xyxy = (1, 1, 3, 3) with
        # aligned=True half-pixel convention → samples at 1.0,1.5,...
        boxes = jnp.array([[1.0, 1.0, 3.0, 3.0]])
        out = roi_align(feat, boxes, (1, 1), spatial_scale=1.0,
                        sampling_ratio=2)
        # samples at (1.0,2.0)x(1.0,2.0) of y+x field → mean = 3.0
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 3.0, rtol=1e-5)

    def test_constant_field_invariance(self):
        feat = jnp.full((16, 16, 3), 7.0)
        boxes = jnp.array([[2.3, 4.1, 9.7, 12.2], [0.0, 0.0, 15.0, 15.0]])
        out = roi_align(feat, boxes, (7, 7), sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-5)

    def test_spatial_scale(self):
        """Box in image coords maps onto a stride-2 feature map."""
        h = w = 8
        yy, _ = np.mgrid[0:h, 0:w].astype(np.float32)
        feat = jnp.asarray(yy[..., None])
        big = roi_align(feat, jnp.array([[0, 0, 16, 16]]), (2, 2),
                        spatial_scale=0.5, sampling_ratio=1)
        # rows sampled at y = 1.5 and 5.5 → values 1.5, 5.5
        np.testing.assert_allclose(
            np.asarray(big)[0, :, 0, 0], [1.5, 5.5], rtol=1e-5
        )

    def test_level_assignment(self):
        boxes = jnp.array(
            [
                [0, 0, 56, 56],     # small → level 0
                [0, 0, 224, 224],   # canonical → level 2
                [0, 0, 900, 900],   # huge → clamped to 3
            ],
            jnp.float32,
        )
        lv = np.asarray(fpn_level_assignment(boxes, 4))
        np.testing.assert_array_equal(lv, [0, 2, 3])

    def test_multiscale_selects_per_roi(self):
        feats = [jnp.full((256 // (2**i), 256 // (2**i), 1), float(i))
                 for i in range(4)]
        scales = [1.0 / (2**i) for i in range(4)]
        boxes = jnp.array([[0, 0, 56, 56], [0, 0, 224, 224]], jnp.float32)
        out = multiscale_roi_align(feats, boxes, (2, 2), scales)
        np.testing.assert_allclose(np.asarray(out)[0], 0.0)
        np.testing.assert_allclose(np.asarray(out)[1], 2.0)


class TestFastNMS:
    from e_osvos_tpu.ops.nms import fast_nms as _fast  # noqa

    def test_non_overlapping_all_kept_sorted_by_score(self):
        from e_osvos_tpu.ops.nms import fast_nms

        boxes = jnp.array(
            [[0, 0, 10, 10], [50, 50, 60, 60], [100, 0, 110, 10]], jnp.float32
        )
        scores = jnp.array([0.5, 0.9, 0.7])
        idx, ok = fast_nms(boxes, scores, 0.5, 3)
        assert list(np.asarray(idx)) == [1, 2, 0]
        assert np.asarray(ok).all()

    def test_suppresses_overlap_of_higher_scorer(self):
        from e_osvos_tpu.ops.nms import fast_nms

        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        idx, ok = fast_nms(boxes, scores, 0.5, 2)
        kept = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        assert kept == [0]

    def test_matches_greedy_when_no_chains(self):
        """Without suppression chains fast and greedy NMS agree."""
        from e_osvos_tpu.ops.nms import fast_nms, nms

        key = jax.random.PRNGKey(3)
        xy = jax.random.uniform(key, (40, 2)) * 300
        wh = jax.random.uniform(jax.random.fold_in(key, 1), (40, 2)) * 10 + 2
        boxes = jnp.concatenate([xy, xy + wh], -1)  # sparse, few overlaps
        scores = jax.random.uniform(jax.random.fold_in(key, 2), (40,))
        gi, gk = nms(boxes, scores, 0.5, 40)
        fi, fk = fast_nms(boxes, scores, 0.5, 40)
        greedy_kept = set(int(i) for i, o in zip(np.asarray(gi), np.asarray(gk)) if o)
        fast_kept = set(int(i) for i, o in zip(np.asarray(fi), np.asarray(fk)) if o)
        # fast suppression is a superset: kept(fast) ⊆ kept(greedy)
        assert fast_kept <= greedy_kept

    def test_valid_mask_and_ids(self):
        from e_osvos_tpu.ops.nms import fast_nms

        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        # different ids never cross-suppress
        idx, ok = fast_nms(boxes, scores, 0.5, 2, ids=jnp.array([0, 1]))
        assert int(np.asarray(ok).sum()) == 2
        # invalid slots never appear
        idx, ok = fast_nms(boxes, scores, 0.5, 2,
                           valid=jnp.array([False, True]))
        kept = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        assert kept == [1]


class TestFlatMultiscaleRoiAlign:
    """Single-gather multiscale == the dense compute-all-levels oracle."""

    def test_matches_dense(self):
        from e_osvos_tpu.ops.roi_align import _multiscale_roi_align_dense

        key = jax.random.PRNGKey(0)
        scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
        feats = [
            jax.random.normal(jax.random.fold_in(key, i),
                              (64 // (2 ** i), 96 // (2 ** i), 8))
            for i in range(4)
        ]
        boxes = jnp.array(
            [
                [3.0, 5.0, 60.0, 50.0],
                [0.0, 0.0, 250.0, 250.0],
                [10.0, 10.0, 330.0, 200.0],
                [-5.0, -5.0, 40.0, 30.0],   # partially out of range
                [0.0, 0.0, 0.0, 0.0],       # degenerate
            ],
            jnp.float32,
        )
        got = multiscale_roi_align(feats, boxes, (7, 7), scales)
        want = _multiscale_roi_align_dense(feats, boxes, (7, 7), scales)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_grad_flows(self):
        from e_osvos_tpu.ops.roi_align import _multiscale_roi_align_dense

        scales = [1 / 2, 1 / 4]
        feats = [jnp.ones((16, 16, 2)), jnp.ones((8, 8, 2))]
        boxes = jnp.array([[1.0, 1.0, 12.0, 12.0]], jnp.float32)

        def f(impl, *fs):
            return jnp.sum(jnp.sin(impl(list(fs), boxes, (3, 3), scales)))

        g1 = jax.grad(lambda a, b: f(multiscale_roi_align, a, b),
                      argnums=(0, 1))(*feats)
        g2 = jax.grad(lambda a, b: f(_multiscale_roi_align_dense, a, b),
                      argnums=(0, 1))(*feats)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_packed_matches_flat(self):
        """Corner-packed variant == the flat single-gather form (values)."""
        from e_osvos_tpu.ops.roi_align import multiscale_roi_align_packed

        key = jax.random.PRNGKey(3)
        scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
        feats = [
            jax.random.normal(jax.random.fold_in(key, i),
                              (64 // (2 ** i), 96 // (2 ** i), 8))
            for i in range(4)
        ]
        boxes = jnp.array(
            [
                [3.0, 5.0, 60.0, 50.0],
                [0.0, 0.0, 250.0, 250.0],
                [10.0, 10.0, 330.0, 200.0],
                [-5.0, -5.0, 40.0, 30.0],   # partially out of range
                [0.0, 0.0, 0.0, 0.0],       # degenerate
                [200.0, 100.0, 400.0, 300.0],  # extends past image
            ],
            jnp.float32,
        )
        got = multiscale_roi_align_packed(feats, boxes, (7, 7), scales)
        want = multiscale_roi_align(feats, boxes, (7, 7), scales)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_packed_grad_matches(self):
        from e_osvos_tpu.ops.roi_align import multiscale_roi_align_packed

        scales = [1 / 2, 1 / 4]
        key = jax.random.PRNGKey(7)
        feats = [jax.random.normal(jax.random.fold_in(key, i), shp)
                 for i, shp in enumerate([(16, 16, 2), (8, 8, 2)])]
        boxes = jnp.array([[1.0, 1.0, 12.0, 12.0],
                           [-2.0, 3.0, 20.0, 18.0]], jnp.float32)

        def f(impl, *fs):
            return jnp.sum(jnp.sin(impl(list(fs), boxes, (3, 3), scales)))

        g1 = jax.grad(lambda a, b: f(multiscale_roi_align_packed, a, b),
                      argnums=(0, 1))(*feats)
        g2 = jax.grad(lambda a, b: f(multiscale_roi_align, a, b),
                      argnums=(0, 1))(*feats)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestStackRoiAlign1ch:
    """stack_roi_align_1ch == per-roi single-level roi_align oracle."""

    def test_matches_vmap_oracle(self):
        from e_osvos_tpu.ops.roi_align import stack_roi_align_1ch

        rs = np.random.RandomState(0)
        maps = jnp.asarray(rs.rand(3, 24, 30).round(), jnp.float32)
        boxes = jnp.array(
            [
                [2.0, 3.0, 20.0, 18.0],
                [-1.0, -1.0, 8.0, 9.0],     # clipped at the origin
                [10.0, 5.0, 40.0, 30.0],    # spills past the border
                [0.0, 0.0, 0.0, 0.0],       # degenerate
            ],
            jnp.float32,
        )
        obj = jnp.array([0, 2, 1, 0], jnp.int32)
        got = stack_roi_align_1ch(maps, boxes, obj, (7, 7))
        want = jax.vmap(
            lambda i, bb: roi_align(
                maps[i][..., None], bb[None], (7, 7)
            )[0, ..., 0]
        )(obj, boxes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_grad_flows_to_maps(self):
        from e_osvos_tpu.ops.roi_align import stack_roi_align_1ch

        maps = jnp.ones((2, 12, 12))
        boxes = jnp.array([[1.0, 1.0, 9.0, 9.0]], jnp.float32)
        obj = jnp.array([1], jnp.int32)

        def f(impl, mm):
            return jnp.sum(jnp.sin(impl(mm)))

        g1 = jax.grad(lambda mm: f(
            lambda m: stack_roi_align_1ch(m, boxes, obj, (3, 3)), mm))(maps)
        g2 = jax.grad(lambda mm: f(
            lambda m: jax.vmap(lambda i, bb: roi_align(
                m[i][..., None], bb[None], (3, 3))[0, ..., 0])(obj, boxes),
            mm))(maps)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5, rtol=1e-5)


def test_stack_roi_align_u8_matches_1ch():
    """Byte-packed GT-crop align == the differentiable lane version."""
    from e_osvos_tpu.ops.roi_align import stack_roi_align_1ch, stack_roi_align_u8

    rs = np.random.RandomState(1)
    maps = jnp.asarray(
        np.where(rs.rand(2, 20, 26) > 0.5, 255, rs.randint(0, 2, (2, 20, 26))),
        jnp.float32,
    )
    boxes = jnp.array(
        [[2.0, 2.0, 18.0, 15.0], [-2.0, -2.0, 30.0, 24.0],
         [5.0, 5.0, 5.0, 5.0]], jnp.float32
    )
    obj = jnp.array([0, 1, 0], jnp.int32)
    got = stack_roi_align_u8(maps, boxes, obj, (5, 5))
    want = stack_roi_align_1ch(maps, boxes, obj, (5, 5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)
