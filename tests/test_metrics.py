"""Metric golden tests vs hand-computed values (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.ops import metrics


def square_mask(h, w, y0, x0, size):
    m = np.zeros((h, w), np.float32)
    m[y0 : y0 + size, x0 : x0 + size] = 1
    return m


class TestJaccard:
    def test_identical(self):
        m = square_mask(32, 32, 4, 4, 10)
        assert float(metrics.jaccard(jnp.asarray(m), jnp.asarray(m))) == 1.0

    def test_disjoint(self):
        a = square_mask(32, 32, 0, 0, 8)
        b = square_mask(32, 32, 20, 20, 8)
        assert float(metrics.jaccard(jnp.asarray(a), jnp.asarray(b))) == 0.0

    def test_half_overlap_golden(self):
        # two 10x10 squares offset by 5 columns: inter=50, union=150 -> 1/3
        a = square_mask(32, 32, 0, 0, 10)
        b = square_mask(32, 32, 0, 5, 10)
        got = float(metrics.jaccard(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(50 / 150, rel=1e-6)

    def test_both_empty_is_one(self):
        z = np.zeros((16, 16), np.float32)
        assert float(metrics.jaccard(jnp.asarray(z), jnp.asarray(z))) == 1.0


class TestBoundaryF:
    def test_identical_masks(self):
        m = square_mask(64, 64, 10, 10, 20)
        f = float(metrics.boundary_f_measure(jnp.asarray(m), jnp.asarray(m)))
        assert f == pytest.approx(1.0)

    def test_small_shift_within_tolerance(self):
        # 1-pixel shift is well inside the dilation radius (~1 for 64x64 img)
        a = square_mask(64, 64, 10, 10, 20)
        b = square_mask(64, 64, 10, 11, 20)
        f = float(metrics.boundary_f_measure(jnp.asarray(a), jnp.asarray(b)))
        assert f == pytest.approx(1.0)

    def test_far_apart_is_zero(self):
        a = square_mask(128, 128, 0, 0, 10)
        b = square_mask(128, 128, 100, 100, 10)
        f = float(metrics.boundary_f_measure(jnp.asarray(a), jnp.asarray(b)))
        assert f == 0.0

    def test_both_empty_is_one(self):
        z = np.zeros((32, 32), np.float32)
        assert float(metrics.boundary_f_measure(jnp.asarray(z), jnp.asarray(z))) == 1.0

    def test_pred_empty_gt_nonempty_zero(self):
        z = np.zeros((32, 32), np.float32)
        m = square_mask(32, 32, 4, 4, 10)
        assert float(metrics.boundary_f_measure(jnp.asarray(z), jnp.asarray(m))) == 0.0


class TestStatistics:
    def test_constant_sequence(self):
        s = metrics.db_statistics(np.full(20, 0.8))
        assert s["mean"] == pytest.approx(0.8)
        assert s["recall"] == 1.0
        assert s["decay"] == pytest.approx(0.0)

    def test_decaying_sequence(self):
        s = metrics.db_statistics(np.linspace(1.0, 0.0, 20))
        assert s["decay"] > 0.5

    def test_recall_counts_above_half(self):
        s = metrics.db_statistics(np.array([0.9, 0.9, 0.1, 0.1]))
        assert s["recall"] == pytest.approx(0.5)


class TestEvaluateSequence:
    def test_perfect_tracking(self):
        frames = np.stack([square_mask(32, 32, i, i, 10) for i in range(5)])
        out = metrics.evaluate_sequence(frames, frames)
        assert out["J"]["mean"] == pytest.approx(1.0)
        assert out["F"]["mean"] == pytest.approx(1.0)

    def test_excludes_first_last(self):
        gt = np.stack([square_mask(32, 32, 2, 2, 10)] * 4)
        pred = gt.copy()
        # corrupt only first and last frames -> stats unaffected
        pred[0] = 0
        pred[-1] = 0
        out = metrics.evaluate_sequence(pred, gt)
        assert out["J"]["mean"] == pytest.approx(1.0)
        # but per-frame values record the corruption
        assert out["J_per_frame"][0] == 0.0
