"""Loss unit tests: hand-computed golden values + cross-checks against an
independent torch-CPU re-derivation of the reference formulas (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from e_osvos_tpu.ops import losses


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _rand_mask(shape, seed=1, p=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < p).astype(np.float32)


class TestDice:
    def test_perfect_prediction_near_zero(self):
        labels = _rand_mask((2, 8, 8))
        logits = np.where(labels > 0, 40.0, -40.0).astype(np.float32)
        loss = losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels))
        assert float(loss) < 1e-3

    def test_matches_torch_formula(self):
        logits = _rand((2, 16, 16))
        labels = _rand_mask((2, 16, 16))
        got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
        p = torch.sigmoid(torch.from_numpy(logits)).reshape(-1)
        l = torch.from_numpy(labels).reshape(-1)
        want = float(1 - (2 * (p * l).sum() + 1) / (p.sum() + l.sum() + 1))
        assert got == pytest.approx(want, rel=1e-5)

    def test_per_sample_mode(self):
        logits = _rand((3, 8, 8))
        labels = _rand_mask((3, 8, 8))
        per = losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels), batch_average=False)
        assert per.shape == (3,)


class TestClassBalancedCE:
    def test_matches_torch_formula(self):
        logits = _rand((2, 12, 12), seed=3)
        labels = _rand_mask((2, 12, 12), seed=4)
        got = float(
            losses.class_balanced_cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        )
        out = torch.from_numpy(logits)
        lab = torch.from_numpy(labels)
        labs = (lab >= 0.5).float()
        n_pos, n_neg = labs.sum(), (1 - labs).sum()
        n_tot = n_pos + n_neg
        gt0 = (out >= 0).float()
        loss_val = out * (labs - gt0) - torch.log(1 + torch.exp(out - 2 * out * gt0))
        loss_pos = (-labs * loss_val).sum()
        loss_neg = (-(1 - labs) * loss_val).sum()
        want = (n_neg / n_tot * loss_pos + n_pos / n_tot * loss_neg) / lab.shape[0]
        want = float(want / np.prod(labels.shape[1:]))
        assert got == pytest.approx(want, rel=1e-4)

    def test_all_background(self):
        logits = _rand((1, 8, 8))
        labels = np.zeros((1, 8, 8), np.float32)
        loss = losses.class_balanced_cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        # n_pos = 0 so both weighted terms vanish
        assert float(loss) == pytest.approx(0.0, abs=1e-6)


def _torch_lovasz_hinge_flat(logits, labels):
    """Independent torch re-derivation of Berman's Alg.1 for cross-checking."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors_sorted, perm = torch.sort(errors, dim=0, descending=True)
    gt_sorted = labels[perm]
    gts = gt_sorted.sum()
    intersection = gts - gt_sorted.cumsum(0)
    union = gts + (1 - gt_sorted).cumsum(0)
    jaccard = 1.0 - intersection / union
    if len(gt_sorted) > 1:
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
    return torch.dot(F.relu(errors_sorted), jaccard)


class TestLovaszHinge:
    def test_matches_torch(self):
        logits = _rand((64,), seed=7)
        labels = _rand_mask((64,), seed=8)
        got = float(losses.lovasz_hinge_flat(jnp.asarray(logits), jnp.asarray(labels)))
        want = float(
            _torch_lovasz_hinge_flat(torch.from_numpy(logits), torch.from_numpy(labels))
        )
        assert got == pytest.approx(want, rel=1e-4, abs=1e-5)

    def test_ignore_mask_equals_filtering(self):
        logits = _rand((100,), seed=9)
        labels = _rand_mask((100,), seed=10)
        valid = _rand_mask((100,), seed=11, p=0.8)
        got = float(
            losses.lovasz_hinge_flat(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)
            )
        )
        keep = valid > 0
        want = float(
            _torch_lovasz_hinge_flat(
                torch.from_numpy(logits[keep]), torch.from_numpy(labels[keep])
            )
        )
        assert got == pytest.approx(want, rel=1e-4, abs=1e-5)

    def test_all_ignored_returns_zero(self):
        logits = jnp.asarray(_rand((16,)))
        labels = jnp.zeros((16,))
        valid = jnp.zeros((16,))
        assert float(losses.lovasz_hinge_flat(logits, labels, valid)) == 0.0

    def test_grad_finite(self):
        logits = jnp.asarray(_rand((2, 8, 8)))
        labels = jnp.asarray(_rand_mask((2, 8, 8)))
        g = jax.grad(lambda x: losses.lovasz_hinge(x, labels))(logits)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestLovaszSoftmax:
    def test_perfect_prediction_near_zero(self):
        labels = np.array([[0, 1, 2, 1, 0, 2, 2, 1]])
        probs = np.eye(3, dtype=np.float32)[labels]
        loss = losses.lovasz_softmax(
            jnp.asarray(probs).reshape(1, 1, 8, 3), jnp.asarray(labels).reshape(1, 1, 8)
        )
        assert float(loss) < 1e-5

    def test_absent_class_excluded(self):
        # only classes 0 and 1 present; class 2 absent must not contribute
        labels = np.array([[0, 1, 0, 1]])
        probs = np.full((1, 4, 3), 1 / 3, np.float32)
        loss = losses.lovasz_softmax(
            jnp.asarray(probs).reshape(1, 1, 4, 3), jnp.asarray(labels).reshape(1, 1, 4)
        )
        assert np.isfinite(float(loss))


class TestDispatcher:
    @pytest.mark.parametrize(
        "name",
        ["cross_entropy", "class_balanced_cross_entropy", "dice",
         "cross_entropy_and_dice", "lovasz_hinge"],
    )
    def test_dispatch(self, name):
        logits = jnp.asarray(_rand((2, 8, 8)))
        labels = jnp.asarray(_rand_mask((2, 8, 8)))
        v = float(losses.compute_loss(name, logits, labels))
        assert np.isfinite(v)
