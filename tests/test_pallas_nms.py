"""Pallas NMS kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.ops.nms import nms as nms_xla
from e_osvos_tpu.ops.pallas_nms import nms_pallas


def random_boxes(key, n):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, 2)) * 80
    wh = jax.random.uniform(k2, (n, 2)) * 40 + 2
    return jnp.concatenate([xy, xy + wh], axis=-1)


class TestPallasNMSMatchesOracle:
    @pytest.mark.parametrize("n,max_out", [(64, 16), (200, 32)])
    def test_random_agreement(self, n, max_out):
        key = jax.random.PRNGKey(n)
        boxes = random_boxes(key, n)
        scores = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        ref_idx, ref_keep = nms_xla(boxes, scores, 0.5, max_out)
        out_idx, out_keep = nms_pallas(boxes, scores, 0.5, max_out,
                                       interpret=True)
        np.testing.assert_array_equal(np.asarray(ref_keep), np.asarray(out_keep))
        np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(out_idx))

    def test_valid_mask(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]], jnp.float32
        )
        scores = jnp.array([0.5, 0.99, 0.8])
        valid = jnp.array([True, False, True])
        idx, keep = nms_pallas(boxes, scores, 0.5, 3, valid=valid,
                               interpret=True)
        kept = [int(i) for i, o in zip(np.asarray(idx), np.asarray(keep)) if o]
        assert kept == [2]  # 2 beats 0 and suppresses it; 1 masked out

    def test_padding_to_lane_multiple(self):
        # n=5 pads to 128 lanes; padded slots must never be selected
        boxes = random_boxes(jax.random.PRNGKey(0), 5)
        scores = jnp.array([0.9, 0.1, 0.8, 0.3, 0.5])
        idx, keep = nms_pallas(boxes, scores, 0.9, 5, interpret=True)
        assert (np.asarray(idx)[np.asarray(keep)] < 5).all()
