"""Bit-packed mask transport (ops/bits.py): lossless round-trip at DAVIS
geometry (854 is not a multiple of 8) and arbitrary leading axes."""

import jax
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.ops.bits import pack_mask_bits, unpack_mask_bits


class TestPackBits:
    def test_round_trip_davis_width(self):
        rng = np.random.RandomState(0)
        mask = (rng.rand(3, 480, 854) > 0.5).astype(np.uint8)
        packed = np.asarray(pack_mask_bits(jnp.asarray(mask)))
        assert packed.shape == (3, 480, 107)  # ceil(854/8)
        assert packed.dtype == np.uint8
        out = unpack_mask_bits(packed, 854)
        np.testing.assert_array_equal(out, mask)

    def test_round_trip_exact_multiple(self):
        rng = np.random.RandomState(1)
        mask = (rng.rand(2, 16) > 0.3).astype(np.uint8)
        out = unpack_mask_bits(np.asarray(pack_mask_bits(mask)), 16)
        np.testing.assert_array_equal(out, mask)

    def test_wire_bytes_8x(self):
        mask = jnp.ones((67, 480, 854), jnp.uint8)
        packed = pack_mask_bits(mask)
        assert packed.size * 8 >= mask.size
        assert packed.size <= mask.size // 8 + 67 * 480  # pad slack only

    def test_jit_and_bool_input(self):
        mask = jnp.zeros((4, 12), bool).at[1, 3].set(True)
        packed = jax.jit(pack_mask_bits)(mask)
        out = unpack_mask_bits(np.asarray(packed), 12)
        np.testing.assert_array_equal(out, np.asarray(mask, np.uint8))
