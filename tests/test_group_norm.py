"""Lane-friendly GroupNorm == flax.linen.GroupNorm (values and grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from e_osvos_tpu.ops.group_norm import FusedGroupNorm, group_norm


def _ref(x, scale, bias, groups):
    return nn.GroupNorm(num_groups=groups, dtype=x.dtype).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 10, 32), 4),
    ((1, 5, 7, 64), 32),
    ((3, 4, 4, 16), 16),
])
def test_matches_flax(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 3.0 + 1.0
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],))
    got = group_norm(x, scale, bias, groups)
    want = _ref(x, scale, bias, groups)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_matches_flax_bf16():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 32), jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    got = group_norm(x, scale, bias, 4).astype(jnp.float32)
    want = _ref(x, scale, bias, 4).astype(jnp.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_grads_match():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 5, 16))
    scale = jnp.full((16,), 1.3)
    bias = jnp.full((16,), -0.2)

    g_got = jax.grad(lambda x, s, b: jnp.sum(jnp.sin(group_norm(x, s, b, 4))),
                     argnums=(0, 1, 2))(x, scale, bias)
    g_want = jax.grad(lambda x, s, b: jnp.sum(jnp.sin(_ref(x, s, b, 4))),
                      argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_fused_relu():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 8))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))
    got = group_norm(x, scale, bias, 4, relu=True)
    want = jnp.maximum(_ref(x, scale, bias, 4), 0.0)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_module_param_compat():
    """FusedGroupNorm exposes nn.GroupNorm-compatible params (scale/bias)."""
    x = jnp.ones((1, 4, 4, 8))
    v = FusedGroupNorm(num_groups=4).init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"scale", "bias"}
    ref_v = nn.GroupNorm(num_groups=4).init(jax.random.PRNGKey(0), x)
    # same tree structure → checkpoints interoperate
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(ref_v)
    got = FusedGroupNorm(num_groups=4).apply(v, x)
    want = nn.GroupNorm(num_groups=4).apply(ref_v, x)
    np.testing.assert_allclose(got, want, atol=1e-5)


class TestPallasGroupNorm:
    """Pallas kernel (interpret mode on CPU) == flax GroupNorm."""

    def test_fwd(self):
        from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 10, 32)) * 2 + 1
        s = jax.random.normal(jax.random.PRNGKey(1), (32,)) + 1.0
        b = jax.random.normal(jax.random.PRNGKey(2), (32,))
        got = pallas_group_norm(x, s, b, 4, 1e-6, True)
        want = _ref(x, s, b, 4)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_bwd(self):
        from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 6, 16))
        s = jnp.full((16,), 1.3)
        b = jnp.full((16,), -0.2)
        f1 = lambda x, s, b: jnp.sum(
            jnp.sin(pallas_group_norm(x, s, b, 4, 1e-6, True)))
        f2 = lambda x, s, b: jnp.sum(jnp.sin(_ref(x, s, b, 4)))
        g1 = jax.grad(f1, argnums=(0, 1, 2))(x, s, b)
        g2 = jax.grad(f2, argnums=(0, 1, 2))(x, s, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(a, c, atol=1e-4, rtol=1e-4)

    def test_partial_tile_masking(self):
        """Spatial size not a multiple of the block: remainder rows masked."""
        from e_osvos_tpu.ops.pallas_group_norm import pallas_group_norm

        x = jax.random.normal(jax.random.PRNGKey(5), (1, 13, 11, 8))
        s = jnp.ones((8,))
        b = jnp.zeros((8,))
        got = pallas_group_norm(x, s, b, 2, 1e-6, True)
        want = _ref(x, s, b, 2)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
