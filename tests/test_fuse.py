"""Conv/frozen-norm fusion + bilinear deconv init tests (reference's
merge_batch_norms_with_convs and interp_surgery, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.models import ResNet
from e_osvos_tpu.models.fuse import bilinear_upsample_kernel, fuse_frozen_norms


class TestBilinearKernel:
    def test_even_kernel_constant_field(self):
        """Upsampling a constant field with the bilinear kernel must stay
        constant (stride-2 deconv, the interp_surgery use case)."""
        k = bilinear_upsample_kernel(4, 1, 1)
        x = jnp.full((1, 5, 5, 1), 3.0)
        y = jax.lax.conv_transpose(
            x, jnp.asarray(k), strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        inner = np.asarray(y)[0, 2:-2, 2:-2, 0]
        np.testing.assert_allclose(inner, 3.0, rtol=1e-6)

    def test_channelwise_identity(self):
        k = bilinear_upsample_kernel(4, 3, 3)
        assert k.shape == (4, 4, 3, 3)
        assert (k[:, :, 0, 1] == 0).all()
        assert (k[:, :, 1, 1] > 0).any()


class TestFuseFrozenNorms:
    def test_fused_forward_matches(self):
        """Folding frozen-BN scale/bias into convs must leave the network
        function unchanged."""
        model = ResNet(arch="resnet10", norm_layer="frozen_bn")
        x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
        variables = model.init(jax.random.key(1), x)
        params, constants = variables["params"], variables["constants"]

        # randomize the frozen stats so fusion is non-trivial
        constants = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jax.random.normal(jax.random.key(2), a.shape),
            constants,
        )
        ref = model.apply({"params": params, "constants": constants}, x)

        fused_p, fused_c = fuse_frozen_norms(
            jax.device_get(params), jax.device_get(constants)
        )
        out = model.apply({"params": fused_p, "constants": fused_c}, x)
        np.testing.assert_allclose(
            np.asarray(out["C5"]), np.asarray(ref["C5"]), rtol=2e-4, atol=2e-4
        )
        # the folded norms' multiplicative parts are identity now
        flat = jax.tree_util.tree_leaves_with_path(fused_c)
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            if "scale" in name:
                np.testing.assert_allclose(leaf, 1.0)
        # the conv kernels absorbed the scales (changed vs original)
        k0 = np.asarray(params["stem_conv"]["kernel"])
        k1 = np.asarray(fused_p["stem_conv"]["kernel"])
        assert not np.allclose(k0, k1)
