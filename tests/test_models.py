"""Model forward-shape / gradient-flow tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e_osvos_tpu.models import ResNet, DeepLabV3, DeepLabV3Plus
from e_osvos_tpu.models.deeplab import build_model


@pytest.fixture(scope="module")
def small_input():
    return jnp.zeros((1, 64, 64, 3), jnp.float32)


class TestResNet:
    def test_output_stride_8_dilated(self, small_input):
        m = ResNet(dilate_stages=(False, True, True))
        params = m.init(jax.random.key(0), small_input)
        feats = m.apply(params, small_input)
        # os8: C3..C5 all stay at stride-8 resolution
        assert feats["C2"].shape[1:3] == (16, 16)
        assert feats["C3"].shape[1:3] == (8, 8)
        assert feats["C4"].shape[1:3] == (8, 8)
        assert feats["C5"].shape[1:3] == (8, 8)
        assert feats["C5"].shape[-1] == 2048

    def test_output_stride_32_for_fpn(self, small_input):
        m = ResNet()
        params = m.init(jax.random.key(0), small_input)
        feats = m.apply(params, small_input)
        assert feats["C2"].shape[1:3] == (16, 16)
        assert feats["C3"].shape[1:3] == (8, 8)
        assert feats["C4"].shape[1:3] == (4, 4)
        assert feats["C5"].shape[1:3] == (2, 2)

    def test_frozen_bn_has_no_trainable_norm_params(self, small_input):
        m = ResNet(norm_layer="frozen_bn")
        variables = m.init(jax.random.key(0), small_input)
        assert "constants" in variables
        # params collection only holds conv kernels
        leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
        for path, _ in leaves:
            assert "conv" in jax.tree_util.keystr(path).lower()


class TestDeepLab:
    @pytest.mark.parametrize("cls", [DeepLabV3, DeepLabV3Plus])
    def test_logits_at_input_resolution(self, cls, small_input):
        m = cls(num_classes=1)
        params = m.init(jax.random.key(0), small_input)
        out = m.apply(params, small_input)
        assert out.shape == (1, 64, 64, 1)
        assert out.dtype == jnp.float32

    def test_bfloat16_compute_fp32_logits(self, small_input):
        m = DeepLabV3Plus(num_classes=1, dtype=jnp.bfloat16)
        params = m.init(jax.random.key(0), small_input)
        out = m.apply(params, small_input)
        assert out.dtype == jnp.float32

    def test_gradients_flow_to_all_params(self):
        # random input + off-target loss: with a zero input every activation
        # is zero and d(mean(out²)) vanishes identically, so this must use
        # non-degenerate data
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        m = DeepLabV3Plus(
            num_classes=1, arch="resnet10", backbone_norm="group4", head_norm="group4"
        )
        variables = m.init(jax.random.key(0), x)

        def loss_fn(params):
            out = m.apply({"params": params}, x)
            return jnp.mean((out - 1.0) ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        # every leaf receives some gradient
        assert sum(n > 0 for n in norms) > len(norms) * 0.9

    def test_factory(self):
        m = build_model("DeepLabV3Plus", num_classes=2)
        assert isinstance(m, DeepLabV3Plus)
        with pytest.raises(ValueError):
            build_model("NoSuchNet")
