"""Torch checkpoint importer tests: resnet name mapping + shape-matched copy
(the reference's COCO checkpoint surgery, mask_rcnn.py:467-475)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from e_osvos_tpu.models import ResNet
from e_osvos_tpu.models.torch_import import (
    conv_to_hwio,
    load_resnet_from_torch,
    resnet_name_map,
    shape_matched_load,
)


class TestNameMap:
    def test_stem_and_blocks(self):
        assert resnet_name_map("conv1.weight") == "stem_conv/kernel"
        assert resnet_name_map("bn1.weight") == "stem_norm/scale"
        assert resnet_name_map("layer1.0.conv2.weight") == (
            "layer1_block0/conv2/kernel"
        )
        assert resnet_name_map("layer3.5.bn3.bias") == "layer3_block5/norm3/bias"
        assert resnet_name_map("layer2.0.downsample.0.weight") == (
            "layer2_block0/down_conv/kernel"
        )
        assert resnet_name_map("backbone.body.layer4.2.conv1.weight") == (
            "layer4_block2/conv1/kernel"
        )
        assert resnet_name_map("fc.weight") is None


class TestResnetImport:
    def test_roundtrip_into_flax_tree(self):
        model = ResNet(arch="resnet10", norm_layer="group4")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        params = variables["params"]

        # synthetic torch state dict for the stem + first block conv
        stem = torch.randn(8, 3, 7, 7)
        b1c1_shape = np.asarray(
            params["layer1_block0"]["conv1"]["kernel"]
        ).shape  # HWIO
        b1c1 = torch.randn(
            b1c1_shape[3], b1c1_shape[2], b1c1_shape[0], b1c1_shape[1]
        )
        sd = {"conv1.weight": stem, "layer1.0.conv1.weight": b1c1}

        new_params, copied = load_resnet_from_torch(params, sd,
                                                    backbone_prefix="")
        assert copied == 2
        np.testing.assert_allclose(
            np.asarray(new_params["stem_conv"]["kernel"]),
            conv_to_hwio(stem.numpy()),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_params["layer1_block0"]["conv1"]["kernel"]),
            conv_to_hwio(b1c1.numpy()),
            rtol=1e-6,
        )

    def test_shape_mismatch_skipped(self):
        model = ResNet(arch="resnet10", norm_layer="group4")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
            "params"
        ]
        sd = {"conv1.weight": torch.randn(64, 3, 7, 7)}  # resnet50 stem ≠ 8ch
        _, copied = load_resnet_from_torch(params, sd, backbone_prefix="")
        assert copied == 0


class TestShapeMatchedFallback:
    def test_dense_transpose_and_order(self):
        params = {"head": {"fc": {"kernel": np.zeros((4, 8), np.float32),
                                  "bias": np.zeros((8,), np.float32)}}}
        sd = {"fc.weight": torch.arange(32, dtype=torch.float32).reshape(8, 4),
              "fc.bias": torch.ones(8)}
        out, copied = shape_matched_load(params, sd)
        assert copied == 2
        np.testing.assert_allclose(
            out["head"]["fc"]["kernel"],
            sd["fc.weight"].numpy().T,
        )
        np.testing.assert_allclose(out["head"]["fc"]["bias"], 1.0)
