"""End-to-end checkpoint-import forward parity vs reference-shaped torch
models (VERDICT r1 #2b, extended from the resnet trunk to every model family).

Each test: build the torch twin (state-dict keys identical to what the
reference saves — see tests/torch_twins.py), randomize, import via the
name-mapped loader, and require the flax forward to match the torch forward
numerically. This proves a reference user's parent `.pth` checkpoints
reproduce under the TPU framework (migration contract, MIGRATING.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch_twins as twins
from e_osvos_tpu.models.torch_import import (
    deeplab_name_map,
    detect_torch_architecture,
    load_mapped_from_torch,
    maskrcnn_name_map,
)

RTOL = 5e-4
ATOL = 5e-4


def _n_tensors(sd):
    return sum(1 for k in sd if not k.endswith("num_batches_tracked"))


class TestNameMaps:
    def test_deeplab_v3plus_keys(self):
        assert deeplab_name_map("backbone.conv1.weight") == (
            "backbone/stem_conv/kernel")
        assert deeplab_name_map("classifier.0.convs.0.0.weight") == (
            "aspp/b0_conv/kernel")
        assert deeplab_name_map("classifier.0.convs.2.1.bias") == (
            "aspp/b2_norm/bias")
        assert deeplab_name_map("classifier.0.convs.4.1.weight") == (
            "aspp/pool_conv/kernel")
        assert deeplab_name_map("classifier.0.project.0.weight") == (
            "aspp/proj_conv/kernel")
        assert deeplab_name_map("decoder.conv1.weight") == "low_conv/kernel"
        assert deeplab_name_map("decoder.last_conv.4.weight") == (
            "dec_conv2/kernel")
        assert deeplab_name_map("decoder.last_conv.8.bias") == (
            "classifier/bias")
        assert deeplab_name_map("aux_classifier.0.weight") is None

    def test_deeplab_v3_keys(self):
        assert deeplab_name_map("classifier.1.weight", "v3") == (
            "head_conv/kernel")
        assert deeplab_name_map("classifier.2.running_mean", "v3") == (
            "head_norm/mean")
        assert deeplab_name_map("classifier.4.weight", "v3") == (
            "classifier/kernel")

    def test_maskrcnn_keys(self):
        assert maskrcnn_name_map("backbone.body.layer2.0.conv3.weight") == (
            "backbone/layer2_block0/conv3/kernel")
        assert maskrcnn_name_map("backbone.fpn.inner_blocks.0.weight") == (
            "fpn/lateral2/kernel")
        assert maskrcnn_name_map("backbone.fpn.layer_blocks.3.bias") == (
            "fpn/output5/bias")
        # newer torchvision nests a Conv2dNormActivation: inner_blocks.0.0
        assert maskrcnn_name_map("backbone.fpn.inner_blocks.1.0.weight") == (
            "fpn/lateral3/kernel")
        assert maskrcnn_name_map("rpn.head.conv.weight") == (
            "rpn_head/conv/kernel")
        assert maskrcnn_name_map("roi_heads.box_head.fc6.weight") == (
            "box_head/fc6/kernel")
        assert maskrcnn_name_map("roi_heads.box_predictor.bbox_pred.bias") == (
            "box_head/bbox_pred/bias")
        assert maskrcnn_name_map("roi_heads.mask_head.mask_fcn3.weight") == (
            "mask_head/mask_fcn3/kernel")
        assert maskrcnn_name_map(
            "roi_heads.mask_predictor.conv5_mask.weight") == (
            "mask_head/deconv/kernel")

    def test_architecture_detection(self):
        assert detect_torch_architecture(
            {"roi_heads.box_head.fc6.weight": 0}) == "maskrcnn"
        assert detect_torch_architecture(
            {"decoder.last_conv.0.weight": 0}) == "deeplab_v3plus"
        assert detect_torch_architecture(
            {"classifier.0.convs.0.0.weight": 0}) == "deeplab_v3"
        assert detect_torch_architecture(
            {"conv1.weight": 0, "layer1.0.conv1.weight": 0}) == "resnet"


class TestDeepLabForwardParity:
    @pytest.mark.parametrize("output_stride", [8, 16])
    def test_v3plus_full_forward(self, output_stride):
        from e_osvos_tpu.models import DeepLabV3Plus

        tm = twins.DeepLabV3Plus(num_classes=1, output_stride=output_stride)
        tm.eval()
        twins.randomize(tm, seed=3)
        sd = tm.state_dict()

        model = DeepLabV3Plus(
            num_classes=1, arch="resnet10", backbone_norm="group4_xla",
            head_norm="group4_xla", output_stride=output_stride,
        )
        x = np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        new_vars, copied = load_mapped_from_torch(variables, sd)
        assert copied == _n_tensors(sd), "every twin tensor must land"

        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_out = model.apply(new_vars, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(j_out)[..., 0],
            t_out.numpy()[:, 0],
            rtol=RTOL, atol=ATOL,
        )

    def test_v3_full_forward(self):
        from e_osvos_tpu.models import DeepLabV3

        tm = twins.DeepLabV3(num_classes=1, output_stride=8)
        tm.eval()
        twins.randomize(tm, seed=5)
        sd = tm.state_dict()

        model = DeepLabV3(
            num_classes=1, arch="resnet10", backbone_norm="group4_xla",
            head_norm="group4_xla", output_stride=8,
        )
        x = np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        new_vars, copied = load_mapped_from_torch(variables, sd)
        assert copied == _n_tensors(sd)

        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_out = model.apply(new_vars, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(j_out)[..., 0], t_out.numpy()[:, 0],
            rtol=RTOL, atol=ATOL,
        )

    def test_v3plus_batchnorm_folds_into_frozen_bn(self):
        """A BN-normed reference checkpoint (the parent default,
        cfgs/meta.yaml batch_norm) imports into our frozen_bn template by
        folding running stats into scale/bias."""
        from e_osvos_tpu.models import DeepLabV3Plus

        bn = lambda c: torch.nn.BatchNorm2d(c)
        tm = twins.DeepLabV3Plus(num_classes=1, output_stride=16, norm=bn)
        tm.eval()
        twins.randomize(tm, seed=7)
        sd = tm.state_dict()

        model = DeepLabV3Plus(
            num_classes=1, arch="resnet10", backbone_norm="frozen_bn",
            head_norm="frozen_bn", output_stride=16,
        )
        x = np.random.RandomState(8).rand(1, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        new_vars, copied = load_mapped_from_torch(variables, sd)
        # mean/var fold instead of landing, so copied counts scale+bias
        # pairs plus convs — every *conv* tensor and every norm pair lands
        assert copied == _n_tensors(sd) - 2 * sum(
            1 for k in sd if k.endswith("running_mean"))

        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_out = model.apply(new_vars, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(j_out)[..., 0], t_out.numpy()[:, 0],
            rtol=1e-3, atol=1e-3,
        )


class TestMaskRCNNForwardParity:
    @pytest.fixture(scope="class")
    def imported(self):
        from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig

        tm = twins.MaskRCNN(num_classes=2)
        tm.eval()
        twins.randomize(tm, seed=11)
        sd = tm.state_dict()

        model = MaskRCNN(
            arch="resnet10", backbone_norm="group4_xla",
            rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                          pre_nms_top_n=64, post_nms_top_n=32,
                          batch_size_per_image=32),
            roi=RoIConfig(batch_size_per_image=16, detections_per_img=2),
        )
        imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            imgs,
        )
        new_vars, copied = load_mapped_from_torch(variables, sd)
        assert copied == _n_tensors(sd), "every twin tensor must land"
        return tm, model, new_vars

    def test_pyramid_parity(self, imported):
        """backbone.body + backbone.fpn: full P2..P6 pyramid matches."""
        tm, model, new_vars = imported
        x = np.random.RandomState(12).rand(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t_ps = tm.pyramid(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_ps = model.apply(new_vars, jnp.asarray(x),
                           method=lambda m, v: m._features(v))
        assert len(t_ps) == len(j_ps) == 5
        for lvl, (tp, jp) in enumerate(zip(t_ps, j_ps)):
            np.testing.assert_allclose(
                np.asarray(jp), tp.numpy().transpose(0, 2, 3, 1),
                rtol=RTOL, atol=ATOL, err_msg=f"P{lvl + 2}",
            )

    def test_rpn_head_parity(self, imported):
        tm, model, new_vars = imported
        f = np.random.RandomState(13).rand(1, 16, 16, 256).astype(np.float32)
        with torch.no_grad():
            t_cls, t_reg = tm.rpn["head"](
                torch.from_numpy(f.transpose(0, 3, 1, 2)))
        j_logits, j_deltas = model.apply(
            new_vars, [jnp.asarray(f)],
            method=lambda m, feats: m.rpn_head(feats))
        # ours flattens NHWC·A; torch lays out [B, A, H, W]
        j_cls = np.asarray(j_logits[0]).reshape(1, 16, 16, 3)
        np.testing.assert_allclose(
            j_cls, t_cls.numpy().transpose(0, 2, 3, 1),
            rtol=RTOL, atol=ATOL)
        j_reg = np.asarray(j_deltas[0]).reshape(1, 16, 16, 3, 4)
        t_reg = t_reg.numpy().reshape(1, 3, 4, 16, 16).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(j_reg, t_reg, rtol=RTOL, atol=ATOL)

    def test_box_head_parity(self, imported):
        """Pooled-ROI features through fc6/fc7/predictors: catches the
        CHW-vs-HWC flatten-order trap in the fc6 import."""
        tm, model, new_vars = imported
        pooled = np.random.RandomState(14).rand(5, 7, 7, 256).astype(
            np.float32)
        with torch.no_grad():
            t_cls, t_reg = tm.box_forward(
                torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        j_cls, j_reg = model.apply(
            new_vars, jnp.asarray(pooled),
            method=lambda m, p: m.box_head(p))
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(j_reg), t_reg.numpy().reshape(5, 2, 4),
            rtol=RTOL, atol=ATOL)

    def test_mask_head_parity(self, imported):
        """mask_fcn1..4 + ConvTranspose deconv + logits: catches the
        transposed-conv kernel-layout/flip convention."""
        tm, model, new_vars = imported
        x = np.random.RandomState(15).rand(4, 14, 14, 256).astype(np.float32)
        with torch.no_grad():
            t_logits = tm.mask_forward(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_logits = model.apply(new_vars, jnp.asarray(x),
                               method=lambda m, v: m.mask_head(v))
        assert j_logits.shape == (4, 28, 28, 2)
        np.testing.assert_allclose(
            np.asarray(j_logits), t_logits.numpy().transpose(0, 2, 3, 1),
            rtol=RTOL, atol=ATOL)


class TestFullWidthImportParity:
    """Real-width import parity (VERDICT r4 missing #5): the miniature-twin
    suite above proves the name map; these prove a REAL resnet50-width
    reference checkpoint round-trips at the real key vocabulary and real
    shapes. The env ships no pretrained weights (/root/reference/models/ is
    empty), so the state dict is synthesized at full width from the same
    reference-shaped twins (torchvision resnet50: stem 64, widths
    64/128/256/512, blocks 3/4/6/3 — mask_rcnn.py:431,
    deeplabv3plus.py:113-133)."""

    @staticmethod
    def _tame(tm):
        """Shrink norm scales so activations stay O(1) at 50-layer depth.

        ``randomize`` keeps per-layer magnitude O(1), but residual adds
        still grow variance ~2x/block; at 16 bottlenecks the logits reach
        O(1e3) and the final 256-channel reduction is cancellation-
        dominated, which turns benign fp reassociation into O(10) absolute
        noise. Import bugs (misrouted tensors) produce O(1) *relative-RMS*
        error either way, so the assertions below stay decisive."""
        with torch.no_grad():
            for n, p in tm.named_parameters():
                if p.ndim == 1 and n.endswith("weight"):
                    p.mul_(0.4)

    @pytest.mark.slow
    def test_v3plus_resnet50_bn_to_frozen_bn_480p(self):
        """The migration path a reference user actually takes: a BN-normed
        resnet50 parent checkpoint (cfgs/meta.yaml batch_norm default)
        imported into the flagship frozen-BN template, checked at the DAVIS
        480p eval geometry — tight in fp32, then through the bf16 flagship
        compute path within bf16 tolerance."""
        from e_osvos_tpu.models import DeepLabV3Plus

        bn = lambda c: torch.nn.BatchNorm2d(c)
        tm = twins.DeepLabV3Plus(num_classes=1, output_stride=16, norm=bn,
                                 arch="resnet50")
        tm.eval()
        twins.randomize(tm, seed=31)
        self._tame(tm)
        sd = tm.state_dict()
        assert sd["backbone.layer3.5.conv1.weight"].shape == (256, 1024, 1, 1)
        assert sd["classifier.0.convs.0.0.weight"].shape == (256, 2048, 1, 1)

        x = np.random.RandomState(32).rand(1, 480, 864, 3).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        t0 = t_out[:, 0]
        rms = float(np.sqrt(np.mean(t0 ** 2)))

        for dtype, rel_rms_tol in ((jnp.float32, 1e-3), (jnp.bfloat16, 0.05)):
            model = DeepLabV3Plus(
                num_classes=1, arch="resnet50", backbone_norm="frozen_bn",
                head_norm="frozen_bn", output_stride=16, dtype=dtype,
            )
            variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
            new_vars, copied = load_mapped_from_torch(variables, sd)
            # BN running stats fold into scale/bias instead of landing
            assert copied == _n_tensors(sd) - 2 * sum(
                1 for k in sd if k.endswith("running_mean"))
            j_out = np.asarray(model.apply(new_vars, jnp.asarray(x)),
                               np.float32)[..., 0]
            rel = float(np.sqrt(np.mean((j_out - t0) ** 2))) / rms
            assert rel < rel_rms_tol, (dtype, rel)
            # rounding must not perturb the decision boundary: sign
            # agreement on all confident logits
            confident = np.abs(t0) > 0.1 * rms
            agree = np.mean(np.sign(j_out[confident]) == np.sign(t0[confident]))
            assert agree > 0.999, (dtype, agree)

    @pytest.mark.slow
    def test_maskrcnn_resnet50_pyramid_and_heads(self):
        """Full-width detector import: resnet50 body + FPN at COCO-checkpoint
        shapes (fpn lateral 256/512/1024/2048 -> 256), pyramid and both roi
        heads match torch (mask_rcnn.py:467-475 shape-matched load)."""
        from e_osvos_tpu.models import MaskRCNN, RoIConfig, RPNConfig

        tm = twins.MaskRCNN(num_classes=2, arch="resnet50")
        tm.eval()
        twins.randomize(tm, seed=33)
        self._tame(tm)
        sd = tm.state_dict()
        assert sd["backbone.fpn.inner_blocks.3.weight"].shape == (
            256, 2048, 1, 1)

        model = MaskRCNN(
            arch="resnet50", backbone_norm="group4_xla",
            rpn=RPNConfig(anchor_sizes=(8, 16, 32, 64, 128),
                          pre_nms_top_n=64, post_nms_top_n=32,
                          batch_size_per_image=32),
            roi=RoIConfig(batch_size_per_image=16, detections_per_img=2),
        )
        imgs = jnp.zeros((1, 256, 448, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            imgs,
        )
        new_vars, copied = load_mapped_from_torch(variables, sd)
        assert copied == _n_tensors(sd), "every resnet50-width tensor lands"

        x = np.random.RandomState(34).rand(1, 256, 448, 3).astype(np.float32)
        with torch.no_grad():
            t_ps = tm.pyramid(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_ps = model.apply(new_vars, jnp.asarray(x),
                           method=lambda m, v: m._features(v))
        assert len(t_ps) == len(j_ps) == 5
        for lvl, (tp, jp) in enumerate(zip(t_ps, j_ps)):
            np.testing.assert_allclose(
                np.asarray(jp), tp.numpy().transpose(0, 2, 3, 1),
                rtol=2e-3, atol=2e-3, err_msg=f"P{lvl + 2}",
            )
        pooled = np.random.RandomState(35).rand(5, 7, 7, 256).astype(
            np.float32)
        with torch.no_grad():
            t_cls, t_reg = tm.box_forward(
                torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        j_cls, j_reg = model.apply(new_vars, jnp.asarray(pooled),
                                   method=lambda m, p: m.box_head(p))
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(j_reg), t_reg.numpy().reshape(5, 2, 4),
            rtol=RTOL, atol=ATOL)
        mx = np.random.RandomState(36).rand(4, 14, 14, 256).astype(np.float32)
        with torch.no_grad():
            t_logits = tm.mask_forward(
                torch.from_numpy(mx.transpose(0, 3, 1, 2)))
        j_logits = model.apply(new_vars, jnp.asarray(mx),
                               method=lambda m, v: m.mask_head(v))
        np.testing.assert_allclose(
            np.asarray(j_logits), t_logits.numpy().transpose(0, 2, 3, 1),
            rtol=RTOL, atol=ATOL)


class TestMetaCheckpointImport:
    """Reference `.model` meta checkpoints (train_meta.py:278-286): learned
    init + per-neuron log lrs under mangled names import into MetaParams."""

    def test_reference_meta_checkpoint_roundtrip(self, tmp_path):
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
        from e_osvos_tpu.models import DeepLabV3Plus
        from e_osvos_tpu.models.torch_import import (
            import_meta_checkpoint_from_torch,
            load_torch_file,
        )

        tm = twins.DeepLabV3Plus(num_classes=1, output_stride=16)
        tm.eval()
        twins.randomize(tm, seed=21)

        # reference-format state dict: model_init_* + log_init_lr_* with
        # '.'→'-' mangling (meta_optim.py:46-78); lr values are distinct
        # per tensor AND per neuron so any misrouting breaks equality
        sd = {}
        expected_lrs = {}
        for i, (name, p) in enumerate(tm.named_parameters()):
            mangled = name.replace(".", "-")
            sd[f"model_init_{mangled}"] = p.detach().clone()
            lr_shape = (p.shape[0],) + (1,) * (p.ndim - 1)
            lr = (torch.arange(p.shape[0], dtype=torch.float32) * 1e-3
                  + float(i)).reshape(lr_shape)
            sd[f"log_init_lr_{mangled}"] = lr
            expected_lrs[name] = lr.numpy().reshape(-1)
        ckpt = {"meta_optim_state_dict": sd, "vis_win_names": {"w": "x"},
                "meta_iter": 7, "meta_epoch": 2}
        path = tmp_path / "best_val_meta_iter.model"
        torch.save(ckpt, str(path))

        model = DeepLabV3Plus(
            num_classes=1, arch="resnet10", backbone_norm="group4_xla",
            head_norm="group4_xla", output_stride=16,
        )
        x = np.random.RandomState(22).rand(1, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        mp = init_meta_params(
            MetaOptimConfig(lr_hierarchy_level="neuron",
                            learn_model_init=True, use_log_init_lr=True),
            variables,
        )
        mp2, init_copied, lr_copied = import_meta_checkpoint_from_torch(
            mp, load_torch_file(str(path))
        )
        n_params = len(list(tm.named_parameters()))
        assert init_copied == n_params
        assert lr_copied == n_params

        # (a) learned-init forward parity
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        j_out = model.apply(mp2.model_init, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(j_out)[..., 0], t_out.numpy()[:, 0],
            rtol=RTOL, atol=ATOL,
        )

        # (b) every lr tensor landed on the right leaf in neuron order
        from e_osvos_tpu.models.torch_import import (
            _flatten,
            _strip_collection,
            deeplab_name_map,
        )

        flat_lr = {_strip_collection(k): v
                   for k, v in _flatten(mp2.log_init_lr).items()}
        for name, want in expected_lrs.items():
            mapped = deeplab_name_map(name)
            assert mapped in flat_lr, (name, mapped)
            got = np.asarray(flat_lr[mapped]).reshape(-1)
            np.testing.assert_allclose(got, want, err_msg=name)

    def test_single_granularity_rejected(self):
        from e_osvos_tpu.meta_optim import MetaOptimConfig, init_meta_params
        from e_osvos_tpu.models.torch_import import (
            import_meta_checkpoint_from_torch,
        )

        mp = init_meta_params(
            MetaOptimConfig(), {"params": {"w": jnp.zeros((3, 3))}}
        )
        with pytest.raises(ValueError, match="SINGLE/TENSOR"):
            import_meta_checkpoint_from_torch(
                mp, {"meta_optim_state_dict":
                     {"log_init_lr": torch.zeros(1, 1)}}
            )
