"""CLI plumbing tests: architecture dispatch + config-to-model wiring."""

import jax.numpy as jnp
import pytest

from e_osvos_tpu import config as cfglib
from e_osvos_tpu.cli.common import build_parent_model
from e_osvos_tpu.models import DeepLabV3Plus, MaskRCNN


class TestBuildParentModel:
    def test_deeplab_default(self):
        cfg = cfglib.load_config()
        m = build_parent_model(cfg)
        assert isinstance(m, DeepLabV3Plus)
        assert m.arch == "resnet50"
        assert m.dtype == jnp.bfloat16

    def test_mask_rcnn_knobs(self):
        cfg = cfglib.load_config(
            overrides={
                "parent_model.architecture": "MaskRCNN",
                "parent_model.box_nms_thresh": 0.6,
                "parent_model.maskrcnn_loss": "BCE",
                "parent_model.detections_per_img": 1,
            }
        )
        m = build_parent_model(cfg)
        assert isinstance(m, MaskRCNN)
        assert m.roi.nms_thresh == 0.6
        assert m.roi.mask_loss == "bce"
        assert m.roi.detections_per_img == 1

    def test_evaluator_dispatch(self):
        from e_osvos_tpu.cli.evaluate import build_evaluator
        from e_osvos_tpu.engine.one_shot import OneShotEvaluator

        cfg = cfglib.load_config(["e-OSVOS-OnA"])
        m = build_parent_model(cfg)
        ev = build_evaluator(cfg, m)
        assert isinstance(ev, OneShotEvaluator)
        assert ev.cfg.online_adapt_step == 5


@pytest.mark.slow
class TestCliEndToEnd:
    def test_evaluate_cli_on_synthetic(self, tmp_path):
        """The full eval CLI path (config → model → evaluator → jsonl/PNG/
        debug exports) on the in-memory fixture with a tiny model."""
        import json

        from e_osvos_tpu.cli import evaluate as eval_cli

        argv = [
            "with", "Synthetic",
            "parent_model.architecture=DeepLabV3",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.decoder_norm_layer=group4",
            "parent_model.dtype=float32",
            "num_epochs.eval=2",
            f"save_dir={tmp_path}",
            f"save_preds={tmp_path}/preds",
            f"save_debug={tmp_path}/debug",
        ]
        eval_cli.main(argv)
        lines = [json.loads(l) for l in
                 (tmp_path / "eval_metrics.jsonl").read_text().splitlines()]
        events = {l["event"] for l in lines}
        assert "eval_seq" in events and "eval_total" in events
        seqs = [l for l in lines if l["event"] == "eval_seq"]
        assert all("time_per_frame" in l and "J_mean" in l for l in seqs)
        # PNG + debug exports exist
        assert (tmp_path / "preds" / "seq00" / "00000.png").exists()
        assert (tmp_path / "debug" / "seq00" / "00001.png").exists()

    def test_train_meta_cli_on_synthetic(self, tmp_path):
        """The full meta-training CLI path (config → taskset → SPMD trainer
        → checkpoint + metrics) on the in-memory fixture."""
        import json

        from e_osvos_tpu.cli import train_meta as tm_cli

        argv = [
            "with", "Synthetic",
            "parent_model.architecture=DeepLabV3",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.decoder_norm_layer=group4",
            "parent_model.dtype=float32",
            "meta_batch_size=8",
            "num_meta_iters=1",
            "num_epochs.train=2",
            "bptt_epochs=2",
            "data_cfg.batch_sizes.train=2",
            "vis_interval=1",
            f"save_dir={tmp_path}",
        ]
        tm_cli.main(argv)
        lines = [json.loads(l) for l in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        train = [l for l in lines if l["event"] == "meta_train"]
        assert train and "meta_loss" in train[0] and "lr_mean" in train[0]
        assert (tmp_path / "last_meta_iter.ckpt").exists()
