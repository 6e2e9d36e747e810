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


class TestParentStateSelector:
    """Leave-one-out parent selection (reference helper_func.py:483-496)."""

    def test_select_by_val_split(self, tmp_path):
        from e_osvos_tpu.cli.common import (
            ParentStateSelector,
            build_parent_state_selector,
        )
        from e_osvos_tpu.utils import save_checkpoint

        tmpl = {"w": jnp.zeros((2,))}
        a = {"w": jnp.ones((2,))}
        b = {"w": jnp.full((2,), 2.0)}
        save_checkpoint(str(tmp_path / "a.ckpt"), a)
        save_checkpoint(str(tmp_path / "b.ckpt"), b)
        (tmp_path / "split_a.txt").write_text("blackswan\ncamel\n")
        (tmp_path / "split_b.txt").write_text("dog\ndrift-chicane\n")

        cfg = cfglib.load_config(overrides={
            "parent_model.val.paths": [str(tmp_path / "a.ckpt"),
                                       str(tmp_path / "b.ckpt")],
            "parent_model.val.val_split_files": [str(tmp_path / "split_a.txt"),
                                                 str(tmp_path / "split_b.txt")],
        })
        sel = build_parent_state_selector(cfg, "val", tmpl)
        assert float(sel.select("camel")["w"][0]) == 1.0
        assert float(sel.select("dog")["w"][0]) == 2.0
        with pytest.raises(KeyError):
            sel.select("not-a-sequence")
        # single state without split files = unconditional
        sel1 = ParentStateSelector([a], [[]])
        assert sel1.select("anything") is a

    def test_none_when_unconfigured(self):
        from e_osvos_tpu.cli.common import build_parent_state_selector

        cfg = cfglib.load_config()
        assert build_parent_state_selector(cfg, "val", {}) is None

    def test_torch_pth_state(self, tmp_path):
        """.pth parent checkpoints go through the shape-matched torch
        importer (models/torch_import.py)."""
        torch = pytest.importorskip("torch")
        tmpl = {"params": {"conv": {"kernel": jnp.zeros((3, 3, 2, 4))}}}
        sd = {"conv.weight": torch.ones((4, 2, 3, 3))}
        torch.save(sd, str(tmp_path / "p.pth"))
        from e_osvos_tpu.cli.common import build_parent_state_selector

        cfg = cfglib.load_config(overrides={
            "parent_model.val.paths": [str(tmp_path / "p.pth")],
        })
        sel = build_parent_state_selector(cfg, "val", tmpl)
        out = sel.select("any")
        assert float(out["params"]["conv"]["kernel"][0, 0, 0, 0]) == 1.0


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

    def test_train_meta_cli_detection(self, tmp_path):
        """Meta-training the reference's DEFAULT architecture (MaskRCNN,
        cfgs/meta.yaml:70) from the CLI: detection_task_fns must be injected
        into the SPMD step (round-2 fix — round 1 only wired the dense
        path)."""
        import json

        import numpy as np

        from e_osvos_tpu.cli import train_meta as tm_cli

        argv = [
            "with", "Synthetic",
            "synthetic.size=[64,64]",
            "parent_model.architecture=MaskRCNN",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.dtype=float32",
            "parent_model.rpn.anchor_sizes=[8,16,32,64,128]",
            "parent_model.rpn.pre_nms_top_n=32",
            "parent_model.rpn.post_nms_top_n=16",
            "parent_model.rpn.batch_size_per_image=16",
            "parent_model.roi.batch_size_per_image=8",
            "meta_batch_size=8",
            "num_meta_iters=1",
            "num_epochs.train=1",
            "bptt_epochs=1",
            "data_cfg.batch_sizes.train=1",
            "data_cfg.crop_sizes.train=[64,64]",
            "remat=False",
            "vis_interval=1",
            f"save_dir={tmp_path}",
        ]
        tm_cli.main(argv)
        lines = [json.loads(l) for l in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        train = [l for l in lines if l["event"] == "meta_train"]
        assert train and np.isfinite(train[0]["meta_loss"])
        assert (tmp_path / "last_meta_iter.ckpt").exists()

    def test_full_pipeline_parent_meta_eval(self, tmp_path):
        """The reference's complete workflow chained through the three CLIs
        (README.md:50-83): train_parent pre-trains the segmentation net →
        train_meta meta-trains from that parent checkpoint → evaluate runs
        one-shot eval from the meta checkpoint. Every hand-off is a file on
        disk, exactly as a user would drive it."""
        import json

        import numpy as np

        from e_osvos_tpu.cli import evaluate as eval_cli
        from e_osvos_tpu.cli import train_meta as tm_cli
        from e_osvos_tpu.cli import train_parent as tp_cli

        arch = [
            "parent_model.architecture=DeepLabV3",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.decoder_norm_layer=group4",
            "parent_model.dtype=float32",
        ]
        # 1) parent pre-training
        tp_cli.main([
            "with", "Synthetic", *arch,
            "parent.num_iters=3",
            "parent.batch_size=8",
            "parent.log_interval=1",
            "data_cfg.crop_sizes.train=[48,48]",
            f"save_dir={tmp_path}/parent",
        ])
        parent_ckpt = tmp_path / "parent" / "parent_final.ckpt"
        assert parent_ckpt.exists()

        # 2) meta-training seeded from the parent checkpoint
        tm_cli.main([
            "with", "Synthetic", *arch,
            f"parent_model.checkpoint={parent_ckpt}",
            "meta_batch_size=8",
            "num_meta_iters=1",
            "num_epochs.train=2",
            "bptt_epochs=2",
            "data_cfg.batch_sizes.train=2",
            "vis_interval=1",
            f"save_dir={tmp_path}/meta",
        ])
        meta_ckpt = tmp_path / "meta" / "last_meta_iter.ckpt"
        assert meta_ckpt.exists()

        # 3) one-shot eval from the meta checkpoint
        eval_cli.main([
            "with", "Synthetic", *arch,
            f"parent_model.checkpoint={parent_ckpt}",
            f"meta_optim_model_file={meta_ckpt}",
            "num_epochs.eval=2",
            f"save_dir={tmp_path}/eval",
        ])
        lines = [json.loads(l) for l in
                 (tmp_path / "eval" / "eval_metrics.jsonl")
                 .read_text().splitlines()]
        seqs = [l for l in lines if l["event"] == "eval_seq"]
        assert seqs and all(np.isfinite(l["J_mean"]) for l in seqs)

        # an explicit but missing meta checkpoint must fail loudly, not
        # silently evaluate from the random init
        with pytest.raises(FileNotFoundError):
            eval_cli.main([
                "with", "Synthetic", *arch,
                f"meta_optim_model_file={tmp_path}/nope.ckpt",
                "num_epochs.eval=1",
                f"save_dir={tmp_path}/eval2",
            ])

    def test_detection_parent_then_eval(self, tmp_path):
        """Detection parent pre-training → one-shot detection eval, chained
        through the CLIs. The reference's equivalent of step 1 is
        downloading COCO weights (helper_func.py:339-346); this environment
        has no COCO, so the framework must be able to TRAIN the detection
        parent (InstanceFrameSampler + ParentTrainer task='detection') and
        the evaluate CLI must load that checkpoint into the Mask R-CNN
        template."""
        import json

        import numpy as np

        from e_osvos_tpu.cli import evaluate as eval_cli
        from e_osvos_tpu.cli import train_parent as tp_cli

        arch = [
            "parent_model.architecture=MaskRCNN",
            "parent_model.encoder=resnet10",
            "parent_model.backbone_norm=group4",
            "parent_model.dtype=float32",
            "parent_model.rpn.anchor_sizes=[8,16,32,64,128]",
            "parent_model.rpn.pre_nms_top_n=64",
            "parent_model.rpn.post_nms_top_n=32",
            "parent_model.rpn.batch_size_per_image=32",
            "parent_model.roi.batch_size_per_image=16",
            "parent_model.detections_per_img=2",
        ]
        tp_cli.main([
            "with", "Synthetic", *arch,
            "parent.num_iters=2",
            "parent.batch_size=8",
            "parent.max_objects=2",
            "parent.log_interval=1",
            "data_cfg.crop_sizes.train=[64,64]",
            f"save_dir={tmp_path}/parent",
        ])
        parent_ckpt = tmp_path / "parent" / "parent_final.ckpt"
        assert parent_ckpt.exists()

        eval_cli.main([
            "with", "Synthetic", *arch,
            f"parent_model.checkpoint={parent_ckpt}",
            "data_cfg.init_hw=[64,64]",
            "num_epochs.eval=1",
            f"save_dir={tmp_path}/eval",
        ])
        lines = [json.loads(l) for l in
                 (tmp_path / "eval" / "eval_metrics.jsonl")
                 .read_text().splitlines()]
        seqs = [l for l in lines if l["event"] == "eval_seq"]
        assert seqs and all(np.isfinite(l["J_mean"]) for l in seqs)


class TestInterleavedEval:
    def test_train_meta_with_eval_interval(self, tmp_path):
        """The interleaved eval hook (meta_trainer.py eval_fn, reference's
        concurrent eval workers train_meta.py:175-186): eval_interval=1 must
        produce an 'eval' metrics row with J_mean, per-sequence Js, and the
        once-per-run init_J baseline."""
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
            "num_meta_iters=2",
            "num_epochs.train=2",
            "num_epochs.eval=2",
            "bptt_epochs=2",
            "data_cfg.batch_sizes.train=2",
            "vis_interval=1",
            "eval_interval=1",
            f"save_dir={tmp_path}",
        ]
        tm_cli.main(argv)
        lines = [json.loads(l) for l in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        evals = [l for l in lines if l["event"] == "eval"]
        assert evals, "eval_interval=1 must log eval rows"
        assert "J_mean" in evals[0] and "per_seq_J" in evals[0]
        # init_J logs exactly once (first eval), not on later evals
        assert "init_J_mean" in evals[0]
        assert all("init_J_mean" not in e for e in evals[1:])
        # best-J checkpoint gating (reference evaluate.py:361-382)
        assert (tmp_path / "best_meta_iter.ckpt").exists() or (
            tmp_path / "last_meta_iter.ckpt").exists()
