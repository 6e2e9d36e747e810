"""Config system tests: layering, dotted overrides, typed views
(SURVEY.md §5.6 — Sacred named-config semantics rebuilt)."""

import numpy as np
import pytest

from e_osvos_tpu import config as cfglib


class TestLayering:
    def test_base_loads(self):
        cfg = cfglib.load_config()
        assert cfg["meta_batch_size"] == 4
        assert cfg["num_epochs"]["train"] == 5

    def test_named_config_overlays(self):
        cfg = cfglib.load_config(["DAVIS-2017", "e-OSVOS-OnA"])
        assert cfg["datasets"]["train"]["name"] == "DAVIS-2017"
        assert cfg["eval_online_adapt"]["step"] == 5
        # untouched keys survive the merge
        assert cfg["num_epochs"]["train"] == 5

    def test_unknown_named_config_raises(self):
        with pytest.raises(FileNotFoundError, match="nope"):
            cfglib.load_config(["nope"])

    def test_dotted_overrides(self):
        cfg = cfglib.load_config(
            overrides={"num_epochs.eval": 100, "eval_online_adapt.step": 5}
        )
        assert cfg["num_epochs"]["eval"] == 100
        assert cfg["eval_online_adapt"]["step"] == 5

    def test_cli_parse(self):
        cfg = cfglib.parse_cli(
            ["with", "DAVIS-2017", "e-OSVOS-OnA", "num_epochs.eval=50",
             "meta_optim_cfg.second_order_gradients=True"]
        )
        assert cfg["num_epochs"]["eval"] == 50
        assert cfg["meta_optim_cfg"]["second_order_gradients"] is True
        assert cfg["datasets"]["val"]["name"] == "DAVIS-2017"

    def test_value_parsing_yaml_literals(self):
        assert cfglib.parse_value("1e-3") == pytest.approx(1e-3)
        assert cfglib.parse_value("True") is True
        assert cfglib.parse_value("null") is None
        assert cfglib.parse_value("[1, 2]") == [1, 2]


class TestTypedViews:
    def test_meta_optim_config(self):
        cfg = cfglib.load_config()
        mo = cfglib.to_meta_optim_config(cfg)
        assert mo.lr_hierarchy_level == "neuron"
        assert mo.init_lr == pytest.approx(1e-3)
        assert mo.use_log_init_lr is False

    def test_second_order_subtrees_arch_default(self):
        """null second_order_subtrees resolves to the architecture default:
        roi_heads restriction for MaskRCNN (reference mask_rcnn.py:536-544),
        unrestricted for the DeepLab family; [] forces no restriction."""
        cfg = cfglib.load_config()
        assert cfglib.to_meta_optim_config(cfg).second_order_subtrees == ()
        cfg = cfglib.load_config(
            overrides={"parent_model.architecture": "MaskRCNN"}
        )
        assert cfglib.to_meta_optim_config(cfg).second_order_subtrees == (
            "roi_heads",
        )
        cfg = cfglib.load_config(
            overrides={
                "parent_model.architecture": "MaskRCNN",
                "meta_optim_cfg.second_order_subtrees": [],
            }
        )
        assert cfglib.to_meta_optim_config(cfg).second_order_subtrees == ()

    def test_second_order_selects_xla_norm_variants(self):
        """second_order_gradients=True must auto-select the pure-XLA
        GroupNorm (the Pallas custom_vjp supports one reverse-mode level)."""
        from e_osvos_tpu.cli.common import build_parent_model

        cfg = cfglib.load_config(
            overrides={
                "meta_optim_cfg.second_order_gradients": True,
                "parent_model.backbone_norm": "group",
            }
        )
        model = build_parent_model(cfg)
        assert model.backbone_norm == "group_xla"
        assert model.head_norm == "group16_xla"
        # off by default: the faster Pallas hybrid stays
        model = build_parent_model(
            cfglib.load_config(overrides={"parent_model.backbone_norm": "group"})
        )
        assert model.backbone_norm == "group"
        assert model.head_norm == "group16"

    def test_one_shot_config_ona(self):
        cfg = cfglib.load_config(["e-OSVOS-OnA"], {"num_epochs.eval": 50})
        os_cfg = cfglib.to_one_shot_config(cfg)
        assert os_cfg.num_epochs == 50
        assert os_cfg.online_adapt_step == 5
        assert os_cfg.batch_size == 3

    def test_meta_step_config(self):
        cfg = cfglib.load_config()
        sc = cfglib.to_meta_step_config(cfg)
        assert sc.num_epochs == 5
        assert sc.bptt_epochs == 5
        assert sc.train_batch_size == 3
        assert sc.loss_func == "dice"

    def test_taskset_config(self):
        cfg = cfglib.load_config()
        tc = cfglib.to_taskset_config(cfg)
        assert tc.crop_size == (480, 480)
        assert tc.random_support_frame is True
