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
