"""int8 (w8a8) DDN backbone: the camera-stage serving quantization.

The reference freezes the COCO-pretrained DeepLabV3 backbone
(ddn_template.py:72-75), so quantizing it is a one-time, scannable
approximation — the same argument that justified the polar view
transform's knob scan. These tests pin the contract: identical param
tree (checkpoints/converter untouched), bounded output error, whole-
detector compatibility with BOTH view transforms, and the eval-only
guard (training keeps the exact backbone).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgsfusion_tpu.models.detector import HGSFusionConfig, HGSFusionModel
from hgsfusion_tpu.models.resnet import ResNetDeepLabBackbone

from test_model import TINY, make_tiny_batch


class TestQConvBackbone:
    def test_param_tree_identical_and_outputs_close(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        m0 = ResNetDeepLabBackbone(stage_sizes=(3, 4, 6, 3))
        mq = ResNetDeepLabBackbone(stage_sizes=(3, 4, 6, 3), quant="w8a8")
        v0 = m0.init(jax.random.PRNGKey(0), x, False)
        vq = mq.init(jax.random.PRNGKey(0), x, False)
        assert (jax.tree_util.tree_structure(v0)
                == jax.tree_util.tree_structure(vq))
        o0 = m0.apply(v0, x, False)
        oq = mq.apply(v0, x, False)  # quant runs the UNQUANTIZED params
        for a, b in zip(o0, oq):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert rel < 0.06, rel
            assert corr > 0.995, corr

    def test_unknown_quant_rejected(self):
        x = jnp.zeros((1, 32, 32, 3))
        m = ResNetDeepLabBackbone(stage_sizes=(3, 4, 6, 3), quant="int4")
        with pytest.raises(NotImplementedError, match="QUANT"):
            m.init(jax.random.PRNGKey(0), x, False)


class TestDetectorDDNQuant:
    @pytest.mark.parametrize("view", ["gather", "polar"])
    def test_eval_forward_close_to_exact(self, view):
        rng = np.random.RandomState(1)
        batch = make_tiny_batch(rng)
        cfg_kw = {} if view == "gather" else dict(
            f2v_view="polar", f2v_polar_zeta_bins=32,
            f2v_polar_near_columns=4)
        cfg0 = dataclasses.replace(TINY, **cfg_kw)
        cfgq = dataclasses.replace(TINY, ddn_quant="w8a8", **cfg_kw)
        m0, mq = HGSFusionModel(cfg=cfg0), HGSFusionModel(cfg=cfgq)
        variables = jax.jit(
            lambda: m0.init(jax.random.PRNGKey(0), batch, False))()
        o0 = m0.apply(variables, batch, False)
        oq = mq.apply(variables, batch, False)
        a = np.asarray(o0["cls_preds"], np.float64).ravel()
        b = np.asarray(oq["cls_preds"], np.float64).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.99

    def test_train_mode_rejected(self):
        rng = np.random.RandomState(2)
        batch = make_tiny_batch(rng)
        cfgq = dataclasses.replace(TINY, ddn_quant="w8a8")
        mq = HGSFusionModel(cfg=cfgq)
        with pytest.raises(NotImplementedError, match="eval-only"):
            mq.init(jax.random.PRNGKey(0), batch, True)


def test_yaml_plumbing():
    from hgsfusion_tpu.config import load_config, model_config_from_yaml

    cfg = load_config("configs/hgsfusion_vod.yaml")
    mc = model_config_from_yaml(cfg)
    assert mc.ddn_quant == "none"
    cfg.MODEL.FusionVFE.ImageVFE.FFN.DDN.QUANT = "w8a8"
    assert model_config_from_yaml(cfg).ddn_quant == "w8a8"
