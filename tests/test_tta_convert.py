import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.eval.tta import make_tta_variants
from hgsfusion_tpu.utils.calibration import Calibration


def _calib():
    return Calibration(
        {
            "P2": np.array(
                [[200.0, 0, 128, 0], [0, 200, 64, 0], [0, 0, 1, 0]], np.float32
            ),
            "P3": np.zeros((3, 4), np.float32),
            "R0": np.eye(3, dtype=np.float32),
            "Tr_velo2cam": np.array(
                [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3]], np.float32
            ),
        }
    )


class TestTTA:
    def test_variants_shapes_and_diversity(self, rng):
        sample = {
            "points": rng.randn(64, 17).astype(np.float32),
            "points_valid": np.ones(64, bool),
            "gt_boxes": np.concatenate(
                [rng.randn(8, 7).astype(np.float32), np.ones((8, 1), np.float32)],
                axis=1,
            ),
            "gt_boxes2d": np.zeros((8, 4), np.float32),
            "images": rng.rand(64, 96, 3).astype(np.float32),
            "frame_id": "00000",
        }
        variants = make_tta_variants(sample, _calib(), tta_num=4, seed=0)
        assert len(variants) == 4
        for v in variants:
            assert v["points"].shape == (64, 17)
            assert v["gt_boxes"].shape == (8, 8)
            assert v["lidar_aug_matrix"].shape == (4, 4)
        # the random draws differ between variants
        assert not np.allclose(variants[0]["points"], variants[1]["points"])
        # original untouched
        np.testing.assert_array_equal(sample["points"].shape, (64, 17))


class TestTorchConvert:
    def test_deeplab_backbone_roundtrip(self):
        """Build a synthetic torchvision-style state dict from our flax tree,
        convert, and check every tensor lands with the right shape/value."""
        torch = pytest.importorskip("torch")
        from hgsfusion_tpu.models.resnet import ResNetDeepLabBackbone
        from hgsfusion_tpu.train.torch_convert import (
            convert_resnet_deeplab_backbone,
        )

        bb = ResNetDeepLabBackbone(stage_sizes=(2, 2, 2, 2))
        x = jnp.zeros((1, 64, 64, 3))
        variables = bb.init(jax.random.PRNGKey(0), x, False)

        # synthesize a torch-style state dict with recognizable values
        state = {}
        counter = [0.0]

        def fill(shape):
            counter[0] += 1
            return np.full(shape, counter[0], np.float32)

        def add_conv(tname, flax_kernel):
            kh, kw, ci, co = flax_kernel.shape
            state[f"backbone.{tname}.weight"] = fill((co, ci, kh, kw))

        def add_bn(tname, c):
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                state[f"backbone.{tname}.{suffix}"] = fill((c,))

        p = variables["params"]
        add_conv("conv1", p["conv1"]["kernel"])
        add_bn("bn1", 64)
        for si, blocks in enumerate((2, 2, 2, 2)):
            for bi in range(blocks):
                f = p[f"layer{si + 1}_block{bi}"]
                for ci in (1, 2, 3):
                    add_conv(f"layer{si + 1}.{bi}.conv{ci}", f[f"conv{ci}"]["kernel"])
                    add_bn(f"layer{si + 1}.{bi}.bn{ci}",
                           f[f"conv{ci}"]["kernel"].shape[-1])
                if "downsample_conv" in f:
                    add_conv(f"layer{si + 1}.{bi}.downsample.0",
                             f["downsample_conv"]["kernel"])
                    add_bn(f"layer{si + 1}.{bi}.downsample.1",
                           f["downsample_conv"]["kernel"].shape[-1])

        params, stats = convert_resnet_deeplab_backbone(
            state, stage_sizes=(2, 2, 2, 2)
        )
        # all shapes line up with the flax tree
        def check(t_flax, t_conv, path=""):
            for k, v in t_conv.items():
                if isinstance(v, dict):
                    check(t_flax[k], v, path + "/" + k)
                else:
                    assert np.shape(t_flax[k]) == np.shape(v), (path, k)

        check(p, params)
        check(variables["batch_stats"], stats)
        # a transposed conv kernel keeps its constant fill value
        np.testing.assert_allclose(params["conv1"]["kernel"],
                                   state["backbone.conv1.weight"].transpose(2, 3, 1, 0))

    def test_full_model_mapping_coverage(self):
        """Synthetic reference state dict -> full model mapping: the mapping
        must copy the head/fusion/occupancy/neck weights with correct shapes."""
        from hgsfusion_tpu.models.detector import HGSFusionModel
        from hgsfusion_tpu.train.torch_convert import convert_hgsfusion_state
        import sys
        sys.path.insert(0, "tests")
        from test_model import TINY, make_tiny_batch

        rng = np.random.RandomState(0)
        batch = make_tiny_batch(rng)
        model = HGSFusionModel(cfg=dataclasses.replace(TINY, image_backbone="ResNet50"))
        variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(batch)

        # synthesize the torch-side tensors for a few key modules
        state = {}
        p = variables["params"]

        def t_conv(name, kernel, bias=None):
            kh, kw, ci, co = np.shape(kernel)
            state[name + ".weight"] = np.ones((co, ci, kh, kw), np.float32)
            if bias is not None:
                state[name + ".bias"] = np.ones((co,), np.float32)

        def t_bn(name, c):
            state[name + ".weight"] = np.full((c,), 2.0, np.float32)
            state[name + ".bias"] = np.zeros((c,), np.float32)
            state[name + ".running_mean"] = np.zeros((c,), np.float32)
            state[name + ".running_var"] = np.ones((c,), np.float32)

        h = p["dense_head"]
        for name in ("conv_cls", "conv_box", "conv_dir_cls"):
            t_conv(f"dense_head.{name}", h[name]["kernel"], bias=True)
        f = p["fusion_after_bev"]
        t_conv("fusion_after_bev.fuse_conv.0", f["fuse_conv"]["kernel"], bias=True)
        t_bn("fusion_after_bev.fuse_conv.1", f["fuse_conv"]["kernel"].shape[-1])
        t_conv("fusion_after_bev.se_block.att.1", f["se"]["att_conv"]["kernel"],
               bias=True)
        occ = p["radar_occupancy"]
        t_conv("fusion_vfe.radar_occupancy.pred_occupancy.0",
               occ["aspp_conv1"]["kernel"])
        t_bn("fusion_vfe.radar_occupancy.pred_occupancy.1", 128)

        new_vars, report = convert_hgsfusion_state(state, variables)
        copied = set(report["copied"])
        assert "dense_head/conv_cls/kernel" in copied
        assert "fusion_after_bev/fuse_conv/kernel" in copied
        assert "radar_occupancy/aspp_conv1/kernel" in copied
        # converted value actually landed
        np.testing.assert_allclose(
            np.asarray(new_vars["params"]["dense_head"]["conv_cls"]["bias"]), 1.0
        )
