import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.frustum import FrustumToVoxelMultiScale
from hgsfusion_tpu.models.detector import HGSFusionModel
import sys

sys.path.insert(0, "tests")
from test_model import TINY, make_tiny_batch


class TestDepthFrustumSampling:
    def test_factorized_trilinear_matches_torch_3d(self, rng):
        """_sample_with_depth must equal torch's trilinear grid_sample on the
        explicitly materialized frustum volume probs * feat."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        h, w, c, d = 10, 14, 6, 8
        feat = rng.randn(1, h, w, c).astype(np.float32)
        logits = rng.randn(1, h, w, d + 1).astype(np.float32)
        probs_full = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        probs = np.asarray(probs_full)[..., :d]

        grid = rng.uniform(-1.2, 1.2, (1, 4, 5, 3, 3)).astype(np.float32)

        f2v = FrustumToVoxelMultiScale(num_depth_bins=d)
        got = np.asarray(
            f2v._sample_with_depth(
                jnp.asarray(feat), jnp.asarray(probs), jnp.asarray(grid),
                jnp.float32,
            )
        )

        # torch: volume (1, C, D, H, W) = probs (D) x feat (C)
        vol = feat[:, None, :, :, :].transpose(0, 4, 1, 2, 3) * probs.transpose(
            0, 3, 1, 2
        )[:, None]
        t_vol = torch.from_numpy(vol)  # (1, C, D, H, W)
        t_grid = torch.from_numpy(grid.reshape(1, 4, 5, 3, 3))
        want = F.grid_sample(
            t_vol, t_grid, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )  # (1, C, 4, 5, 3)
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestUseDepthModel:
    def test_forward_and_train_loss(self, rng):
        cfg = dataclasses.replace(TINY, use_depth=True)
        batch = make_tiny_batch(rng)
        batch = dict(batch)
        # synthetic depth supervision (H, W of the padded image)
        batch["depth_maps"] = jnp.asarray(
            rng.uniform(1.0, 15.0, (1, 64, 96)).astype(np.float32)
        )
        batch["gt_boxes2d"] = jnp.asarray(
            np.array([[[10, 10, 40, 40], [0, 0, 0, 0]]], np.float32)
        )
        model = HGSFusionModel(cfg=cfg)
        variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, False))(
            batch
        )
        preds, _ = model.apply(variables, batch, False, mutable=["batch_stats"])
        # logits at the layer1 (stride 4) resolution
        assert preds["depth_logits"].shape == (1, 16, 24, TINY.disc_num_bins + 1)
        assert np.all(np.isfinite(np.asarray(preds["cls_preds"])))

        # ddn loss: positive, finite, fg weighting increases fg-box loss share
        from hgsfusion_tpu.models.ddn_loss import compute_fg_mask, ddn_loss

        # targets binned at the logits resolution: downsample depth map 4x
        dm = np.asarray(batch["depth_maps"])[:, ::4, ::4]
        loss, tb = ddn_loss(
            preds["depth_logits"], jnp.asarray(dm),
            batch["gt_boxes2d"], cfg.disc_cfg, downsample_factor=4,
        )
        assert np.isfinite(float(loss)) and float(loss) > 0
        fg = np.asarray(
            compute_fg_mask(np.asarray(batch["gt_boxes2d"]), (1, 16, 24), 4)
        )
        assert fg.sum() > 0 and fg.sum() < fg.size

    def test_fg_mask_geometry(self):
        from hgsfusion_tpu.models.ddn_loss import compute_fg_mask

        boxes = np.array([[[2.0, 1.0, 5.0, 3.0]]], np.float32)
        m = np.asarray(compute_fg_mask(jnp.asarray(boxes), (1, 6, 8), 1))
        assert m[0, 1, 2] and m[0, 2, 4]
        assert not m[0, 0, 0] and not m[0, 3, 2] and not m[0, 1, 5]
