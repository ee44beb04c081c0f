import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.layers import (
    MaskedBatchNorm,
    upsample_bilinear_align_corners,
    resize_bilinear,
)
from hgsfusion_tpu.models.pillar_encoder import PillarFeatureNet
from hgsfusion_tpu.models.bev_encoder import PillarNetRadar, SparseBasicBlock


class TestMaskedBatchNorm:
    def test_matches_torch_bn1d_on_active_rows(self, rng):
        torch = pytest.importorskip("torch")

        n, c = 64, 8
        x = rng.randn(n, c).astype(np.float32)
        mask = rng.rand(n, 1) > 0.4

        mbn = MaskedBatchNorm(c, eps=1e-3, momentum=0.01)
        variables = mbn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask), False)
        y, mutated = mbn.apply(
            variables, jnp.array(x), jnp.array(mask), False, mutable=["batch_stats"]
        )
        y = np.asarray(y)

        tbn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
        tbn.train()
        active = torch.from_numpy(x[mask[:, 0]])
        ty = tbn(active).detach().numpy()
        np.testing.assert_allclose(y[mask[:, 0]], ty, atol=1e-4)
        # running stats must match too
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(),
            atol=1e-5,
        )

    def test_eval_uses_running_stats(self, rng):
        c = 4
        x = rng.randn(10, c).astype(np.float32)
        mask = np.ones((10, 1), bool)
        mbn = MaskedBatchNorm(c)
        variables = mbn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask), True)
        y = mbn.apply(variables, jnp.array(x), jnp.array(mask), True)
        # fresh stats: mean 0 var 1 -> y ~= x / sqrt(1 + eps)
        np.testing.assert_allclose(np.asarray(y), x / np.sqrt(1 + 1e-3), atol=1e-5)


class TestSubmanifoldEquivalence:
    def test_inactive_sites_do_not_leak(self, rng):
        """Dense emulation must be a function of active sites only, and must
        output exactly zero at inactive sites (submanifold conv property)."""
        b, h, w, c = 1, 12, 12, 8
        mask = (rng.rand(b, h, w, 1) > 0.6).astype(np.float32)
        x1 = rng.randn(b, h, w, c).astype(np.float32) * mask
        # x2 differs only at inactive sites
        x2 = x1 + rng.randn(b, h, w, c).astype(np.float32) * (1 - mask)

        block = SparseBasicBlock(c)
        variables = block.init(jax.random.PRNGKey(0), jnp.array(x1), jnp.array(mask), False)
        y1 = np.asarray(
            block.apply(variables, jnp.array(x1), jnp.array(mask), False,
                        mutable=["batch_stats"])[0]
        )
        y2 = np.asarray(
            block.apply(variables, jnp.array(x2), jnp.array(mask), False,
                        mutable=["batch_stats"])[0]
        )
        np.testing.assert_allclose(y1, y2, atol=1e-5)
        assert np.all(np.abs(y1 * (1 - mask)) < 1e-7)


class TestPillarFeatureNet:
    def _make_points(self, rng, b=2, n=50, d=17):
        pts = np.zeros((b, n, d), dtype=np.float32)
        pts[..., 0] = rng.uniform(0.1, 51.0, (b, n))
        pts[..., 1] = rng.uniform(-25.0, 25.0, (b, n))
        pts[..., 2] = rng.uniform(-2.9, 1.9, (b, n))
        pts[..., 3:15] = rng.randn(b, n, 12)
        idf1 = (rng.rand(b, n) > 0.5).astype(np.float32)
        pts[..., 15] = idf1
        pts[..., 16] = 1.0
        valid = rng.rand(b, n) > 0.1
        return pts, valid

    def test_shapes_and_mask(self, rng):
        pts, valid = self._make_points(rng)
        net = PillarFeatureNet()
        variables = net.init(jax.random.PRNGKey(0), jnp.array(pts), jnp.array(valid), False)
        (bev, occ), _ = net.apply(
            variables, jnp.array(pts), jnp.array(valid), False, mutable=["batch_stats"]
        )
        assert bev.shape == (2, 320, 320, 32)
        assert occ.shape == (2, 320, 320, 1)
        bev = np.asarray(bev)
        occ = np.asarray(occ)
        # features nonzero only where occupied
        assert np.all(np.abs(bev[~occ[..., 0]]) < 1e-7)
        # every valid point produced an occupied pillar
        assert occ.sum() > 0

    def test_split_encoding(self, rng):
        net = PillarFeatureNet()
        pts = np.zeros((1, 2, 17), dtype=np.float32)
        pts[0, 0, :3] = [1, 2, 3]
        pts[0, 0, 3:15] = np.arange(12)
        pts[0, 0, 15:] = [1, 1]  # raw real
        pts[0, 1, :3] = [4, 5, 6]
        pts[0, 1, 3:15] = np.arange(12) + 100
        pts[0, 1, 15:] = [0, 1]  # virtual
        enc = np.asarray(net._split_encode(jnp.array(pts)))
        assert enc.shape == (1, 2, 29)
        np.testing.assert_allclose(enc[0, 0, 3:15], np.arange(12))
        np.testing.assert_allclose(enc[0, 0, 15:27], 0)
        np.testing.assert_allclose(enc[0, 1, 3:15], 0)
        np.testing.assert_allclose(enc[0, 1, 15:27], np.arange(12) + 100)
        np.testing.assert_allclose(enc[0, 0, 27:], [1, 1])
        np.testing.assert_allclose(enc[0, 1, 27:], [0, 1])


class TestUpsample:
    def test_matches_torch_align_corners(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 5, 7, 3).astype(np.float32)
        got = np.asarray(upsample_bilinear_align_corners(jnp.array(x), 2))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
            mode="bilinear", align_corners=True,
        )
        want = t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_resize_matches_torch_no_align(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(1, 6, 8, 2).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.array(x), (9, 12)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(9, 12),
            mode="bilinear", align_corners=False,
        )
        want = t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestRadarBranchEndToEnd:
    def test_full_radar_branch_small_grid(self, rng):
        """Reader -> ResNet18 BEV -> FPN on a small grid (static shapes)."""
        net = PillarFeatureNet(
            pc_range=(0, -6.4, -3, 12.8, 6.4, 2), pillar_size=0.4
        )  # grid 32 x 32
        pts = np.zeros((1, 30, 17), dtype=np.float32)
        pts[..., 0] = rng.uniform(0.1, 12.0, (1, 30))
        pts[..., 1] = rng.uniform(-6.0, 6.0, (1, 30))
        pts[..., 2] = rng.uniform(-2.0, 1.0, (1, 30))
        pts[..., 15:] = 1.0
        valid = np.ones((1, 30), bool)

        variables = net.init(jax.random.PRNGKey(0), jnp.array(pts), jnp.array(valid), False)
        (bev, occ), _ = net.apply(
            variables, jnp.array(pts), jnp.array(valid), False, mutable=["batch_stats"]
        )
        radar = PillarNetRadar()
        rvars = radar.init(jax.random.PRNGKey(1), bev, occ, False)
        out, _ = radar.apply(rvars, bev, occ, False, mutable=["batch_stats"])
        assert out.shape == (1, 32, 32, 128)
        assert np.all(np.isfinite(np.asarray(out)))


class TestResizeDownscale:
    def test_downscale_matches_torch_no_antialias(self):
        """torch F.interpolate does NOT anti-alias when minifying (unlike
        jax.image.resize) — the flagship DSM fusion downscales the image
        BEV, so this direction must match torch too."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        x = rng.randn(1, 32, 32, 3).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.array(x), (16, 16)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 16),
            mode="bilinear", align_corners=False,
        )
        want = t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_non_integer_ratio_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        x = rng.randn(2, 13, 7, 4).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.array(x), (5, 11)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(5, 11),
            mode="bilinear", align_corners=False,
        )
        np.testing.assert_allclose(got, t.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-5)
