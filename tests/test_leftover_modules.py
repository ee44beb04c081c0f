"""Tests for the registered-but-unused reference leftovers (SURVEY §2.7):
Radar7PillarVFE, SimpleSampler, RadarOccupancy v1 (3D), single-scale
FrustumToVoxel, pseudocost depth logits, Fusion_MAP_TO_BEV,
HeightCompressionMultiScale, RPNV2."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestRadar7PillarVFE:
    def _vfe(self, **kw):
        from hgsfusion_tpu.models.pillar_encoder import Radar7PillarVFE

        return Radar7PillarVFE(
            num_filters=kw.pop("num_filters", (16,)),
            voxel_size=(0.5, 0.5, 5.0),
            pc_range=(0, -2, -3, 4, 2, 2), **kw)

    def _points(self):
        # [x y z rcs v_r v_r_comp time]
        pts = np.zeros((1, 6, 7), np.float32)
        pts[0, 0] = [0.2, -1.8, 0.0, 1.0, 0.5, 0.4, 0.0]
        pts[0, 1] = [0.4, -1.9, 0.5, 2.0, 0.1, 0.2, 0.1]   # same pillar as 0
        pts[0, 2] = [3.6, 1.7, -1.0, 3.0, 0.0, 0.0, 0.2]   # far pillar
        valid = np.zeros((1, 6), bool)
        valid[0, :3] = True
        return jnp.asarray(pts), jnp.asarray(valid)

    def test_shapes_and_empty_cells(self):
        vfe = self._vfe()
        pts, valid = self._points()
        var = vfe.init(jax.random.PRNGKey(0), pts, valid, False)
        bev, occ = vfe.apply(var, pts, valid, False,
                             mutable=False)
        assert bev.shape == (1, 8, 8, 16)
        assert occ.shape == (1, 8, 8, 1)
        # exactly two occupied pillars
        assert int(jnp.sum(occ)) == 2
        # empty cells are zero (reference zero-init scatter)
        assert float(jnp.abs(bev[0, 3, 3]).max()) == 0.0

    def test_elevation_flag_zeroes_z(self):
        """USE_ELEVATION=False zeroes z before features (pillar_vfe:231)."""
        pts, valid = self._points()
        vfe0 = self._vfe(use_elevation=False)
        var = vfe0.init(jax.random.PRNGKey(0), pts, valid, False)
        bev0, _ = vfe0.apply(var, pts, valid, False)
        pts_z0 = pts.at[..., 2].set(0.0)
        vfe1 = self._vfe(use_elevation=True)
        bev1, _ = vfe1.apply(var, pts_z0, valid, False)
        np.testing.assert_allclose(np.asarray(bev0), np.asarray(bev1),
                                   atol=1e-6)

    def test_multi_layer_pfn_reference_widths(self):
        """Reference PFN semantics (pillar_vfe.py:18-49, :193-199): ONLY
        the final layer pools to pillar level (the reference's last-layer
        test counts a filter list with the input dim prepended); earlier
        layers output width//2 per point + width//2 broadcast pillar max."""
        pts, valid = self._points()
        # two layers: layer0 is concat-style at 8//2=4 (total 8 into layer1)
        vfe = self._vfe(num_filters=(8, 16))
        var = vfe.init(jax.random.PRNGKey(1), pts, valid, False)
        bev, _ = vfe.apply(var, pts, valid, False)
        assert bev.shape[-1] == 16
        assert var["params"]["pfn_0"]["kernel"].shape == (7 + 6, 4)
        assert var["params"]["pfn_1"]["kernel"].shape == (8, 16)
        # empty cells stay exactly zero
        assert float(jnp.abs(bev[0, 3, 3]).max()) == 0.0
        # three layers: two concat-style layers then the pooling layer
        vfe3 = self._vfe(num_filters=(8, 12, 16))
        var3 = vfe3.init(jax.random.PRNGKey(1), pts, valid, False)
        assert var3["params"]["pfn_0"]["kernel"].shape == (13, 4)
        assert var3["params"]["pfn_1"]["kernel"].shape == (8, 6)
        assert var3["params"]["pfn_2"]["kernel"].shape == (12, 16)


class TestSimpleSampler:
    def _mk(self, **kw):
        from hgsfusion_tpu.models.occupancy import SimpleSampler

        return SimpleSampler(
            feature_dim=4, pc_range=(0, -2, -3, 4, 2, 2),
            voxel_size=(0.5, 0.5, 0.5), **kw)

    def test_add_doubles_marked_voxel(self):
        samp = self._mk(fuse_mode="ADD")
        vox = jnp.ones((1, 8, 8, 10, 4), jnp.float32)
        pts = jnp.asarray(
            np.array([[[0.2, -1.8, -2.9, 0.0]]], np.float32))
        valid = jnp.ones((1, 1), bool)
        out = samp.apply({}, vox, pts, valid, False)
        # marked voxel (iy=0, ix=0, iz=0): 1 + 1 = 2
        assert float(out[0, 0, 0, 0, 0]) == 2.0
        assert float(out[0, 5, 5, 5, 0]) == 1.0

    def test_out_of_range_clamps_to_border(self):
        """Reference quirk (simple_sampler.py:87): rounded indices are
        clamped, so out-of-range points mark border voxels."""
        samp = self._mk(fuse_mode="ADD")
        vox = jnp.ones((1, 8, 8, 10, 4), jnp.float32)
        pts = jnp.asarray(np.array([[[99.0, 99.0, 99.0, 0.0]]], np.float32))
        out = samp.apply({}, vox, pts, jnp.ones((1, 1), bool), False)
        assert float(out[0, 7, 7, 9, 0]) == 2.0

    def test_virtual_filter(self):
        samp = self._mk(fuse_mode="ADD", use_virtual=True, virtual_col=3)
        vox = jnp.ones((1, 8, 8, 10, 4), jnp.float32)
        pts = jnp.asarray(
            np.array([[[0.2, -1.8, -2.9, 1.0]]], np.float32))  # flag != 0
        out = samp.apply({}, vox, pts, jnp.ones((1, 1), bool), False)
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_se_fuse_shapes(self):
        samp = self._mk(fuse_mode="SE")
        vox = jnp.ones((1, 8, 8, 10, 4), jnp.float32)
        pts = jnp.zeros((1, 2, 4), jnp.float32)
        valid = jnp.zeros((1, 2), bool)
        var = samp.init(jax.random.PRNGKey(0), vox, pts, valid, False)
        out = samp.apply(var, vox, pts, valid, False)
        assert out.shape == vox.shape


class TestRadarOccupancy3D:
    def _mk(self, **kw):
        from hgsfusion_tpu.models.occupancy import RadarOccupancy3D

        return RadarOccupancy3D(radar_input_channels=8, num_z_bins=6, **kw)

    def test_replace_gates_voxels(self):
        occ3d = self._mk()
        vox = jnp.ones((1, 8, 8, 6, 4), jnp.float32)
        radar = jnp.zeros((1, 8, 8, 8), jnp.float32)
        var = occ3d.init(jax.random.PRNGKey(0), vox, radar, False)
        fused, occ = occ3d.apply(var, vox, radar, False)
        assert fused.shape == (1, 8, 8, 6, 4)
        assert occ.shape == (1, 8, 8, 6)
        # focal bias init -> occupancy near occupancy_init on zero input
        np.testing.assert_allclose(np.asarray(occ), 0.01, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(vox * occ[..., None]), atol=1e-6)

    def test_add_mode_and_resize(self):
        occ3d = self._mk(fuse_mode="ADD")
        vox = jnp.ones((1, 16, 16, 6, 4), jnp.float32)  # finer than radar
        radar = jnp.zeros((1, 8, 8, 8), jnp.float32)
        var = occ3d.init(jax.random.PRNGKey(0), vox, radar, False)
        fused, occ = occ3d.apply(var, vox, radar, False)
        assert fused.shape == (1, 8, 8, 6, 4)  # resized to radar grid
        np.testing.assert_allclose(
            np.asarray(fused[..., 0]), np.asarray(1.0 + occ), atol=1e-6)

    def test_mask_mode_blends_radially(self):
        occ3d = self._mk(fuse_mode="MASK", mask_sigma=2.0)
        vox = jnp.ones((1, 8, 8, 6, 4), jnp.float32)
        radar = jnp.zeros((1, 8, 8, 8), jnp.float32)
        var = occ3d.init(jax.random.PRNGKey(0), vox, radar, False)
        fused, occ = occ3d.apply(var, vox, radar, False)
        # far corner: ratio ~ 0 -> image features pass through unmodified
        np.testing.assert_allclose(float(fused[0, 7, 7, 0, 0]), 1.0,
                                   atol=1e-3)
        # near (y=ny//2, x=0): ratio = 1 -> fully gated by occupancy
        np.testing.assert_allclose(
            float(fused[0, 4, 0, 0, 0]), float(occ[0, 4, 0, 0]), atol=1e-4)


class TestRasterize3D:
    def test_z_quirk_and_bev_footprint(self):
        """The 3D target's xy footprint matches the BEV rasterizer; z spans
        [center_voxel, center_voxel + 2*halfz) (radar_occupancy.py:219-224)."""
        from hgsfusion_tpu.models.occupancy import (
            rasterize_gt_boxes_3d, rasterize_gt_boxes_bev)

        gt = jnp.asarray(np.array(
            [[[10.0, 0.0, -0.5, 4.0, 2.0, 1.5, 0.3, 1.0]]], np.float32))
        grid = (64, 64, 10)
        pcr = (0, -12.8, -3, 25.6, 12.8, 1)
        vox = (0.4, 0.4, 0.4)
        t3 = np.asarray(rasterize_gt_boxes_3d(gt, grid, pcr, vox))
        bev = np.asarray(rasterize_gt_boxes_bev(gt, grid[:2], pcr, vox[:2]))
        assert t3.shape == (1, 64, 64, 10)
        np.testing.assert_allclose(t3.max(axis=-1), bev)
        # z extent: center voxel floor((-0.5+3)/0.4)=6, halfz=floor(0.75/0.4)=1
        # -> z slices {6, 7} only
        zs = np.where(t3[0].sum(axis=(0, 1)) > 0)[0]
        np.testing.assert_array_equal(zs, [6, 7])

    def test_focal_loss_scalar(self):
        from hgsfusion_tpu.models.occupancy import occupancy3d_loss

        gt = jnp.asarray(np.array(
            [[[10.0, 0.0, -0.5, 4.0, 2.0, 1.5, 0.3, 1.0]]], np.float32))
        occ = jnp.full((1, 64, 64, 10), 0.5, jnp.float32)
        loss = occupancy3d_loss(occ, gt, (64, 64, 10),
                                (0, -12.8, -3, 25.6, 12.8, 1), (0.4, 0.4, 0.4))
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestPseudocost:
    def test_ud_spike_and_overflow(self):
        from hgsfusion_tpu.models.frustum import pseudocost_from_depth

        depth = jnp.asarray(np.array(
            [[[5.0, 45.0], [-1.0, np.inf]]], np.float32))
        out = np.asarray(pseudocost_from_depth(depth, "UD", 2.0, 42.0, 80))
        assert out.shape == (1, 2, 2, 81)
        # (5-2)/0.5 = 6
        assert out[0, 0, 0, 6] == 10.0 and out[0, 0, 0].sum() == 10.0
        # 45 > depth_max -> (45-2)/0.5 = 86 > 80 -> overflow bin
        assert out[0, 0, 1, 80] == 10.0
        # negative + inf -> overflow bin
        assert out[0, 1, 0, 80] == 10.0 and out[0, 1, 1, 80] == 10.0


class TestSingleScaleF2V:
    def test_no_depth_equals_bilinear(self):
        from hgsfusion_tpu.models.frustum import FrustumToVoxelSingleScale
        from hgsfusion_tpu.ops.grid_sample import grid_sample_2d

        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 3)).astype(np.float32))
        grid = jnp.asarray(
            rng.uniform(-1, 1, size=(1, 4, 4, 2, 3)).astype(np.float32))
        m = FrustumToVoxelSingleScale(use_depth=False)
        out = m.apply({}, feat, grid, False)
        ref = grid_sample_2d(feat, grid[..., 0:2])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_depth_weighted_matches_materialized_volume(self):
        """Factorized sampling == trilinear on the materialized frustum
        volume probs*feat (frustum_to_voxel.py + sampler.py semantics)."""
        from hgsfusion_tpu.models.frustum import FrustumToVoxelSingleScale

        rng = np.random.default_rng(1)
        h, w, d, c = 5, 6, 4, 3
        feat = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        logits = rng.normal(size=(1, h, w, d)).astype(np.float32)
        probs = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
        # interior grid points (avoid the zeros-padding boundary)
        grid = jnp.asarray(
            rng.uniform(-0.8, 0.8, size=(1, 3, 3, 2, 3)).astype(np.float32))
        m = FrustumToVoxelSingleScale(use_depth=True)
        out = np.asarray(m.apply({}, feat, grid, False, depth_probs=probs))

        # numpy oracle: trilinear on volume[d, h, w, c] = probs * feat
        vol = (np.asarray(probs)[0][..., None]
               * np.asarray(feat)[0][:, :, None, :])  # (h, w, d, c)
        g = np.asarray(grid)[0]
        uc = (g[..., 0] + 1) / 2 * (w - 1)
        vc = (g[..., 1] + 1) / 2 * (h - 1)
        dc = (g[..., 2] + 1) / 2 * (d - 1)
        expect = np.zeros(out.shape[1:], np.float32)
        for idx in np.ndindex(expect.shape[:-1]):
            u, v, dd = uc[idx], vc[idx], dc[idx]
            u0, v0, d0 = int(np.floor(u)), int(np.floor(v)), int(np.floor(dd))
            acc = np.zeros(c, np.float32)
            for du in (0, 1):
                for dv in (0, 1):
                    for dz in (0, 1):
                        wu = (1 - abs(u - (u0 + du)))
                        wv = (1 - abs(v - (v0 + dv)))
                        wd = (1 - abs(dd - (d0 + dz)))
                        if min(wu, wv, wd) < 0:
                            continue
                        vv, uu, zz = v0 + dv, u0 + du, d0 + dz
                        if 0 <= vv < h and 0 <= uu < w and 0 <= zz < d:
                            acc += wu * wv * wd * vol[vv, uu, zz]
            expect[idx] = acc
        np.testing.assert_allclose(out[0], expect, atol=1e-5)


class TestMapToBEVLeftovers:
    def test_fusion_map_to_bev_resizes_and_concats(self):
        from hgsfusion_tpu.models.fusion_bev import fusion_map_to_bev

        img = jnp.ones((1, 16, 16, 5), jnp.float32)
        radar = jnp.full((1, 32, 32, 3), 2.0, jnp.float32)
        out = fusion_map_to_bev(img, radar)
        assert out.shape == (1, 16, 16, 8)
        np.testing.assert_allclose(np.asarray(out[..., :5]), 1.0)
        np.testing.assert_allclose(np.asarray(out[..., 5:]), 2.0, atol=1e-5)

    def test_height_compression_multi_scale(self):
        from hgsfusion_tpu.models.fusion_bev import HeightCompressionMultiScale

        m = HeightCompressionMultiScale(out_channels=(6, 7, 8))
        pyr = [
            jnp.ones((1, 16, 16, 8, 4), jnp.float32),
            jnp.ones((1, 8, 8, 4, 8), jnp.float32),
            jnp.ones((1, 4, 4, 2, 16), jnp.float32),
        ]
        var = m.init(jax.random.PRNGKey(0), pyr, False)
        outs = m.apply(var, pyr, False)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 6), (1, 8, 8, 7), (1, 4, 4, 8)]
        # kernel stored in torch's (C*Z, O) flatten order (Conv2DCollapse)
        assert var["params"]["down0"]["kernel"].shape == (32, 6)


class TestRPNV2:
    def test_two_level_neck_shapes(self):
        from hgsfusion_tpu.models.base_bev_backbone import RPNV2

        m = RPNV2(layer_nums=(2, 2), num_filters=(32, 64),
                  num_upsample_filters=(16, 16))
        fine = jnp.ones((1, 16, 16, 32), jnp.float32)
        coarse = jnp.ones((1, 8, 8, 64), jnp.float32)
        var = m.init(jax.random.PRNGKey(0), fine, coarse, False)
        out = m.apply(var, fine, coarse, False)
        assert out.shape == (1, 16, 16, 32)


class TestSubModuleRegistry:
    def test_all_reference_names_resolve(self):
        from hgsfusion_tpu.models.registry import resolve_sub_module

        for name in [
            "DynamicPillarFeatureNet", "Radar7PillarVFE", "SimpleSampler",
            "RadarOccupancy", "RadarOccupancy2DV2", "FrustumToVoxel",
            "FrustumToVoxelMultiScale", "Conv2DCollapse", "Fusion_MAP_TO_BEV",
            "HeightCompressionMultiScale", "BaseBEVBackbone", "RPNV2",
            "FusionAfterBEVSEDirect",
        ]:
            assert resolve_sub_module(name) is not None

    def test_unknown_name_raises(self):
        from hgsfusion_tpu.models.registry import resolve_sub_module

        with pytest.raises(KeyError):
            resolve_sub_module("NotARealModule")


class TestReviewRegressions:
    def test_occ3d_separate_leaves_voxels_untouched(self):
        """SEPARATE stores the gated copy without replacing the image
        voxels (radar_occupancy.py:174-175)."""
        from hgsfusion_tpu.models.occupancy import RadarOccupancy3D

        m = RadarOccupancy3D(radar_input_channels=8, num_z_bins=6,
                             fuse_mode="SEPARATE")
        vox = jnp.ones((1, 8, 8, 6, 4), jnp.float32)
        radar = jnp.zeros((1, 8, 8, 8), jnp.float32)
        var = m.init(jax.random.PRNGKey(0), vox, radar, False)
        fused, occ = m.apply(var, vox, radar, False)
        np.testing.assert_allclose(np.asarray(fused), 1.0)
        assert occ.shape == (1, 8, 8, 6)

    def test_occ3d_unknown_fuse_mode_raises(self):
        from hgsfusion_tpu.models.occupancy import RadarOccupancy3D

        m = RadarOccupancy3D(radar_input_channels=8, num_z_bins=6,
                             fuse_mode="Replace")  # typo'd case
        vox = jnp.ones((1, 8, 8, 6, 4), jnp.float32)
        radar = jnp.zeros((1, 8, 8, 8), jnp.float32)
        with pytest.raises(NotImplementedError):
            m.init(jax.random.PRNGKey(0), vox, radar, False)

    def test_radar7_non_square_pillars(self):
        """Non-square voxel_size bins each axis with its own size."""
        from hgsfusion_tpu.models.pillar_encoder import Radar7PillarVFE

        vfe = Radar7PillarVFE(num_filters=(8,), voxel_size=(0.5, 1.0, 5.0),
                              pc_range=(0, -2, -3, 4, 2, 2))
        # grid: nx = 4/0.5 = 8, ny = 4/1.0 = 4
        assert vfe.grid_shape == (4, 8)
        pts = np.zeros((1, 2, 7), np.float32)
        pts[0, 0] = [3.9, 1.9, 0.0, 1.0, 0, 0, 0]   # ix=7, iy=3
        pts[0, 1] = [0.1, -1.9, 0.0, 1.0, 0, 0, 0]  # ix=0, iy=0
        valid = np.ones((1, 2), bool)
        var = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                       jnp.asarray(valid), False)
        bev, occ = vfe.apply(var, jnp.asarray(pts), jnp.asarray(valid), False)
        assert bev.shape == (1, 4, 8, 8)
        occ2 = np.asarray(occ)[0, :, :, 0]
        assert occ2.sum() == 2 and occ2[3, 7] and occ2[0, 0]
