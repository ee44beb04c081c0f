"""Polar-factorized f2v (models/polar_f2v.py) vs the exact gather path.

The polar path is an algorithmic replacement for FrustumGridGenerator +
FrustumToVoxelMultiScale + Conv2DCollapse (reference semantics
pcdet/.../f2v/frustum_to_voxel_multi_scale.py:86-96 then
radar_occupancy_2d_v2.py:53-84). Its docstring enumerates the exact
properties and the controlled approximations; this file pins each one:

  * geometry: v(u, zeta, z) is exactly affine in u; (u, zeta) -> (x, y)
    solve round-trips; hat-weights == zeros-padded 2-tap lerp.
  * parameter tree: identical to the gather path's (checkpoints move
    freely between the two).
  * near-field columns: bit-level-tight parity (the side path runs the
    same quad sampler on reduced maps; sample(f) @ K == sample(f @ K)).
  * far field: error is a controlled sub-pixel blur — tight for smooth
    feature maps, bounded correlation for white noise (worst case).
  * full detector: F2V.VIEW polar builds, runs eval + train (grads flow,
    BN stats update), and rejects the unsupported option combos.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgsfusion_tpu.models import polar_f2v as P
from hgsfusion_tpu.models.frustum import (
    FrustumGridGenerator,
    FrustumToVoxelMultiScale,
)
from hgsfusion_tpu.models.occupancy import Conv2DCollapse

GRID = (64, 48, 8)  # nx, ny, nz
PC = (0.0, -12.8, -2.0, 25.6, 12.8, 1.2)
IMG = (64, 96)  # H, W
OUTC = 32
BEVC = 24
DISC = {"mode": "LID", "depth_min": 1.0, "depth_max": 25.0, "num_bins": 16}


def _calib(b, tilt=0.0):
    """Forward-facing rig in the parity-test family
    (tests/test_reference_parity.py::_wg_batch); optional pitch tilt makes
    every z_ref/shear approximation term nonzero."""
    l2c = np.array(
        [[0, -1, 0, 0.05], [0, 0, -1, -0.1], [1, 0, 0, 0.2], [0, 0, 0, 1]],
        np.float32,
    )
    if tilt:
        c, s = np.cos(tilt), np.sin(tilt)
        rot = np.array(
            [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
            np.float32,
        )
        l2c = rot @ l2c
    h, w = IMG
    f = 10.0 * w / 48.0
    c2i = np.array(
        [[f, 0, w / 2, 1.0], [0, f, h / 2, -0.5], [0, 0, 1, 0.002]],
        np.float32,
    )
    return (
        np.tile(l2c, (b, 1, 1)),
        np.tile(c2i, (b, 1, 1)),
    )


def _feats(rng, b, smooth=False):
    """Two scale groups: /4 (64ch) and /8 (64ch) maps, like the flagship's
    reduced tap layout. smooth=True builds low-frequency maps (resampling
    approximations vanish); False is white noise (worst case)."""
    h, w = IMG
    shapes = [(b, h // 4, w // 4, 64), (b, h // 8, w // 8, 64)]
    out = []
    for s in shapes:
        x = rng.randn(*s).astype(np.float32)
        if smooth:
            yy = np.linspace(0, 4, s[1])[None, :, None, None]
            xx = np.linspace(0, 4, s[2])[None, None, :, None]
            cc = np.linspace(0, 3, s[3])[None, None, None, :]
            x = np.sin(yy + cc) * np.cos(xx - cc) + 0.1 * np.tanh(x)
        out.append(jnp.asarray(x, jnp.float32))
    return out


class _Gather(nn.Module):
    @nn.compact
    def __call__(self, feats, l2c, c2i, train):
        grid = FrustumGridGenerator(GRID, PC, DISC)(l2c, c2i, IMG)
        vox = FrustumToVoxelMultiScale(out_channels=OUTC, name="f2v")(
            feats, grid, train
        )
        return Conv2DCollapse(num_bev_features=BEVC, name="map_to_bev")(
            vox, train
        )


class _Polar(nn.Module):
    zeta_bins: int = 256
    near_columns: int = 8

    @nn.compact
    def __call__(self, feats, l2c, c2i, train):
        return P.polar_image_bev(
            P._F2VScope(
                sum_channels=sum(f.shape[-1] for f in feats),
                out_channels=OUTC, name="f2v",
            ),
            P._CollapseScope(
                in_channels=OUTC, nz=GRID[2], out_channels=BEVC,
                name="map_to_bev",
            ),
            feats, l2c, c2i, IMG, None, train,
            grid_size=GRID, pc_range=PC, zeta_bins=self.zeta_bins,
            near_columns=self.near_columns,
        )


def _init_pair(rng, feats, l2c, c2i, **polar_kw):
    """Init both paths; assert tree compatibility; randomize shared BN
    running stats so eval mode exercises them."""
    key = jax.random.PRNGKey(0)
    gv = _Gather().init(key, feats, l2c, c2i, False)
    pm = _Polar(**polar_kw)
    pv = pm.init(key, feats, l2c, c2i, False)
    gp = jax.tree_util.tree_structure(gv["params"])
    pp = jax.tree_util.tree_structure(pv["params"])
    assert gp == pp, f"param trees diverge:\n{gp}\nvs\n{pp}"
    assert jax.tree_util.tree_structure(
        gv["batch_stats"]
    ) == jax.tree_util.tree_structure(pv["batch_stats"])
    # nontrivial BN affine + running stats (same values for both paths)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, x.shape), jnp.float32
        ) * jnp.sign(x + 0.5) + jnp.asarray(
            rng.uniform(-0.2, 0.2, x.shape), jnp.float32
        ),
        gv,
    )
    # variances must stay positive
    variables = jax.tree_util.tree_map(jnp.abs, variables)
    return variables, pm


# ---------------------------------------------------------------- geometry


def test_v_exact_matches_direct_projection():
    rng = np.random.RandomState(1)
    l2c, c2i = _calib(1, tilt=0.13)
    m = (c2i[0] @ l2c[0]).astype(np.float64)
    z_ref = 0.5 * (PC[2] + PC[5])
    for _ in range(50):
        x = rng.uniform(1.0, 25.0)
        y = rng.uniform(-12.0, 12.0)
        z = rng.uniform(PC[2], PC[5])
        u, zeta = P._project_uv_zeta(jnp.asarray(m), x, y, z_ref)
        # round-trip (u, zeta) -> (x, y)
        xs, ys = P._solve_cell(jnp.asarray(m), u, zeta, z_ref)
        np.testing.assert_allclose(float(xs), x, rtol=1e-5)
        np.testing.assert_allclose(float(ys), y, rtol=1e-5, atol=1e-5)
        # exact v reproduces the direct projection at any height z
        v = P._v_exact(jnp.asarray(m), u, zeta, z, z_ref)
        p = m @ np.array([x, y, z, 1.0])
        np.testing.assert_allclose(float(v), p[1] / p[2], rtol=1e-5)


def test_v_is_affine_in_u():
    """The whole polar factorization rests on v(u, zeta, z) being affine in
    u for fixed (zeta, z) — check to float64 tightness on a tilted rig."""
    l2c, c2i = _calib(1, tilt=0.2)
    m = jnp.asarray((c2i[0] @ l2c[0]).astype(np.float64))
    z_ref = 0.5 * (PC[2] + PC[5])
    us = jnp.linspace(-40.0, 130.0, 9).astype(jnp.float64)
    for zeta in (0.05, 0.2, 0.8):
        for z in (PC[2], z_ref, PC[5]):
            v = np.array(P._v_exact(m, us, zeta, z, z_ref))
            slopes = np.diff(v) / np.diff(np.array(us))
            np.testing.assert_allclose(slopes, slopes[0], rtol=1e-9,
                                       atol=1e-9)


def test_hat_weights_equal_zero_padded_lerp():
    from hgsfusion_tpu.ops.grid_sample import grid_sample_2d

    rng = np.random.RandomState(2)
    col = jnp.asarray(rng.randn(1, 10, 1, 3).astype(np.float32))
    v0 = jnp.asarray(
        rng.uniform(-1.5, 10.5, (17,)).astype(np.float32)
    )
    w = P._hat_weights(v0, 10)  # (17, 10)
    got = jnp.einsum("ph,bhwc->bpwc", w, col)[0, :, 0]
    coords = jnp.stack(
        [jnp.zeros_like(v0), v0 / 9.0 * 2.0 - 1.0], axis=-1
    )[None]
    want = grid_sample_2d(col, coords)[0]
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_shear_rows_zero_shift_is_identity():
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(2, 12, 5, 4).astype(np.float32))
    out = P._shear_rows(src, jnp.zeros((2, 5), jnp.float32))
    np.testing.assert_allclose(np.array(out), np.array(src), atol=1e-6)
    # fractional shift lerps; integer shift shifts with zero fill
    out1 = P._shear_rows(src, jnp.full((2, 5), 1.0, jnp.float32))
    np.testing.assert_allclose(
        np.array(out1[:, :-1]), np.array(src[:, 1:]), atol=1e-6
    )
    np.testing.assert_allclose(np.array(out1[:, -1]), 0.0, atol=1e-6)


# ------------------------------------------------------------------ parity


def _run_pair(rng, smooth, tilt=0.0, train=False, **polar_kw):
    b = 2
    l2c, c2i = _calib(b, tilt=tilt)
    feats = _feats(rng, b, smooth=smooth)
    variables, pm = _init_pair(rng, feats, l2c, c2i, **polar_kw)
    kw = dict(mutable=["batch_stats"]) if train else {}
    g = _Gather().apply(variables, feats, l2c, c2i, train, **kw)
    p = pm.apply(variables, feats, l2c, c2i, train, **kw)
    if train:
        return (g[0], p[0]), (g[1], p[1])
    return g, p


def test_near_field_columns_match_gather_path_tightly():
    """First near_columns BEV columns run the exact side path: identical
    quad sampling on reduced maps (sample(f) @ K == sample(f @ K))."""
    rng = np.random.RandomState(4)
    g, p = _run_pair(rng, smooth=False, near_columns=8)
    gn = np.array(g[:, :, :8], np.float64)
    pn = np.array(p[:, :, :8], np.float64)
    scale = np.abs(gn).max()
    np.testing.assert_allclose(pn, gn, atol=2e-3 * scale)


def test_far_field_smooth_features_tight():
    """Smooth maps: every sub-pixel approximation term is tiny -> the polar
    BEV tracks the exact gather BEV closely."""
    rng = np.random.RandomState(5)
    g, p = _run_pair(rng, smooth=True, near_columns=8, zeta_bins=256)
    gf = np.array(g[:, :, 8:], np.float64).ravel()
    pf = np.array(p[:, :, 8:], np.float64).ravel()
    rel = np.linalg.norm(pf - gf) / (np.linalg.norm(gf) + 1e-9)
    assert rel < 0.05, f"smooth far-field rel L2 {rel:.4f}"


def test_far_field_white_noise_bounded():
    """White-noise maps are the resampling worst case; the polar BEV must
    still be a high-correlation reconstruction, not garbage."""
    rng = np.random.RandomState(6)
    g, p = _run_pair(rng, smooth=False, near_columns=8, zeta_bins=256)
    gf = np.array(g[:, :, 8:], np.float64).ravel()
    pf = np.array(p[:, :, 8:], np.float64).ravel()
    corr = np.corrcoef(gf, pf)[0, 1]
    assert corr > 0.97, f"white-noise far-field corr {corr:.4f}"
    rel = np.linalg.norm(pf - gf) / (np.linalg.norm(gf) + 1e-9)
    assert rel < 0.25, f"white-noise far-field rel L2 {rel:.4f}"


def test_tilted_rig_still_tracks():
    """Pitch tilt switches on every z_ref/shear residual term; errors must
    stay controlled (the docstring bounds them at O(tilt))."""
    rng = np.random.RandomState(7)
    g, p = _run_pair(rng, smooth=True, tilt=0.05, near_columns=8,
                     zeta_bins=256)
    gf = np.array(g, np.float64).ravel()
    pf = np.array(p, np.float64).ravel()
    rel = np.linalg.norm(pf - gf) / (np.linalg.norm(gf) + 1e-9)
    assert rel < 0.12, f"tilted-rig rel L2 {rel:.4f}"


def test_zeta_bins_convergence():
    """More zeta nodes -> strictly better far-field reconstruction (the
    blur is controlled by the node density, as documented)."""
    rng = np.random.RandomState(8)
    rels = []
    for jb in (24, 96, 384):
        g, p = _run_pair(np.random.RandomState(8), smooth=False,
                         near_columns=8, zeta_bins=jb)
        gf = np.array(g[:, :, 8:], np.float64).ravel()
        pf = np.array(p[:, :, 8:], np.float64).ravel()
        rels.append(np.linalg.norm(pf - gf) / np.linalg.norm(gf))
    assert rels[0] > rels[1] > rels[2], f"no convergence: {rels}"


def test_train_mode_runs_and_updates_stats():
    rng = np.random.RandomState(9)
    (g, p), (gs, ps) = _run_pair(rng, smooth=True, train=True,
                                 near_columns=8)
    # outputs finite, stats updated away from init on both paths
    assert np.isfinite(np.array(p)).all()
    assert np.isfinite(np.array(g)).all()
    for tree in (gs["batch_stats"], ps["batch_stats"]):
        means = jax.tree_util.tree_leaves(tree)
        assert any(float(jnp.abs(m).sum()) > 0 for m in means)


def test_gradients_flow_through_polar_path():
    rng = np.random.RandomState(10)
    b = 1
    l2c, c2i = _calib(b)
    feats = _feats(rng, b, smooth=True)
    variables, pm = _init_pair(rng, feats, l2c, c2i, near_columns=8)

    def loss(params):
        out, _ = pm.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, l2c, c2i, True, mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.array(g)).all() for g in leaves)
    nz = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nz >= len(leaves) - 2, f"dead grads: {nz}/{len(leaves)}"


# ------------------------------------------------------------ full model


def test_config_plumbs_polar_view():
    from hgsfusion_tpu.config import load_config, model_config_from_yaml

    cfg = load_config("configs/hgsfusion_vod.yaml")
    f2v = cfg["MODEL"]["FusionVFE"]["ImageVFE"]["F2V"]
    f2v["VIEW"] = "polar"
    f2v["POLAR_ZETA_BINS"] = 32
    f2v["POLAR_NEAR_COLUMNS"] = 4
    mc = model_config_from_yaml(cfg)
    assert mc.f2v_view == "polar"
    assert mc.f2v_polar_zeta_bins == 32
    assert mc.f2v_polar_near_columns == 4


def test_full_detector_polar_tracks_gather_with_same_weights():
    """The strongest integration check: init the detector ONCE (trees are
    identical), run the full forward through both views with the SAME
    variables, and require the head outputs to track closely."""
    import dataclasses

    from hgsfusion_tpu.models.detector import HGSFusionModel
    from tests.test_model import TINY, make_tiny_batch

    rng = np.random.RandomState(12)
    batch = make_tiny_batch(rng)
    polar_cfg = dataclasses.replace(
        TINY, f2v_view="polar", f2v_polar_zeta_bins=192,
        f2v_polar_near_columns=4,
    )
    model_g = HGSFusionModel(cfg=TINY)
    model_p = HGSFusionModel(cfg=polar_cfg)
    variables = jax.jit(
        lambda: model_g.init(jax.random.PRNGKey(0), batch, False)
    )()
    v_polar = jax.jit(
        lambda: model_p.init(jax.random.PRNGKey(0), batch, False)
    )()
    assert jax.tree_util.tree_structure(
        variables["params"]
    ) == jax.tree_util.tree_structure(v_polar["params"])

    run = lambda m: m.apply(variables, batch, False,
                            mutable=["batch_stats"])[0]
    pg = jax.jit(lambda: run(model_g))()
    pp = jax.jit(lambda: run(model_p))()
    # occupancy is radar-only — the view transform cannot touch it, so it
    # must be BIT-equal, not merely correlated (including it in the corr
    # gate would dilute the check). The head outputs, which DO see the
    # camera branch, carry the correlation gate; the detection-level gate
    # lives in tests/test_polar_detection_equiv.py.
    np.testing.assert_array_equal(np.array(pg["occupancy"]),
                                  np.array(pp["occupancy"]))
    for key in ("cls_preds", "box_preds"):
        a = np.array(pg[key], np.float64).ravel()
        b = np.array(pp[key], np.float64).ravel()
        assert np.isfinite(b).all()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.95, f"{key} corr {corr:.4f}"


def test_detector_rejects_polar_with_gather_only_options():
    """VIEW polar covers the USE_DEPTH False CONCAT/XLA path; combining it
    with QUANT int8 or the pallas sampler must fail loudly."""
    import dataclasses

    from hgsfusion_tpu.models.detector import HGSFusionModel
    from tests.test_model import TINY, make_tiny_batch

    batch = make_tiny_batch(np.random.RandomState(13))
    for bad_kw in ({"f2v_quant": "int8"},
                   {"f2v_sampler_kernel": "pallas"}):
        bad = dataclasses.replace(TINY, f2v_view="polar", **bad_kw)
        model = HGSFusionModel(cfg=bad)
        with pytest.raises(ValueError, match="polar"):
            model.init(jax.random.PRNGKey(0), batch, False)


def test_polar_rejects_bad_zeta_bins():
    rng = np.random.RandomState(14)
    l2c, c2i = _calib(1)
    feats = _feats(rng, 1)
    with pytest.raises(ValueError, match="zeta_bins"):
        _Polar(zeta_bins=1).init(
            jax.random.PRNGKey(0), feats, l2c, c2i, False
        )
