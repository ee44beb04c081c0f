"""Parity of the Pallas f2v sampler kernels vs the XLA quad path.

Runs in Pallas interpret mode on CPU (ops/pallas_sample._interpret); the
same kernels compile for TPU unchanged. Reference semantics under test:
torch grid_sample bilinear/zeros/align_corners (pcdet f2v/sampler.py:8-37)
as realized by ops.grid_sample.grid_sample_2d_quad.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgsfusion_tpu.ops import pallas_sample
from hgsfusion_tpu.ops.grid_sample import grid_sample_2d_quad
from hgsfusion_tpu.ops.pallas_sample import grid_sample_2d_quad_pallas


def _coords(rng, shape):
    """Normalized coords incl. out-of-bounds (zeros-padding exercised)."""
    return jnp.asarray(rng.uniform(-1.3, 1.3, shape).astype(np.float32))


@pytest.fixture(autouse=True, params=["rows", "planes"])
def small_tile(monkeypatch, request):
    """Shrink the kernel tile so tiny test shapes span several grid steps;
    run every test under both table layouts (ops/pallas_sample.LAYOUT)."""
    monkeypatch.setattr(pallas_sample, "TILE", 64)
    monkeypatch.setattr(pallas_sample, "LAYOUT", request.param)


@pytest.mark.parametrize("b,h,w,c", [(1, 9, 13, 64), (2, 7, 5, 192)])
def test_forward_matches_xla_quad(b, h, w, c):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    coords = _coords(rng, (b, 10, 13, 2))
    ref = grid_sample_2d_quad(feats, coords)
    got = grid_sample_2d_quad_pallas(feats, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_forward_bf16_flagship_dtype():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 9, 13, 64)).astype(jnp.bfloat16)
    coords = _coords(rng, (1, 20, 7, 2))
    ref = grid_sample_2d_quad(feats, coords).astype(jnp.float32)
    got = grid_sample_2d_quad_pallas(feats, coords).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0.04)


def test_channel_split_passes(monkeypatch):
    """Force the channel-split path and check it still matches exactly.

    The budget math counts PHYSICAL VMEM (lane dim padded to 128), so the
    planes layout cannot split below ck=128 — its forced-split case needs
    a 256-channel table (ck=128 per pass), while rows splits 128 -> 2x64.
    """
    rng = np.random.RandomState(2)
    c = 128 if pallas_sample.LAYOUT == "rows" else 256
    feats = jnp.asarray(rng.randn(1, 6, 8, c).astype(np.float32))
    coords = _coords(rng, (1, 12, 11, 2))
    ref = grid_sample_2d_quad(feats, coords)
    p_pad = pallas_sample._round_up((6 + 1) * (8 + 1), 16)
    if pallas_sample.LAYOUT == "rows":
        budget = p_pad * 4 * 64 * 4  # exactly two f32 passes of 64ch
    else:
        budget = 4 * p_pad * 128 * 4  # two planes passes of ck=128
    monkeypatch.setattr(pallas_sample, "TABLE_BUDGET_BYTES", budget)
    assert pallas_sample._num_passes(p_pad, c, 4) == 2
    got = grid_sample_2d_quad_pallas(feats, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_planes_split_floor(monkeypatch):
    """Splitting below 128 lanes is a physical no-op for planes: the
    budget check must FAIL LOUDLY (suggesting the xla fallback) instead of
    picking a split that still over-allocates VMEM and dies in Mosaic."""
    p_pad = 1024
    floor = 4 * p_pad * 128 * 2  # bf16, ck<=128 all cost this much
    monkeypatch.setattr(pallas_sample, "TABLE_BUDGET_BYTES", floor - 1)
    with pytest.raises(ValueError, match="SAMPLER_KERNEL: xla"):
        pallas_sample._num_passes(p_pad, 128, 2, layout="planes")
    monkeypatch.setattr(pallas_sample, "TABLE_BUDGET_BYTES", floor)
    assert pallas_sample._num_passes(p_pad, 128, 2, layout="planes") == 1


def test_non_multiple_of_32_channels():
    """Widths the XLA sampler supports (e.g. 48) work via zero-channel
    padding — forward and backward."""
    rng = np.random.RandomState(8)
    feats = jnp.asarray(rng.randn(1, 7, 9, 48).astype(np.float32))
    coords = _coords(rng, (1, 8, 5, 2))
    ref = grid_sample_2d_quad(feats, coords)
    got = grid_sample_2d_quad_pallas(feats, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    g_ref = jax.grad(lambda f: jnp.sum(
        grid_sample_2d_quad(f, coords) ** 2))(feats)
    g_pal = jax.grad(lambda f: jnp.sum(
        grid_sample_2d_quad_pallas(f, coords) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_rejects_unsupported_modes():
    """SAMPLER_KERNEL: pallas must fail loudly with QUANT: int8 or the
    USE_DEPTH/ADD paths instead of silently running the XLA kernel."""
    from hgsfusion_tpu.models.frustum import FrustumToVoxelMultiScale

    rng = np.random.RandomState(9)
    feats = [jnp.asarray(rng.randn(1, 5, 7, 32).astype(np.float32))]
    grid = jnp.asarray(
        rng.uniform(-1, 1, (1, 4, 4, 3, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="int8"):
        FrustumToVoxelMultiScale(
            out_channels=16, quant="int8", sampler_kernel="pallas"
        ).init(jax.random.PRNGKey(0), feats, grid, False)
    with pytest.raises(NotImplementedError, match="CONCAT"):
        FrustumToVoxelMultiScale(
            out_channels=16, fuse_mode="ADD", sampler_kernel="pallas"
        ).init(jax.random.PRNGKey(0), feats, grid, False)


@pytest.mark.parametrize("c", [64, 192])
def test_backward_matches_xla_quad(c):
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(1, 8, 11, c).astype(np.float32))
    coords = _coords(rng, (1, 17, 9, 2))
    cot = jnp.asarray(rng.randn(1, 17, 9, c).astype(np.float32))

    def loss_ref(f):
        return jnp.sum(grid_sample_2d_quad(f, coords) * cot)

    def loss_pal(f):
        return jnp.sum(grid_sample_2d_quad_pallas(f, coords) * cot)

    g_ref = jax.grad(loss_ref)(feats)
    g_pal = jax.grad(loss_pal)(feats)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_coords_grad_is_zero():
    """Documented deviation: the sampling grid is calibration geometry and
    receives zero cotangent from the pallas path."""
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(1, 8, 11, 64).astype(np.float32))
    coords = _coords(rng, (1, 6, 5, 2))
    g = jax.grad(
        lambda cc: jnp.sum(grid_sample_2d_quad_pallas(feats, cc)))(coords)
    assert float(jnp.abs(g).max()) == 0.0


def test_remat_composes_with_pallas_vjp():
    """The flagship wraps f2v in nn.remat; jax.checkpoint around the
    pallas sampler must reproduce the unchecked gradient."""
    rng = np.random.RandomState(6)
    feats = jnp.asarray(rng.randn(1, 8, 11, 64).astype(np.float32))
    coords = _coords(rng, (1, 9, 7, 2))

    def loss(f):
        return jnp.sum(grid_sample_2d_quad_pallas(f, coords) ** 2)

    g = jax.grad(loss)(feats)
    g_remat = jax.grad(jax.checkpoint(loss))(feats)
    np.testing.assert_allclose(np.asarray(g_remat), np.asarray(g),
                               rtol=1e-6, atol=1e-6)


def test_detector_pallas_matches_xla():
    """Full HGSFusion forward with f2v_sampler_kernel='pallas' matches the
    XLA sampler with identical variables (config -> detector -> frustum
    wiring, SAMPLER_KERNEL schema key)."""
    import dataclasses

    from test_model import TINY, make_tiny_batch
    from hgsfusion_tpu.models.detector import HGSFusionModel

    rng = np.random.RandomState(7)
    batch = make_tiny_batch(rng)
    model_x = HGSFusionModel(cfg=TINY)
    model_p = HGSFusionModel(
        cfg=dataclasses.replace(TINY, f2v_sampler_kernel="pallas"))
    variables = model_x.init(jax.random.PRNGKey(0), batch, False)
    out_x, _ = model_x.apply(variables, batch, False,
                             mutable=["batch_stats"])
    out_p, _ = model_p.apply(variables, batch, False,
                             mutable=["batch_stats"])
    for k in out_x:
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_x[k]),
            rtol=1e-4, atol=1e-4, err_msg=k)


def test_f2v_module_pallas_matches_xla():
    """FrustumToVoxelMultiScale end-to-end: sampler_kernel=pallas equals
    the XLA path with identical params (grouped gathers + reduce + BN)."""
    from hgsfusion_tpu.models.frustum import FrustumToVoxelMultiScale

    rng = np.random.RandomState(5)
    feats = [
        jnp.asarray(rng.randn(1, 9, 13, 32).astype(np.float32)),
        jnp.asarray(rng.randn(1, 5, 7, 32).astype(np.float32)),
        jnp.asarray(rng.randn(1, 5, 7, 32).astype(np.float32)),
    ]
    grid = jnp.asarray(
        rng.uniform(-1.2, 1.2, (1, 6, 7, 5, 3)).astype(np.float32))

    mod_x = FrustumToVoxelMultiScale(out_channels=32)
    mod_p = FrustumToVoxelMultiScale(out_channels=32,
                                     sampler_kernel="pallas")
    params = mod_x.init(jax.random.PRNGKey(0), feats, grid, False)
    out_x = mod_x.apply(params, feats, grid, False)
    out_p = mod_p.apply(params, feats, grid, False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
