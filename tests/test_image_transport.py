"""uint8 image transport (round 4): the data layer ships raw bytes and
preprocess_images normalizes on device — the values must be EXACTLY what
the old f32 [0,1] convention produced, including the zero-pad mask
semantics (ddn_template.preprocess:191-210)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgsfusion_tpu.models.resnet import preprocess_images  # noqa: E402


def test_uint8_transport_matches_f32_convention():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (2, 17, 23, 3)).astype(np.uint8)
    raw[0, :4] = 0  # collate zero padding
    raw[1, 5, 5, 1] = 0  # a single true-zero channel value
    got = np.asarray(preprocess_images(jnp.asarray(raw)))
    want = np.asarray(
        preprocess_images(jnp.asarray(raw.astype(np.float32) / 255.0)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # padded pixels stay exactly 0 on both routes
    assert (got[0, :4] == 0).all()
    assert got[1, 5, 5, 1] == 0


def test_pad_to_static_preserves_uint8():
    """The collate pad keeps uint8 images uint8 (and f32 images f32)."""
    import types

    from hgsfusion_tpu.datasets.dataset import DatasetTemplate

    stub = types.SimpleNamespace(
        image_size=(8, 10), max_points=16, max_gt_boxes=4,
        _warned_truncation=set())
    base = {"points": np.zeros((3, 5), np.float32)}
    for dtype in (np.uint8, np.float32):
        d = dict(base, images=np.full((5, 7, 3), 9, dtype))
        out = DatasetTemplate.pad_to_static(stub, d)
        assert out["images"].dtype == dtype
        assert out["images"].shape == (8, 10, 3)
        assert (out["images"][:5, :7] == 9).all()
        assert (out["images"][5:] == 0).all()
