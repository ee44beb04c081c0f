"""End-to-end RHGM: mask sources -> virtual points -> loader-consumable
files (VERDICT r1 #5 — the reference's image->masks->points path,
hybrid_radar_pts_vod.py __main__:418-468).

The Mask2Former-class model itself is external to the vendored reference
(detectron2/Mask2Former), so its tests are oracle tests: shape/semantics
invariants and the detectron2 postprocess contract, not weight parity.
"""
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

TINY = dict(embed_dims=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            window_size=4, hidden_dim=64, num_queries=20, dec_layers=3,
            dim_feedforward=128)


@pytest.fixture(scope="module")
def tiny_m2f():
    from hgsfusion_tpu.rhgm.mask2former import Mask2FormerInstance

    model = Mask2FormerInstance(**TINY)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, False)
    return model, variables


class TestMask2Former:
    def test_forward_shapes(self, tiny_m2f):
        model, variables = tiny_m2f
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3))
        out = jax.jit(lambda v, x: model.apply(v, x, False))(variables, img)
        assert out["pred_logits"].shape == (1, 20, 9)  # Q, K+1
        assert out["pred_masks"].shape == (1, 20, 16, 24)  # stride 4
        assert np.isfinite(np.asarray(out["pred_logits"])).all()
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    def test_sine_position_embedding_matches_detectron2(self):
        """Oracle re-derivation of PositionEmbeddingSine (normalize=True,
        scale=2*pi) for a couple of hand-computed entries."""
        from hgsfusion_tpu.rhgm.mask2former import sine_position_embedding

        pe = sine_position_embedding(4, 6, 8)
        assert pe.shape == (4, 6, 8)
        # channel layout: first half y, second half x; within each half the
        # detectron2 interleave is sin on even source dims, cos on odd
        y0 = 1 / (4 + 1e-6) * 2 * np.pi
        np.testing.assert_allclose(pe[0, 0, 0], np.sin(y0), rtol=1e-5)
        # cos(y0) ~ 0 here (y0 ~ pi/2): float32 pi truncation makes
        # the relative error meaningless, compare absolutely
        np.testing.assert_allclose(pe[0, 0, 1], np.cos(y0), atol=1e-6)
        x0 = 1 / (6 + 1e-6) * 2 * np.pi
        np.testing.assert_allclose(pe[0, 0, 4], np.sin(x0), rtol=1e-5)
        # embedding is constant along the orthogonal axis: x channels (4)
        # don't vary with h, y channels (0) don't vary with w
        np.testing.assert_allclose(pe[0, :, 4], pe[3, :, 4], rtol=1e-6)
        np.testing.assert_allclose(pe[:, 0, 0], pe[:, 3, 0], rtol=1e-6)

    def test_masked_attention_respects_mask(self):
        """A query whose predicted mask excludes a pixel region must not
        attend there: perturbing ONLY the masked-out pixels' features
        cannot change that query's cross-attention output."""
        from hgsfusion_tpu.rhgm.mask2former import _MHA

        mha = _MHA(channels=16, heads=2)
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16))
        variables = mha.init(jax.random.PRNGKey(2), q, k, k)
        key_mask = jnp.zeros((1, 3, 10), bool).at[:, 0, 5:].set(True)
        out1 = mha.apply(variables, q, k, k, key_mask=key_mask)
        k2 = k.at[:, 5:].add(100.0)
        out2 = mha.apply(variables, q, k2, k2, key_mask=key_mask)
        np.testing.assert_allclose(
            np.asarray(out1[0, 0]), np.asarray(out2[0, 0]), atol=1e-5)
        assert np.abs(np.asarray(out1[0, 1] - out2[0, 1])).max() > 1e-3

    def test_instance_inference_contract(self):
        """detectron2 instance_inference semantics: top-k (query, class)
        pairs, score = class prob x mean in-mask sigmoid, empty masks get
        score 0 (the reference postprocess drops them,
        hybrid_radar_pts_vod.py:327-331)."""
        from hgsfusion_tpu.rhgm.mask2former import instance_inference

        q, k = 4, 3
        logits = np.full((1, q, k + 1), -10.0, np.float32)
        logits[0, 0, 1] = 10.0   # query 0 -> class 1, confident
        logits[0, 1, 2] = 10.0   # query 1 -> class 2, confident, EMPTY mask
        masks = np.full((1, q, 8, 8), -5.0, np.float32)
        masks[0, 0, :4] = 5.0    # top half positive
        labels, scores, binary = instance_inference(
            jnp.asarray(logits), jnp.asarray(masks), (16, 16), topk=q * k)
        labels, scores, binary = map(np.asarray, (labels, scores, binary))
        assert labels[0] == 1 and scores[0] > 0.9
        assert binary[0, :8].all() and not binary[0, 8:].any()
        # the empty-mask confident query scores 0 wherever it landed
        empty_rank = np.where(labels == 2)[0][0]
        assert scores[empty_rank] == 0.0 and not binary[empty_rank].any()

    def test_large_preset_param_scale(self):
        """The default config is the reference's swin-L scale
        (hybrid_radar_pts_vod.py:54): embed 192, 100 queries, 9 layers."""
        from hgsfusion_tpu.rhgm.mask2former import Mask2FormerInstance

        m = Mask2FormerInstance()
        assert m.embed_dims == 192 and m.depths == (2, 2, 18, 2)
        assert m.num_queries == 100 and m.dec_layers == 9


def _make_tree(tmp_path, image_hw=(64, 96)):
    from hgsfusion_tpu.datasets.synthetic import make_synthetic_kitti

    root = tmp_path / "tree"
    make_synthetic_kitti(root, num_frames=2, num_points=128,
                         image_hw=image_hw)
    return root


def _run_cli(args):
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/generate_hybrid_points.py")]
        + args,
        capture_output=True, text=True, cwd=str(REPO),
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r


class TestGenerateHybridPointsCLI:
    def test_gtbox_source_end_to_end(self, tmp_path):
        root = _make_tree(tmp_path)
        out = tmp_path / "virtual_points"
        _run_cli(["--dataset", "vod", "--data_root", str(root),
                  "--pts_save_path", str(out), "--mask_source", "gtbox",
                  "--image_hw", "64", "96"])
        files = sorted(out.glob("*.pkl.npy"))
        assert len(files) == 2
        d = np.load(files[0], allow_pickle=True).item()
        assert set(d) == {"virtual_points", "real_points"}
        # layout: xyz(3) + radar feats(4) + one-hot(8) = 15 columns, the
        # exact shape vod_dataset.get_virtual_point consumes
        assert d["virtual_points"].shape[1] == 15
        assert d["real_points"].shape[1] == 15
        assert d["virtual_points"].shape[0] > 0
        onehot = d["virtual_points"][:, 7:]
        np.testing.assert_allclose(onehot.sum(axis=1), 1.0)

    def test_precomputed_source_and_loader_roundtrip(self, tmp_path):
        """Precomputed-masks path; the outputs feed the actual dataset
        loader (kitti_base.get_virtual_points convention)."""
        root = _make_tree(tmp_path)
        masks_dir = tmp_path / "m2f"
        masks_dir.mkdir()
        rng = np.random.RandomState(0)
        for idx in ("00000", "00001"):
            masks = np.zeros((2, 64, 96), bool)
            masks[0, 10:40, 20:60] = True
            masks[1, 30:60, 50:90] = True
            np.savez(masks_dir / f"{idx}.npz", masks=masks,
                     labels=np.array([2, 0]),
                     scores=rng.uniform(0.6, 0.9, 2))
        out = root / "training" / "virtual_points_pre"
        _run_cli(["--dataset", "vod", "--data_root", str(root),
                  "--pts_save_path", str(out), "--mask_source",
                  "precomputed", "--masks_dir", str(masks_dir),
                  "--image_hw", "64", "96"])

        d = np.load(out / "00000.pkl.npy", allow_pickle=True).item()
        assert d["virtual_points"].shape[1] == 15
        # classes carried through: bin 2 (car) and bin 0 (person) only
        used_bins = np.nonzero(d["virtual_points"][:, 7:].sum(axis=0))[0]
        assert set(used_bins).issubset({0, 2})

        from test_datasets import _small_vod_cfg

        from hgsfusion_tpu.datasets.vod import VODDataset

        cfg = _small_vod_cfg(root)
        cfg["VIRTUAL_POINT_PREFIX"] = "virtual_points_pre"
        ds = VODDataset(cfg, class_names=["Car", "Pedestrian", "Cyclist"],
                        training=True)
        if not ds.infos:
            ds.create_infos(splits=("train", "val"))
            ds.load_infos()
        virtual, real = ds.get_virtual_points("00000")
        assert virtual.shape[1] == 15 and virtual.shape[0] > 0
        item = ds[0]  # full __getitem__ consumes the generated files
        assert item["points"].shape[0] > 0

    def test_model_source_end_to_end(self, tmp_path):
        """The full image -> Mask2Former -> masks -> virtual points path
        (tiny preset, random weights — pipeline validation)."""
        root = _make_tree(tmp_path)
        out = tmp_path / "virtual_points_model"
        r = _run_cli(["--dataset", "vod", "--data_root", str(root),
                      "--pts_save_path", str(out), "--mask_source", "model",
                      "--model_preset", "tiny", "--image_hw", "64", "96",
                      "--confidence_threshold", "0.0", "--max_frames", "1"])
        assert "RANDOMLY INITIALIZED" in r.stdout
        d = np.load(out / "00000.pkl.npy", allow_pickle=True).item()
        assert set(d) == {"virtual_points", "real_points"}
        assert d["virtual_points"].shape[1] == 15

    def test_model_source_with_published_ckpt_format(self, tmp_path):
        """image -> CONVERTED published-format checkpoint -> masks ->
        virtual points: a detectron2 .pkl with the real key structure
        (tests/ref_mask2former.py) drives --mask_source model --ckpt,
        including the reference's ResizeShortestEdge step."""
        import pickle

        import torch

        from ref_mask2former import Mask2FormerTorch

        torch.manual_seed(3)
        ref = Mask2FormerTorch(
            embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            window_size=4, hidden_dim=64, num_queries=20, nheads=8,
            dim_feedforward=128, dec_layers=3, enc_layers=2, num_classes=8)
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        ckpt = tmp_path / "model_final.pkl"
        with open(ckpt, "wb") as f:
            pickle.dump({"model": state}, f)

        root = _make_tree(tmp_path)
        out = tmp_path / "virtual_points_ckpt"
        r = _run_cli(["--dataset", "vod", "--data_root", str(root),
                      "--pts_save_path", str(out), "--mask_source", "model",
                      "--model_preset", "tiny", "--image_hw", "64", "96",
                      "--ckpt", str(ckpt), "--resize_shortest", "80",
                      "--confidence_threshold", "0.0", "--max_frames", "1"])
        assert "imported" in r.stdout, r.stdout + r.stderr
        assert "incomplete" not in r.stdout, r.stdout
        d = np.load(out / "00000.pkl.npy", allow_pickle=True).item()
        assert d["virtual_points"].shape[1] == 15
