"""Mask2Former checkpoint import: torch (published key structure) -> flax.

The oracle is tests/ref_mask2former.py — a torch mini-implementation whose
state_dict() is structurally identical to the published swin-L checkpoint's
"model" dict (same module paths, same packing: microsoft-swin PatchMerging
order, MultiheadAttention in_proj, d2 norm-fused convs). A randomly
initialized torch model is converted with convert_mask2former_state and the
two forwards must agree elementwise — validating every transposition and
the patch-merge permutation end to end.
"""
import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hgsfusion_tpu.rhgm.mask2former import Mask2FormerInstance  # noqa: E402
from hgsfusion_tpu.train.torch_convert import (  # noqa: E402
    convert_mask2former_state,
    load_d2_checkpoint,
)

TINY = dict(embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            window_size=4, hidden_dim=32, num_queries=10, nheads=8,
            dim_feedforward=64, dec_layers=3, enc_layers=2, num_classes=8)


def _torch_model():
    from ref_mask2former import Mask2FormerTorch

    torch.manual_seed(11)
    m = Mask2FormerTorch(**TINY)
    m.eval()
    return m


def _flax_model():
    return Mask2FormerInstance(
        embed_dims=TINY["embed_dim"], depths=TINY["depths"],
        num_heads=TINY["num_heads"], window_size=TINY["window_size"],
        hidden_dim=TINY["hidden_dim"], num_queries=TINY["num_queries"],
        dec_heads=TINY["nheads"], dec_layers=TINY["dec_layers"],
        dim_feedforward=TINY["dim_feedforward"],
        pixel_decoder="msdeform", pd_enc_layers=TINY["enc_layers"],
        pd_ffn=TINY["hidden_dim"] * 4, num_classes=TINY["num_classes"])


class TestMask2FormerConvert:
    def test_full_model_parity(self):
        """Converted weights: whole-model forward equals torch elementwise
        on a non-divisible image size (exercises window padding, odd patch
        merges, deformable sampling, masked decoder attention)."""
        ref = _torch_model()
        rng = np.random.RandomState(5)
        img = rng.randn(1, 3, 52, 76).astype(np.float32)
        with torch.no_grad():
            want_cls, want_masks = ref(torch.from_numpy(img))

        ours = _flax_model()
        variables = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(img.transpose(0, 2, 3, 1)), False)
        state = {k: v.detach().numpy()
                 for k, v in ref.state_dict().items()}
        variables, report = convert_mask2former_state(state, variables)
        assert report["missing"] == [], report["missing"][:10]
        assert report["unmatched"] == [], report["unmatched"][:10]

        out = ours.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                         False)
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]), want_cls.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["pred_masks"]), want_masks.numpy(), atol=2e-4)

    def test_pkl_roundtrip(self, tmp_path):
        """The published weights ship as a detectron2 .pkl with a "model"
        dict of numpy arrays — load_d2_checkpoint must read it."""
        import pickle

        ref = _torch_model()
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        p = tmp_path / "model_final.pkl"
        with open(p, "wb") as f:
            pickle.dump({"model": state, "__author__": "test"}, f)
        loaded = load_d2_checkpoint(p)
        assert set(loaded) == set(state)
        np.testing.assert_array_equal(
            loaded["backbone.patch_embed.proj.weight"],
            state["backbone.patch_embed.proj.weight"])
