import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgsfusion_tpu.models.anchor_head import (
    add_sin_difference,
    get_direction_target,
    sigmoid_focal_loss,
    weighted_cross_entropy,
    weighted_smooth_l1,
)
from hgsfusion_tpu.models.occupancy import binary_focal_loss


class TestLossParityVsTorch:
    """Each loss reproduced against a direct torch implementation of the
    reference formulas (pcdet/utils/loss_utils.py)."""

    def test_sigmoid_focal(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.randn(2, 50, 3).astype(np.float32)
        targets = (rng.rand(2, 50, 3) > 0.7).astype(np.float32)
        weights = rng.rand(2, 50).astype(np.float32)

        got = np.asarray(sigmoid_focal_loss(jnp.array(logits), jnp.array(targets),
                                            jnp.array(weights)))
        t_in = torch.from_numpy(logits)
        t_tg = torch.from_numpy(targets)
        pred_sigmoid = torch.sigmoid(t_in)
        alpha_weight = t_tg * 0.25 + (1 - t_tg) * 0.75
        pt = t_tg * (1 - pred_sigmoid) + (1 - t_tg) * pred_sigmoid
        focal = alpha_weight * pt.pow(2.0)
        bce = torch.clamp(t_in, min=0) - t_in * t_tg + torch.log1p(
            torch.exp(-torch.abs(t_in))
        )
        want = (focal * bce * torch.from_numpy(weights).unsqueeze(-1)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_weighted_smooth_l1(self, rng):
        torch = pytest.importorskip("torch")
        pred = rng.randn(2, 40, 7).astype(np.float32)
        target = rng.randn(2, 40, 7).astype(np.float32)
        target[0, 0, 0] = np.nan  # nan targets ignored (loss_utils.py:117)
        weights = rng.rand(2, 40).astype(np.float32)
        cw = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]

        got = np.asarray(
            weighted_smooth_l1(jnp.array(pred), jnp.array(target),
                               jnp.array(weights), code_weights=cw)
        )
        t_p, t_t = torch.from_numpy(pred), torch.from_numpy(target)
        t_t = torch.where(torch.isnan(t_t), t_p, t_t)
        diff = (t_p - t_t) * torch.tensor(cw)
        n = diff.abs()
        beta = 1.0 / 9.0
        loss = torch.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)
        want = (loss * torch.from_numpy(weights).unsqueeze(-1)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_weighted_cross_entropy(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        logits = rng.randn(2, 30, 2).astype(np.float32)
        onehot = np.eye(2, dtype=np.float32)[rng.randint(0, 2, (2, 30))]
        weights = rng.rand(2, 30).astype(np.float32)
        got = np.asarray(
            weighted_cross_entropy(jnp.array(logits), jnp.array(onehot),
                                   jnp.array(weights))
        )
        t_in = torch.from_numpy(logits).permute(0, 2, 1)
        t_tg = torch.from_numpy(onehot).argmax(dim=-1)
        want = (F.cross_entropy(t_in, t_tg, reduction="none")
                * torch.from_numpy(weights)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_sin_difference(self, rng):
        a = rng.randn(2, 10, 7).astype(np.float32)
        b = rng.randn(2, 10, 7).astype(np.float32)
        b1, b2 = add_sin_difference(jnp.array(a), jnp.array(b))
        b1, b2 = np.asarray(b1), np.asarray(b2)
        np.testing.assert_allclose(
            b1[..., 6], np.sin(a[..., 6]) * np.cos(b[..., 6]), atol=1e-6
        )
        np.testing.assert_allclose(
            b2[..., 6], np.cos(a[..., 6]) * np.sin(b[..., 6]), atol=1e-6
        )
        np.testing.assert_allclose(b1[..., :6], a[..., :6])

    def test_direction_target_bins(self):
        anchors = np.zeros((1, 4, 7), np.float32)
        reg = np.zeros((1, 4, 7), np.float32)
        # rot_gt - dir_offset wrapped into [0, 2pi), bin = floor(x / pi)
        reg[0, :, 6] = [0.0, np.pi / 2, np.pi, -np.pi / 2]
        t = np.asarray(get_direction_target(jnp.array(anchors), jnp.array(reg),
                                            dir_offset=0.78539, num_bins=2))
        labels = t.argmax(-1)[0]
        # limit_period(rot-0.785, 0, 2pi) then floor(/pi):
        # 0 -> 5.50 bin 1; pi/2 -> 0.785 bin 0; pi -> 2.36 bin 0;
        # -pi/2 -> 3.93 bin 1
        assert labels.tolist() == [1, 0, 0, 1]

    def test_binary_focal_matches_reference_formula(self, rng):
        torch = pytest.importorskip("torch")
        preds = rng.rand(2, 16, 16).astype(np.float32)
        labels = (rng.rand(2, 16, 16) > 0.9).astype(np.float32)
        got = float(binary_focal_loss(jnp.array(preds), jnp.array(labels)))
        tp, tl = torch.from_numpy(preds), torch.from_numpy(labels)
        eps = 1e-7
        l1 = -0.25 * (1 - tp).pow(2) * torch.log(tp + eps) * tl
        l0 = -0.75 * tp.pow(2) * torch.log(1 - tp + eps) * (1 - tl)
        want = float((l0 + l1).mean())
        np.testing.assert_allclose(got, want, rtol=1e-5)
