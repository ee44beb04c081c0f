"""Mask2Former-class instance segmentation — the RHGM mask source.

The reference's offline hybrid-point generator runs a pretrained
Mask2Former (hybrid_radar_pts_vod.py:20-24 imports detectron2 +
mask2former; the predictor is invoked in process_one_frame:381 and its
instances are flattened by postprocess:319-334). The model itself lives
outside the reference tree (facebookresearch/Mask2Former), so there is no
vendored module to parity-test against; this is a from-scratch flax
implementation of the same architecture family, oracle-tested.

Architecture (Mask2Former, Cheng et al. 2022):
- backbone: SwinTransformer (reused from models/swin.py — the reference
  config is swin-L cityscapes instance, maskformer2_swin_large_IN21k
  per hybrid_radar_pts_vod.py:54);
- pixel decoder: TWO variants, selected by `pixel_decoder`:
  * "msdeform" (default) — MSDeformAttnPixelDecoder, the decoder the
    reference's swin-L checkpoint was trained with: 6-layer deformable-
    attention encoder over res5/res4/res3 + one FPN step onto res2.
    Required for importing the published weights
    (train/torch_convert.py convert_mask2former_state).
  * "fpn" — BasePixelDecoder (lateral 1x1 + GN, top-down sum, 3x3 + GN +
    ReLU per level). Gather-free, the TPU-friendliest choice for
    self-trained weights — deformable attention's per-pixel bilinear
    taps are a scattered-gather pattern; fine for this offline tool,
    wrong for a hot path.
- transformer decoder: 100 learned queries, 9 post-norm layers cycling
  over the 3 lowest-resolution pixel-decoder scales, each layer =
  masked cross-attention (attention restricted to the foreground of the
  previous layer's mask prediction) -> self-attention -> FFN, with sine
  positional embeddings on pixels and learned embeddings on queries;
- prediction heads applied to the (layer-normed) queries: linear class
  head over K+1 (cityscapes instance K=8: person, rider, car, truck,
  bus, train, motorcycle, bicycle — the one-hot bin order the .pkl.npy
  label columns use, hybrid_radar_pts_vod.py:340-355/371-375), 3-layer
  MLP mask head dotted with the mask features.

Everything is static-shape: Q=100 queries, fixed top-k instances, fixed
image size per trace — the whole forward jits onto the MXU (attention and
mask einsums are batched matmuls; mask resizing is the torch-exact
gather-free bilinear from models/layers.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import resize_bilinear
from ..models.swin import SwinTransformer

# Cityscapes instance classes, index == one-hot label bin of the RHGM
# output files (postprocess keeps the raw pred_classes; one_hot_labels is
# 10-wide but columns 3:11 of the saved layout crop it back to these 8).
CITYSCAPES_THINGS = (
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
)


def sine_position_embedding(h: int, w: int, channels: int,
                            temperature: float = 10000.0):
    """2-D sine positional embedding, detectron2 PositionEmbeddingSine
    semantics (normalize=True, scale=2*pi): (h, w, channels) constant."""
    half = channels // 2
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None]
         / (h + eps) * 2 * np.pi)
    x = (np.arange(1, w + 1, dtype=np.float32)[None, :]
         / (w + eps) * 2 * np.pi)
    dim_t = temperature ** (2 * (np.arange(half, dtype=np.float32) // 2)
                            / half)
    pos_x = np.broadcast_to(x[..., None], (h, w, half)) / dim_t
    pos_y = np.broadcast_to(y[..., None], (h, w, half)) / dim_t
    # interleave sin/cos over pairs, then (pos_y, pos_x) along channels
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                     axis=-1).reshape(h, w, half)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                     axis=-1).reshape(h, w, half)
    return np.concatenate([pos_y, pos_x], axis=-1)


class _ConvGN(nn.Module):
    """Conv2d + GroupNorm(32) (+ optional ReLU) — the pixel-decoder unit."""

    features: int
    kernel: int = 3
    relu: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="gn")(x)
        return nn.relu(x) if self.relu else x


class PixelDecoderFPN(nn.Module):
    """BasePixelDecoder: top-down FPN over the backbone pyramid.

    inputs: NHWC features highest-stride LAST ([res2, res3, res4, res5]).
    Returns (mask_features (B, H/4, W/4, mask_dim), [3 lowest-res decoder
    maps, lowest resolution first] for the transformer decoder).
    """

    conv_dim: int = 256
    mask_dim: int = 256
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        n = len(inputs)
        y = _ConvGN(self.conv_dim, dtype=self.dtype,
                    name=f"output_{n - 1}")(inputs[-1])
        outs = [y]
        for i in range(n - 2, -1, -1):
            lat = _ConvGN(self.conv_dim, kernel=1, relu=False,
                          dtype=self.dtype, name=f"lateral_{i}")(inputs[i])
            y = lat + resize_bilinear(y, lat.shape[1:3])
            y = _ConvGN(self.conv_dim, dtype=self.dtype,
                        name=f"output_{i}")(y)
            outs.append(y)
        mask_features = nn.Conv(self.mask_dim, (3, 3), dtype=self.dtype,
                                name="mask_features")(outs[-1])
        return mask_features, outs[:3]  # strides 32, 16, 8


def _deform_sample_level(value, loc):
    """Bilinear-sample one value level at deformable sampling locations.

    value: (B, H, W, heads, dh); loc: (B, Q, heads, P, 2) normalized (x, y)
    in [0, 1]. torch semantics: F.grid_sample(grid=2*loc-1, bilinear,
    padding_mode='zeros', align_corners=False) — pixel coords
    px = loc_x*W - 0.5 — exactly Deformable DETR's
    ms_deform_attn_core_pytorch (the published checkpoints were trained
    with the CUDA kernel, which matches this fallback bitwise-closely).
    Returns (B, Q, heads, P, dh).
    """
    b, h, w, nh, dh = value.shape
    q, p = loc.shape[1], loc.shape[3]
    px = loc[..., 0] * w - 0.5
    py = loc[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v = value.reshape(b, h * w, nh, dh).transpose(0, 2, 1, 3)  # (B,nh,HW,dh)
    out = jnp.zeros((b, q, nh, p, dh), value.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            idxf = idx.transpose(0, 2, 1, 3).reshape(b, nh, q * p)
            tap = jnp.take_along_axis(v, idxf[..., None], axis=2)
            tap = tap.reshape(b, nh, q, p, dh).transpose(0, 2, 1, 3, 4)
            out = out + tap * (wgt * inb)[..., None]
    return out


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (Deformable DETR, Zhu et al. 2021)
    — the self-attention of the MSDeformAttn pixel-decoder encoder.

    Param names mirror the published module (ms_deform_attn.py:
    sampling_offsets / attention_weights / value_proj / output_proj) so the
    checkpoint converter maps 1:1.
    """

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value_levels):
        """query (B, Q, C) [already pos-embedded]; reference_points
        (B, Q, n_levels, 2) normalized (x, y); value_levels: list of
        (B, H_l, W_l, C) UN-pos-embedded sources. Returns (B, Q, C)."""
        c, nh, nl, npt = self.d_model, self.n_heads, self.n_levels, \
            self.n_points
        dh = c // nh
        b, q = query.shape[:2]
        offsets = nn.Dense(nh * nl * npt * 2, dtype=self.dtype,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npt, 2)
        attn = nn.Dense(nh * nl * npt, dtype=self.dtype,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(
            attn.reshape(b, q, nh, nl * npt), axis=-1
        ).reshape(b, q, nh, nl, npt)
        value_proj = nn.Dense(c, dtype=self.dtype, name="value_proj")
        acc = jnp.zeros((b, q, nh, dh), query.dtype)
        for l, v in enumerate(value_levels):
            hl, wl = v.shape[1:3]
            val = value_proj(v).reshape(b, hl, wl, nh, dh)
            norm = jnp.asarray([wl, hl], query.dtype)
            loc = (reference_points[:, :, None, l, None, :]
                   + offsets[:, :, :, l] / norm)
            tap = _deform_sample_level(val, loc)  # (B, Q, nh, P, dh)
            acc = acc + (tap * attn[:, :, :, l, :, None]).sum(axis=3)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(
            acc.reshape(b, q, c))


class _MSDeformEncoderLayer(nn.Module):
    """MSDeformAttnTransformerEncoderLayer: deformable self-attn + FFN,
    post-norm, ReLU (msdeformattn.py encoder; d_ffn=1024)."""

    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, value_levels):
        y = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels,
            n_heads=self.n_heads, n_points=self.n_points, dtype=self.dtype,
            name="self_attn",
        )(src + pos, reference_points, value_levels)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + y)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        y = nn.Dense(self.d_model, dtype=self.dtype,
                     name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + y)


class PixelDecoderMSDeform(nn.Module):
    """MSDeformAttnPixelDecoder — the pixel decoder the published swin-L
    checkpoints actually use (mask2former/modeling/pixel_decoder/
    msdeformattn.py; selected by the reference's generation config,
    hybrid_radar_pts_vod.py:54).

    A 6-layer deformable-attention encoder runs over the 3 coarsest scales
    (res5, res4, res3 after 1x1+GN input projections), then one FPN step
    fuses the stride-8 output with res2 (adapter_1 lateral 1x1+GN,
    layer_1 3x3+GN+ReLU) and mask_features is a plain 3x3 conv.

    inputs: NHWC features stride-ascending ([res2, res3, res4, res5]).
    Returns (mask_features (B, H/4, W/4, mask_dim), [stride-32, -16, -8
    encoder maps] for the transformer decoder) — same contract as
    PixelDecoderFPN.
    """

    conv_dim: int = 256
    mask_dim: int = 256
    enc_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    d_ffn: int = 1024
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.conv_dim
        b = inputs[0].shape[0]
        # transformer levels, coarsest first: res5, res4, res3
        levels = inputs[:0:-1]
        nl = len(levels)
        srcs, poss, hws = [], [], []
        for i, f in enumerate(levels):
            # nn.Sequential(Conv2d(in, c, 1), GroupNorm(32, c)) — conv HAS
            # bias here (plain nn.Conv2d), unlike the d2 norm-fused convs
            y = nn.Conv(c, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}_conv")(f)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_{i}_gn")(y)
            h, w = y.shape[1:3]
            srcs.append(y.reshape(b, h * w, c))
            poss.append(jnp.asarray(
                sine_position_embedding(h, w, c), self.dtype
            ).reshape(1, h * w, c))
            hws.append((h, w))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nl, c))
        pos_flat = jnp.concatenate(
            [p + level_embed[i][None, None] for i, p in enumerate(poss)],
            axis=1)
        src_flat = jnp.concatenate(srcs, axis=1)
        # reference point of each query = its own normalized pixel center,
        # identical across sampling levels (valid_ratios == 1: no padding
        # mask in this single-image pipeline)
        refs = []
        for (h, w) in hws:
            ry, rx = np.meshgrid(
                (np.arange(h, dtype=np.float32) + 0.5) / h,
                (np.arange(w, dtype=np.float32) + 0.5) / w, indexing="ij")
            refs.append(np.stack([rx, ry], -1).reshape(-1, 2))
        ref_points = jnp.asarray(np.concatenate(refs, 0))[None, :, None, :]
        ref_points = jnp.broadcast_to(
            ref_points, (b, ref_points.shape[1], nl, 2)).astype(self.dtype)

        x = src_flat
        for li in range(self.enc_layers):
            # value levels are the CURRENT x re-split into maps (the encoder
            # re-reads its own output each layer)
            vals, start = [], 0
            for (h, w) in hws:
                vals.append(x[:, start:start + h * w].reshape(b, h, w, c))
                start += h * w
            x = _MSDeformEncoderLayer(
                d_model=c, d_ffn=self.d_ffn, n_levels=nl,
                n_heads=self.n_heads, n_points=self.n_points,
                dtype=self.dtype, name=f"encoder_layer_{li}",
            )(x, pos_flat, ref_points, vals)

        outs, start = [], 0
        for (h, w) in hws:
            outs.append(x[:, start:start + h * w].reshape(b, h, w, c))
            start += h * w
        # one FPN step onto stride 4 (res2): d2 norm-fused convs, bias-free
        lat = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="adapter_1")(inputs[0])
        lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                           name="adapter_1_gn")(lat)
        y = lat + resize_bilinear(outs[-1], lat.shape[1:3])
        y = nn.Conv(c, (3, 3), use_bias=False, dtype=self.dtype,
                    name="layer_1")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 dtype=self.dtype, name="layer_1_gn")(y))
        mask_features = nn.Conv(self.mask_dim, (3, 3), dtype=self.dtype,
                                name="mask_features")(y)
        return mask_features, outs  # strides 32, 16, 8


class _MHA(nn.Module):
    """Multi-head attention with an additive (B, Q, N) bool key mask."""

    channels: int
    heads: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        c, h = self.channels, self.heads
        d = c // h
        qp = nn.Dense(c, dtype=self.dtype, name="q")(q)
        kp = nn.Dense(c, dtype=self.dtype, name="k")(k)
        vp = nn.Dense(c, dtype=self.dtype, name="v")(v)
        b, nq = qp.shape[:2]
        nk = kp.shape[1]
        qp = qp.reshape(b, nq, h, d).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / np.sqrt(d)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _MaskMLP(nn.Module):
    """3-layer ReLU MLP mask head (MaskFormer MLP)."""

    hidden: int
    out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class MaskedTransformerDecoder(nn.Module):
    """MultiScaleMaskedTransformerDecoder: 100 queries, masked
    cross-attention cycling over 3 scales, post-norm, prediction head
    after every layer (the final one is returned)."""

    num_classes: int = 8
    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    num_layers: int = 9  # DEC_LAYERS 10 => 9 transformer layers
    dim_feedforward: int = 2048
    mask_dim: int = 256
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, scales, mask_features):
        c, q = self.hidden_dim, self.num_queries
        b = mask_features.shape[0]
        n_scales = len(scales)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (n_scales, c))
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (q, c))
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (q, c))

        srcs, poss, hws = [], [], []
        for i, f in enumerate(scales):
            h, w = f.shape[1:3]
            if f.shape[-1] != c:
                f = nn.Conv(c, (1, 1), dtype=self.dtype,
                            name=f"input_proj_{i}")(f)
            srcs.append(f.reshape(b, h * w, c) + level_embed[i])
            poss.append(jnp.asarray(
                sine_position_embedding(h, w, c), self.dtype
            ).reshape(1, h * w, c))
            hws.append((h, w))

        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               name="class_embed")
        mask_mlp = _MaskMLP(c, self.mask_dim, dtype=self.dtype,
                            name="mask_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")

        def predict(x):
            y = decoder_norm(x)
            cls = class_embed(y)
            emb = mask_mlp(y)
            masks = jnp.einsum("bqc,bhwc->bqhw", emb,
                               mask_features.astype(emb.dtype))
            return cls, masks

        def attn_mask_for(masks, hw):
            # (B, Q, h*w) True = do NOT attend; fully-empty queries are
            # un-masked (detectron2's sum==len reset) so softmax stays sane
            m = resize_bilinear(
                masks.transpose(0, 2, 3, 1), hw
            ).transpose(0, 3, 1, 2).reshape(b, q, -1)
            blocked = jax.nn.sigmoid(m) < 0.5
            all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
            return blocked & ~all_blocked

        x = jnp.broadcast_to(query_feat[None], (b, q, c)).astype(self.dtype)
        qe = query_embed[None].astype(self.dtype)
        _, masks = predict(x)
        for li in range(self.num_layers):
            si = li % n_scales
            km = attn_mask_for(masks, hws[si])
            # masked cross-attention (queries read pixels), post-norm
            x = x + _MHA(c, self.num_heads, dtype=self.dtype,
                         name=f"layer{li}_cross")(
                x + qe, srcs[si] + poss[si], srcs[si], key_mask=km)
            x = nn.LayerNorm(epsilon=1e-5, name=f"layer{li}_cross_norm")(x)
            # self-attention among queries
            x = x + _MHA(c, self.num_heads, dtype=self.dtype,
                         name=f"layer{li}_self")(x + qe, x + qe, x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"layer{li}_self_norm")(x)
            # FFN
            y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name=f"layer{li}_ffn0")(x)
            y = nn.Dense(c, dtype=self.dtype,
                         name=f"layer{li}_ffn1")(nn.relu(y))
            x = nn.LayerNorm(epsilon=1e-5, name=f"layer{li}_ffn_norm")(x + y)
            cls, masks = predict(x)
        return cls, masks


class Mask2FormerInstance(nn.Module):
    """Image -> (pred_logits (B, Q, K+1), pred_masks (B, Q, H/4, W/4)).

    Defaults mirror the reference's generation config scaled to swin-L
    (maskformer2_swin_large_IN21k_384_bs16_90k, hybrid_radar_pts_vod.py:54);
    pass small dims for tests.
    """

    num_classes: int = 8
    embed_dims: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window_size: int = 12
    hidden_dim: int = 256
    num_queries: int = 100
    dec_heads: int = 8
    dec_layers: int = 9
    dim_feedforward: int = 2048
    # "msdeform" = MSDeformAttnPixelDecoder, what the published swin-L
    # checkpoint was trained with (required for weight import); "fpn" =
    # the gather-free BasePixelDecoder variant (TPU-friendliest, for
    # self-trained weights).
    pixel_decoder: str = "msdeform"
    pd_enc_layers: int = 6   # TRANSFORMER_ENC_LAYERS (msdeform only)
    pd_ffn: int = 1024       # encoder d_ffn, 1024 in the published config
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = SwinTransformer(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, window_size=self.window_size,
            out_indices=(0, 1, 2, 3), drop_path_rate=0.0,
            dtype=self.dtype, name="backbone",
        )(images, train)
        if self.pixel_decoder == "msdeform":
            mask_features, scales = PixelDecoderMSDeform(
                conv_dim=self.hidden_dim, mask_dim=self.hidden_dim,
                enc_layers=self.pd_enc_layers, d_ffn=self.pd_ffn,
                dtype=self.dtype, name="pixel_decoder",
            )(feats)
        else:
            mask_features, scales = PixelDecoderFPN(
                conv_dim=self.hidden_dim, mask_dim=self.hidden_dim,
                dtype=self.dtype, name="pixel_decoder",
            )(feats)
        cls, masks = MaskedTransformerDecoder(
            num_classes=self.num_classes, hidden_dim=self.hidden_dim,
            num_queries=self.num_queries, num_heads=self.dec_heads,
            num_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            mask_dim=self.hidden_dim, dtype=self.dtype,
            name="transformer_decoder",
        )(scales, mask_features)
        return {"pred_logits": cls, "pred_masks": masks}


def instance_inference(pred_logits, pred_masks, image_hw: Tuple[int, int],
                       topk: int = 100):
    """detectron2 instance_inference, static-shape: flatten (Q x K) class
    scores, keep the top `topk` (query, class) pairs, binarize masks at 0,
    final score = class prob x mean in-mask sigmoid. Returns
    (labels (T,), scores (T,), masks (T, H, W) bool) — empty detections
    (all-zero masks, the reference's postprocess drop) keep score 0."""
    q, kp1 = pred_logits.shape[-2:]
    k = kp1 - 1
    scores = jax.nn.softmax(pred_logits[0], axis=-1)[:, :-1].reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores, min(topk, q * k))
    labels = top_idx % k
    qidx = top_idx // k
    masks = resize_bilinear(
        pred_masks[0].transpose(1, 2, 0)[None], image_hw
    )[0].transpose(2, 0, 1)[qidx]
    binary = masks > 0
    prob = jax.nn.sigmoid(masks)
    denom = jnp.maximum(binary.sum(axis=(1, 2)), 1)
    mask_score = (prob * binary).sum(axis=(1, 2)) / denom
    nonempty = binary.any(axis=(1, 2))
    return labels, top_scores * mask_score * nonempty, binary
