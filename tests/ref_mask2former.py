"""Torch mini-implementation of Mask2Former with the PUBLISHED checkpoint's
exact state-dict key structure — the oracle for convert_mask2former_state.

The reference pipeline runs the pretrained swin-L Cityscapes Mask2Former via
detectron2 (hybrid_radar_pts_vod.py:20-24,54); neither detectron2 nor the
Mask2Former project is vendored in the reference tree, so this module
re-implements the exact modules the checkpoint serializes, with the same
module paths (backbone.*, sem_seg_head.pixel_decoder.*,
sem_seg_head.predictor.*), so that a randomly initialized state_dict() here
is structurally identical to the published `model_final_*.pkl`'s "model"
dict. Sources (public):
- microsoft/Swin-Transformer swin_transformer.py + the detectron2 wrapper
  (Mask2Former mask2former/modeling/backbone/swin.py): patch_embed.proj,
  layers.{i}.blocks.{j}.{norm1,attn.{qkv,proj,relative_position_bias_table},
  norm2,mlp.{fc1,fc2}}, layers.{i}.downsample.{reduction,norm}, norm{0..3};
  NOTE PatchMerging concatenates [x(0::2,0::2), x(1::2,0::2), x(0::2,1::2),
  x(1::2,1::2)] — a DIFFERENT 4C channel order than mmcv's nn.Unfold
  (pcdet swin) which our flax PatchMerging mirrors; the converter permutes.
- Mask2Former msdeformattn.py (MSDeformAttnPixelDecoder) + Deformable DETR
  ms_deform_attn.py (pytorch core: grid_sample align_corners=False, zeros).
- Mask2Former mask2former_transformer_decoder.py
  (MultiScaleMaskedTransformerDecoder, post-norm, cross->self->ffn).
"""
import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Swin backbone (microsoft naming/semantics)
# ---------------------------------------------------------------------------

def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    b = int(windows.shape[0] / (h * w / ws / ws))
    x = windows.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


class WindowAttention(nn.Module):
    def __init__(self, dim, ws, num_heads):
        super().__init__()
        self.dim, self.ws, self.num_heads = dim, ws, num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) * (2 * ws - 1), num_heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        cf = coords.flatten(1)
        rel = cf[:, :, None] - cf[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class SwinBlock(nn.Module):
    def __init__(self, dim, num_heads, ws, shift, mlp_ratio):
        super().__init__()
        self.ws, self.shift_size = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.H = self.W = None

    def forward(self, x, mask_matrix):
        b, l, c = x.shape
        h, w = self.H, self.W
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        pad_r = (self.ws - w % self.ws) % self.ws
        pad_b = (self.ws - h % self.ws) % self.ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = x.shape[1], x.shape[2]
        if self.shift_size > 0:
            shifted = torch.roll(
                x, shifts=(-self.shift_size, -self.shift_size), dims=(1, 2))
            attn_mask = mask_matrix
        else:
            shifted, attn_mask = x, None
        xw = window_partition(shifted, self.ws).view(-1, self.ws * self.ws, c)
        aw = self.attn(xw, mask=attn_mask).view(-1, self.ws, self.ws, c)
        shifted = window_reverse(aw, self.ws, hp, wp)
        if self.shift_size > 0:
            x = torch.roll(
                shifted, shifts=(self.shift_size, self.shift_size),
                dims=(1, 2))
        else:
            x = shifted
        x = x[:, :h, :w].contiguous().view(b, h * w, c)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    """Microsoft concat order: [x(0::2,0::2), x(1::2,0::2), x(0::2,1::2),
    x(1::2,1::2)] — position-major (pos*C + c), vs mmcv unfold's
    channel-major (c*4 + kh*2 + kw)."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, h, w):
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        if (h % 2 == 1) or (w % 2 == 1):
            x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, depth, num_heads, ws, mlp_ratio, downsample):
        super().__init__()
        self.ws, self.shift = ws, ws // 2
        self.blocks = nn.ModuleList([
            SwinBlock(dim, num_heads, ws, 0 if i % 2 == 0 else self.shift,
                      mlp_ratio)
            for i in range(depth)])
        self.downsample = PatchMerging(dim) if downsample else None

    def forward(self, x, h, w):
        hp = int(math.ceil(h / self.ws)) * self.ws
        wp = int(math.ceil(w / self.ws)) * self.ws
        img_mask = torch.zeros((1, hp, wp, 1))
        cnt = 0
        for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                   slice(-self.shift, None)):
            for wsl in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                        slice(-self.shift, None)):
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        mw = window_partition(img_mask, self.ws).view(-1, self.ws * self.ws)
        attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
        attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0) \
            .masked_fill(attn_mask == 0, 0.0)
        for blk in self.blocks:
            blk.H, blk.W = h, w
            x = blk(x, attn_mask)
        if self.downsample is not None:
            x_down = self.downsample(x, h, w)
            return x, h, w, x_down, (h + 1) // 2, (w + 1) // 2
        return x, h, w, x, h, w


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv2d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):
        _, _, h, w = x.shape
        if w % self.patch_size != 0:
            x = F.pad(x, (0, self.patch_size - w % self.patch_size))
        if h % self.patch_size != 0:
            x = F.pad(x, (0, 0, 0, self.patch_size - h % self.patch_size))
        x = self.proj(x)
        wh, ww = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        x = self.norm(x)
        return x, wh, ww


class D2SwinTransformer(nn.Module):
    """State-dict-identical to the Mask2Former d2 swin backbone."""

    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24), window_size=7, mlp_ratio=4.0,
                 out_indices=(0, 1, 2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.patch_embed = PatchEmbed(4, embed_dim)
        self.layers = nn.ModuleList([
            BasicLayer(embed_dim * 2 ** i, depths[i], num_heads[i],
                       window_size, mlp_ratio, i < len(depths) - 1)
            for i in range(len(depths))])
        self.num_features = [embed_dim * 2 ** i for i in range(len(depths))]
        for i in out_indices:
            self.add_module(f"norm{i}", nn.LayerNorm(self.num_features[i]))

    def forward(self, x):
        x, wh, ww = self.patch_embed(x)
        outs = {}
        for i, layer in enumerate(self.layers):
            x_out, h, w, x, wh, ww = layer(x, wh, ww)
            if i in self.out_indices:
                x_out = getattr(self, f"norm{i}")(x_out)
                outs[f"res{i + 2}"] = x_out.view(
                    -1, h, w, self.num_features[i]).permute(
                    0, 3, 1, 2).contiguous()
        return outs


# ---------------------------------------------------------------------------
# MSDeformAttn pixel decoder
# ---------------------------------------------------------------------------

def position_embedding_sine(x, num_pos_feats):
    """detectron2 PositionEmbeddingSine(normalize=True), mask=None:
    x (B, C, H, W) -> (B, 2*num_pos_feats, H, W)."""
    b, _, h, w = x.shape
    not_mask = torch.ones(b, h, w)
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(),
                         pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(),
                         pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


class MSDeformAttn(nn.Module):
    def __init__(self, d_model=256, n_levels=3, n_heads=8, n_points=4):
        super().__init__()
        self.d_model, self.n_levels = d_model, n_levels
        self.n_heads, self.n_points = n_heads, n_points
        self.sampling_offsets = nn.Linear(
            d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(
            d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, input_flatten, spatial_shapes):
        n, lq, _ = query.shape
        value = self.value_proj(input_flatten).view(
            n, -1, self.n_heads, self.d_model // self.n_heads)
        offs = self.sampling_offsets(query).view(
            n, lq, self.n_heads, self.n_levels, self.n_points, 2)
        attn = self.attention_weights(query).view(
            n, lq, self.n_heads, self.n_levels * self.n_points)
        attn = F.softmax(attn, -1).view(
            n, lq, self.n_heads, self.n_levels, self.n_points)
        normalizer = torch.stack(
            [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
        loc = reference_points[:, :, None, :, None, :] \
            + offs / normalizer[None, None, None, :, None, :]
        # pytorch core (ms_deform_attn_core_pytorch)
        splits = [int(h * w) for h, w in spatial_shapes.tolist()]
        value_list = value.split(splits, dim=1)
        grids = 2 * loc - 1
        samples = []
        for lid, (h, w) in enumerate(spatial_shapes.tolist()):
            vl = value_list[lid].flatten(2).transpose(1, 2).reshape(
                n * self.n_heads, self.d_model // self.n_heads,
                int(h), int(w))
            g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
            samples.append(F.grid_sample(
                vl, g, mode="bilinear", padding_mode="zeros",
                align_corners=False))
        attn_t = attn.transpose(1, 2).reshape(
            n * self.n_heads, 1, lq, self.n_levels * self.n_points)
        out = (torch.stack(samples, dim=-2).flatten(-2) * attn_t).sum(-1)
        out = out.view(n, self.n_heads * (self.d_model // self.n_heads), lq)
        return self.output_proj(out.transpose(1, 2))


class MSDeformAttnTransformerEncoderLayer(nn.Module):
    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points):
        super().__init__()
        self.self_attn = MSDeformAttn(d_model, n_levels, n_heads, n_points)
        self.norm1 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, reference_points, spatial_shapes):
        src2 = self.self_attn(src + pos, reference_points, src,
                              spatial_shapes)
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class MSDeformAttnTransformer(nn.Module):
    """MSDeformAttnTransformerEncoderOnly: owns level_embed + encoder."""

    def __init__(self, d_model, n_heads, enc_layers, d_ffn, n_levels,
                 n_points):
        super().__init__()
        self.level_embed = nn.Parameter(torch.randn(n_levels, d_model))
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList([
            MSDeformAttnTransformerEncoderLayer(
                d_model, d_ffn, n_levels, n_heads, n_points)
            for _ in range(enc_layers)])

    def forward(self, srcs, pos_embeds):
        src_flat, lvl_pos_flat, shapes = [], [], []
        for lvl, (src, pos) in enumerate(zip(srcs, pos_embeds)):
            _, _, h, w = src.shape
            shapes.append((h, w))
            src_flat.append(src.flatten(2).transpose(1, 2))
            lvl_pos_flat.append(pos.flatten(2).transpose(1, 2)
                                + self.level_embed[lvl].view(1, 1, -1))
        src_flat = torch.cat(src_flat, 1)
        lvl_pos_flat = torch.cat(lvl_pos_flat, 1)
        spatial_shapes = torch.as_tensor(shapes, dtype=torch.long)
        refs = []
        for (h, w) in shapes:
            ry, rx = torch.meshgrid(
                torch.linspace(0.5, h - 0.5, h),
                torch.linspace(0.5, w - 0.5, w), indexing="ij")
            refs.append(torch.stack(
                (rx.reshape(-1) / w, ry.reshape(-1) / h), -1))
        reference_points = torch.cat(refs, 0)[None, :, None, :].repeat(
            src_flat.shape[0], 1, len(shapes), 1)
        out = src_flat
        for layer in self.encoder.layers:
            out = layer(out, lvl_pos_flat, reference_points, spatial_shapes)
        return out, spatial_shapes


class MSDeformAttnPixelDecoder(nn.Module):
    """in_features res2..res5; transformer over [res5, res4, res3]."""

    def __init__(self, in_channels, conv_dim=256, mask_dim=256, n_heads=8,
                 enc_layers=6, d_ffn=1024, n_points=4):
        super().__init__()
        # input_proj ordered coarsest first (res5, res4, res3)
        self.input_proj = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, conv_dim, kernel_size=1),
                          nn.GroupNorm(32, conv_dim))
            for c in in_channels[:0:-1]])
        self.transformer = MSDeformAttnTransformer(
            conv_dim, n_heads, enc_layers, d_ffn, 3, n_points)
        self.pe_dim = conv_dim // 2
        # stride-4 FPN step (d2 Conv2d with fused GN => bias-free convs)
        self.adapter_1 = nn.Conv2d(in_channels[0], conv_dim, 1, bias=False)
        self.adapter_1.norm = nn.GroupNorm(32, conv_dim)
        self.layer_1 = nn.Conv2d(conv_dim, conv_dim, 3, padding=1,
                                 bias=False)
        self.layer_1.norm = nn.GroupNorm(32, conv_dim)
        self.mask_features = nn.Conv2d(conv_dim, mask_dim, 3, padding=1)

    def forward(self, feats):
        # feats: dict res2..res5 (B, C, H, W)
        xs = [feats["res5"], feats["res4"], feats["res3"]]
        srcs = [self.input_proj[i](x) for i, x in enumerate(xs)]
        poss = [position_embedding_sine(x, self.pe_dim) for x in srcs]
        y, spatial_shapes = self.transformer(srcs, poss)
        splits = [int(h * w) for h, w in spatial_shapes.tolist()]
        outs = []
        for part, (h, w) in zip(y.split(splits, dim=1),
                                spatial_shapes.tolist()):
            outs.append(part.transpose(1, 2).view(
                y.shape[0], -1, int(h), int(w)))
        cur = self.adapter_1.norm(self.adapter_1(feats["res2"]))
        cur = cur + F.interpolate(outs[-1], size=cur.shape[-2:],
                                  mode="bilinear", align_corners=False)
        cur = F.relu(self.layer_1.norm(self.layer_1(cur)))
        return self.mask_features(cur), outs  # strides 32, 16, 8


# ---------------------------------------------------------------------------
# MultiScaleMaskedTransformerDecoder (predictor)
# ---------------------------------------------------------------------------

class SelfAttentionLayer(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, query_pos):
        q = k = tgt + query_pos
        tgt2 = self.self_attn(q, k, value=tgt, need_weights=False)[0]
        return self.norm(tgt + tgt2)


class CrossAttentionLayer(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, heads,
                                                    batch_first=True)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, memory, memory_mask, pos, query_pos):
        tgt2 = self.multihead_attn(
            query=tgt + query_pos, key=memory + pos, value=memory,
            attn_mask=memory_mask, need_weights=False)[0]
        return self.norm(tgt + tgt2)


class FFNLayer(nn.Module):
    def __init__(self, d, d_ffn):
        super().__init__()
        self.linear1 = nn.Linear(d, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt):
        return self.norm(tgt + self.linear2(F.relu(self.linear1(tgt))))


class MLP(nn.Module):
    def __init__(self, in_dim, hidden, out_dim, num_layers=3):
        super().__init__()
        dims = [in_dim] + [hidden] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [out_dim]))

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = F.relu(l(x)) if i < len(self.layers) - 1 else l(x)
        return x


class MultiScaleMaskedTransformerDecoder(nn.Module):
    def __init__(self, hidden_dim=256, num_queries=100, nheads=8,
                 dim_feedforward=2048, dec_layers=9, mask_dim=256,
                 num_classes=8):
        super().__init__()
        self.num_heads, self.num_layers = nheads, dec_layers
        self.num_feature_levels = 3
        self.transformer_self_attention_layers = nn.ModuleList(
            SelfAttentionLayer(hidden_dim, nheads) for _ in range(dec_layers))
        self.transformer_cross_attention_layers = nn.ModuleList(
            CrossAttentionLayer(hidden_dim, nheads)
            for _ in range(dec_layers))
        self.transformer_ffn_layers = nn.ModuleList(
            FFNLayer(hidden_dim, dim_feedforward) for _ in range(dec_layers))
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(self.num_feature_levels, hidden_dim)
        self.class_embed = nn.Linear(hidden_dim, num_classes + 1)
        self.mask_embed = MLP(hidden_dim, hidden_dim, mask_dim)
        self.pe_dim = hidden_dim // 2

    def prediction_heads(self, output, mask_features, size):
        y = self.decoder_norm(output)
        outputs_class = self.class_embed(y)
        mask_embed = self.mask_embed(y)
        outputs_mask = torch.einsum("bqc,bchw->bqhw", mask_embed,
                                    mask_features)
        am = F.interpolate(outputs_mask, size=size, mode="bilinear",
                           align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(
            1, self.num_heads, 1, 1).flatten(0, 1) < 0.5).bool()
        return outputs_class, outputs_mask, am.detach()

    def forward(self, x, mask_features):
        # x: 3 scales coarsest first (B, C, H, W)
        src, pos, sizes = [], [], []
        for i in range(self.num_feature_levels):
            sizes.append(x[i].shape[-2:])
            pos.append(position_embedding_sine(
                x[i], self.pe_dim).flatten(2).transpose(1, 2))
            src.append(x[i].flatten(2).transpose(1, 2)
                       + self.level_embed.weight[i][None, None, :])
        b = x[0].shape[0]
        output = self.query_feat.weight.unsqueeze(0).repeat(b, 1, 1)
        query_embed = self.query_embed.weight.unsqueeze(0).repeat(b, 1, 1)
        outputs_class, outputs_mask, attn_mask = self.prediction_heads(
            output, mask_features, sizes[0])
        for i in range(self.num_layers):
            li = i % self.num_feature_levels
            attn_mask[torch.where(
                attn_mask.sum(-1) == attn_mask.shape[-1])] = False
            output = self.transformer_cross_attention_layers[i](
                output, src[li], memory_mask=attn_mask, pos=pos[li],
                query_pos=query_embed)
            output = self.transformer_self_attention_layers[i](
                output, query_pos=query_embed)
            output = self.transformer_ffn_layers[i](output)
            outputs_class, outputs_mask, attn_mask = self.prediction_heads(
                output, mask_features,
                sizes[(i + 1) % self.num_feature_levels])
        return outputs_class, outputs_mask


class Mask2FormerTorch(nn.Module):
    """backbone + sem_seg_head.{pixel_decoder,predictor} — the exact
    top-level module paths of the published checkpoint."""

    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24), window_size=7,
                 hidden_dim=256, num_queries=100, nheads=8,
                 dim_feedforward=2048, dec_layers=9, enc_layers=6,
                 num_classes=8):
        super().__init__()
        self.backbone = D2SwinTransformer(embed_dim, depths, num_heads,
                                          window_size)
        in_ch = self.backbone.num_features
        self.sem_seg_head = nn.Module()
        self.sem_seg_head.pixel_decoder = MSDeformAttnPixelDecoder(
            in_ch, conv_dim=hidden_dim, mask_dim=hidden_dim, n_heads=nheads,
            enc_layers=enc_layers, d_ffn=hidden_dim * 4)
        self.sem_seg_head.predictor = MultiScaleMaskedTransformerDecoder(
            hidden_dim, num_queries, nheads, dim_feedforward, dec_layers,
            hidden_dim, num_classes)

    def forward(self, images):
        feats = self.backbone(images)
        mask_features, scales = self.sem_seg_head.pixel_decoder(feats)
        return self.sem_seg_head.predictor(scales, mask_features)
