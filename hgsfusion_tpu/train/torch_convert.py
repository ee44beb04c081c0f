"""Torch checkpoint conversion: reference .pth -> flax param/batch_stats trees.

Covers:
- torchvision `deeplabv3_resnet101` COCO weights -> the frozen DDN image
  backbone (reference loads them at ddn_template.get_model:92-113); only
  `backbone.*` keys are needed (classifier unused with USE_DEPTH False).
- the full HGSFusion detector state dict (reference torch pickle format,
  train_utils.py:221-254 `model_state`) -> this framework's parameter tree.

Layout conventions:
- torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O)
- torch Linear weight (O, I) -> flax (I, O)
- spconv 2.x SubMConv2d/SparseConv2d weight (O, kH, kW, I) -> flax
  (kH, kW, I, O)  [spconv 1.x layouts are transposed first, mirroring
  detector3d_template._load_state_dict:425-454]
- torch BatchNorm {weight, bias, running_mean, running_var} ->
  flax {scale, bias} params + {mean, var} batch_stats.

Every copied tensor is shape-checked against the flax tree; mismatches are
reported rather than silently skipped.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _spconv(w):
    w = np.asarray(w)
    if w.ndim == 4:  # (O, kH, kW, I) spconv 2.x
        return np.transpose(w, (1, 2, 3, 0))
    raise ValueError(f"unexpected spconv weight shape {w.shape}")


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def load_torch_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt.get("state_dict", ckpt))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def convert_resnet_deeplab_backbone(state: Dict[str, np.ndarray],
                                    prefix: str = "backbone.",
                                    stage_sizes=(3, 4, 23, 3)):
    """torchvision resnet backbone -> (params, batch_stats) subtrees for
    models.resnet.ResNetDeepLabBackbone (module name 'ddn_backbone')."""
    params: Dict = {}
    stats: Dict = {}

    def put_conv(flax_name, torch_name):
        params[flax_name] = {"kernel": _conv(state[prefix + torch_name + ".weight"])}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": np.asarray(state[prefix + torch_name + ".weight"]),
            "bias": np.asarray(state[prefix + torch_name + ".bias"]),
        }
        stats[flax_name] = {
            "mean": np.asarray(state[prefix + torch_name + ".running_mean"]),
            "var": np.asarray(state[prefix + torch_name + ".running_var"]),
        }

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")
    for si, blocks in enumerate(stage_sizes):
        for bi in range(blocks):
            t = f"layer{si + 1}.{bi}"
            f = f"layer{si + 1}_block{bi}"
            params[f] = {}
            stats[f] = {}
            for ci in (1, 2, 3):
                params[f][f"conv{ci}"] = {
                    "kernel": _conv(state[f"{prefix}{t}.conv{ci}.weight"])
                }
                params[f][f"bn{ci}"] = {
                    "scale": np.asarray(state[f"{prefix}{t}.bn{ci}.weight"]),
                    "bias": np.asarray(state[f"{prefix}{t}.bn{ci}.bias"]),
                }
                stats[f][f"bn{ci}"] = {
                    "mean": np.asarray(state[f"{prefix}{t}.bn{ci}.running_mean"]),
                    "var": np.asarray(state[f"{prefix}{t}.bn{ci}.running_var"]),
                }
            if f"{prefix}{t}.downsample.0.weight" in state:
                params[f]["downsample_conv"] = {
                    "kernel": _conv(state[f"{prefix}{t}.downsample.0.weight"])
                }
                params[f]["downsample_bn"] = {
                    "scale": np.asarray(state[f"{prefix}{t}.downsample.1.weight"]),
                    "bias": np.asarray(state[f"{prefix}{t}.downsample.1.bias"]),
                }
                stats[f]["downsample_bn"] = {
                    "mean": np.asarray(state[f"{prefix}{t}.downsample.1.running_mean"]),
                    "var": np.asarray(state[f"{prefix}{t}.downsample.1.running_var"]),
                }
    return params, stats


def load_deeplab_backbone_into_variables(variables, pth_path,
                                         stage_sizes=(3, 4, 23, 3)):
    """Overlay COCO DeepLabV3 backbone weights onto an initialized variables
    tree (in-place on copies; returns the new tree). Shape-checked."""
    import jax

    state = load_torch_state_dict(pth_path)
    params, stats = convert_resnet_deeplab_backbone(state, stage_sizes=stage_sizes)

    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    tgt_p = dict(new_vars["params"])
    tgt_s = dict(new_vars["batch_stats"])

    def check_and_cast(dst, src, path=""):
        out = {}
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = check_and_cast(dst[k], v, f"{path}/{k}")
            else:
                assert np.shape(dst[k]) == np.shape(v), (
                    f"shape mismatch at {path}/{k}: "
                    f"{np.shape(dst[k])} vs {np.shape(v)}"
                )
                out[k] = np.asarray(v, np.float32)
        return {**dst, **out}

    tgt_p["ddn_backbone"] = check_and_cast(tgt_p["ddn_backbone"], params)
    tgt_s["ddn_backbone"] = check_and_cast(tgt_s["ddn_backbone"], stats)
    return {**new_vars, "params": tgt_p, "batch_stats": tgt_s}


# ---------------------------------------------------------------------------
# Full HGSFusion reference checkpoint mapping (torch module path -> flax path)
# ---------------------------------------------------------------------------

# The reference registers FusionVFE submodules under CamelCase names
# (fusion_vfe.py:40-41 add_module('ImageVFE'/'RadarVFE'); RadarOccupancy is
# registered twice — attribute `radar_occupancy` AND add_module
# 'RadarOccupancy', so real checkpoints carry both spellings). The mapping
# below uses one canonical snake_case scheme; normalize incoming keys to it.
_KEY_ALIASES = (
    ("fusion_vfe.ImageVFE.", "fusion_vfe.image_vfe."),
    ("fusion_vfe.RadarVFE.", "fusion_vfe.radar_backbone."),
    ("fusion_vfe.RadarOccupancy.", "fusion_vfe.radar_occupancy."),
)


def _normalize_state_keys(state: Dict[str, np.ndarray]):
    out = {}
    for k, v in state.items():
        for src, dst in _KEY_ALIASES:
            if k.startswith(src):
                k = dst + k[len(src):]
                break
        out.setdefault(k, v)  # duplicate registrations collapse to one key
    return out


def convert_hgsfusion_state(state: Dict[str, np.ndarray], variables):
    """Map a reference HGSFusion `model_state` onto this framework's tree.

    Returns (variables, report) where report lists copied / missing /
    unmatched keys. Mapping follows the module-by-module correspondence
    documented in each model file's docstring. Requires a real reference
    checkpoint to exercise; the synthetic round-trip is covered by tests.
    """
    import jax

    class _Recording(dict):
        """Records which torch keys the mapping consumed (for `unmatched`)."""

        used: set = set()

        def __getitem__(self, k):
            v = dict.__getitem__(self, k)
            self.used.add(k)
            return v

    state = _Recording(_normalize_state_keys(state))
    state.used = set()
    copied, missing, unmatched = [], [], []
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def put(dst_tree, path: Tuple[str, ...], value):
        node = dst_tree
        for k in path[:-1]:
            node = node[k]
        leaf = path[-1]
        assert np.shape(node[leaf]) == np.shape(value), (
            f"{'/'.join(path)}: {np.shape(node[leaf])} vs {np.shape(value)}"
        )
        node[leaf] = np.asarray(value, np.float32)
        copied.append("/".join(path))

    def bn(dst_prefix: Tuple[str, ...], torch_prefix: str):
        put(p, dst_prefix + ("scale",), state[torch_prefix + ".weight"])
        put(p, dst_prefix + ("bias",), state[torch_prefix + ".bias"])
        put(s, dst_prefix + ("mean",), state[torch_prefix + ".running_mean"])
        put(s, dst_prefix + ("var",), state[torch_prefix + ".running_var"])

    def conv(dst_prefix, torch_name, kind="conv"):
        w = state[torch_name + ".weight"]
        kernel = {"conv": _conv, "spconv": _spconv, "linear": _linear}[kind](w)
        put(p, dst_prefix + ("kernel",), kernel)
        if torch_name + ".bias" in state:
            put(p, dst_prefix + ("bias",), state[torch_name + ".bias"])

    def try_(fn, *a):
        try:
            fn(*a)
        except KeyError as e:
            missing.append(str(e))

    def overlay(dst, src, path):
        """Recursively copy src into dst, shape-checking every leaf (the
        module contract: mismatches are reported, never silently skipped)."""
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v, path + (k,))
            else:
                put_at = dst
                assert np.shape(put_at[k]) == np.shape(v), (
                    f"{'/'.join(path + (k,))}: "
                    f"{np.shape(put_at[k])} vs {np.shape(v)}"
                )
                put_at[k] = np.asarray(v, np.float32)
                copied.append("/".join(path + (k,)))

    # --- image branch
    try:
        n_blocks = tuple(
            len(p["ddn_backbone"][f"layer{i}_block0"]) and sum(
                1 for k in p["ddn_backbone"] if k.startswith(f"layer{i}_block")
            )
            for i in range(1, 5)
        )
        dl_params, dl_stats = convert_resnet_deeplab_backbone(
            state, prefix="fusion_vfe.image_vfe.ffn.ddn.model.backbone.",
            stage_sizes=n_blocks,
        )
        overlay(p["ddn_backbone"], dl_params, ("ddn_backbone",))
        overlay(s["ddn_backbone"], dl_stats, ("ddn_backbone#stats",))
    except KeyError as e:
        missing.append(f"ddn_backbone: {e}")
    for i in range(4):
        t = f"fusion_vfe.image_vfe.ffn.channel_reduce.{i}"
        try_(conv, (f"channel_reduce_{i}", "conv"), t + ".conv")
        try_(bn, (f"channel_reduce_{i}", "bn"), t + ".bn")
    # f2v 1x1x1 Conv3d (O, I, 1, 1, 1) -> (I, O) kernel + bias, then BN3d
    t = "fusion_vfe.image_vfe.f2v.channel_reduce"
    if t + ".0.weight" in state:
        w = np.asarray(state[t + ".0.weight"])[:, :, 0, 0, 0]  # (O, I)
        try_(put, p, ("f2v", "reduce_kernel"), w.T)
        if t + ".0.bias" in state:  # Conv3d(..., bias=False) variants
            try_(put, p, ("f2v", "reduce_bias"), state[t + ".0.bias"])
        else:
            missing.append(f"'{t}.0.bias'")
        try_(bn, ("f2v", "bn"), t + ".1")

    # --- radar branch: reader MLP
    t = "fusion_vfe.radar_backbone.reader.pfn_layers.shared_mlps"
    try_(conv, ("pillar_net", "mlp_0"), t + ".0", "linear")
    try_(bn, ("pillar_net", "bn_0"), t + ".1")

    # --- radar sparse encoder (spconv 2.x weights)
    enc = "fusion_vfe.radar_backbone.backbone"
    stage_map = [
        ("conv1", [("conv1_block0", "0", True), ("conv1_block1", "1", False)], None),
        ("conv2", [("conv2_block0", "3", False), ("conv2_block1", "4", False)],
         ("conv2_down", "0", "1")),
        ("conv3", [("conv3_block0", "3", False), ("conv3_block1", "4", False)],
         ("conv3_down", "0", "1")),
        ("conv4", [("conv4_block0", "3", False), ("conv4_block1", "4", False)],
         ("conv4_down", "0", "1")),
    ]
    for stage, blocks, down in stage_map:
        if down is not None:
            dname, ci, bi = down
            try_(conv, ("radar_backbone", "backbone", dname, "conv"),
                 f"{enc}.{stage}.{ci}", "spconv")
            try_(bn, ("radar_backbone", "backbone", dname, "bn"),
                 f"{enc}.{stage}.{bi}")
        for fname, ti, is_v in blocks:
            subs = ["conv0", "conv1", "conv2"] if is_v else ["conv1", "conv2"]
            for sub in subs:
                try_(conv,
                     ("radar_backbone", "backbone", fname, sub, "conv"),
                     f"{enc}.{stage}.{ti}.{sub}.0", "spconv")
                try_(bn,
                     ("radar_backbone", "backbone", fname, sub, "bn"),
                     f"{enc}.{stage}.{ti}.{sub}.1")

    # --- FPN neck
    neck = "fusion_vfe.radar_backbone.neck"
    for flax_name, tname in (("conv34", "conv34"), ("conv23", "conv23")):
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            try_(conv, ("radar_backbone", "neck", flax_name, f"conv{j}"),
                 f"{neck}.{tname}.{ci}")
            try_(bn, ("radar_backbone", "neck", flax_name, f"bn{j}"),
                 f"{neck}.{tname}.{bi}")

    # --- occupancy (serial ASPP indices: 0 conv,1 bn,3 conv,4 bn,6 conv,7 bn,9 conv)
    occ = "fusion_vfe.radar_occupancy.pred_occupancy"
    try_(conv, ("radar_occupancy", "aspp_conv1"), occ + ".0")
    try_(bn, ("radar_occupancy", "aspp_bn1"), occ + ".1")
    try_(conv, ("radar_occupancy", "aspp_conv2"), occ + ".3")
    try_(bn, ("radar_occupancy", "aspp_bn2"), occ + ".4")
    try_(conv, ("radar_occupancy", "occ_conv1"), occ + ".6")
    try_(bn, ("radar_occupancy", "occ_bn1"), occ + ".7")
    try_(conv, ("radar_occupancy", "occ_conv2"), occ + ".9")
    # map-to-bev collapse: torch 1x1 conv (O, C*Z, 1, 1) -> (C*Z, O) kernel
    t = "fusion_vfe.radar_occupancy.map_to_bev.block"
    if t + ".conv.weight" in state:
        w = np.asarray(state[t + ".conv.weight"])[:, :, 0, 0]
        try_(put, p, ("map_to_bev", "kernel"), w.T)
        if t + ".conv.bias" in state:
            try_(put, p, ("map_to_bev", "bias"), state[t + ".conv.bias"])
    try_(bn, ("map_to_bev", "bn"), t + ".bn")

    # --- SE fusion
    t = "fusion_after_bev"
    try_(conv, ("fusion_after_bev", "fuse_conv"), t + ".fuse_conv.0")
    try_(bn, ("fusion_after_bev", "fuse_bn"), t + ".fuse_conv.1")
    try_(conv, ("fusion_after_bev", "se", "att_conv"), t + ".se_block.att.1")

    # --- head
    for name in ("conv_cls", "conv_box", "conv_dir_cls"):
        try_(conv, ("dense_head", name), f"dense_head.{name}")

    for k in state:
        if k not in state.used and not k.endswith("num_batches_tracked"):
            unmatched.append(k)
    report = {"copied": copied, "missing": missing, "unmatched": unmatched}
    return {"params": p, "batch_stats": s}, report


# ---------------------------------------------------------------------------
# Mask2Former (RHGM mask source): published swin-L checkpoint -> flax
# ---------------------------------------------------------------------------

def load_d2_checkpoint(path):
    """Load a detectron2-format checkpoint: .pkl ({"model": {k: ndarray}})
    or a torch .pth — the published Mask2Former weights ship as .pkl
    (the reference's generation pipeline consumes them via detectron2,
    hybrid_radar_pts_vod.py:34-42)."""
    p = str(path)
    if p.endswith(".pkl"):
        import pickle

        with open(p, "rb") as f:
            ckpt = pickle.load(f, encoding="latin1")
        state = ckpt.get("model", ckpt)
        return {k: np.asarray(v) for k, v in state.items()}
    return load_torch_state_dict(p)


def _swin_merge_perm(c: int) -> np.ndarray:
    """Input-channel permutation for PatchMerging weights: microsoft swin
    concatenates position-major ([x(0::2,0::2); x(1::2,0::2); x(0::2,1::2);
    x(1::2,1::2)] -> index pos*C + c), our flax PatchMerging mirrors mmcv's
    nn.Unfold (channel-major, index c*4 + kh*2 + kw). perm[i_ours] = i_ms."""
    pos_rank = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}
    perm = np.empty(4 * c, np.int64)
    for i in range(4 * c):
        ch, r = divmod(i, 4)
        kh, kw = divmod(r, 2)
        perm[i] = pos_rank[(kh, kw)] * c + ch
    return perm


def convert_mask2former_state(state: Dict[str, np.ndarray], variables):
    """Published Mask2Former checkpoint (detectron2 key structure:
    backbone.* microsoft-swin, sem_seg_head.pixel_decoder.* MSDeformAttn,
    sem_seg_head.predictor.* MultiScaleMaskedTransformerDecoder) ->
    variables for rhgm.mask2former.Mask2FormerInstance(pixel_decoder=
    'msdeform').

    Architecture hyperparameters (depths, out indices, layer counts) are
    derived from the flax `variables` template, so the same mapping serves
    the tiny test model and the real swin-L. Returns (variables, report);
    report lists copied/missing/unmatched keys — a checkpoint/model
    mismatch shows up there, not as a silent partial load.
    """
    import re

    import jax
    from flax.core import unfreeze

    params = jax.tree_util.tree_map(np.asarray, unfreeze(variables["params"]))
    copied, missing, unmatched = [], [], []
    used = set()

    def get(key):
        used.add(key)
        return np.asarray(state[key])

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node[k]
        tgt = node[path[-1]]
        if tuple(tgt.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: model "
                f"{tuple(tgt.shape)} vs checkpoint {tuple(value.shape)}")
        node[path[-1]] = value.astype(tgt.dtype)
        copied.append("/".join(path))

    def try_(fn):
        # fn is a thunk so checkpoint-side lookups (get) raise INSIDE the
        # try and land in report["missing"] — eager-argument evaluation
        # would escape as a raw KeyError on an architecture mismatch
        try:
            fn()
        except KeyError as e:
            missing.append(str(e))

    def copy_(path, key, xform=lambda v: v):
        try_(lambda: put(path, xform(get(key))))

    def ln(path, key):
        copy_(path + ("scale",), key + ".weight")
        copy_(path + ("bias",), key + ".bias")

    def dense(path, key, bias=True):
        copy_(path + ("kernel",), key + ".weight", _linear)
        if bias:
            copy_(path + ("bias",), key + ".bias")

    def conv(path, key, bias=True):
        copy_(path + ("kernel",), key + ".weight", _conv)
        if bias:
            copy_(path + ("bias",), key + ".bias")

    # ---- backbone (microsoft swin naming) -------------------------------
    bb = params["backbone"]
    conv(("backbone", "patch_embed", "projection"),
         "backbone.patch_embed.proj")
    ln(("backbone", "patch_embed", "norm"), "backbone.patch_embed.norm")
    stages: Dict[int, int] = {}
    for k in bb:
        m = re.fullmatch(r"stage(\d+)_block(\d+)", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            stages[s] = max(stages.get(s, 0), b + 1)
    for s in sorted(stages):
        for b in range(stages[s]):
            t = f"backbone.layers.{s}.blocks.{b}"
            o = ("backbone", f"stage{s}_block{b}")
            ln(o + ("norm1",), t + ".norm1")
            ln(o + ("norm2",), t + ".norm2")
            copy_(o + ("attn", "w_msa", "relative_position_bias_table"),
                  t + ".attn.relative_position_bias_table")
            dense(o + ("attn", "w_msa", "qkv"), t + ".attn.qkv")
            dense(o + ("attn", "w_msa", "proj"), t + ".attn.proj")
            dense(o + ("ffn", "fc1"), t + ".mlp.fc1")
            dense(o + ("ffn", "fc2"), t + ".mlp.fc2")
        if f"downsample{s}" in bb:
            t = f"backbone.layers.{s}.downsample"

            def merge_perm(v):  # input-channel reorder, _swin_merge_perm
                return v[_swin_merge_perm(v.shape[0] // 4)]

            copy_(("backbone", f"downsample{s}", "reduction", "kernel"),
                  t + ".reduction.weight",
                  lambda v: merge_perm(_linear(v)))
            copy_(("backbone", f"downsample{s}", "norm", "scale"),
                  t + ".norm.weight", merge_perm)
            copy_(("backbone", f"downsample{s}", "norm", "bias"),
                  t + ".norm.bias", merge_perm)
    for k in bb:
        m = re.fullmatch(r"norm(\d+)", k)
        if m:
            ln(("backbone", k), f"backbone.norm{m.group(1)}")

    # ---- pixel decoder (MSDeformAttnPixelDecoder) ------------------------
    pd = params["pixel_decoder"]
    pfx = "sem_seg_head.pixel_decoder"
    n_proj = sum(1 for k in pd if re.fullmatch(r"input_proj_\d+_conv", k))
    for i in range(n_proj):
        conv(("pixel_decoder", f"input_proj_{i}_conv"),
             f"{pfx}.input_proj.{i}.0")
        ln(("pixel_decoder", f"input_proj_{i}_gn"), f"{pfx}.input_proj.{i}.1")
    copy_(("pixel_decoder", "level_embed"),
          f"{pfx}.transformer.level_embed")
    n_enc = sum(1 for k in pd if re.fullmatch(r"encoder_layer_\d+", k))
    for li in range(n_enc):
        t = f"{pfx}.transformer.encoder.layers.{li}"
        o = ("pixel_decoder", f"encoder_layer_{li}")
        for sub in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            dense(o + ("self_attn", sub), f"{t}.self_attn.{sub}")
        ln(o + ("norm1",), t + ".norm1")
        ln(o + ("norm2",), t + ".norm2")
        dense(o + ("linear1",), t + ".linear1")
        dense(o + ("linear2",), t + ".linear2")
    conv(("pixel_decoder", "adapter_1"), f"{pfx}.adapter_1", bias=False)
    ln(("pixel_decoder", "adapter_1_gn"), f"{pfx}.adapter_1.norm")
    conv(("pixel_decoder", "layer_1"), f"{pfx}.layer_1", bias=False)
    ln(("pixel_decoder", "layer_1_gn"), f"{pfx}.layer_1.norm")
    conv(("pixel_decoder", "mask_features"), f"{pfx}.mask_features")

    # ---- transformer decoder (predictor) ---------------------------------
    td = params["transformer_decoder"]
    pfx = "sem_seg_head.predictor"
    for name in ("query_feat", "query_embed", "level_embed"):
        copy_(("transformer_decoder", name), f"{pfx}.{name}.weight")

    def mha(o_path, t_key):
        # torch MultiheadAttention packs in_proj as rows [Wq; Wk; Wv];
        # split third i of the packed weight (2-D) or bias (1-D)
        def split(i):
            def xf(v):
                c = v.shape[-1] if v.ndim == 2 else v.shape[0] // 3
                part = v[i * c:(i + 1) * c]
                return _linear(part) if v.ndim == 2 else part
            return xf

        for i, sub in enumerate(("q", "k", "v")):
            copy_(o_path + (sub, "kernel"), t_key + ".in_proj_weight",
                  split(i))
            copy_(o_path + (sub, "bias"), t_key + ".in_proj_bias",
                  split(i))
        dense(o_path + ("proj",), t_key + ".out_proj")

    n_dec = sum(1 for k in td if re.fullmatch(r"layer\d+_cross", k))
    for li in range(n_dec):
        mha(("transformer_decoder", f"layer{li}_cross"),
            f"{pfx}.transformer_cross_attention_layers.{li}.multihead_attn")
        ln(("transformer_decoder", f"layer{li}_cross_norm"),
           f"{pfx}.transformer_cross_attention_layers.{li}.norm")
        mha(("transformer_decoder", f"layer{li}_self"),
            f"{pfx}.transformer_self_attention_layers.{li}.self_attn")
        ln(("transformer_decoder", f"layer{li}_self_norm"),
           f"{pfx}.transformer_self_attention_layers.{li}.norm")
        dense(("transformer_decoder", f"layer{li}_ffn0"),
              f"{pfx}.transformer_ffn_layers.{li}.linear1")
        dense(("transformer_decoder", f"layer{li}_ffn1"),
              f"{pfx}.transformer_ffn_layers.{li}.linear2")
        ln(("transformer_decoder", f"layer{li}_ffn_norm"),
           f"{pfx}.transformer_ffn_layers.{li}.norm")
    ln(("transformer_decoder", "decoder_norm"), f"{pfx}.decoder_norm")
    dense(("transformer_decoder", "class_embed"), f"{pfx}.class_embed")
    for i in range(3):
        dense(("transformer_decoder", "mask_embed", f"fc{i}"),
              f"{pfx}.mask_embed.layers.{i}")

    _SKIP = ("relative_position_index", "attn_mask", "empty_weight",
             "pixel_mean", "pixel_std")
    for k in state:
        if k not in used and not any(s in k for s in _SKIP):
            unmatched.append(k)
    report = {"copied": copied, "missing": missing, "unmatched": unmatched}
    out = dict(variables)
    out["params"] = params
    return out, report
