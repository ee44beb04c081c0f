"""YAML config system: _BASE_CONFIG_ inheritance + CLI overrides.

Keeps the reference's two-level YAML schema and field names
(pcdet/config.py:16-85) so reference configs port 1:1, but uses a plain
attribute-dict (no global mutable singleton).
"""
from __future__ import annotations

import ast
from pathlib import Path

import yaml


class ConfigDict(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, list):
            return [cls._wrap(x) for x in v]
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def get(self, key, default=None):
        return super().get(key, default)

    def copy(self):
        return ConfigDict({k: v for k, v in self.items()})


def _merge(base: dict, new: dict) -> dict:
    """Recursive merge: `new` wins; nested dicts merge (pcdet/config.py:51-66)."""
    out = dict(base)
    for k, v in new.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path, root_dir=None) -> ConfigDict:
    """Load a YAML config, resolving _BASE_CONFIG_ inheritance recursively.

    Base paths are resolved relative to `root_dir` (default: repo root =
    two levels above this file) first, then relative to the config file.
    """
    path = Path(path)
    if root_dir is None:
        root_dir = Path(__file__).resolve().parent.parent
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}

    def resolve_bases(node, cfg_dir):
        if not isinstance(node, dict):
            return node
        base_rel = node.pop("_BASE_CONFIG_", None)
        node = {k: resolve_bases(v, cfg_dir) for k, v in node.items()}
        if base_rel is not None:
            cand = Path(root_dir) / base_rel
            if not cand.exists():
                cand = cfg_dir / base_rel
            base = load_config(cand, root_dir=root_dir)
            node = _merge(base, node)
        return node

    cfg = resolve_bases(cfg, path.parent)
    out = ConfigDict(cfg)
    out["TAG"] = path.stem
    return out


def cfg_from_list(cfg: ConfigDict, kv_list):
    """Apply 'KEY.SUBKEY value' CLI overrides with literal-eval type coercion
    (pcdet/config.py:16-48)."""
    assert len(kv_list) % 2 == 0, "override list must be key/value pairs"
    for key, value in zip(kv_list[0::2], kv_list[1::2]):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                node[p] = ConfigDict()
            node = node[p]
        leaf = parts[-1]
        if leaf in node and node[leaf] is not None and not isinstance(
            node[leaf], (dict, list)
        ):
            value = type(node[leaf])(value) if not isinstance(value, type(node[leaf])) else value
        node[leaf] = ConfigDict._wrap(value)
    return cfg


_DEFAULT_CENTER_CHANNELS = {"center": 2, "center_z": 1, "dim": 3, "rot": 2,
                            "vel": 2, "iou": 1}


def _center_head_layout(head):
    """(order, channels) from SEPARATE_HEAD_CFG, with defaults for missing
    HEAD_ORDER / HEAD_DICT entries."""
    sep = head.get("SEPARATE_HEAD_CFG", {})
    order = tuple(sep.get("HEAD_ORDER", ("center", "center_z", "dim", "rot")))
    head_dict = sep.get("HEAD_DICT", {})
    channels = tuple(
        head_dict.get(k, {}).get(
            "out_channels", _DEFAULT_CENTER_CHANNELS.get(k, 2))
        for k in order
    )
    return order, channels


def model_config_from_yaml(cfg: ConfigDict):
    """Build the static HGSFusionConfig dataclass from a reference-schema YAML."""
    from .models.detector import HGSFusionConfig

    model = cfg.MODEL
    data = cfg.DATA_CONFIG
    # Head-less second-stage families (MPPNet: proposals come in through
    # the batch) may omit the branch blocks — absent keys fall back to the
    # HGSFusionConfig dataclass defaults. Every OTHER family keeps the
    # fail-fast direct access so a typo'd block name (DENSE_HEADS, ...)
    # raises at load time with the missing key, not as an obscure
    # zero-anchor shape error deep in the model build.
    _e = ConfigDict({})
    lenient = model.NAME in ("MPPNet", "MPPNetE2E")

    def blk(parent, key):
        return parent.get(key, _e) if lenient else parent[key]

    fusion_vfe = blk(model, "FusionVFE")
    image_vfe = blk(fusion_vfe, "ImageVFE")
    radar = blk(fusion_vfe, "RadarBackbone")
    occ = blk(fusion_vfe, "RadarOccupancy")
    fuse = blk(model, "FUSION_AFTER_BEV")
    head = blk(model, "DENSE_HEAD")
    ffn = blk(image_vfe, "FFN")
    f2v = blk(image_vfe, "F2V")

    pc_range = tuple(data.POINT_CLOUD_RANGE)
    voxel_size = tuple(
        next(
            p["VOXEL_SIZE"]
            for p in data.DATA_PROCESSOR
            if p["NAME"] == "calculate_grid_size"
        )
    )
    disc = ffn.get("DISCRETIZE", ConfigDict(
        {"mode": "LID", "num_bins": 80, "depth_min": 1.0,
         "depth_max": 51.2}))
    if "ANCHOR_GENERATOR_CONFIG" in head:
        n_anchor = sum(
            len(c["anchor_rotations"]) * len(c["anchor_sizes"]) * len(c["anchor_bottom_heights"])
            for c in head.ANCHOR_GENERATOR_CONFIG
        )
    else:  # anchor-free heads (CenterHead)
        n_anchor = 0
    tgt = head.get("TARGET_ASSIGNER_CONFIG", {})
    post = cfg.MODEL.get("POST_PROCESSING", {})
    num_pt_feats = len(data.POINT_FEATURE_ENCODING.used_feature_list)
    # AnchorHeadMulti (grouped multihead) static shape extraction
    coder_cfg = tgt.get("BOX_CODER_CONFIG", {})
    sep_reg = head.get("SEPARATE_REG_CONFIG", {})
    rpn_head_cfgs = None
    mh_num_per_loc = ()
    if head.get("NAME") == "AnchorHeadMulti":
        rpn_head_cfgs = tuple(
            tuple(h["HEAD_CLS_NAME"]) for h in head.RPN_HEAD_CFGS
        )
        mh_num_per_loc = tuple(
            len(c["anchor_rotations"]) * len(c["anchor_sizes"])
            * len(c["anchor_bottom_heights"])
            for c in head.ANCHOR_GENERATOR_CONFIG
        )
    return HGSFusionConfig(
        class_names=tuple(cfg.CLASS_NAMES),
        pc_range=pc_range,
        voxel_size=voxel_size,
        image_backbone=ffn.get("DDN", _e).get("BACKBONE_NAME", "ResNet101"),
        ddn_quant=ffn.get("DDN", _e).get("QUANT", "none"),
        channel_reduce_out=ffn.get("CHANNEL_REDUCE", _e).get(
            "out_channels", 64),
        f2v_out_channels=f2v.get("OUT_CHANNELS", 128),
        f2v_quant=f2v.get("QUANT", "none"),
        f2v_sampler_kernel=f2v.get("SAMPLER_KERNEL", "xla"),
        f2v_view=f2v.get("VIEW", "gather"),
        f2v_polar_zeta_bins=f2v.get("POLAR_ZETA_BINS", 128),
        f2v_polar_near_columns=f2v.get("POLAR_NEAR_COLUMNS", 20),
        disc_mode=disc["mode"],
        disc_num_bins=disc["num_bins"],
        disc_depth_min=disc["depth_min"],
        disc_depth_max=disc["depth_max"],
        bev_aug=f2v.get("BEV_AUG", False),
        image_size=tuple(data.get("IMAGE_SIZE", (516, 1936))),
        num_point_features=num_pt_feats,
        reader_num_input=radar.get("READER", _e).get(
            "NUM_INPUT_FEATURES", 29),
        backbone_out_indices=tuple(
            radar.get("BACKBONE", _e).get("OUT_INDICES", (0, 1, 2))),
        neck_out_channels=tuple(
            radar.get("NECK", _e).get("OUT_CHANNELS", (128, 128))),
        radar_input_channels=occ.get("RADAR_INPUT_CHANNELS", 128),
        aspp_dilation=occ.get("ASPP_SHAPE", 6),
        use_aspp=occ.get("USE_ASPP", False),
        aspp_dilations=(tuple(occ["ASPP_DIAL"])
                        if occ.get("ASPP_DIAL") else None),
        use_dcn=(tuple(occ["USE_DCN"]) if occ.get("USE_DCN") else None),
        occ_use_mask=occ.get("USE_MASK", False),
        occ_fuse_mode=occ.get("FUSE_MODE", "MUL"),
        fusion_image_out=fuse.get("IMAGE_OUT_CHANNELS", 128),
        fusion_radar_out=fuse.get("RADAR_OUT_CHANNELS", 128),
        num_anchors_per_location=n_anchor,
        num_dir_bins=head.get("NUM_DIR_BINS", 2),
        dir_offset=head.get("DIR_OFFSET", 0.78539),
        dir_limit_offset=head.get("DIR_LIMIT_OFFSET", 0.0),
        rpn_head_cfgs=rpn_head_cfgs,
        mh_num_per_loc=mh_num_per_loc,
        mh_shared_conv_filters=head.get("SHARED_CONV_NUM_FILTER", 64),
        mh_separate_reg_list=tuple(sep_reg.get(
            "REG_LIST", ("reg:2", "height:1", "size:3", "angle:2", "velo:2")
        )),
        mh_num_middle_conv=sep_reg.get("NUM_MIDDLE_CONV", 1),
        mh_num_middle_filter=sep_reg.get("NUM_MIDDLE_FILTER", 64),
        mh_separate_multihead=head.get("SEPARATE_MULTIHEAD", True),
        # reference semantics: the dir CONV exists iff the key is present
        # (anchor_head_multi.py:86), but dir preds are only EMITTED — and
        # the dir loss / sin-difference / heading snap only apply — when
        # the VALUE is truthy (:214, :341); emission is what matters here
        mh_use_dir=bool(head.get("USE_DIRECTION_CLASSIFIER", False))
        if rpn_head_cfgs else False,
        box_coder_size=coder_cfg.get("code_size", 7),
        box_coder_sincos=coder_cfg.get("encode_angle_by_sincos", False),
        image_backbone_arch=(
            "swin"
            if model.get("IMAGE_BACKBONE", {}).get("NAME")
            == "SwinTransformer" else "ddn"
        ),
        swin_embed_dims=model.get("IMAGE_BACKBONE", {}).get("EMBED_DIMS", 96),
        swin_depths=tuple(
            model.get("IMAGE_BACKBONE", {}).get("DEPTHS", (2, 2, 6, 2))),
        swin_num_heads=tuple(
            model.get("IMAGE_BACKBONE", {}).get("NUM_HEADS", (3, 6, 12, 24))),
        swin_window_size=model.get("IMAGE_BACKBONE", {}).get(
            "WINDOW_SIZE", 7),
        swin_mlp_ratio=model.get("IMAGE_BACKBONE", {}).get("MLP_RATIO", 4),
        swin_out_indices=tuple(
            model.get("IMAGE_BACKBONE", {}).get("OUT_INDICES", (1, 2, 3))),
        swin_drop_path=model.get("IMAGE_BACKBONE", {}).get(
            "DROP_PATH_RATE", 0.2),
        swin_patch_size=model.get("IMAGE_BACKBONE", {}).get("PATCH_SIZE", 4),
        fpn_out_channels=model.get("NECK", {}).get("OUT_CHANNELS", 256),
        compute_dtype=model.get("COMPUTE_DTYPE", "float32"),
        remat=model.get("REMAT", True),
        use_depth=image_vfe.get("USE_DEPTH", True),
        center_feature_map_stride=tgt.get("FEATURE_MAP_STRIDE", 2),
        center_max_k=post.get("MAX_OBJ_PER_SAMPLE", 500),
        # TransFusion peak-pool exemptions follow TARGET_ASSIGNER_CONFIG.
        # DATASET (transfusion_head.py predict:168-176): nuScenes exempts
        # classes 8,9 (Pedestrian/Traffic_cone), Waymo 1,2 (Ped/Cyc), any
        # other dataset (VoD/TJ4D) pools ALL classes
        tf_no_pool_classes={"nuScenes": (8, 9), "Waymo": (1, 2)}.get(
            tgt.get("DATASET", ""), ()),
        center_gaussian_overlap=tgt.get("GAUSSIAN_OVERLAP", 0.1),
        center_min_radius=tgt.get("MIN_RADIUS", 2),
        center_post_limit=tuple(
            post.get(
                "POST_CENTER_LIMIT_RANGE",
                (-75.0, -75.0, -10.0, 75.0, 75.0, 10.0),
            )
        ),
        center_head_order=tuple(_center_head_layout(head)[0]),
        center_head_channels=tuple(_center_head_layout(head)[1]),
        pv_num_keypoints=model.get("PFE", {}).get("NUM_KEYPOINTS", 1024),
        pv_num_rois=model.get("ROI_HEAD", {}).get("NUM_ROIS", 128),
        pv_nms_thresh=model.get("ROI_HEAD", {}).get("NMS_THRESH_TRAIN", 0.8),
        point_mean_sizes=tuple(
            tuple(s) for s in head.get(
                "MEAN_SIZE",
                ((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)),
            )
        ),
        point_npoints=tuple(
            model.get("BACKBONE_3D", {}).get(
                "NPOINTS", (4096, 1024, 256, 64)
            )
        ),
        roi_point_sample=model.get("ROI_HEAD", {}).get(
            "NUM_SAMPLED_POINTS", 512
        ),
        iou_grid_size=model.get("ROI_HEAD", {}).get("GRID_SIZE_2D", 7),
        iou_score_type=model.get("POST_PROCESSING", {}).get(
            "SCORE_TYPE", "iou"
        ),
        backbone_3d_arch={
            "VoxelBackBone8xFocal": "voxel8x_focal",
            "PillarBackBone8x": "pillar_8x",
            "PillarRes18BackBone8x": "pillar_res2d_8x",
            "VoxelResBackBone8xVoxelNeXt2D": "voxelnext2d",
        }.get(model.get("BACKBONE_3D", {}).get("NAME"), "voxel8x"),
        bev_v1_layer_nums=tuple(
            model.get("BACKBONE_2D", {}).get("LAYER_NUMS", (5, 5))),
        bev_v1_num_filters=tuple(
            model.get("BACKBONE_2D", {}).get("NUM_FILTERS", (256, 256))),
        bev_v1_upsample_strides=tuple(
            model.get("BACKBONE_2D", {}).get("UPSAMPLE_STRIDES", (1, 2))),
        bev_v1_num_upsample_filters=tuple(
            model.get("BACKBONE_2D", {}).get(
                "NUM_UPSAMPLE_FILTERS", (128, 128))),
        focal_topk=model.get("BACKBONE_3D", {}).get("TOPK", True),
        focal_threshold=model.get("BACKBONE_3D", {}).get("THRESHOLD", 0.5),
        focal_mask_multi=model.get("BACKBONE_3D", {}).get(
            "MASK_MULTI", False),
        focal_skip_mask_kernel=model.get("BACKBONE_3D", {}).get(
            "SKIP_MASK_KERNEL", False),
        parta2_pool_size=model.get("ROI_HEAD", {}).get("POOL_SIZE", 6),
    )
