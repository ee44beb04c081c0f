"""Import vendored-reference pcdet submodules under their canonical dotted
names WITHOUT executing pcdet/__init__.py (which pulls the whole registry +
compiled CUDA ops).

Mechanism: pre-register every needed package name as an empty module whose
`__path__` points at the real reference directory — Python's path finder
then loads requested *submodules* from the reference files directly, while
the package `__init__.py` never runs (the stub is already in sys.modules).
External/compiled deps (spconv, pillar_cuda, kornia, mmcv, torchvision,
numba) are emulated or stubbed BEFORE any reference file loads.

Used by the whole-graph and subsystem parity tests; reference semantics for
the emulations are cited in tests/spconv_emulator.py.
"""
from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import torch

REF_ROOT = Path("/root/reference")

_PACKAGES = [
    "pcdet",
    "pcdet.utils",
    "pcdet.ops",
    "pcdet.ops.pillar_ops",
    "pcdet.ops.iou3d_nms",
    "pcdet.ops.roiaware_pool3d",
    "pcdet.models",
    "pcdet.models.model_utils",
    "pcdet.models.backbones_2d",
    "pcdet.models.backbones_2d.resnet_modules",
    "pcdet.models.backbones_image",
    "pcdet.models.backbones_image.img_neck",
    "pcdet.models.fusion",
    "pcdet.models.dense_heads",
    "pcdet.models.dense_heads.target_assigner",
    "pcdet.models.backbones_3d",
    "pcdet.models.backbones_3d.focal_sparse_conv",
    "pcdet.models.backbones_3d.vfe",
    "pcdet.models.backbones_3d.vfe.pillarnet_modules",
    "pcdet.models.backbones_3d.vfe.image_vfe_modules",
    "pcdet.models.backbones_3d.vfe.image_vfe_modules.f2v",
    "pcdet.models.backbones_3d.vfe.image_vfe_modules.ffn",
]


def _stub(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_numba():
    if "numba" in sys.modules:
        return

    def _jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    nb = _stub("numba")
    nb.jit = _jit
    nb.njit = _jit
    nb.prange = range


def _install_kornia():
    """The two kornia functions frustum_grid_generator.py:5-6 uses.

    create_meshgrid3d mirrors kornia.utils.grid (meshgrid over [zs, xs, ys]
    -> (1, D, W, H, 3) -> permute to (1, D, H, W, 3), last dim =
    (depth_idx, width_idx, height_idx)); transform_points is the standard
    homogeneous affine map (exact for the B=1 shapes the reference uses).
    """
    if "kornia" in sys.modules and hasattr(sys.modules["kornia"], "_emulated"):
        return

    def create_meshgrid3d(depth, height, width, normalized_coordinates=True,
                          device=None, dtype=None):
        assert not normalized_coordinates
        zs = torch.arange(int(depth), dtype=torch.float32)
        xs = torch.arange(int(width), dtype=torch.float32)
        ys = torch.arange(int(height), dtype=torch.float32)
        g = torch.stack(torch.meshgrid(zs, xs, ys, indexing="ij"), dim=-1)
        return g.unsqueeze(0).permute(0, 1, 3, 2, 4)  # (1, D, H, W, 3)

    def transform_points(trans_01, points_1):
        # kornia flattens both to (-1, N, D) and repeat_interleaves the
        # transform to match the flattened batch (geometry/linalg.py), which
        # is what lets frustum_grid_generator.py:131-135 pass
        # (B, 1, 1, 4, 4) transforms against (B, X, Y, Z, 3) grids.
        shape_inp = list(points_1.shape)
        pts = points_1.reshape(-1, points_1.shape[-2], points_1.shape[-1])
        tr = trans_01.reshape(-1, trans_01.shape[-2], trans_01.shape[-1])
        tr = torch.repeat_interleave(
            tr, repeats=pts.shape[0] // tr.shape[0], dim=0)
        ph = torch.cat([pts, torch.ones_like(pts[..., :1])], dim=-1)
        out = torch.bmm(ph, tr.permute(0, 2, 1))
        out = out[..., :-1] / out[..., -1:]
        return out.reshape(shape_inp)

    class FocalLoss(torch.nn.Module):
        """kornia.losses.FocalLoss over class-logit maps (ddn_loss.py:46).

        CE focal form: loss = -alpha * (1 - p_t)^gamma * log(p_t) per pixel,
        input (B, C, ...) logits, target (B, ...) int64.
        """

        def __init__(self, alpha, gamma=2.0, reduction="none"):
            super().__init__()
            self.alpha, self.gamma, self.reduction = alpha, gamma, reduction

        def forward(self, input, target):
            logp = torch.log_softmax(input, dim=1)
            logpt = logp.gather(1, target.unsqueeze(1)).squeeze(1)
            pt = logpt.exp()
            loss = -self.alpha * (1 - pt) ** self.gamma * logpt
            if self.reduction == "mean":
                return loss.mean()
            if self.reduction == "sum":
                return loss.sum()
            return loss

    kornia = _stub("kornia")
    kornia._emulated = True
    losses = _stub("kornia.losses")
    focal = _stub("kornia.losses.focal")
    focal.FocalLoss = FocalLoss
    losses.focal = focal
    losses.FocalLoss = FocalLoss
    kornia.losses = losses
    utils = _stub("kornia.utils")
    grid = _stub("kornia.utils.grid")
    geometry = _stub("kornia.geometry")
    linalg = _stub("kornia.geometry.linalg")
    conversions = _stub("kornia.geometry.conversions")
    grid.create_meshgrid3d = create_meshgrid3d
    linalg.transform_points = transform_points
    conversions.convert_points_to_homogeneous = lambda p: torch.cat(
        [p, torch.ones_like(p[..., :1])], dim=-1)
    conversions.convert_points_from_homogeneous = (
        lambda p: p[..., :-1] / p[..., -1:])
    kornia.utils = utils
    kornia.geometry = geometry
    utils.grid = grid
    geometry.linalg = linalg
    geometry.conversions = conversions


def _get_or_stub(name):
    return sys.modules.get(name) or _stub(name)


def _install_misc_stubs():
    # mmcv: only ModulatedDeformConv2dPack is imported (unused in the
    # flagship config path, radar_occupancy_2d_v2.py:6). Other tests in the
    # same session may have pre-stubbed parts of mmcv — heal attributes
    # instead of skipping, so ordering doesn't matter.
    mmcv = _get_or_stub("mmcv")
    ops = _get_or_stub("mmcv.ops")
    mdc = _get_or_stub("mmcv.ops.modulated_deform_conv")

    class _DCNUnavailable(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    if not hasattr(mdc, "ModulatedDeformConv2dPack"):
        mdc.ModulatedDeformConv2dPack = _DCNUnavailable
    cnn = _get_or_stub("mmcv.cnn")
    if not hasattr(cnn, "build_norm_layer"):
        cnn.build_norm_layer = (
            lambda cfg, ch, postfix=0: (None, torch.nn.BatchNorm2d(ch)))
    # ddn_yolox.py/yoloxpafpn.py (unused YOLOX DDN variant) import these
    # at module scope; instantiating them is out of scope.
    if not hasattr(cnn, "ConvModule"):
        cnn.ConvModule = _DCNUnavailable
    if not hasattr(cnn, "DepthwiseSeparableConvModule"):
        cnn.DepthwiseSeparableConvModule = _DCNUnavailable
    mmcv.ops = ops
    mmcv.cnn = cnn
    if not hasattr(ops, "modulated_deform_conv"):
        ops.modulated_deform_conv = mdc
    # mmengine/mmdet: module-scope imports of the unused YOLOX/mmdet-ResNet
    # DDN variants (ddn_yolox.py:11-12, ddn_resnet.py:8-9, yoloxpafpn.py:6-10)
    if "mmengine" not in sys.modules:
        class _MMUnavailable(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        me = _stub("mmengine")
        me_model = _stub("mmengine.model")
        me_model.BaseModule = _MMUnavailable
        me_model.xavier_init = lambda m, **k: torch.nn.init.xavier_uniform_(
            m.weight) if hasattr(m, "weight") else None
        me.model = me_model
        md = _stub("mmdet")
        md_models = _stub("mmdet.models")
        md_models.CSPDarknet = _MMUnavailable
        md_backbones = _stub("mmdet.models.backbones")
        md_backbones.ResNet = _MMUnavailable
        md_necks = _stub("mmdet.models.necks")
        md_necks.FPN = _MMUnavailable
        md_layers = _stub("mmdet.models.layers")
        md_layers.CSPLayer = _MMUnavailable
        md_registry = _stub("mmdet.registry")

        class _Registry:
            def register_module(self, *a, **k):
                return lambda cls: cls

        md_registry.MODELS = _Registry()
        md.models = md_models
        md_models.backbones = md_backbones
        md_models.necks = md_necks
        md_models.layers = md_layers
        md.registry = md_registry
    # torchvision: rpn.py imports torchvision.models.resnet at module level
    # (RPNV2 itself is dead-as-shipped; pillarnet.py only needs the import
    # to succeed)
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        models = _stub("torchvision.models")
        resnet = _stub("torchvision.models.resnet")
        models.resnet = resnet
        tv.models = models
    # SharedArray: common_utils.py:9 imports it unconditionally; only
    # sa_create/sa_delete (dataset caching, unused here) touch it.
    if "SharedArray" not in sys.modules:
        _stub("SharedArray")


def install_reference_packages():
    """Register package stubs + dependency emulations; returns a loader
    `load(dotted_name)` that imports a reference submodule by dotted path."""
    from spconv_emulator import install_spconv_stub, make_pillar_cuda

    install_spconv_stub()
    _install_numba()
    _install_kornia()
    _install_misc_stubs()

    for name in _PACKAGES:
        if name in sys.modules:
            continue
        pkg = types.ModuleType(name)
        pkg.__path__ = [str(REF_ROOT / name.replace(".", "/"))]
        sys.modules[name] = pkg

    # compiled extension inside pillar_ops
    if "pcdet.ops.pillar_ops.pillar_cuda" not in sys.modules:
        sys.modules["pcdet.ops.pillar_ops.pillar_cuda"] = make_pillar_cuda()
    # compiled CUDA extensions imported at module scope by
    # iou3d_nms_utils.py:8 / roiaware_pool3d_utils.py (their functions are
    # only called from paths the parity tests don't execute)
    for cuda_ext in ("pcdet.ops.iou3d_nms.iou3d_nms_cuda",
                     "pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda"):
        if cuda_ext not in sys.modules:
            _stub(cuda_ext)

    # vfe siblings referenced by fusion_vfe.py that the vendored tree does
    # not ship (feature_sampler, radar_occupancy_2d, foreground_sampler) —
    # unused by the flagship config; class attributes only need to exist
    base = "pcdet.models.backbones_3d.vfe"
    for mod_name, classes in (
        ("feature_sampler", ["GaussianSampler"]),
        ("radar_occupancy_2d", ["RadarOccupancy2D"]),
        ("foreground_sampler", ["ForegroundSampler"]),
    ):
        full = f"{base}.{mod_name}"
        if full not in sys.modules:
            m = _stub(full)
            for cls in classes:
                setattr(m, cls, type(cls, (torch.nn.Module,), {}))

    return load


def load(dotted_name):
    """Import (or fetch) a reference submodule, e.g.
    load('pcdet.models.backbones_3d.vfe.pillarnet')."""
    return importlib.import_module(dotted_name)
