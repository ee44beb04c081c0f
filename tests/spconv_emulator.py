"""Pure-torch CPU emulation of the spconv + pillar_ops CUDA surfaces.

Lets the vendored reference's sparse-conv model code (pcnres18.py,
pillarnet.py, pillar_modules.py) execute unmodified in this CUDA-free
environment, so parity tests can compare our dense-masked JAX encoders
against the reference's own forward.

Semantics transcribed from the reference sources (not from spconv, which
is absent here):
- SubMConv2d: output only at the INPUT active sites; inactive sites
  contribute zeros to the stencil (dense conv + gather is numerically
  exact for this).
- SparseConv2d (strided): output active set = every output site whose
  kernel footprint covers >=1 active input (computed by convolving the
  occupancy mask).
- SparseSequential: sparse modules consume the sparse tensor; plain
  nn modules (BatchNorm1d, ReLU) apply to `.features`
  (reference usage: pcnres18.py Sparse2DBasicBlock*).
- pillar_cuda wrappers: reference CUDA kernels
  pillar_ops_gpu.cu:13-37 (mask), :55-72 (indices), :89-117 (pairs),
  group_ops_gpu.cu:9-40 (flatten), :42-55 (gather),
  scatter_ops_gpu.cu:13-26 (atomMax into a zero-initialized output).

Weight layout follows spconv 2.x — (O, kH, kW, I) — so state dicts taken
from these emulated modules look exactly like real reference checkpoints
to `hgsfusion_tpu.train.torch_convert`.
"""
from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class SparseConvTensor:
    """Minimal stand-in for spconv.SparseConvTensor.

    features: (M, C); indices: (M, 3) int [batch, idx0, idx1] where idx0
    ranges over spatial_shape[0] and idx1 over spatial_shape[1].
    """

    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features
        self.indices = indices
        self.spatial_shape = tuple(int(s) for s in spatial_shape)
        self.batch_size = int(batch_size)

    def replace_feature(self, new_features):
        return SparseConvTensor(
            new_features, self.indices, self.spatial_shape, self.batch_size)

    def dense(self):
        c = self.features.shape[1]
        out = self.features.new_zeros(self.batch_size, *self.spatial_shape, c)
        idx = self.indices.long()
        out[tuple(idx[:, i] for i in range(idx.shape[1]))] = self.features
        perm = (0, len(self.spatial_shape) + 1) + tuple(
            range(1, len(self.spatial_shape) + 1))
        return out.permute(*perm).contiguous()


class SparseModule(nn.Module):
    pass


def _is_sparse_consumer(m):
    return isinstance(m, (SparseModule, SparseSequential))


class SparseSequential(nn.Sequential):
    def forward(self, x):
        for m in self:
            if isinstance(x, SparseConvTensor) and not _is_sparse_consumer(m):
                x = x.replace_feature(m(x.features))
            else:
                x = m(x)
        return x


class _SparseConvBase(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, bias=True, indice_key=None):
        super().__init__()
        k = (kernel_size if isinstance(kernel_size, (tuple, list))
             else (kernel_size, kernel_size))
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = tuple(k)
        self.stride = stride if isinstance(stride, (tuple, list)) else (stride, stride)
        self.padding = padding if isinstance(padding, (tuple, list)) else (padding, padding)
        self.dilation = dilation if isinstance(dilation, (tuple, list)) else (dilation, dilation)
        self.indice_key = indice_key
        # spconv 2.x layout (O, kH, kW, I)
        self.weight = nn.Parameter(
            torch.empty(out_channels, *self.kernel_size, in_channels))
        fan_in = in_channels * self.kernel_size[0] * self.kernel_size[1]
        nn.init.uniform_(self.weight, -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)

    def _dense_conv(self, x: SparseConvTensor):
        w = self.weight.permute(0, 3, 1, 2)  # (O, I, kH, kW)
        return F.conv2d(x.dense(), w, self.bias, stride=self.stride,
                        padding=self.padding, dilation=self.dilation)


class SubMConv2d(_SparseConvBase):
    """Submanifold conv: active set preserved; stride must be 1.

    spconv computes SubM outputs at the input active sites with the stencil
    implicitly zero-padded — the `padding` argument does not change the
    output positions (focal_sparse_conv.py:20 passes none) — so the dense
    emulation always uses SAME padding."""

    def forward(self, x: SparseConvTensor):
        assert self.stride == (1, 1)
        self.padding = tuple(
            d * (k - 1) // 2 for k, d in zip(self.kernel_size, self.dilation))
        out = self._dense_conv(x)
        idx = x.indices.long()
        feats = out[idx[:, 0], :, idx[:, 1], idx[:, 2]]
        return SparseConvTensor(feats, x.indices, x.spatial_shape, x.batch_size)


def _regular_out_indices(x: SparseConvTensor, kernel_size, stride, padding,
                         dilation):
    """Active set of a regular (non-subm) sparse op: output sites whose
    receptive field covers at least one active input."""
    h, w = x.spatial_shape
    occ = x.features.new_zeros(x.batch_size, 1, h, w)
    idx = x.indices.long()
    occ[idx[:, 0], 0, idx[:, 1], idx[:, 2]] = 1.0
    kernel = occ.new_ones(1, 1, *kernel_size)
    hit = F.conv2d(occ, kernel, stride=stride, padding=padding,
                   dilation=dilation)
    new_idx = (hit[:, 0] > 0).nonzero().int()  # (M', 3) [b, y, x]
    return new_idx, hit.shape[-2:]


class SparseConv2d(_SparseConvBase):
    """Regular sparse conv: grows/strides the active set."""

    def forward(self, x: SparseConvTensor):
        out = self._dense_conv(x)
        new_idx, (oh, ow) = _regular_out_indices(
            x, self.kernel_size, self.stride, self.padding, self.dilation)
        li = new_idx.long()
        feats = out[li[:, 0], :, li[:, 1], li[:, 2]]
        return SparseConvTensor(feats, new_idx, (oh, ow), x.batch_size)


class SparseMaxPool2d(SparseModule):
    def __init__(self, kernel_size, stride=None, padding=0, dilation=1):
        super().__init__()
        k = (kernel_size if isinstance(kernel_size, (tuple, list))
             else (kernel_size, kernel_size))
        self.kernel_size = tuple(k)
        s = stride if stride is not None else kernel_size
        self.stride = s if isinstance(s, (tuple, list)) else (s, s)
        self.padding = padding if isinstance(padding, (tuple, list)) else (padding, padding)

    def forward(self, x: SparseConvTensor):
        dense = x.dense()
        out = F.max_pool2d(dense, self.kernel_size, self.stride, self.padding)
        new_idx, (oh, ow) = _regular_out_indices(
            x, self.kernel_size, self.stride, self.padding, (1, 1))
        li = new_idx.long()
        feats = out[li[:, 0], :, li[:, 1], li[:, 2]]
        return SparseConvTensor(feats, new_idx, (oh, ow), x.batch_size)


class SparseInverseConv2d(SparseModule):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError(
            "SparseInverseConv2d is not used by the vendored reference's "
            "executed paths")


class _SparseConvBase3D(SparseModule):
    """3-D analogue of _SparseConvBase; spconv 2.x layout (O, kD, kH, kW, I).

    Semantics per the 2-D classes above (focal_sparse_conv.py / 
    spconv_backbone_focal.py usage)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, bias=True, indice_key=None):
        super().__init__()
        k = (kernel_size if isinstance(kernel_size, (tuple, list))
             else (kernel_size,) * 3)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = tuple(k)
        self.stride = stride if isinstance(stride, (tuple, list)) else (stride,) * 3
        self.padding = padding if isinstance(padding, (tuple, list)) else (padding,) * 3
        self.dilation = dilation if isinstance(dilation, (tuple, list)) else (dilation,) * 3
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(out_channels, *self.kernel_size, in_channels))
        fan_in = in_channels * int(torch.tensor(self.kernel_size).prod())
        nn.init.uniform_(self.weight, -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)

    def _dense_conv(self, x: SparseConvTensor):
        w = self.weight.permute(0, 4, 1, 2, 3)  # (O, I, kD, kH, kW)
        return F.conv3d(x.dense(), w, self.bias, stride=self.stride,
                        padding=self.padding, dilation=self.dilation)


class SubMConv3d(_SparseConvBase3D):
    """3-D submanifold conv: active set preserved (stride 1); SAME-padded
    like real spconv regardless of the padding argument (see SubMConv2d)."""

    def forward(self, x: SparseConvTensor):
        assert self.stride == (1, 1, 1)
        self.padding = tuple(
            d * (k - 1) // 2 for k, d in zip(self.kernel_size, self.dilation))
        out = self._dense_conv(x)
        idx = x.indices.long()
        feats = out[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]]
        return SparseConvTensor(feats, x.indices, x.spatial_shape,
                                x.batch_size)


class SparseConv3d(_SparseConvBase3D):
    """3-D regular sparse conv: grows/strides the active set."""

    def forward(self, x: SparseConvTensor):
        out = self._dense_conv(x)
        d, h, w = x.spatial_shape
        occ = x.features.new_zeros(x.batch_size, 1, d, h, w)
        idx = x.indices.long()
        occ[idx[:, 0], 0, idx[:, 1], idx[:, 2], idx[:, 3]] = 1.0
        kernel = occ.new_ones(1, 1, *self.kernel_size)
        hit = F.conv3d(occ, kernel, stride=self.stride, padding=self.padding,
                       dilation=self.dilation)
        new_idx = (hit[:, 0] > 0).nonzero().int()
        li = new_idx.long()
        feats = out[li[:, 0], :, li[:, 1], li[:, 2], li[:, 3]]
        return SparseConvTensor(feats, new_idx, hit.shape[-3:], x.batch_size)


# ---------------------------------------------------------------------------
# pillar_cuda emulation (in-place wrapper semantics of pillar_ops/src/*.cu)
# ---------------------------------------------------------------------------

def _point_batch_ids(n, xyz_batch_cnt):
    return torch.repeat_interleave(
        torch.arange(xyz_batch_cnt.numel()), xyz_batch_cnt.long())[:n]


def _pillar_xy_ids(xyz, bev_size):
    # CUDA: int(cx) truncates toward zero (pillar_ops_gpu.cu:31-34)
    xid = torch.trunc(xyz[:, 0] / bev_size).long()
    yid = torch.trunc(xyz[:, 1] / bev_size).long()
    return xid, yid


def make_pillar_cuda():
    """Emulated `pillar_cuda` extension module (in-place fills)."""
    mod = types.ModuleType("pillar_cuda")

    def create_pillar_indices_stack_wrapper(bev_size, xyz, xyz_batch_cnt,
                                            pillar_mask):
        b, h, w = pillar_mask.shape
        bid = _point_batch_ids(xyz.shape[0], xyz_batch_cnt)
        xid, yid = _pillar_xy_ids(xyz, bev_size)
        ok = (xid >= 0) & (xid < w) & (yid >= 0) & (yid < h)
        pillar_mask[bid[ok], yid[ok], xid[ok]] = True

    def create_pillar_indices_wrapper(pillar_bev_indices, pillars):
        b, h, w = pillar_bev_indices.shape
        pos = (pillar_bev_indices.view(-1) >= 0).nonzero()[:, 0]
        dest = pillar_bev_indices.view(-1)[pos].long()
        pillars[dest, 0] = (pos // (h * w)).int()
        pillars[dest, 1] = ((pos // w) % h).int()
        pillars[dest, 2] = (pos % w).int()

    def create_pillar_indice_pairs_stack_wrapper(bev_size, xyz, xyz_batch_cnt,
                                                 pillar_bev_indices,
                                                 indice_pairs):
        b, h, w = pillar_bev_indices.shape
        bid = _point_batch_ids(xyz.shape[0], xyz_batch_cnt)
        xid, yid = _pillar_xy_ids(xyz, bev_size)
        ok = (xid >= 0) & (xid < w) & (yid >= 0) & (yid < h)
        indice_pairs[ok, 0] = pillar_bev_indices[bid[ok], yid[ok], xid[ok]]

    def flatten_indice_pairs_wrapper(indice_pairs, position, first_indices,
                                     second_indices):
        flat = indice_pairs.view(-1)
        pos = (flat > -1).nonzero()[:, 0]
        first_indices[:] = pos.int()
        second_indices[:] = flat[pos]

    def gather_feature_wrapper(set_indices, features, new_features):
        new_features[:] = features[set_indices.long()]

    def scatter_max_wrapper(index, src, arg, out):
        # out is zero-initialized by the caller; atomMax against 0
        # (scatter_ops_gpu.cu:13-26 + scatter_utils.py:26)
        c, m = out.shape
        idx = index.long().unsqueeze(0).expand(c, -1)
        out.scatter_reduce_(1, idx, src, reduce="amax", include_self=True)

    mod.create_pillar_indices_stack_wrapper = create_pillar_indices_stack_wrapper
    mod.create_pillar_indices_wrapper = create_pillar_indices_wrapper
    mod.create_pillar_indice_pairs_stack_wrapper = (
        create_pillar_indice_pairs_stack_wrapper)
    mod.flatten_indice_pairs_wrapper = flatten_indice_pairs_wrapper
    mod.gather_feature_wrapper = gather_feature_wrapper
    mod.scatter_max_wrapper = scatter_max_wrapper
    return mod


def install_spconv_stub():
    """Register emulated `spconv` / `spconv.pytorch` modules in sys.modules
    (idempotent). Returns the top-level module."""
    if "spconv" in sys.modules and hasattr(sys.modules["spconv"], "_emulated"):
        return sys.modules["spconv"]
    sp = types.ModuleType("spconv")
    sp._emulated = True
    sp.__version__ = "2.1.21"  # spconv_utils.py:4 parses [2:] as a float
    for name, obj in (
        ("SparseConvTensor", SparseConvTensor),
        ("SparseModule", SparseModule),
        ("SparseSequential", SparseSequential),
        ("SubMConv2d", SubMConv2d),
        ("SparseConv2d", SparseConv2d),
        ("SparseMaxPool2d", SparseMaxPool2d),
        ("SparseInverseConv2d", SparseInverseConv2d),
        ("SubMConv3d", SubMConv3d),
        ("SparseConv3d", SparseConv3d),
    ):
        setattr(sp, name, obj)
    conv_mod = types.ModuleType("spconv.conv")
    conv_mod.SparseConvolution = _SparseConvBase
    sp.conv = conv_mod
    sys.modules["spconv.conv"] = conv_mod
    pytorch = types.ModuleType("spconv.pytorch")
    for name in ("SparseConvTensor", "SparseModule", "SparseSequential",
                 "SubMConv2d", "SparseConv2d", "SparseMaxPool2d",
                 "SparseInverseConv2d", "SubMConv3d", "SparseConv3d"):
        setattr(pytorch, name, getattr(sp, name))
    pytorch.conv = conv_mod
    functional = types.ModuleType("spconv.pytorch.functional")
    ops = types.ModuleType("spconv.pytorch.ops")
    utils = types.ModuleType("spconv.utils")
    pytorch.functional = functional
    pytorch.ops = ops
    sp.pytorch = pytorch
    sp.utils = utils
    sp.ops = ops
    sys.modules.update({
        "spconv": sp,
        "spconv.pytorch": pytorch,
        "spconv.pytorch.functional": functional,
        "spconv.pytorch.ops": ops,
        "spconv.utils": utils,
    })
    return sp
