"""ResNet-101 backbone with DeepLabV3 dilation, flax.linen NHWC.

Reimplements the torchvision `deeplabv3_resnet101` backbone used by the
reference DDN (pcdet/.../ffn/ddn/ddn_deeplabv3.py:9-24, ddn_template.py:16-210):
ResNet-101 with replace_stride_with_dilation=[False, True, True], i.e.
layer3/layer4 keep stride 8 with dilations 2/4 (first block of a dilated
stage uses the previous stage's dilation, matching torchvision _make_layer).
Only the backbone is needed: with USE_DEPTH False the DeepLab classifier head
never runs (ddn_template.py:163-167).

Multi-scale taps: returns layer1..layer4 feature maps (strides 4, 8, 8, 8).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_images(images):
    """ImageNet-normalize, keeping zero-padded pixels at exactly 0.

    ddn_template.preprocess:191-210: mask = (x == 0) before normalize, then
    x[mask] = 0 (so collate padding stays neutral).

    Accepts uint8 (the data layer ships images as raw bytes — 4x less
    host->device traffic than f32; uint8/255 -> f32 here is exactly the
    value the old f32 pipeline carried) or float [0, 1].
    """
    mask = images == 0
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    x = (images - mean) / std
    return jnp.where(mask, 0.0, x)


class QConv8(nn.Module):
    """Drop-in nn.Conv(use_bias=False) that runs on the MXU's int8 path.

    w8a8 dynamic quantization for the FROZEN DDN backbone
    (ddn_template.py:72-75 freezes the COCO weights, so quantization
    error is a one-time, scannable quantity): per-tensor activation
    scale and per-output-channel weight scale, both computed inside the
    jitted graph (the weight max folds to a constant under jit since
    params are trace-constant leaves), int8xint8->int32 convolution —
    2x MXU throughput on v5e vs bf16 — then one rescale back to the
    compute dtype. The parameter tree is IDENTICAL to nn.Conv (one
    "kernel" f32 leaf), so checkpoints and the torch converter are
    untouched.
    """

    features: int
    kernel_size: tuple = (1, 1)
    strides: tuple = (1, 1)
    padding: object = ((0, 0), (0, 0))
    kernel_dilation: tuple = (1, 1)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        # activation: per-tensor symmetric, dynamic
        ax = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127, 127
                      ).astype(jnp.int8)
        # weights: per-output-channel symmetric (constant-folded under jit)
        wk = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        qk = jnp.clip(jnp.round(kernel / wk), -127, 127).astype(jnp.int8)
        out = lax.conv_general_dilated(
            qx, qk, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        cdt = self.dtype or jnp.float32
        return (out.astype(jnp.float32) * (ax * wk)).astype(cdt)


def _make_conv(quant: str, dtype):
    """nn.Conv or its int8 twin, same call/param signature."""
    if quant == "w8a8":
        def conv(features, kernel_size, strides=(1, 1),
                 padding=((0, 0), (0, 0)), kernel_dilation=(1, 1),
                 use_bias=False, dtype=dtype, name=None):
            assert not use_bias
            return QConv8(features, tuple(kernel_size), tuple(strides),
                          padding, tuple(kernel_dilation), dtype=dtype,
                          name=name)
        return conv
    if quant != "none":
        raise NotImplementedError(
            f"DDN QUANT={quant!r} (supported: none, w8a8)")
    return nn.Conv


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_momentum: float = 0.1
    quant: str = "none"
    dtype: object = None  # compute dtype; params/BN stats stay f32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=1.0 - self.bn_momentum,
                epsilon=1e-5, dtype=self.dtype, name=name,
            )

        conv = _make_conv(self.quant, self.dtype)
        identity = x
        out = conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        pad = self.dilation
        out = conv(
            self.planes, (3, 3), strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = conv(
                self.planes * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetDeepLabBackbone(nn.Module):
    """ResNet with [3,4,23,3] (101) or [3,4,6,3] (50) bottleneck stages."""

    stage_sizes: Sequence[int] = (3, 4, 23, 3)
    bn_momentum: float = 0.1
    quant: str = "none"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        conv = _make_conv(self.quant, self.dtype)
        x = conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=1.0 - self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = []
        # (planes, stride, stage_dilation); dilated stages follow torchvision:
        # first block uses previous dilation, the rest the new one.
        stage_cfg = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        prev_dilation = 1
        for si, ((planes, stride, dilation), blocks) in enumerate(
            zip(stage_cfg, self.stage_sizes)
        ):
            for bi in range(blocks):
                if bi == 0:
                    x = Bottleneck(
                        planes, strides=stride, dilation=prev_dilation,
                        downsample=True, bn_momentum=self.bn_momentum,
                        quant=self.quant, dtype=self.dtype,
                        name=f"layer{si + 1}_block0",
                    )(x, train)
                else:
                    x = Bottleneck(
                        planes, dilation=dilation, bn_momentum=self.bn_momentum,
                        quant=self.quant, dtype=self.dtype,
                        name=f"layer{si + 1}_block{bi}",
                    )(x, train)
            prev_dilation = dilation
            taps.append(x)
        return taps  # [layer1 (C=256, /4), layer2 (512, /8), layer3 (1024, /8), layer4 (2048, /8)]


def resnet101_deeplab(bn_momentum: float = 0.1):
    return ResNetDeepLabBackbone(stage_sizes=(3, 4, 23, 3), bn_momentum=bn_momentum)


def resnet50_deeplab(bn_momentum: float = 0.1):
    return ResNetDeepLabBackbone(stage_sizes=(3, 4, 6, 3), bn_momentum=bn_momentum)


class ASPPModule(nn.Module):
    """DeepLabV3 ASPP: 1x1 + three dilated 3x3 branches + image pooling.

    torchvision deeplabv3 head (used when USE_DEPTH True; the reference runs
    model.classifier on layer4, ddn_template.py:163-167).
    """

    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        branches = []
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="b0_conv")(x)
        branches.append(nn.relu(bn("b0_bn")(h)))
        for i, rate in enumerate(self.atrous_rates):
            h = nn.Conv(
                self.out_channels, (3, 3), padding=((rate, rate), (rate, rate)),
                kernel_dilation=(rate, rate), use_bias=False, dtype=self.dtype,
                name=f"b{i + 1}_conv",
            )(x)
            branches.append(nn.relu(bn(f"b{i + 1}_bn")(h)))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pool_conv")(g)
        g = nn.relu(bn("pool_bn")(g))
        g = jnp.broadcast_to(g, x.shape[:3] + (self.out_channels,))
        branches.append(g)

        h = jnp.concatenate(branches, axis=-1)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        return nn.relu(bn("project_bn")(h))


class DeepLabClassifier(nn.Module):
    """ASPP -> 3x3 conv-BN-ReLU -> 1x1 logits (torchvision DeepLabHead)."""

    num_classes: int = 81  # depth bins + 1 (DepthFFN disc num_bins + 1)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = ASPPModule(dtype=self.dtype, name="aspp")(x, train)
        h = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(h)
        h = nn.relu(h)
        # final logits in f32 (softmax/loss stability)
        return nn.Conv(self.num_classes, (1, 1), name="logits")(h).astype(
            jnp.float32
        )
