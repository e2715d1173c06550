"""Flax ResNet trunks for speaker embeddings (r-vector geometry).

Architecture parity with the reference trunks (model.py:205-331):
- stem: 3x3 stride-1 conv to 32 channels (no max-pool),
- stages 32/64/128/256 with strides 1/2/2/2,
- BasicBlock / SEBasicBlock / Bottleneck all with expansion **1**
  (the reference deliberately deviates from torchvision's 4x bottleneck),
- 1x1-conv+BN downsample on shape change,
- Kaiming-normal(fan_out) conv init, BN γ=1 β=0,
- trunk output is the 4-D feature map — pooling/fc live in SpeakerModel.

TPU-first differences: NHWC layout — input (B, F, T) becomes
(B, H=F, W=T, C=1) so convolutions hit the MXU's preferred layout; compute
dtype is configurable (bf16 by default for the conv stack, params and BN
statistics in f32).  BatchNorm under pjit data-parallelism computes global
batch statistics (SyncBN semantics) — the reference's DDP kept per-replica
statistics; global stats are a strict upgrade and documented deviation
(SURVEY §7 hard-parts list).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # torch Conv2d(padding=k//2) semantics: for stride 1 that IS flax
        # "SAME" (kept for XLA's native conv-padding path); under stride 2
        # "SAME" pads asymmetrically and shifts the taps, breaking
        # checkpoint-import parity, so strided convs pad explicitly
        if self.strides == (1, 1):
            pad = "SAME"
        else:
            pad = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return x


class SEGate(nn.Module):
    """Squeeze-excitation channel gate, reduction 16 (model.py:17-33)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # squeeze over H, W
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        y = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(y.astype(self.dtype))
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
        return x * y[:, None, None, :]


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    use_se: bool = False
    dtype: Any = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, self.dtype)(x, train)
        y = nn.relu(y)
        y = ConvBN(self.features, (3, 3), (1, 1), self.dtype)(y, train)
        if self.use_se:
            y = SEGate(self.features, dtype=self.dtype)(y)
        if self.strides != (1, 1) or x.shape[-1] != self.features:
            residual = ConvBN(self.features, (1, 1), self.strides,
                              self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1 with expansion 1 (model.py:100-135)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    use_se: bool = False
    dtype: Any = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = ConvBN(self.features, (1, 1), (1, 1), self.dtype)(x, train)
        y = nn.relu(y)
        y = ConvBN(self.features, (3, 3), self.strides, self.dtype)(y, train)
        y = nn.relu(y)
        out_ch = self.features * self.expansion
        y = ConvBN(out_ch, (1, 1), (1, 1), self.dtype)(y, train)
        if self.strides != (1, 1) or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, (1, 1), self.strides,
                              self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Speaker-verification ResNet trunk; returns the (B, F/8, T/8, C) map."""

    stage_sizes: Sequence[int]
    block_cls: Callable = BasicBlock
    base_width: int = 32
    use_se: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, F, T) → NHWC (B, F, T, 1)
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        x = ConvBN(self.base_width, (3, 3), (1, 1), self.dtype, name="stem")(x, train)
        x = nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = self.base_width * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = self.block_cls(feats, strides, self.use_se, self.dtype,
                                   name=f"layer{i + 1}_{j}")(x, train)
        return x


class ThinResNet(nn.Module):
    """8/16/32/64-channel trunk, 7x7 stem; returns (B, T', C)
    (model.py:138-202; not used by the active recipes but part of the zoo)."""

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        x = nn.Conv(8, (7, 7), (1, 1), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = 8 * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = BasicBlock(feats, strides, False, self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train)
        # average over frequency (the reference's AvgPool2d((1,3)) + reshape
        # collapses the trailing axis); emit (B, T', C)
        x = jnp.mean(x.astype(jnp.float32), axis=1)
        return x


def tiny_resnet(**kw) -> ResNet:
    """1-block-per-stage, 8-channel trunk for tests and smoke recipes
    (the CPU-debug role of run_aam_cpu.sh)."""
    return ResNet([1, 1, 1, 1], BasicBlock, base_width=8, **kw)


def resnet18(**kw) -> ResNet:
    return ResNet([2, 2, 2, 2], BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet([3, 4, 6, 3], BasicBlock, **kw)


def se_resnet34(**kw) -> ResNet:
    return ResNet([3, 4, 6, 3], BasicBlock, use_se=True, **kw)


def thin_resnet34(**kw) -> ThinResNet:
    return ThinResNet([3, 4, 6, 3], **kw)


def resnet50(**kw) -> ResNet:
    return ResNet([3, 4, 6, 3], Bottleneck, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet([3, 4, 23, 3], Bottleneck, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet([3, 8, 36, 3], Bottleneck, **kw)
