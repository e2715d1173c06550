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
    """Squeeze-excitation channel gate, reduction 16 (model.py:17-33).

    n_valid (B,) restricts the squeeze mean to the valid time columns —
    without it, padded columns of a bucketed batch leak into the gate and
    the same utterance embeds differently depending on its bucket."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, n_valid=None):
        if n_valid is None:
            y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        else:
            m = (jnp.arange(x.shape[2])[None, :]
                 < n_valid[:, None]).astype(jnp.float32)
            y = jnp.sum(x.astype(jnp.float32) * m[:, None, :, None],
                        axis=(1, 2))
            y = y / (x.shape[1] * jnp.maximum(m.sum(axis=1), 1.0))[:, None]
        y = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(y.astype(self.dtype))
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
        return x * y[:, None, None, :]


def zero_time_pad(x, n_valid):
    """Zero the padded time columns of an NHWC map (n_valid per batch row).

    Applied before every op that mixes across time (3x3 convs, after
    BatchNorm has made padded columns nonzero): the next conv's edge then
    reads exactly the zeros an exact-length run's conv padding provides,
    so bucketed extraction == exact-length extraction for every valid
    column."""
    if n_valid is None:
        return x
    keep = jnp.arange(x.shape[2])[None, :] < n_valid[:, None]
    return x * keep[:, None, :, None].astype(x.dtype)


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    use_se: bool = False
    dtype: Any = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool, n_valid=None):
        n_out = None
        if n_valid is not None:  # valid frames at this block's output
            n_out = ((n_valid + 1) // 2 if self.strides[1] == 2 else n_valid)
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, self.dtype)(x, train)
        y = nn.relu(y)
        y = zero_time_pad(y, n_out)  # conv2 must not read BN-biased pads
        y = ConvBN(self.features, (3, 3), (1, 1), self.dtype)(y, train)
        if self.use_se:
            y = SEGate(self.features, dtype=self.dtype)(y, n_out)
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
    def __call__(self, x, train: bool, n_valid=None):
        residual = x
        y = ConvBN(self.features, (1, 1), (1, 1), self.dtype)(x, train)
        y = nn.relu(y)
        y = zero_time_pad(y, n_valid)  # the 3x3 below mixes across time
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

    @staticmethod
    def valid_out_frames(n):
        """Valid output frames for n valid input frames (3 ceil-div-2
        stages: explicit (k-1)//2 padding under stride 2)."""
        return (n + 7) // 8

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """(B, F, T) [+ (B, T) mask] → (B, F/8, T/8, C).

        With a mask, padded time columns are RE-ZEROED after the stem and
        every block: BatchNorm's bias makes them nonzero, and the next
        layer's edge convs would read that garbage — the last valid output
        frames would then depend on which bucket the utterance landed in.
        Zeroing reproduces exactly what an exact-length run's conv zero
        padding sees, so bucketed == exact for every valid column.  The SE
        gates additionally restrict their squeeze means to valid columns.
        """
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        n_valid = None
        if mask is not None:
            n_valid = jnp.sum(mask.astype(jnp.int32), axis=-1)
        x = ConvBN(self.base_width, (3, 3), (1, 1), self.dtype, name="stem")(x, train)
        x = nn.relu(x)
        x = zero_time_pad(x, n_valid)
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = self.base_width * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = self.block_cls(feats, strides, self.use_se, self.dtype,
                                   name=f"layer{i + 1}_{j}")(x, train, n_valid)
                if n_valid is not None and strides[1] == 2:
                    n_valid = (n_valid + 1) // 2
                x = zero_time_pad(x, n_valid)
        return x


class ThinResNet(nn.Module):
    """8/16/32/64-channel trunk, 7x7 stem; returns (B, T', C)
    (model.py:138-202; not used by the active recipes but part of the zoo).

    Known deviation: the reference's AvgPool2d((1,3)) + view only executes
    when the post-trunk time axis is exactly 3 frames wide (its .view()
    RAISES for recipe-shaped inputs, e.g. 200-frame crops — the class is
    dead code there); we realize the evident intent as a full frequency
    mean, which runs at any length.  Documented in PARITY.md."""

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16

    @staticmethod
    def valid_out_frames(n):
        return (n + 7) // 8

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        n_valid = None
        if mask is not None:
            n_valid = jnp.sum(mask.astype(jnp.int32), axis=-1)
        x = nn.Conv(8, (7, 7), (1, 1), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = zero_time_pad(x, n_valid)
        for i, n_blocks in enumerate(self.stage_sizes):
            feats = 8 * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = BasicBlock(feats, strides, False, self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train, n_valid)
                if n_valid is not None and strides[1] == 2:
                    n_valid = (n_valid + 1) // 2
                x = zero_time_pad(x, n_valid)
        # collapse frequency; emit (B, T', C) — see the class docstring for
        # the AvgPool2d((1,3)) deviation
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
