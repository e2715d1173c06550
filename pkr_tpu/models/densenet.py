"""Flax DenseNet-BC trunks for speaker embeddings.

Parity target: scripts/densenet.py (torchvision-derived Densenet-BC with a
1-channel 7x7 stride-2 stem, no max-pool, final BN, returns a (B, T', C)
sequence after collapsing the frequency axis — densenet.py:50-113) and its
variant table densenet62/115/121/169/201/161 (densenet.py:116-149).  The
reference imports these but never wires them into NeuralSpeakerModel
(model.py:8); here they are first-class `trunk=` choices of SpeakerModel
(BASELINE.json configs list the DenseNet variant explicitly).

NHWC layout, bf16 compute, f32 params/BN — same conventions as resnet.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pkr_tpu.models.resnet import conv_init, zero_time_pad


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool, n_valid=None):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, kernel_init=conv_init)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        # the only time-mixing op: its edge must read zeros, not BN-biased
        # padded columns, or bucketed != exact-length (see resnet.py)
        y = zero_time_pad(y, n_valid)
        y = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, kernel_init=conv_init)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_init)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    dtype: Any = jnp.bfloat16

    @staticmethod
    def valid_out_frames(n):
        """ceil-div-2 stem conv, then 3 floor-div-2 VALID avg-pool
        transitions."""
        n = (n + 1) // 2
        for _ in range(3):
            n = n // 2
        return jnp.maximum(n, 1) if hasattr(n, "shape") else max(int(n), 1)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if x.ndim == 3:
            x = x[..., None]  # (B, F, T, 1)
        x = x.astype(self.dtype)
        x = nn.Conv(self.num_init_features, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        n_valid = None
        if mask is not None:  # stem is ceil-div-2 on the time axis
            n_valid = (jnp.sum(mask.astype(jnp.int32), axis=-1) + 1) // 2
        n_feats = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size, self.dtype,
                               name=f"block{i + 1}_layer{j + 1}")(x, train,
                                                                  n_valid)
            n_feats += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n_feats //= 2
                x = Transition(n_feats, self.dtype, name=f"transition{i + 1}")(x, train)
                if n_valid is not None:  # VALID 2x2 avg-pool: floor-div-2
                    n_valid = n_valid // 2
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_norm")(x)
        # collapse frequency → (B, T', C) sequence (densenet.py:105-113)
        return jnp.mean(x.astype(jnp.float32), axis=1)


def densenet62(**kw):
    return DenseNet(growth_rate=8, block_config=(3, 6, 12, 8), num_init_features=15, **kw)


def densenet115(**kw):
    return DenseNet(growth_rate=16, block_config=(3, 12, 24, 16), num_init_features=8, **kw)


def densenet121(**kw):
    return DenseNet(growth_rate=16, block_config=(6, 12, 24, 16), num_init_features=8, **kw)


def densenet169(**kw):
    return DenseNet(growth_rate=16, block_config=(6, 12, 32, 32), num_init_features=8, **kw)


def densenet201(**kw):
    return DenseNet(growth_rate=32, block_config=(6, 12, 48, 32), num_init_features=64, **kw)


def densenet161(**kw):
    return DenseNet(growth_rate=48, block_config=(6, 12, 36, 24), num_init_features=96, **kw)


DENSENETS = {
    "densenet62": densenet62,
    "densenet115": densenet115,
    "densenet121": densenet121,
    "densenet169": densenet169,
    "densenet201": densenet201,
    "densenet161": densenet161,
}
