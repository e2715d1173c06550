"""The speaker-embedding model: trunk → stats pooling → 256-d embedding → head.

Parity target: NeuralSpeakerModel (model.py:334-432).
- trunk selectable (the reference hard-codes resnet34 at model.py:345 and
  leaves --arch cosmetic; here `trunk` actually selects the architecture,
  including the DenseNet family the reference imports but never wires in),
- `_feature_dim = (feat_dim + 7) // 8` frequency geometry (model.py:347),
- heads: 'softmax' (BN+ReLU+Linear), 'AAM' (margin head straight on fc1),
  'AAM-v1' (BN+ReLU then margin head) — model.py:360-369,
- `embed` = trunk+pool+flatten+fc1, the reference's `predict` (model.py:402).

The embedding path runs in f32 from pooling onward; the conv trunk computes
in bf16 on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from pkr_tpu.models import densenet as _densenet
from pkr_tpu.models import resnet as _resnet
from pkr_tpu.ops.aam import aam_logits
from pkr_tpu.ops.stats_pool import flatten_pooled, stats_pool

TRUNKS = {
    "tiny_resnet": _resnet.tiny_resnet,
    "resnet18": _resnet.resnet18,
    "resnet34": _resnet.resnet34,
    "se_resnet34": _resnet.se_resnet34,
    "thin_resnet34": _resnet.thin_resnet34,
    "resnet50": _resnet.resnet50,
    "resnet101": _resnet.resnet101,
    "resnet152": _resnet.resnet152,
}


class SpeakerModel(nn.Module):
    spk_num: int
    feat_dim: int = 40
    pooling: str = "mean+std"  # run.sh trains mean+std (BASELINE.md)
    loss: str = "softmax"  # 'softmax' | 'AAM' | 'AAM-v1'
    m: float = 0.2
    s: float = 30.0
    trunk: str = "resnet34"
    emb_dim: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self):
        if self.trunk in TRUNKS:
            self._trunk = TRUNKS[self.trunk](dtype=self.dtype)
        elif self.trunk in _densenet.DENSENETS:
            self._trunk = _densenet.DENSENETS[self.trunk](dtype=self.dtype)
        else:
            raise ValueError(
                f"unknown trunk {self.trunk!r} (choose from "
                f"{sorted(TRUNKS) + sorted(_densenet.DENSENETS)})")
        self.fc1 = nn.Dense(self.emb_dim, dtype=jnp.float32, param_dtype=jnp.float32)
        if self.loss in ("softmax", "AAM-v1"):
            self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32, param_dtype=jnp.float32)
        if self.loss == "softmax":
            self.last = nn.Dense(self.spk_num, dtype=jnp.float32, param_dtype=jnp.float32)
        elif self.loss in ("AAM", "AAM-v1"):
            self.aam_weight = self.param(
                "aam_weight",
                nn.initializers.variance_scaling(1.0, "fan_avg", "normal"),
                (self.spk_num, self.emb_dim), jnp.float32)
        else:
            raise ValueError(f"unknown loss {self.loss!r}")

    def embed(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
              train: bool = False) -> jnp.ndarray:
        """(B, F, T) [+ (B, T) frame mask] → (B, emb_dim) embeddings
        (reference `predict`, model.py:402-409)."""
        fmap = self._trunk(x, train=train, mask=mask)
        tmask = None
        if mask is not None:
            # every trunk reports its own time-axis striding so padded
            # columns of a bucketed batch stay out of the pooled statistics
            n_valid = self._trunk.valid_out_frames(
                jnp.sum(mask.astype(jnp.int32), axis=-1))
            t_axis = fmap.shape[2] if fmap.ndim == 4 else fmap.shape[1]
            tmask = jnp.arange(t_axis)[None, :] < n_valid[:, None]
        if fmap.ndim != 4:
            fmap = fmap[:, None, :, :]  # (B, T', C) trunks → (B, 1, T', C)
        pooled = stats_pool(fmap, tmask, self.pooling)
        return self.fc1(flatten_pooled(pooled))

    def head_input(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                   train: bool = False) -> jnp.ndarray:
        """The tensor the classifier weight actually consumes: the raw
        embedding for 'AAM', relu(bn1(emb)) for 'AAM-v1'/'softmax'
        (model.py:360-369).  This is what the flash classifier loss feeds
        its cosine tiles, so flash mode covers every AAM variant; serving
        still uses `embed` (reference predict() returns the pre-head
        embedding, model.py:402-409)."""
        emb = self.embed(x, mask, train)
        if self.loss == "AAM":
            return emb
        return nn.relu(self.bn1(emb, use_running_average=not train))

    def __call__(self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None, train: bool = False) -> jnp.ndarray:
        """Returns classification logits (B, spk_num) — model.py:374-400."""
        emb = self.embed(x, mask, train)
        if self.loss == "softmax":
            h = nn.relu(self.bn1(emb, use_running_average=not train))
            return self.last(h)
        if self.loss == "AAM":
            return aam_logits(emb, self.aam_weight, labels, self.m, self.s)
        # AAM-v1: BN+ReLU before the margin head (model.py:366-369)
        h = nn.relu(self.bn1(emb, use_running_average=not train))
        return aam_logits(h, self.aam_weight, labels, self.m, self.s)
