"""Additive-angular-margin (ArcFace) classification head, fused.

Semantics of the reference AAMLayer (model.py:459-501): cosine logits from
L2-normalized embeddings and class weights; the target class's cosine is
replaced by cos(θ+m) — with Kaldi-recipe defaults m=0.2, s=30
(run_aam_v2.sh:32-33) — using the hard-margin monotonicity guard
(phi if cosθ > cos(π−m), else cosθ − m·sin(π−m)); everything scaled by s.

TPU notes: the class matmul is the only O(B·n_spk·D) op — it runs in f32
(normalized cosines need the mantissa near ±1, and torch parity is defined
at f32; the bf16-rate scaling path for big speaker counts is the flash
kernel in ops/flash_aam.py, not this head); the margin math is a cheap VPU
epilogue kept in f32
(the clamp/where chain is precision-sensitive near cosθ=±1 — SURVEY §7).
Instead of building a one-hot matrix and two full (B, n_spk) products like
the reference, the margin is applied as a scatter-free `where` against the
label column — O(B·n_spk) comparisons that XLA fuses into the matmul
epilogue.  For very large speaker counts the weight can be sharded over the
'model' mesh axis; see pkr_tpu/parallel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def cosine_logits(emb: jnp.ndarray, weight: jnp.ndarray,
                  eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalized linear: (B, D) x (n_classes, D) → (B, n_classes) cosines.

    Normalization matches F.normalize's eps semantics (divide by
    max(||x||, eps))."""
    e = emb.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), eps)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), eps)
    return jnp.dot(e, w.T, preferred_element_type=jnp.float32)


def aam_logits(emb: jnp.ndarray, weight: jnp.ndarray,
               labels: Optional[jnp.ndarray], m: float = 0.2, s: float = 30.0,
               easy_margin: bool = False) -> jnp.ndarray:
    """ArcFace logits; labels=None gives plain scaled cosines (eval path)."""
    cos = cosine_logits(emb, weight)
    if labels is None:
        return cos * s
    # lower clip 1e-12 (not 0, as the reference's clamp does): sqrt'(0)=inf
    # would leak NaN gradients through the `where` when cosθ = ±1 exactly
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 1e-12, 1.0))
    cos_m, sin_m = math.cos(m), math.sin(m)
    phi = cos * cos_m - sin * sin_m
    if easy_margin:
        phi = jnp.where(cos > 0, phi, cos)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cos - th > 0, phi, cos - mm)
    is_target = labels[:, None] == jnp.arange(weight.shape[0])[None, :]
    return jnp.where(is_target, phi, cos) * s
