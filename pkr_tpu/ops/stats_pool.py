"""Mask-aware statistics pooling over the time axis.

Equivalent of the reference StatsPooling (model.py:435-457): 'mean' or
'mean+std' over time of the trunk's (B, C, F', T') feature map.  Our layout
is NHWC — (B, F', T', C) — and pooling reduces the T' axis.  'mean+std' uses
the unbiased variance (torch.var_mean's default correction=1,
model.py:450-453), which matters for checkpoint-import parity.

The mask makes padded time columns transparent: with bucketed variable-length
extraction, statistics are computed only over valid columns, replacing the
reference's reliance on exact dynamic shapes (datasets.py:185-189).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def stats_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
               pooling: str = "mean+std", eps: float = 1e-10) -> jnp.ndarray:
    """(B, F, T, C) [+ (B, T) time mask] → (B, F, C) or (B, 2F, C).

    'mean+std' concatenates along the frequency axis (axis 1), matching the
    reference's cat([mean, std], dim=-1) on its (B, C, F) tensors.
    """
    xf = x.astype(jnp.float32)
    if mask is None:
        mean = jnp.mean(xf, axis=2)
        if pooling == "mean":
            return mean
        n = xf.shape[2]
        var = jnp.sum((xf - mean[:, :, None, :]) ** 2, axis=2) / max(n - 1, 1)
    else:
        m = mask.astype(jnp.float32)[:, None, :, None]  # (B, 1, T, 1)
        n = jnp.maximum(jnp.sum(m, axis=2), 1.0)  # (B, 1, 1)
        mean = jnp.sum(xf * m, axis=2) / n
        if pooling == "mean":
            return mean
        var = jnp.sum(((xf - mean[:, :, None, :]) * m) ** 2, axis=2) / jnp.maximum(n - 1.0, 1.0)
    if pooling != "mean+std":
        raise ValueError(f"unknown pooling {pooling!r}")
    std = jnp.sqrt(jnp.maximum(var, eps))
    return jnp.concatenate([mean, std], axis=1)


def flatten_pooled(pooled: jnp.ndarray) -> jnp.ndarray:
    """(B, F?, C) → (B, C*F?) in the reference's channel-major flatten order
    (torch Flatten of (B, C, F) — model.py:352,381), so imported fc1 weights
    line up."""
    return jnp.transpose(pooled, (0, 2, 1)).reshape(pooled.shape[0], -1)
