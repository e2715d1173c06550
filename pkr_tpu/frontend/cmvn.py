"""Sliding-window cepstral mean normalization + voiced-frame selection.

Replaces the ``apply-cmvn-sliding --norm-vars=false --center=true
--cmn-window=300 | select-voiced-frames`` C++ pipe
(local/nnet3/xvector/prepare_feats_for_egs.sh:67-72) that produces the
``*_no_sil`` features the trainer actually reads.

Kaldi SlidingWindowCmn(center=true) window placement for frame t of a
T-frame utterance:  start = t - window//2, end = start + window, then the
window is shifted (not shrunk) to fit inside [0, T); only if T < window does
it shrink to the whole utterance.  Implemented with one masked cumulative
sum — O(T) instead of O(T·window).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit,
                   static_argnames=("window", "center", "norm_vars",
                                    "min_window"))
def sliding_cmvn(feats: jnp.ndarray, mask: jnp.ndarray, window: int = 300,
                 center: bool = True, norm_vars: bool = False,
                 min_window: int = 100) -> jnp.ndarray:
    """(B, T, F) features + (B, T) mask → mean-normalized (B, T, F).

    Padded frames are ignored by the statistics and returned as zeros.

    center=False follows Kaldi's causal placement: frame t averages
    [t-window, t+1) (window+1 frames in steady state — Kaldi's documented
    off-by-one), and the first frames look ahead to at least `min_window`
    frames (--min-window, default 100: 'adds latency only at start').
    """
    if feats.ndim == 2:
        feats, mask = feats[None], mask[None]
    B, T, F = feats.shape
    maskf = mask.astype(jnp.float32)
    x = feats * maskf[..., None]
    # prefix sums with a leading zero row: csum[t] = sum of frames [0, t)
    csum = jnp.concatenate([jnp.zeros((B, 1, F), x.dtype), jnp.cumsum(x, axis=1)], axis=1)
    csum2 = None
    if norm_vars:
        csum2 = jnp.concatenate(
            [jnp.zeros((B, 1, F), x.dtype), jnp.cumsum(x * x, axis=1)], axis=1)

    n_valid = jnp.sum(maskf, axis=1, keepdims=True)  # (B, 1)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]  # (1, T)
    if center:
        start = t - window // 2
        end = start + window
        # shift window right if it starts before 0
        shift_r = jnp.maximum(0, -start)
        start, end = start + shift_r, end + shift_r
        # shift window left if it ends past the utterance
        over = jnp.maximum(0, end - n_valid.astype(jnp.int32))
        start, end = start - over, end - over
        start = jnp.maximum(start, 0)
    else:
        start = jnp.maximum(0, t - window)
        # Kaldi extends the window to min_window ONLY when the causal start
        # was clamped below 0 (t < window): the right-shift leaves
        # window_end = window+1, then end = max(t+1, min(window+1,
        # min_window)).  Frames with t >= window keep end = t+1 even when
        # t+1 < min_window (possible when cmn_window < min_window).
        ext = jnp.maximum(t + 1, jnp.minimum(min_window, window + 1))
        end = jnp.where(t - window < 0, ext, t + 1)
    end = jnp.minimum(end, n_valid.astype(jnp.int32))
    start = jnp.minimum(start, end)

    def take(c, idx):
        return jnp.take_along_axis(c, idx[..., None].astype(jnp.int32), axis=1)

    cnt = jnp.maximum((end - start).astype(jnp.float32), 1.0)[..., None]
    mean = (take(csum, end) - take(csum, start)) / cnt
    out = feats - mean
    if norm_vars:
        var = (take(csum2, end) - take(csum2, start)) / cnt - mean * mean
        out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
    return out * maskf[..., None]


@jax.jit
def select_voiced(feats: jnp.ndarray, voiced: jnp.ndarray,
                  mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop frames where vad==0, compacting survivors to the front
    (select-voiced-frames semantics) while keeping static shapes.

    Returns (compacted feats (B, T, F), new mask (B, T)).
    """
    if feats.ndim == 2:
        feats, voiced, mask = feats[None], voiced[None], mask[None]
    keep = (voiced > 0.5) & mask
    # stable order: kept frames first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    gathered = jnp.take_along_axis(feats, order[..., None], axis=1)
    n_keep = jnp.sum(keep, axis=-1, keepdims=True)
    new_mask = jnp.arange(feats.shape[1])[None, :] < n_keep
    return gathered * new_mask[..., None], new_mask
