"""Embedding extraction at scale.

Replaces scripts/decode.py / decode_cpu.py (the 8-process DDP extractor with
per-rank output files and awk dedup, SURVEY §3.2): one program drives
length-bucketed masked batches through `SpeakerModel.embed` under jit — one
compiled executable per bucket length, every utterance exactly once.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pkr_tpu.models.speaker_model import SpeakerModel


@partial(jax.jit, static_argnames=("model",))
def _embed_jit(model, variables, feats, mask):
    return model.apply(variables, feats, mask, train=False,
                       method=SpeakerModel.embed)


@partial(jax.jit, static_argnames=("model",))
def _embed_codes_jit(model, variables, codes, pct, mask):
    """Quantized-transport extraction: dequantize CM codes ON DEVICE, then
    embed — one program, so the f32 features never cross the host↔device
    link (4× fewer feature bytes than f32, 2× fewer than the bf16 cast).
    Padded frames are re-zeroed after dequantization (code 0 decodes to the
    column's p0, not 0.0) so the values entering the stem conv are
    bit-identical to the float path's zero padding."""
    from pkr_tpu.data.device_cache import dequantize

    feats = dequantize(codes, pct)             # (B, T, F) f32
    feats = feats * mask[:, :, None]           # exact zero pads for the stem
    feats = jnp.transpose(feats, (0, 2, 1))    # (B, F, T), like the loader
    return model.apply(variables, feats, mask, train=False,
                       method=SpeakerModel.embed)


def make_embed_fn(model: SpeakerModel, variables, mesh=None):
    """Returns (feats (B, F, T), mask (B, T)) → (B, emb_dim).

    The jit lives at module level with `variables` as an ARGUMENT, not a
    closure: re-creating a jitted closure per extraction call would re-trace
    and re-compile every length bucket each time (measured ~5 s/bucket
    through the remote-compile tunnel).

    With a mesh, batches are sharded over its 'data' axis (single-host
    multi-chip inference; ragged final batches are padded to the axis size
    and the pad rows dropped)."""
    if mesh is None:
        def embed(feats, mask, pct=None):
            if pct is not None:
                return _embed_codes_jit(model, variables, feats, pct, mask)
            return _embed_jit(model, variables, feats, mask)

        return embed

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_shard = NamedSharding(mesh, P("data"))
    n_data = mesh.devices.shape[0]

    def embed(feats, mask, pct=None):
        b = feats.shape[0]
        pad = (-b) % n_data
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)])
            mask = jnp.concatenate(
                [mask, jnp.ones((pad,) + mask.shape[1:], mask.dtype)])
            if pct is not None:
                pct = jnp.concatenate(
                    [pct, jnp.zeros((pad,) + pct.shape[1:], pct.dtype)])
        feats = jax.device_put(feats, batch_shard)
        mask = jax.device_put(mask, batch_shard)
        if pct is not None:
            pct = jax.device_put(pct, batch_shard)
            out = _embed_codes_jit(model, variables, feats, pct, mask)
        else:
            out = _embed_jit(model, variables, feats, mask)
        return out[:b]

    return embed


def extract_embeddings(model: SpeakerModel, variables, loader, mesh=None
                       ) -> Dict[str, np.ndarray]:
    """Run extraction over an EvalLoader; returns {utt: embedding}.

    Segment keys ('<utt>##<k>', emitted by EvalLoader long_mode='average')
    are mean-pooled back into one embedding per utterance.

    Feature batches transfer in the trunk's compute dtype: for bf16 models
    the conv stack casts its input to bf16 on device anyway, so casting on
    the host is bit-identical and halves host→device bytes (which dominates
    extraction when the link is slow)."""
    embed = make_embed_fn(model, variables, mesh=mesh)
    xfer_dtype = jnp.bfloat16 if model.dtype == jnp.bfloat16 else jnp.float32
    out: Dict[str, np.ndarray] = {}
    seg_sum: Dict[str, np.ndarray] = {}
    seg_cnt: Dict[str, int] = {}
    sep = getattr(loader, "SEG_SEP", "##")

    def absorb(keys, arr):
        for k, e in zip(keys, arr):
            if sep in k:
                utt = k.rsplit(sep, 1)[0]
                seg_sum[utt] = seg_sum.get(utt, 0.0) + e
                seg_cnt[utt] = seg_cnt.get(utt, 0) + 1
            else:
                out[k] = e

    pending: list[Tuple[list, jax.Array]] = []
    for keys, feats, mask in loader:
        if isinstance(feats, tuple):  # quantized transport (codes, pct)
            codes, pct = feats
            emb = embed(jnp.asarray(codes), jnp.asarray(mask),
                        pct=jnp.asarray(pct))
        else:
            emb = embed(jnp.asarray(feats, dtype=xfer_dtype),
                        jnp.asarray(mask))
        pending.append((keys, emb))  # don't block: overlap host IO with device
        if len(pending) >= 4:
            k, e = pending.pop(0)
            absorb(k, np.asarray(e))
    for k, e in pending:
        absorb(k, np.asarray(e))
    for utt, total in seg_sum.items():
        out[utt] = (total / seg_cnt[utt]).astype(np.float32)
    return out


def warmup_buckets(model: SpeakerModel, variables, feat_dim: int = 40,
                   batch_size: int = 8, quantum: int = 100,
                   max_len: int = 2000, mesh=None) -> int:
    """Precompile every (batch, bucket-length) extraction executable so the
    first real corpus pass hits no compile stalls (useful for serving and
    for amortizing the remote-compile latency of fresh environments).
    Pass the same `mesh` the extraction will use — sharded inputs compile
    different executables, so an unsharded warmup would not help a
    multi-chip pass.  Both transports are warmed: quantized-payload batches
    (EvalLoader transport='auto' on CM arks) dispatch _embed_codes_jit,
    a different input signature that would otherwise pay its own
    first-use compile per bucket.  Returns the number of programs
    compiled."""
    embed = make_embed_fn(model, variables, mesh=mesh)
    xfer = jnp.bfloat16 if model.dtype == jnp.bfloat16 else jnp.float32
    n = 0
    for L in range(quantum, max_len + 1, quantum):
        feats = jnp.zeros((batch_size, feat_dim, L), xfer)
        mask = jnp.ones((batch_size, L), bool)
        jax.block_until_ready(embed(feats, mask))
        codes = jnp.zeros((batch_size, L, feat_dim), jnp.uint8)
        pct = jnp.zeros((batch_size, 4, feat_dim), jnp.float32)
        jax.block_until_ready(embed(codes, mask, pct=pct))
        n += 2
    return n
