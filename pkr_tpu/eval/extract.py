"""Embedding extraction at scale.

Replaces scripts/decode.py / decode_cpu.py (the 8-process DDP extractor with
per-rank output files and awk dedup, SURVEY §3.2): one program drives
length-bucketed masked batches through `SpeakerModel.embed` under jit — one
compiled executable per bucket length, every utterance exactly once.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pkr_tpu.models.speaker_model import SpeakerModel


def make_embed_fn(model: SpeakerModel, variables):
    """Returns jitted (feats (B, F, T), mask (B, T)) → (B, emb_dim)."""

    @jax.jit
    def embed(feats, mask):
        return model.apply(variables, feats, mask, train=False,
                           method=SpeakerModel.embed)

    return embed


def extract_embeddings(model: SpeakerModel, variables, loader,
                       to_numpy: bool = True) -> Dict[str, np.ndarray]:
    """Run extraction over an EvalLoader; returns {utt: embedding}."""
    embed = make_embed_fn(model, variables)
    out: Dict[str, np.ndarray] = {}
    pending: list[Tuple[list, jax.Array]] = []
    for keys, feats, mask in loader:
        emb = embed(jnp.asarray(feats), jnp.asarray(mask))
        pending.append((keys, emb))  # don't block: overlap host IO with device
        if len(pending) >= 4:
            k, e = pending.pop(0)
            arr = np.asarray(e)
            out.update(zip(k, arr))
    for k, e in pending:
        out.update(zip(k, np.asarray(e)))
    return out
