"""HBM-resident quantized feature cache: sample training batches on device.

Motivation: the host pipeline (native reader) delivers ~12k crops/s on this
box — 2x one chip's consumption, but a single host core cannot feed an
8-chip slice (~47k crops/s).  This cache moves the data plane onto the
accelerator: the whole (augmented) training feature set is stored in HBM as
uint8 codes with per-(utterance, mel-bin) percentile tables — the same
3-piece quantization as Kaldi's CompressedMatrix, 1 byte/value — and each
training step gathers + dequantizes its crops entirely on device.

Memory: VoxCeleb2-dev post-VAD ≈ 1.09 G frames x 40 mels ≈ 44 GB at 1 B/val
— sharded over 8 chips' HBM (5.5 GB/chip) or rotated in per-epoch shards on
one chip.  A 500k-crop epoch shard (feature_pre.sh's decode subset scale) is
~4 GB.

TPU notes: the per-utterance crop is a vmapped dynamic_slice over a
row-contiguous buffer (efficient sliced gather, NOT a general gather);
dequantization is branchless VPU math XLA fuses into the consumer.
Round-trip error equals the CM codec's (tested).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_U16 = np.float32(1.0 / 65535.0)


def quantize_utterance(mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, F) float32 → (codes uint8 (T, F), percentiles f32 (4, F)).

    Same anchor selection as io.kaldi_ark.compress_matrix (ranks 0, T//4,
    3T//4, T-1 with monotonic uint16 codes), per column of this utterance.
    """
    from pkr_tpu.io.kaldi_ark import _float_to_uint16

    mat = np.asarray(mat, np.float32)
    rows = mat.shape[0]
    gmin = float(mat.min()) if mat.size else 0.0
    grange = float(mat.max()) - gmin or 1.0
    srt = np.sort(mat, axis=0)
    if rows >= 5:
        q = rows // 4
        anchors = srt[[0, q, 3 * q, rows - 1], :]
    else:
        anchors = srt[[0, 0, rows - 1, rows - 1], :]
    codes16 = _float_to_uint16(anchors, gmin, grange).astype(np.int64)
    codes16[0] = np.minimum(codes16[0], 65532)
    codes16[1] = np.clip(codes16[1], codes16[0] + 1, 65533)
    codes16[2] = np.clip(codes16[2], codes16[1] + 1, 65534)
    codes16[3] = np.maximum(codes16[3], codes16[2] + 1)
    pct = (gmin + grange * _U16 * codes16.astype(np.float32)).astype(np.float32)

    p0, p25, p75, p100 = pct[0], pct[1], pct[2], pct[3]
    v = mat
    low = np.clip(np.floor((v - p0) / np.maximum(p25 - p0, 1e-20) * 64.0 + 0.5), 0, 64)
    mid = np.clip(np.floor((v - p25) / np.maximum(p75 - p25, 1e-20) * 128.0 + 64.5), 64, 192)
    high = np.clip(np.floor((v - p75) / np.maximum(p100 - p75, 1e-20) * 63.0 + 192.5), 192, 255)
    codes = np.where(v < p25, low, np.where(v < p75, mid, high)).astype(np.uint8)
    return codes, pct


def dequantize(codes: jnp.ndarray, pct: jnp.ndarray) -> jnp.ndarray:
    """codes (..., T, F) uint8 + pct (..., 4, F) → float32, branchless."""
    c = codes.astype(jnp.float32)
    p0 = pct[..., 0:1, :]
    p25 = pct[..., 1:2, :]
    p75 = pct[..., 2:3, :]
    p100 = pct[..., 3:4, :]
    low = p0 + (p25 - p0) * (c * (1.0 / 64.0))
    mid = p25 + (p75 - p25) * ((c - 64.0) * (1.0 / 128.0))
    high = p75 + (p100 - p75) * ((c - 192.0) * (1.0 / 63.0))
    return jnp.where(c <= 64.0, low, jnp.where(c <= 192.0, mid, high))


class DeviceFeatureCache:
    """Quantized corpus in device memory with on-device crop sampling."""

    def __init__(self, codes: jnp.ndarray, pct: jnp.ndarray,
                 offsets: np.ndarray, rows: np.ndarray, utts: List[str],
                 labels: Optional[np.ndarray] = None):
        self.codes = codes  # (total_rows, F) uint8 on device
        self.pct = pct  # (n_utts, 4, F) f32 on device
        self.offsets = jnp.asarray(offsets, jnp.int32)
        self.rows = jnp.asarray(rows, jnp.int32)
        self.utts = utts
        self.labels = None if labels is None else jnp.asarray(labels, jnp.int32)

    @staticmethod
    def build(mats: Dict[str, np.ndarray], labels: Optional[Dict[str, int]] = None,
              device=None) -> "DeviceFeatureCache":
        utts = sorted(mats)
        F = next(iter(mats.values())).shape[1]
        offsets, rows, code_blocks, pcts = [], [], [], []
        off = 0
        for u in utts:
            c, p = quantize_utterance(mats[u])
            offsets.append(off)
            rows.append(c.shape[0])
            off += c.shape[0]
            code_blocks.append(c)
            pcts.append(p)
        codes = jnp.asarray(np.concatenate(code_blocks, axis=0))
        pct = jnp.asarray(np.stack(pcts))
        lab = None
        if labels is not None:
            lab = np.asarray([labels[u] for u in utts], np.int64)
        return DeviceFeatureCache(codes, pct, np.asarray(offsets),
                                  np.asarray(rows), utts, lab)

    @staticmethod
    def from_scp(scp_path: str, utt2spkid: Optional[Dict[str, int]] = None
                 ) -> "DeviceFeatureCache":
        from pkr_tpu.io import kaldi_ark

        mats = {u: m for u, m in kaldi_ark.read_mat_scp(scp_path)}
        return DeviceFeatureCache.build(mats, utt2spkid)

    @property
    def nbytes(self) -> int:
        return int(self.codes.size + self.pct.size * 4)

    @functools.partial(jax.jit, static_argnames=("self", "seq_len"))
    def _sample(self, utt_ids: jnp.ndarray, key: jax.Array, seq_len: int):
        rows = self.rows[utt_ids]
        starts = self.offsets[utt_ids] + (
            jax.random.uniform(key, utt_ids.shape)
            * jnp.maximum(rows - seq_len + 1, 1)).astype(jnp.int32)

        def crop(start):
            return jax.lax.dynamic_slice(
                self.codes, (start, 0), (seq_len, self.codes.shape[1]))

        codes = jax.vmap(crop)(starts)  # (B, seq_len, F)
        feats = dequantize(codes, self.pct[utt_ids])
        # (B, F, T) layout, like the host loader
        return jnp.transpose(feats, (0, 2, 1))

    def sample_batch(self, utt_ids, key, seq_len: int
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Random seq_len crops of the given utterances, decoded on device.

        Utterances shorter than seq_len start at 0 and read into the next
        utterance's rows; exclude them upstream (the ≥200-frame filter) or
        accept the contamination like the host loader's tiling accepts reuse.
        """
        utt_ids = jnp.asarray(utt_ids, jnp.int32)
        feats = self._sample(utt_ids, key, seq_len)
        labels = None if self.labels is None else self.labels[utt_ids]
        return feats, labels


class DeviceCacheLoader:
    """TrainLoader-compatible adapter: balanced sampler indices on host,
    crop sampling + dequantization on device.  Drop-in for
    train_and_validate (yields device arrays; the loop's device_put is a
    no-op for already-committed arrays)."""

    def __init__(self, cache: DeviceFeatureCache, sampler, batch_size: int,
                 chunk: int = 200, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        assert cache.labels is not None, "cache must be built with labels"
        self.cache = cache
        self.sampler = sampler
        self.batch_size = batch_size
        self.chunk = chunk
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    def batches_per_epoch(self) -> int:
        return (len(self.sampler) // self.process_count) // self.batch_size

    def epoch(self, epoch: int):
        idx = self.sampler.epoch_indices(epoch, self.seed,
                                         self.process_index, self.process_count)
        key = jax.random.key((self.seed << 16) ^ epoch)
        n = len(idx) // self.batch_size
        for b in range(n):
            key, sub = jax.random.split(key)
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            feats, labels = self.cache.sample_batch(sel, sub, self.chunk)
            yield feats, labels
