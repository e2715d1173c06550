"""Trial scoring: centering, cosine, cohort S-norm statistics.

Replaces the reference's per-trial python loops (SURVEY §3 flags
cosine_score.py:60-66 as a hot loop — O(trials) python) with dense linear
algebra: one normalized matmul produces every enroll×test cosine; trials are
a gather.  Parity targets:
- scripts/compute_mean.py:10-21 (global mean),
- scripts/compute_speaker_mean.py / compute_mean_byspk.py (cohort & pooled
  enrollment means),
- scripts/cosine_score.py:37-69 (mean-subtracted cosine per trial),
- scripts/compute_topk_mean_std.py:10-23 (center, L2-normalize, cosine vs
  cohort, top-300 mean/std — std is torch's UNBIASED default),
- scripts/adaptive_snorm.py:33-34 (s' = ((s-μe)/σe + (s-μt)/σt)/2 with
  σ floored at 1e-8).

All functions take/return numpy; the O(N·M·D) products run through jax (on
TPU when available) above a size threshold.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

_JAX_MIN_ELEMENTS = 1 << 22


def _matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape[0] * b.shape[1] >= _JAX_MIN_ELEMENTS:
        import jax.numpy as jnp

        return np.asarray(jnp.dot(jnp.asarray(a), jnp.asarray(b),
                                  preferred_element_type=jnp.float32))
    return a @ b


def global_mean(vecs: Dict[str, np.ndarray]) -> np.ndarray:
    mat = np.stack(list(vecs.values())).astype(np.float32)
    return mat.mean(axis=0)


def speaker_means(vecs: Dict[str, np.ndarray], utt2spk: Dict[str, str]
                  ) -> Dict[str, np.ndarray]:
    groups: Dict[str, List[np.ndarray]] = {}
    for utt, v in vecs.items():
        groups.setdefault(utt2spk[utt], []).append(v)
    return {s: np.mean(g, axis=0).astype(np.float32) for s, g in groups.items()}


def pooled_speaker_means(vecs: Dict[str, np.ndarray],
                         spk2utt: Dict[str, Sequence[str]]) -> Dict[str, np.ndarray]:
    """Enrollment pooling via spk2utt lists (compute_mean_byspk.py:9-41)."""
    out = {}
    for spk, utts in spk2utt.items():
        mats = [vecs[u] for u in utts if u in vecs]
        if mats:
            out[spk] = np.mean(mats, axis=0).astype(np.float32)
    return out


def _normalize_rows(mat: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, eps)


def cosine_scores(enroll: Dict[str, np.ndarray], test: Dict[str, np.ndarray],
                  trials: Sequence[Tuple[str, str]],
                  mean: np.ndarray | None = None) -> np.ndarray:
    """Scores for (enroll_key, test_key) trial pairs, mean-centered cosine.

    Dense trial sets (≳1/4 of the full cross) go through one normalized
    enroll×test matmul; sparse ones (VoxCeleb1-E/H: 580k pairs over 145k
    utterances, where the full matrix would be 90 GB) use a row-gathered
    pairwise dot — O(trials·D) work either way far below the reference's
    per-trial python loop (cosine_score.py:60-66)."""
    e_keys = list(enroll)
    t_keys = list(test)
    e_idx = {k: i for i, k in enumerate(e_keys)}
    t_idx = {k: i for i, k in enumerate(t_keys)}
    e = np.stack([enroll[k] for k in e_keys]).astype(np.float32)
    t = np.stack([test[k] for k in t_keys]).astype(np.float32)
    if mean is not None:
        e = e - mean
        t = t - mean
    e = _normalize_rows(e)
    t = _normalize_rows(t)
    rows = np.fromiter((e_idx[a] for a, _ in trials), np.int64, len(trials))
    cols = np.fromiter((t_idx[b] for _, b in trials), np.int64, len(trials))
    if len(trials) * 4 >= len(e_keys) * len(t_keys):
        scores = _matmul(e, t.T)
        return scores[rows, cols]
    return np.einsum("nd,nd->n", e[rows], t[cols])


def cohort_topk_stats(vecs: Dict[str, np.ndarray], cohort: np.ndarray,
                      topk: int = 300, mean: np.ndarray | None = None
                      ) -> Dict[str, Tuple[float, float]]:
    """Per-key (mean, std) of the top-k cosines against the cohort matrix.

    Centering by `mean` is applied to both sides; std is unbiased
    (compute_topk_mean_std.py:19 uses torch.std_mean's default)."""
    keys = list(vecs)
    mat = np.stack([vecs[k] for k in keys]).astype(np.float32)
    coh = cohort.astype(np.float32)
    if mean is not None:
        mat = mat - mean
        coh = coh - mean
    mat = _normalize_rows(mat)
    cohT = _normalize_rows(coh).T
    k = min(topk, coh.shape[0])
    # chunk rows so the (N, C) score block stays bounded (N can be 145k utts)
    chunk = max(1, (1 << 27) // max(coh.shape[0], 1))
    mu = np.empty(len(keys), np.float64)
    sd = np.empty(len(keys), np.float64)
    for lo in range(0, len(keys), chunk):
        scores = _matmul(mat[lo:lo + chunk], cohT)
        part = np.partition(scores, scores.shape[1] - k, axis=1)[:, -k:]
        mu[lo:lo + chunk] = part.mean(axis=1)
        sd[lo:lo + chunk] = part.std(axis=1, ddof=1)
    return {key: (float(mu[i]), float(sd[i])) for i, key in enumerate(keys)}


def adaptive_snorm(scores: np.ndarray, trials: Sequence[Tuple[str, str]],
                   enroll_stats: Dict[str, Tuple[float, float]],
                   test_stats: Dict[str, Tuple[float, float]]) -> np.ndarray:
    """Adaptive S-norm (adaptive_snorm.py:33-34)."""
    mu_e = np.fromiter((enroll_stats[a][0] for a, _ in trials), np.float64, len(trials))
    sd_e = np.fromiter((enroll_stats[a][1] for a, _ in trials), np.float64, len(trials))
    mu_t = np.fromiter((test_stats[b][0] for _, b in trials), np.float64, len(trials))
    sd_t = np.fromiter((test_stats[b][1] for _, b in trials), np.float64, len(trials))
    s = np.asarray(scores, np.float64)
    return ((s - mu_e) / np.maximum(sd_e, 1e-8) / 2
            + (s - mu_t) / np.maximum(sd_t, 1e-8) / 2)


def read_trials(path: str) -> Tuple[List[Tuple[str, str]], List[int]]:
    """'<enroll> <test> target|nontarget' → (pairs, 0/1 labels).

    Labeled and unlabeled lines must not mix: a partially-labeled file
    would silently misalign labels[i] with pairs[i] for every line after
    the first unlabeled one (raise instead).  A fully unlabeled file (a
    pairs-only scoring list) returns labels == []."""
    pairs, labels = [], []
    for ln, line in enumerate(open(path), 1):
        parts = line.split()
        if not parts:
            continue
        a, b = parts[0], parts[1]
        pairs.append((a, b))
        if len(parts) > 2:
            labels.append(1 if parts[2] == "target" else 0)
        elif labels:
            raise ValueError(
                f"{path}:{ln}: unlabeled trial after labeled ones — "
                "labels would misalign with pairs")
    if labels and len(labels) != len(pairs):
        raise ValueError(
            f"{path}: {len(pairs)} pairs but {len(labels)} labels "
            "(mixed labeled/unlabeled lines)")
    return pairs, labels


def write_scores(path: str, trials: Sequence[Tuple[str, str]],
                 scores: Sequence[float]) -> None:
    with open(path, "w") as f:
        for (a, b), s in zip(trials, scores):
            f.write(f"{a} {b} {float(s)}\n")
