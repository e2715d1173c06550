"""Evaluation backend: extraction, scoring, metrics, trials, LDA/PLDA."""

from pkr_tpu.eval.metrics import compute_error_rates, compute_eer, compute_min_dcf
from pkr_tpu.eval.scoring import (
    global_mean,
    speaker_means,
    pooled_speaker_means,
    cosine_scores,
    cohort_topk_stats,
    adaptive_snorm,
)
from pkr_tpu.eval.extract import extract_embeddings

__all__ = [
    "compute_error_rates",
    "compute_eer",
    "compute_min_dcf",
    "global_mean",
    "speaker_means",
    "pooled_speaker_means",
    "cosine_scores",
    "cohort_topk_stats",
    "adaptive_snorm",
    "extract_embeddings",
]
