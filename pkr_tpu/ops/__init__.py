"""Reusable compute ops: stats pooling, AAM margin head."""

from pkr_tpu.ops.stats_pool import stats_pool
from pkr_tpu.ops.aam import aam_logits

__all__ = ["stats_pool", "aam_logits"]
