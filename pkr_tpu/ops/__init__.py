"""Reusable compute ops: stats pooling, AAM margin head."""

from pkr_tpu.ops.stats_pool import stats_pool
from pkr_tpu.ops.aam import aam_logits
from pkr_tpu.ops.flash_aam import flash_aam_loss, flash_aam_loss_sharded

__all__ = ["stats_pool", "aam_logits", "flash_aam_loss", "flash_aam_loss_sharded"]
