"""Logging, meters, and misc utilities."""

from pkr_tpu.utils.logging import (AverageMeter, ProgressLogger,
                                    enable_compile_cache)

__all__ = ["AverageMeter", "ProgressLogger", "enable_compile_cache"]
