"""Logging, meters, and misc utilities."""

from pkr_tpu.utils.logging import AverageMeter, ProgressLogger

__all__ = ["AverageMeter", "ProgressLogger"]
