"""Training meters and structured progress logging.

Covers the reference's observability surface (train_resnet.py:388-427
AverageMeter/ProgressMeter + per-stage log files, SURVEY §5) and adds what it
lacked: an optional JSONL stream for structured metrics and a context-managed
jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional, TextIO


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":.4f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg)


class ProgressLogger:
    """Plain-text lines to a stream + optional JSONL metrics file."""

    def __init__(self, stream: Optional[TextIO] = None,
                 jsonl_path: Optional[str] = None, prefix: str = ""):
        self.stream = stream if stream is not None else sys.stdout
        self.prefix = prefix
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    def log(self, msg: str, **metrics):
        stamp = time.strftime("%H:%M:%S")
        self.stream.write(f"[{stamp}] {self.prefix}{msg}\n")
        self.stream.flush()
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"t": time.time(), "msg": msg, **metrics}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace if a dir is given (the reference had only wall-clock
    meters — SURVEY §5 tracing gap)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compile cache (env-var spellings are ignored by this
    jax build, so set the config keys).  One home for the knob — bench.py,
    the graft entry and every tools/ script call this.

    The default lives under the repo, not /tmp: this host's /tmp is wiped
    on every VM restart, and a cold cache sends first compiles through the
    remote helper (1-5 min each) — enough to blow bench.py's per-attempt
    watchdog right when the driver measures.  Override with
    PKR_COMPILE_CACHE."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "PKR_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # very old jax: cache just stays off
        pass
