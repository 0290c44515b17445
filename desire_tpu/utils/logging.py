"""Structured metrics logging (SURVEY §5 metrics row).

The reference logged with bare print + flush (train.py:187-194) and left TF
summary writers commented out. Here: JSONL to stdout and optionally a file —
machine-parseable, crash-safe (line-buffered)."""

from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
    def __init__(self, path: str | None = None, also_stdout: bool = True,
                 quiet: bool = False):
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1) if path else None
        self._stdout = also_stdout and not quiet  # quiet: non-main hosts
        self._t0 = time.time()

    def log(self, record: dict) -> None:
        record = dict(record, t=round(time.time() - self._t0, 3))
        line = json.dumps(record, sort_keys=True, default=float)
        if self._stdout:
            print(line)
            sys.stdout.flush()
        if self._f:
            self._f.write(line + "\n")

    def close(self):
        if self._f:
            self._f.close()


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace viewable in Perfetto /
    TensorBoard (SURVEY §5 tracing row)."""
    import jax
    return jax.profiler.trace(log_dir)


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Persistent XLA compilation cache for CLI runs (big-program recompiles
    — e.g. the K=50 eval or remat training steps — cost minutes through the
    remote-TPU compile service; cached reloads are seconds). Tests set the
    same directory in conftest.py."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("DESIRE_CACHE_DIR", path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass   # older jax without the knobs: run uncached
