"""Profiling & observability helpers.

The reference has no tracer (SURVEY §5: benchmarking via triton do_bench,
debugging via compile-time printf macros). The TPU framework gets the real
thing: jax.profiler traces viewable in TensorBoard/Perfetto, scoped
annotations that show up on the device timeline, and a tiny structured
logger for quantization/tuning pipelines.
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Iterator

import jax

logger = logging.getLogger("flute_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[flute-tpu] %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (XLA ops, Pallas kernels, DMA) to
    ``log_dir`` for TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region on the profiler timeline (host + device)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(name: str, sync: bool = False) -> Iterator[None]:
    """Wall-clock timer with structured log output."""
    t0 = time.perf_counter()
    yield
    if sync:
        jax.effects_barrier()
    logger.info("%s took %.3fs", name, time.perf_counter() - t0)


def log_event(event: str, **fields) -> None:
    """One-line JSON event (quantization progress, tuning decisions...)."""
    logger.info("%s %s", event, json.dumps(fields, sort_keys=True, default=str))
