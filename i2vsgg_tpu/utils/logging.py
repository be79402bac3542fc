"""Training observability: scalar logging + on-demand device profiling.

Scalar parity with the reference's tensorboardX groups
(``trainval_net_instance_styleD_bilinear.py:204-211,348-382``): the same
loss-component names, written to TensorBoard when available and always to a
JSONL sidecar (machine-readable artifact the reference lacked). Profiling
uses ``jax.profiler`` traces — the reference had only wall-clock prints
(SURVEY.md §5 "Tracing / profiling: none").
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

try:
    from torch.utils.tensorboard import SummaryWriter
    _HAVE_TB = True
except Exception:                                    # pragma: no cover
    _HAVE_TB = False


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = (SummaryWriter(log_dir)
                    if use_tensorboard and _HAVE_TB else None)

    def log_scalars(self, tag: str, scalars: Dict[str, float], step: int):
        rec = {"tag": tag, "step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in
                                       scalars.items()}, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Steps/sec + frames/sec over a display interval (the reference prints
    wall-clock per disp_interval, trainval_…:385-407)."""

    def __init__(self):
        self._t0 = time.time()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self) -> float:
        dt = time.time() - self._t0
        r = self._steps / dt if dt > 0 else 0.0
        self._t0 = time.time()
        self._steps = 0
        return r


def start_profiler(log_dir: Optional[str]):
    """Begin a jax.profiler trace if a dir is given; returns stop fn."""
    if not log_dir:
        return lambda: None
    import jax
    jax.profiler.start_trace(log_dir)
    return jax.profiler.stop_trace
