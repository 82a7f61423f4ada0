"""Tracing / profiling — first-class observability (SURVEY.md §5).

The reference only has CUDA-event per-iteration timing (train.py:98-127)
and sync-bracketed FPS (train.py:408-412). The TPU equivalents:

  * StepTimer — wall-clock per-step stats with device sync, EMA +
    percentiles (the iter_time scalar of train.py:289);
  * trace(...) — a context manager around jax.profiler for on-demand
    XLA/TPU traces viewable in TensorBoard / Perfetto;
  * annotate(...) — TraceAnnotation wrapper so pipeline stages (decode,
    binning, composite) show up as named spans in the trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class StepTimer:
    """Per-step wall-clock stats. Call split() AFTER jax.block_until_ready
    (or pass the step output to tick())."""

    def __init__(self, ema_decay: float = 0.98, keep: int = 10_000):
        self.ema_decay = ema_decay
        self.ema_ms: Optional[float] = None
        self.times_ms: list[float] = []
        self.keep = keep
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def tick(self, result=None) -> float:
        """Record one step; optionally block on `result` first."""
        if result is not None:
            import jax

            jax.block_until_ready(result)
        t1 = time.perf_counter()
        dt_ms = (t1 - self._t0) * 1e3 if self._t0 is not None else 0.0
        self._t0 = t1
        self.times_ms.append(dt_ms)
        if len(self.times_ms) > self.keep:
            del self.times_ms[: -self.keep]
        self.ema_ms = (dt_ms if self.ema_ms is None
                       else self.ema_decay * self.ema_ms
                       + (1 - self.ema_decay) * dt_ms)
        return dt_ms

    def stats(self, skip: int = 2) -> dict:
        t = np.asarray(self.times_ms[skip:] or self.times_ms)
        if t.size == 0:
            return {}
        return {
            "mean_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p90_ms": float(np.percentile(t, 90)),
            "p99_ms": float(np.percentile(t, 99)),
            "steps_per_s": float(1e3 / max(t.mean(), 1e-9)),
        }


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in the device trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class TensorBoardLogger:
    """Thin scalar/image logger over torch.utils.tensorboard (available in
    the baked CPU torch); no-op when tensorboard is missing. Mirrors the
    reference's tb_writer usage (train.py:284-338,381-389)."""

    def __init__(self, logdir: Optional[str]):
        self._w = None
        if logdir is None:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    @property
    def active(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def image(self, tag: str, rgb01: np.ndarray, step: int):
        """[H, W, 3] float image in [0, 1]."""
        if self._w is not None:
            self._w.add_image(tag, np.transpose(
                np.clip(rgb01, 0, 1), (2, 0, 1)), step)

    def depth_image(self, tag: str, depth: np.ndarray, step: int,
                    vmax: float = 80.0):
        from .visualize import depth_to_rgb

        self.image(tag, depth_to_rgb(np.asarray(depth), vmax), step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()


class WandbLogger:
    """Optional Weights & Biases sink, mirroring the reference's guarded
    usage (train.py:53-60 init, :611-622 metric logging): a no-op when the
    package is missing (it is not baked into this environment) or init
    fails — training must never depend on the logger."""

    def __init__(self, project: Optional[str], run_name: str = None,
                 config: dict = None):
        self._wb = None
        if not project:
            return
        try:
            import wandb

            wandb.init(project=project, name=run_name, config=config or {})
            self._wb = wandb
        except Exception:
            self._wb = None

    @property
    def active(self) -> bool:
        return self._wb is not None

    def log(self, values: dict, step: int = None, prefix: str = ""):
        if self._wb is None:
            return
        payload = {prefix + k: float(v) for k, v in values.items()
                   if isinstance(v, (int, float, np.floating, np.integer))}
        self._wb.log(payload, step=step)

    def finish(self):
        if self._wb is not None:
            self._wb.finish()
