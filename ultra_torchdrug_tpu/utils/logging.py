"""Run logging: console + log.txt in the working directory, windowed meter.

Mirrors the reference's logging surface (/root/reference/ultra/util.py:91-101
root logger; torchdrug core.Meter epoch/step averaging used at
/root/reference/ultra/engine.py:63,91,153) without the torchdrug dependency.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict

import numpy as np


def get_root_logger(log_file: str | None = "log.txt") -> logging.Logger:
    logger = logging.getLogger("ultra_tpu")
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)-10s %(message)s", "%H:%M:%S")
    if not any(isinstance(h, logging.StreamHandler) and
               not isinstance(h, logging.FileHandler) for h in logger.handlers):
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file:
        path = os.path.abspath(log_file)
        existing = [
            h for h in logger.handlers if isinstance(h, logging.FileHandler)
        ]
        if not any(getattr(h, "baseFilename", None) == path for h in existing):
            # one file sink per run: retarget to the current working directory
            for h in existing:
                logger.removeHandler(h)
                h.close()
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class Meter:
    """Accumulates step metrics; reports window averages every log_interval
    updates and epoch summaries on demand.

    Metric values may be device (jax) scalars: they are held lazily and
    fetched in ONE batched device_get per log window, so the train loop never
    blocks on per-step metric transfers (over the remote-TPU tunnel a per-step
    float() costs a full round trip and serializes host against device)."""

    def __init__(self, logger: logging.Logger, log_interval: int = 100,
                 sink=None):
        self.logger = logger
        self.log_interval = log_interval
        # optional metric sink (e.g. utils.debug.WandbLogger) — the analog of
        # torchdrug core.Engine's `logger: wandb` config key, which the
        # reference's engine accepts (config/transductive/pretrain_3g.yaml:47)
        self.sink = sink
        self.reset()
        self.epoch = 0
        self.global_step = 0

    def reset(self):
        self._pending = []  # list of (metric dict, step count); values lazy
        self._steps = 0
        self._rates = defaultdict(float)  # summed counts -> count/window_dt
        self._t0 = time.time()

    @property
    def _count(self):
        return self._steps

    def update(self, metrics: dict, rates: dict | None = None):
        """`metrics` are averaged over the window. `rates` are summed counts
        reported as count-per-second of window wall time (e.g. propagated
        edges), which measures true device throughput rather than per-step
        host dispatch time."""
        self.update_many(metrics, 1, rates)

    def update_many(self, metrics: dict, n: int, rates: dict | None = None):
        """Record `n` optimizer steps at once; each metric value is a stacked
        [n] array (or a scalar when n == 1). Used by the engine's chunked step
        (steps_per_call > 1), where one device dispatch covers n steps."""
        self.global_step += n
        self._steps += n
        self._pending.append((dict(metrics), n))
        for k, v in (rates or {}).items():
            self._rates[k] += v
        if self._steps >= self.log_interval:
            self.log_window()

    def log_window(self):
        if not self._pending:
            return
        import jax

        fetched = jax.device_get(self._pending)  # one transfer for the window
        dt = time.time() - self._t0
        n = self._steps
        sums = defaultdict(float)
        for step, _cnt in fetched:
            for k, v in step.items():
                sums[k] += float(np.sum(v))
        rate = n / dt if dt > 0 else 0.0
        parts = [f"{k}: {v / n:.6g}" for k, v in sorted(sums.items())]
        parts += [
            f"{k}: {v / dt if dt > 0 else 0.0:.6g}"
            for k, v in sorted(self._rates.items())
        ]
        self.logger.info(
            f"step {self.global_step} | {' | '.join(parts)} | {rate:.2f} it/s"
        )
        if self.sink is not None:
            record = {k: v / n for k, v in sums.items()}
            record.update(
                {k: (v / dt if dt > 0 else 0.0) for k, v in self._rates.items()}
            )
            record["it_per_s"] = rate
            self.sink.log(record, step=self.global_step)
        self.reset()

    def log_dict(self, metrics: dict, category: str = ""):
        prefix = f"[{category}] " if category else ""
        for k in sorted(metrics):
            self.logger.info(f"{prefix}{k}: {float(metrics[k]):.6g}")
        if self.sink is not None:
            pre = f"{category}/" if category else ""
            self.sink.log(
                {f"{pre}{k}": float(v) for k, v in metrics.items()},
                step=self.global_step,
            )


def create_working_directory(output_dir: str, *names: str) -> str:
    """output_dir/<name pieces>/<timestamp> — the reference's layout
    (util.py:104-128). Single-process (multi-host rendezvous goes through
    jax.distributed, not a shared-FS file dance)."""
    path = os.path.join(
        os.path.expanduser(output_dir), *names, time.strftime("%Y-%m-%d-%H-%M-%S")
    )
    os.makedirs(path, exist_ok=True)
    return path
