"""Debug & observability helpers.

  * setup_debug_hook — post-mortem debugger on uncaught exceptions, rank-0
    only (the reference's DebugHook, /root/reference/ultra/util.py:139-154;
    non-zero ranks idle so the pod doesn't tear down mid-debug)
  * detect_anomaly — context manager enabling jax_debug_nans/infs, the
    analog of torch.autograd.set_detect_anomaly(True) wrapping the
    reference's whole run (script/run_full.py:127)
  * WandbLogger — optional metric sink (no-op without the wandb package),
    the engine-config logger hook (reference engine config `logger: wandb`)
"""

from __future__ import annotations

import contextlib
import sys


class DebugHook:
    instance = None

    def __init__(self, process_index: int = 0):
        self.process_index = process_index

    def __call__(self, *args, **kwargs):
        if self.process_index > 0:
            while True:  # pragma: no cover
                pass
        if DebugHook.instance is None:
            import pdb
            import traceback

            traceback.print_exception(*args)
            DebugHook.instance = pdb.post_mortem
        return DebugHook.instance(args[2])


def setup_debug_hook():
    import jax

    sys.excepthook = DebugHook(jax.process_index())


@contextlib.contextmanager
def detect_anomaly():
    """NaN/inf tripwire for everything executed inside (at real runtime cost,
    like the reference's global anomaly mode)."""
    import jax

    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


class WandbLogger:
    """Best-effort wandb sink; silently inert when wandb is unavailable."""

    def __init__(self, project: str = "ultra_tpu", config: dict = None):
        try:
            import wandb

            # scrub non-serializable values (reference engine.py:162-167)
            clean = {
                k: v for k, v in (config or {}).items()
                if isinstance(v, (int, float, str, bool, list, dict))
            }
            self._run = wandb.init(project=project, config=clean)
        except Exception:
            self._run = None

    def log(self, metrics: dict, step: int = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
