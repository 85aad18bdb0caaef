"""Real multi-process distributed test: spawns 2 OS processes that
initialize jax.distributed over a localhost coordinator (gloo CPU
collectives) and run the engine's full eval shard/gather/reduce
choreography (parallel/distributed.py).

This exercises the paths the in-process tests can't: actual
process_allgather across unequal data, order restoration after
round-robin sharding, and metric mean-reduction (reference
engine.py:89-90, :130, :148-150).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")
TRAIN_WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "mp_worker_train.py"
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(worker, nprocs, extra_args=(), timeout=300, marker="MP_OK"):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), str(nprocs), str(port),
             *map(str, extra_args)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"{marker} {i}" in out, f"proc {i} missing OK marker:\n{out}"


@pytest.mark.parametrize("nprocs", [2])
def test_two_process_eval_gather(nprocs):
    _run_workers(WORKER, nprocs, timeout=120, marker="MP_OK")


def test_two_process_train_step_matches_single():
    """Full jitted train step (loss+grad+update) across 2 OS processes over
    gloo, batch sharded per process; params after N steps must match the
    single-process run (DDP semantics, reference engine.py:55-90)."""
    _run_workers(TRAIN_WORKER, 2, extra_args=(1,), marker="MP_TRAIN_OK")


def test_two_process_four_device_composed_mesh_train():
    """2 processes x 4 local devices: "data" axis spans processes (gradient
    psum over gloo), "edge" axis partitions the rspmm within each process —
    the mesh layout a real multi-host slice would run."""
    _run_workers(TRAIN_WORKER, 2, extra_args=(4,), marker="MP_TRAIN_OK")
