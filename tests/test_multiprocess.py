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


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nprocs", [2])
def test_two_process_eval_gather(nprocs):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), str(nprocs), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MP_OK {i}" in out, f"proc {i} missing OK marker:\n{out}"
