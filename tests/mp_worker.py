"""Worker for the real 2-process distributed test (test_multiprocess.py).

Runs the full multi-host eval choreography the engine uses
(reference: engine.py:130 DistributedSampler shard, :148-150 comm.cat,
:89-90 comm.reduce) over actual cross-process gloo collectives:
shard_eval_triples -> per-process ranking compute -> gather_rankings
(order restoration + pad drop) -> reduce_metrics_mean.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("XLA_FLAGS", None)

    import numpy as np

    from ultra_torchdrug_tpu.parallel import distributed as dist

    ok = dist.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert ok and dist.process_count() == nprocs

    # odd length on purpose: exercises the pad-to-multiple path
    N = 13
    rng = np.random.default_rng(0)  # same seed on every process
    triples = np.stack(
        [rng.integers(0, 50, N), rng.integers(0, 50, N), rng.integers(0, 7, N)], 1
    ).astype(np.int32)

    shard = dist.shard_eval_triples(triples)
    assert len(shard) == -(-N // nprocs)

    # a deterministic "ranking" so order alignment is checkable exactly
    rank_of = lambda t: (t[:, 0] * 1000 + t[:, 1] * 10 + t[:, 2]).astype(np.float32)
    gathered = dist.gather_rankings(rank_of(shard), total=N)

    expected = rank_of(triples)
    assert gathered.shape == (N,), gathered.shape
    assert np.array_equal(gathered, expected), (gathered, expected)

    metrics = dist.reduce_metrics_mean({"mrr": float(pid), "hits": 2.0 * pid})
    assert abs(metrics["mrr"] - (nprocs - 1) / 2) < 1e-6, metrics
    assert abs(metrics["hits"] - (nprocs - 1)) < 1e-6, metrics

    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
