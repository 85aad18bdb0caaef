"""Worker for the multi-process TRAIN test (test_multiprocess.py).

Runs the full jitted train step (loss + grad + optimizer update) across OS
processes over gloo — the DDP-parity path of the reference
(/root/reference/ultra/engine.py:55-90: DDP wrap, gradient allreduce in
backward, optimizer step per rank on identical grads). Here the equivalent is
ONE jit over a process-spanning mesh: the batch is sharded over the "data"
axis, XLA inserts the gradient psums, params/opt state stay replicated.

Two mesh cases, selected by the local-device count argument:
  * 1 local device / process  -> pure multi-process DP (mesh [P] over "data")
  * 4 local devices / process -> composed 2-proc x 4-local mesh ("data" spans
    processes, "edge" is intra-process): batch DP across hosts + edge-
    partitioned rspmm within each host — the layout a real multi-host TPU
    slice would run.

Equivalence gate: after N steps the replicated parameters must match a
single-process, single-device run of the same batches bit-for-bit up to fp32
reduction order.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    local_devices = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ultra_torchdrug_tpu.parallel import distributed as dist
    from ultra_torchdrug_tpu.parallel.mesh import use_mesh

    ok = dist.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert ok and dist.process_count() == nprocs
    n_dev = jax.device_count()
    assert n_dev == nprocs * local_devices, (n_dev, nprocs, local_devices)

    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.models.nbfnet import (
        entity_nbfnet_config, rel_nbfnet_config,
    )
    from ultra_torchdrug_tpu.models.ultra import UltraConfig
    from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask

    edge_axis = "edge" if local_devices > 1 else ""

    def build_task():
        ds = synthetic_transductive(num_nodes=40, num_edges=300,
                                    num_relations=5, seed=7)
        mcfg = UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8),
                num_relations=ds.num_relations * 2, edge_axis=edge_axis,
            ),
            relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
        )
        return TransductiveKGTask(ds, mcfg, TaskConfig(num_negative=8), seed=0)

    # two task instances so the DP and single-process traces never share a
    # lowering cache (the mesh context is trace-time routing state)
    task_dp = build_task()
    task_sp = build_task()
    params0 = task_dp.init_params(jax.random.PRNGKey(0))
    tx = optax.adamw(5e-3)

    def make_step(task):
        def one_step(params, opt_state, key, batch):
            def lf(p):
                return task._loss_fn(p, key, batch, None)

            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return one_step

    if edge_axis:
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(nprocs, local_devices),
            ("data", "edge"),
        )
    else:
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    dp_step = jax.jit(
        make_step(task_dp),
        in_shardings=(rep, rep, rep, bsh),
        out_shardings=(rep, rep, rep),
    )
    sp_step = jax.jit(make_step(task_sp))

    B, STEPS = 16, 3
    rng = np.random.default_rng(0)  # same seed on every process
    triples = np.asarray(task_dp.train_triples)
    batches = [
        triples[rng.permutation(len(triples))[:B]].astype(np.int32)
        for _ in range(STEPS)
    ]

    # distributed run: replicated params/opt, data-sharded global batches
    p_dp = jax.device_put(params0, rep)
    s_dp = jax.device_put(tx.init(params0), rep)
    losses_dp = []
    with use_mesh(mesh):
        for i, b in enumerate(batches):
            key = jax.device_put(jax.random.fold_in(jax.random.PRNGKey(9), i), rep)
            p_dp, s_dp, loss = dp_step(p_dp, s_dp, key, jax.device_put(b, bsh))
            losses_dp.append(float(np.asarray(loss)))

    # single-process reference on local device 0 (no mesh context: the conv
    # falls back to its single-chip paths even with edge_axis configured)
    p_sp = params0
    s_sp = tx.init(params0)
    losses_sp = []
    for i, b in enumerate(batches):
        key = jax.random.fold_in(jax.random.PRNGKey(9), i)
        p_sp, s_sp, loss = sp_step(p_sp, s_sp, key, jnp.asarray(b))
        losses_sp.append(float(np.asarray(loss)))

    np.testing.assert_allclose(losses_dp, losses_sp, rtol=2e-4, atol=1e-6)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_sp = jax.tree_util.tree_leaves(p_sp)
    assert len(flat_dp) == len(flat_sp)
    for a, b in zip(flat_dp, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )

    print(f"MP_TRAIN_OK {pid} mesh={mesh.shape} losses={losses_dp}", flush=True)


if __name__ == "__main__":
    main()
