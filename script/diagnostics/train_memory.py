"""Peak HBM of the full train step (loss+grad) at large-graph scale.

Round 2's known ceiling: ATOMIC-scale (V=304k) training at batch 64 OOMed at
27.9 GB — every [V, B, 64] f32 carry/remat buffer paid a 2x lane-padding
expansion. The flat [V, B*D] activation layout removes that; this harness
measures the XLA-reported temp allocation of one jitted grad step so the
number is tracked per round.

Usage (real TPU):
  python script/diagnostics/train_memory.py [--nodes 304388] [--batch 64]
      [--impl pallas] [--remat full|save_rspmm]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=304388)  # ATOMIC entities
    ap.add_argument("--edges", type=int, default=610536)
    ap.add_argument("--relations", type=int, default=9)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-negative", type=int, default=128)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--remat", default="full")
    ap.add_argument("--micro-batch", type=int, default=-1,
                    help="-1 = auto (tasks.task.auto_micro_batch), 0 = off")
    ap.add_argument("--run", action="store_true",
                    help="also execute the step (costs a long remote compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )

    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.models.nbfnet import (
        entity_nbfnet_config, entity_nbfnet_init, entity_nbfnet_score_all,
    )
    from ultra_torchdrug_tpu.tasks.kg import bce_self_adversarial

    rng = np.random.default_rng(0)
    V, E, R, B, N = args.nodes, args.edges, args.relations, args.batch, args.num_negative
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    g = Graph.from_triplets(tri, V, R).undirected_with_inverse()
    if args.impl == "pallas":
        t0 = time.time()
        g = g.prepare_pallas()
        print(f"# layout build {time.time() - t0:.1f}s", file=sys.stderr)

    remat = args.remat if args.remat in ("full", "save_rspmm") else True
    cfg = entity_nbfnet_config(
        input_dim=args.dim, hidden_dims=(args.dim,) * args.layers,
        num_relations=2 * R, rspmm_impl=args.impl, remat=remat,
        micro_batch=max(args.micro_batch, 0),
    )
    if args.micro_batch < 0:
        import dataclasses

        from ultra_torchdrug_tpu.models.ultra import UltraConfig
        from ultra_torchdrug_tpu.tasks.task import auto_micro_batch

        wrapped = UltraConfig(entity=cfg, relation=cfg)
        cfg = auto_micro_batch(wrapped, V, B).entity
        print(f"# auto micro_batch -> {cfg.micro_batch}", file=sys.stderr)
    params = entity_nbfnet_init(jax.random.PRNGKey(0), cfg)
    rel_q = jnp.asarray(rng.normal(size=(B, 2 * R, args.dim)).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    qr = jnp.asarray(rng.integers(0, 2 * R, B).astype(np.int32))
    cand = jnp.asarray(rng.integers(0, V, (B, N + 1)).astype(np.int32))

    def loss_fn(p):
        scores = entity_nbfnet_score_all(p, cfg, g, rel_q, src, qr)  # [B, V]
        picked = jnp.take_along_axis(scores, cand, axis=1)  # [B, 1+N]
        return bce_self_adversarial(picked, 1.0)

    step = jax.jit(jax.grad(loss_fn))
    temp = -1.0
    try:
        ma = step.lower(params).compile().memory_analysis()
        temp = ma.temp_size_in_bytes
    except Exception as e:  # pragma: no cover
        print(f"# memory_analysis unavailable: {e}", file=sys.stderr)
    exec_s = -1.0
    if args.run:
        t0 = time.time()
        out = jax.block_until_ready(step(params))
        print(f"# first step (incl. compile) {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        out = jax.block_until_ready(step(params))
        exec_s = time.time() - t0
        del out
    print(
        f'{{"V": {V}, "E_und": {g.num_edges}, "B": {B}, "impl": "{args.impl}",'
        f' "remat": "{args.remat}", "xla_temp_gb": {temp / 1e9:.2f},'
        f' "step_s": {exec_s:.3f}}}'
    )


if __name__ == "__main__":
    main()
