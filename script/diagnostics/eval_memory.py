"""Measure peak HBM of the all-entity eval step at large-graph scale.

The reference needed candidate chunking + CPU offload escape hatches for its
biggest transductive graphs (task.py:602-618, :262-263); this framework's
propagate-once-score-all eval plus the optional score_chunk tail replaces
them. This harness builds an ATOMIC/ConceptNet-scale synthetic KG and
reports device peak_bytes_in_use for one eval batch.

Usage (real TPU):
  python script/diagnostics/eval_memory.py [--nodes 304388] [--edges 610536]
      [--batch 16] [--chunk 0] [--impl pallas]
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
    ap.add_argument("--edges", type=int, default=610536)  # ~ATOMIC train size
    ap.add_argument("--relations", type=int, default=9)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--impl", default="pallas")
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

    rng = np.random.default_rng(0)
    V, E, R = args.nodes, args.edges, args.relations
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    g = Graph.from_triplets(tri, V, R).undirected_with_inverse()
    if args.impl == "pallas":
        t0 = time.time()
        g = g.prepare_pallas()
        print(f"# layout build {time.time() - t0:.1f}s", file=sys.stderr)

    cfg = entity_nbfnet_config(
        input_dim=args.dim, hidden_dims=(args.dim,) * args.layers,
        num_relations=2 * R, rspmm_impl=args.impl, score_chunk=args.chunk,
    )
    params = entity_nbfnet_init(jax.random.PRNGKey(0), cfg)
    B = args.batch
    rel_q = jnp.asarray(rng.normal(size=(B, 2 * R, args.dim)).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    qr = jnp.asarray(rng.integers(0, 2 * R, B).astype(np.int32))

    fn = jax.jit(lambda p, rq, s, q: entity_nbfnet_score_all(p, cfg, g, rq, s, q))
    t0 = time.time()
    out = jax.block_until_ready(fn(params, rel_q, src, qr))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(fn(params, rel_q, src, qr))
    exec_s = time.time() - t0

    # runtime peak when the backend exposes it; XLA's compile-time memory
    # analysis otherwise (remote-tunnel devices return no memory_stats)
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    temp = args_b = -1.0
    try:
        ma = fn.lower(params, rel_q, src, qr).compile().memory_analysis()
        temp = ma.temp_size_in_bytes
        args_b = ma.argument_size_in_bytes
    except Exception:
        pass
    print(
        f'{{"V": {V}, "E_und": {g.num_edges}, "B": {B}, "impl": "{args.impl}",'
        f' "score_chunk": {args.chunk},'
        f' "xla_temp_gb": {temp / 1e9:.2f}, "xla_args_gb": {args_b / 1e9:.2f},'
        f' "runtime_peak_gb": {(peak or 0) / 1e9:.2f},'
        f' "compile_s": {compile_s:.1f}, "eval_batch_s": {exec_s:.3f},'
        f' "finite": {bool(jnp.isfinite(out).all())}}}'
    )


if __name__ == "__main__":
    main()
