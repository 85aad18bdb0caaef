"""Decompose the per-layer XLA glue of the entity conv (sum aggregation) at
FB scale: BENCH_BREAKDOWN shows entity fwd 131 ms while 6 rspmm forwards
account for ~74 ms — ~9.5 ms/layer is boundary add + combine matmuls +
layer norm + activation + pad/slice glue. Slope-times a ladder:

  k0_rspmm      6x generalized_rspmm fwd only (includes the op's own
                pad/slice/weight-gather wrapper)
  k1_layer      6x full conv_apply (sum, layer_norm, relu, short_cut off
                here — shortcut lives in the tower loop)
  k2_nonorm     6x conv_apply with layer_norm=False, activation=none
  k3_nocombine  6x (rspmm + boundary add) only — isolates the combine

Writes LAYER_GLUE.json. Usage: python script/diagnostics/layer_glue.py
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "LAYER_GLUE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.models.layers import conv_apply, conv_init
    from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_config
    from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ds = synthetic_transductive("fb", 14541, 272115, 237, seed=0)
    g, _ = ds.fact_graph(None)
    und = g.undirected_with_inverse()
    if impl == "pallas":
        und = und.prepare_pallas()
    V = und.num_nodes
    B, D = 64, 64
    F = B * D
    cfg = entity_nbfnet_config(
        input_dim=D, hidden_dims=(D,) * 6,
        num_relations=und.num_relations, rspmm_impl=impl,
    )
    lcfg = dataclasses.replace(cfg.layer_configs()[0], layer_norm=True)
    lcfg_nn = dataclasses.replace(lcfg, layer_norm=False, activation="none")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    lp = conv_init(key, lcfg)
    x0 = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32) * 0.1)
    bnd = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32) * 0.1)
    # injected per-(batch, relation) queries [B, R, D] (the conv transposes
    # to [R, B, D]); the direct rspmm legs use the transposed view
    rel_inj = jnp.asarray(
        rng.normal(size=(B, und.num_relations, D)).astype(np.float32) * 0.1)
    rel_rbd = rel_inj.transpose(1, 0, 2)

    results = {
        "backend": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%d"),
        "V": int(V), "E_und": int(und.num_edges), "B": B, "D": D,
        "method": "slope(chained jit depths, per-depth minima)",
    }

    def slope(name, step, lo_n=2, hi_n=6, reps=3):
        # graph/boundary/relation arrive as jit ARGUMENTS — closure
        # constants inline multi-MB arrays as MLIR literals and blow the
        # remote-compile payload limit (CLAUDE.md)
        def make(n):
            @jax.jit
            def f(xx, gg, bb, rr):
                def body(i, xx):
                    return step(xx, gg, bb, rr)
                xx = jax.lax.fori_loop(0, n, body, xx)
                return xx[0, 0]
            return f

        lo, hi = make(lo_n), make(hi_n)
        fargs = (x0, und, bnd, rel_inj)
        float(lo(*fargs))
        float(hi(*fargs))
        tl = th = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(lo(*fargs))
            tl = min(tl, time.time() - t0)
            t0 = time.time()
            float(hi(*fargs))
            th = min(th, time.time() - t0)
        ms = max((th - tl) / (hi_n - lo_n) * 1e3, 0.0)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms / 6 layers = {ms/6:.2f} ms/layer",
              flush=True)
        return ms

    def k0(xx, gg, bb, rr):
        for _ in range(6):
            out = generalized_rspmm(
                gg.edge_index, gg.edge_type, gg.edge_weight,
                rr.transpose(1, 0, 2),
                xx.reshape(V, B, D), msg="mul", agg="add", num_nodes=V,
                impl=impl, layouts=gg.layouts,
            ).reshape(V, F)
            xx = out * (1.0 / 6.0) + xx * 1e-6
        return xx

    def k3(xx, gg, bb, rr):
        for _ in range(6):
            out = generalized_rspmm(
                gg.edge_index, gg.edge_type, gg.edge_weight,
                rr.transpose(1, 0, 2),
                xx.reshape(V, B, D), msg="mul", agg="add", num_nodes=V,
                impl=impl, layouts=gg.layouts,
            ).reshape(V, F)
            xx = (out + bb) * (1.0 / 6.0) + xx * 1e-6
        return xx

    def layer_step(c):
        def step(xx, gg, bb, rr):
            for _ in range(6):
                out = conv_apply(lp, c, gg, xx, bb, rel_injected=rr)
                xx = out * (1.0 / 6.0) + xx * 1e-6
            return xx
        return step

    slope("k0_rspmm_x6", k0)
    slope("k3_rspmm_boundary_x6", k3)
    slope("k2_layer_nonorm_x6", layer_step(lcfg_nn))
    slope("k1_layer_full_x6", layer_step(lcfg))

    results["derived"] = {
        "boundary_add_per_layer": round(
            (results["k3_rspmm_boundary_x6"] - results["k0_rspmm_x6"]) / 6, 2),
        "combine_matmuls_per_layer": round(
            (results["k2_layer_nonorm_x6"]
             - results["k3_rspmm_boundary_x6"]) / 6, 2),
        "norm_act_per_layer": round(
            (results["k1_layer_full_x6"] - results["k2_layer_nonorm_x6"]) / 6,
            2),
        "total_glue_per_layer": round(
            (results["k1_layer_full_x6"] - results["k0_rspmm_x6"]) / 6, 2),
    }
    print(results["derived"], flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
