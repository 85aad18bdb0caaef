"""Decompose the headline bench (45 ms fwd+bwd) into component times.

Times, at the exact bench workload (V=15k, E=544k, F=4096, hot_rows=1024):
  fwd_full        rspmm_fwd_pallas (cold DMA kernel + hot VMEM kernel + combine)
  fwd_cold_only   the cold kernel alone (hot layouts stripped)
  fwd_nohot       a no-hot-split layout (every edge through the DMA kernel)
  bwd_full        rspmm_bwd_pallas (fused rev cold + rev hot + adds)
  fwd_bwd         value_and_grad of sum(out^2) — the bench step

Slope-timed (chain n vs n+k inside one jit) to cancel the remote-tunnel RTT.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import build_workload  # noqa: E402

from ultra_torchdrug_tpu.data.graph import Graph  # noqa: E402
from ultra_torchdrug_tpu.ops.rspmm_pallas import (  # noqa: E402
    rspmm_bwd_pallas, rspmm_fwd_pallas,
)

V, R = 15000, 474
triplets, rel, x = build_workload()
E = triplets.shape[0]

g_hot = Graph.from_triplets(triplets, V, R).prepare_pallas()
g_cold = Graph.from_triplets(triplets, V, R).prepare_pallas(hot_rows=0)

relation = jnp.asarray(rel)
x0 = jnp.asarray(x)
gr0 = jnp.asarray(np.random.default_rng(1).normal(size=x.shape).astype(np.float32))


def slope_time(name, step, args, chain=6):
    """step: fn(*args) -> array; chains by feeding a scalar perturbation."""
    def chained(n):
        @jax.jit
        def f(*a):
            out = step(*a)
            for _ in range(n - 1):
                out = step(a[0] + 1e-30 * out.ravel()[0], *a[1:])
            return out.ravel()[0]
        return f

    lo, hi = chained(2), chained(2 + chain)
    float(lo(*args)); float(hi(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(lo(*args)); tl = time.time() - t0
        t0 = time.time(); float(hi(*args)); th = time.time() - t0
        best = min(best, (th - tl) / chain)
    print(f"{name:14s} {best*1e3:8.2f} ms  ({E/best/1e6:.1f} M edges/s)",
          flush=True)
    return best


def fwd(g):
    def f(xx, rr):
        return rspmm_fwd_pallas(g.layouts, g.edge_weight, rr, xx,
                                msg="mul", num_nodes=V)
    return f


def bwd(g):
    def f(xx, rr, gg):
        dr, dx = rspmm_bwd_pallas(g.layouts, g.edge_weight, rr, xx, gg,
                                  msg="mul")
        return dx + 0 * dr.sum()
    return f


which = sys.argv[1:] if len(sys.argv) > 1 else [
    "fwd_full", "fwd_nohot", "bwd_full", "bwd_nohot"]
if "fwd_full" in which:
    slope_time("fwd_full", lambda xx, rr: fwd(g_hot)(xx, rr), (x0, relation))
if "fwd_nohot" in which:
    slope_time("fwd_nohot", lambda xx, rr: fwd(g_cold)(xx, rr), (x0, relation))
if "bwd_full" in which:
    slope_time("bwd_full", lambda xx, rr, gg: bwd(g_hot)(xx, rr, gg),
               (x0, relation, gr0))
if "bwd_nohot" in which:
    slope_time("bwd_nohot", lambda xx, rr, gg: bwd(g_cold)(xx, rr, gg),
               (x0, relation, gr0))
