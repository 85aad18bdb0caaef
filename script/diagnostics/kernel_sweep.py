"""Sweep the rspmm kernel's pipeline-depth knobs on the real TPU.

Each configuration runs in a SUBPROCESS (clean jit/lru caches; the knobs are
import-time constants) against the bench.py headline workload, timing forward
and fwd+bwd separately. Results append to /tmp/kernel_sweep.jsonl and print
as a table. Compiles are minutes each over the tunnel but persist in
.jax_cache, so re-running a config is cheap.

Usage:
  python script/diagnostics/kernel_sweep.py                 # default grid
  python script/diagnostics/kernel_sweep.py 8,4,8 16,4,8    # GROUP,NGRP,NACC
  python script/diagnostics/kernel_sweep.py --tile-edges 512 8,8,8
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", %(cache)r)
sys.path.insert(0, %(repo)r)
from bench import build_workload
from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

triplets, rel, x = build_workload()
V, R = 15000, 474
E = triplets.shape[0]
g = Graph.from_triplets(triplets, V, R).prepare_pallas(
    tile_edges=%(tile_edges)d, tile_rows=%(tile_rows)d)
relation = jnp.asarray(rel); x0 = jnp.asarray(x)

def rs(xx, rr):
    return generalized_rspmm(g.edge_index, g.edge_type, g.edge_weight, rr, xx,
                             msg="mul", agg="add", num_nodes=V, impl="pallas",
                             layouts=g.layouts)

@jax.jit
def fwd_chain(xx, rr):
    for _ in range(4):
        xx = xx + 1e-12 * rs(xx, rr)
    return xx

grad_fn = jax.value_and_grad(lambda xx, rr: jnp.sum(rs(xx, rr)**2), argnums=(0,1))

@jax.jit
def fb_chain(xx, rr):
    for _ in range(4):
        _, (gx, gr) = grad_fn(xx, rr)
        xx = xx + 1e-12*gx; rr = rr + 1e-12*gr
    return xx, rr

def best(f, *a, n=3):
    jax.block_until_ready(f(*a))
    b = 1e9
    for _ in range(n):
        t0 = time.time(); jax.block_until_ready(f(*a)); b = min(b, time.time()-t0)
    return b / 4

fwd = best(fwd_chain, x0, relation)
fb = best(fb_chain, x0, relation)
print(json.dumps({"fwd_ms": round(fwd*1e3, 2), "fwd_bwd_ms": round(fb*1e3, 2),
                  "edges_per_s": round(E/fb, 1)}), flush=True)
"""


def run_cfg(group, ngrp, nacc, tile_edges, tile_rows):
    env = dict(os.environ)
    env.update(RSPMM_GROUP=str(group), RSPMM_NGRP=str(ngrp),
               RSPMM_NACC=str(nacc))
    code = _CHILD % dict(repo=REPO, cache=os.path.join(REPO, ".jax_cache"),
                         tile_edges=tile_edges, tile_rows=tile_rows)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=2400)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    rec = dict(group=group, ngrp=ngrp, nacc=nacc, tile_edges=tile_edges,
               tile_rows=tile_rows)
    if p.returncode == 0 and line:
        rec.update(json.loads(line[-1]))
    else:
        rec["error"] = (p.stderr or p.stdout)[-400:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", help="GROUP,NGRP,NACC triples")
    ap.add_argument("--tile-edges", type=int, default=256)
    ap.add_argument("--tile-rows", type=int, default=256)
    ap.add_argument("--log", default="/tmp/kernel_sweep.jsonl")
    args = ap.parse_args()

    cfgs = [tuple(map(int, c.split(","))) for c in args.configs] or [
        (8, 4, 8), (8, 8, 8), (16, 4, 8), (16, 8, 8), (8, 4, 16), (32, 4, 8),
    ]
    for group, ngrp, nacc in cfgs:
        rec = run_cfg(group, ngrp, nacc, args.tile_edges, args.tile_rows)
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
