"""Microbenchmark: XLA relayout/reshape costs at the propagation shapes.

Questions this answers (v5e, V=15000, B=64, D=64, F=4096):
  1. is reshape [V,4096] -> [V,64,64] a physical copy? (lane padding 2x)
  2. is reshape [V,4096] -> [V,32,128] a copy? (lane-aligned 3D)
  3. elementwise chain cost at [V,B,64] (padded) vs [V,4096] (flat)
  4. linear: concat([x,u],-1)@W vs x@W1+u@W2, 3D vs blockdiag-2x flat
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", ".jax_cache"))

V, B, D = 15000, 64, 64
F = B * D
rng = np.random.default_rng(0)
xf = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
uf = jnp.asarray(rng.normal(size=(V, F)).astype(np.float32))
x3 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
u3 = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(2 * D, D)).astype(np.float32) * 0.1)
W1, W2 = W[:D], W[D:]
Wbd = jnp.asarray(
    np.block([[np.asarray(W1), np.zeros((D, D))],
              [np.zeros((D, D)), np.asarray(W1)]]).astype(np.float32))
Wbd2 = jnp.asarray(
    np.block([[np.asarray(W2), np.zeros((D, D))],
              [np.zeros((D, D)), np.asarray(W2)]]).astype(np.float32))


def slope(name, fn, *args, chain=8):
    def chained(n):
        @jax.jit
        def f(*a):
            out = fn(*a)
            for _ in range(n - 1):
                out = fn(a[0] + 1e-30 * out.ravel()[0], *a[1:])
            return out.ravel()[0]
        return f
    lo, hi = chained(2), chained(2 + chain)
    float(lo(*args)); float(hi(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(lo(*args)); tl = time.time() - t0
        t0 = time.time(); float(hi(*args)); th = time.time() - t0
        best = min(best, (th - tl) / chain)
    print(f"{name:34s} {best*1e3:7.3f} ms", flush=True)


# 1/2: reshape costs (force materialization with a trivial consumer whose
# output shape keeps the target layout: +1 then sum over last axis)
slope("reshape_to_Vx64x64_touch", lambda x: (x.reshape(V, B, D) + 1.0).sum(-1), xf)
slope("reshape_to_Vx32x128_touch", lambda x: (x.reshape(V, 32, 128) + 1.0).sum(-1), xf)
slope("flat_touch", lambda x: (x + 1.0).sum(-1), xf)

# 3: five-op elementwise chain, padded vs flat
def chain3(x):
    y = x * 1.0001 + 0.1
    y = jnp.maximum(y, 0.0)
    y = y * x + y
    return y.sum()
slope("elemwise5_3d_Vx64x64", lambda x: chain3(x), x3)
slope("elemwise5_flat", lambda x: chain3(x), xf)

# 4: the conv linear, four formulations
slope("linear_concat_3d", lambda x, u: (
    jnp.concatenate([x, u], -1) @ W).sum(), x3, u3)
slope("linear_split_3d", lambda x, u: (x @ W1 + u @ W2).sum(), x3, u3)
slope("linear_split_flat_reshape3d", lambda x, u: (
    x.reshape(V, B, D) @ W1 + u.reshape(V, B, D) @ W2).sum(), xf, uf)
slope("linear_blockdiag_flat128", lambda x, u: (
    x.reshape(V, 32, 128) @ Wbd + u.reshape(V, 32, 128) @ Wbd2).sum(), xf, uf)
