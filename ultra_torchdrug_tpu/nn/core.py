"""Minimal functional NN core: parameters are nested dicts of arrays, modules
are (init, apply) function pairs. No framework classes — everything composes
under jit/grad/vmap/shard_map, and the parameter tree maps 1:1 onto the
reference checkpoints' state-dict keys for the .pth importer.

Initializers replicate torch defaults so training-from-scratch matches the
reference's setup in distribution: Linear weight/bias ~ U(-1/sqrt(fan_in), +),
Embedding ~ N(0, 1), LayerNorm scale=1 bias=0.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Params = dict


# ---- linear ---------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim**0.5)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # Precision.HIGHEST: TPU default truncates f32 matmul inputs to bf16;
    # the reference runs true-fp32 matmuls (TF32 disabled,
    # /root/reference/script/run_full.py:19-20) — parity requires f32 here
    return (
        jnp.dot(x, p["w"], precision=jax.lax.Precision.HIGHEST) + p["b"]
    )


# ---- MLP (torchdrug layers.MLP: ReLU between layers, none after the last) --


def mlp_init(key, in_dim: int, hidden_dims: Sequence[int]) -> Params:
    dims = [in_dim] + list(hidden_dims)
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
        ]
    }


def mlp_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear_apply(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# ---- layer norm -----------------------------------------------------------


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---- embedding ------------------------------------------------------------


def embedding_init(key, num: int, dim: int) -> Params:
    return {"weight": jax.random.normal(key, (num, dim), jnp.float32)}


def embedding_apply(p: Params, idx: jnp.ndarray) -> jnp.ndarray:
    return p["weight"][idx]


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
