"""Generalized relational sparse-dense matrix multiply (rspmm).

The hot op of NBFNet-style propagation:

    out[t] = AGG_{e=(h,t,r)} edge_weight[e] * (relation[r] MSG x[h])

with MSG in {mul (distmult), add (transe)} and AGG in {add, max, min}.

This is the TPU-native equivalent of torchdrug's C++/CUDA
``generalized_rspmm`` extension (called from /root/reference/ultra/layer.py:134-178;
advertised in the reference README as the O(V)-memory fast path). Here:

  * ``impl='xla'``   — segment-op formulation; correct everywhere (CPU/TPU),
    materializes [E, B, D] messages. The semantics oracle for tests.
  * ``impl='pallas'`` — fused TPU kernel (ops/rspmm_pallas.py); O(V·D) memory,
    messages are produced and consumed in VMEM.

For AGG='add' a custom VJP avoids saving messages: the backward is two more
rspmm-shaped reductions (a transposed SpMM for d_input and an SDDMM-style
segment-by-relation reduction for d_relation) — mirroring the structure of the
reference kernel's backward pass.

Shapes:
  relation: [R, D] (shared across batch) or [R, B, D] (per-batch, the
            query-conditioned case of layer.py:298-330)
  input:    [V, B, D]
  out:      [V, B, D]
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

__all__ = ["generalized_rspmm"]

_MSG_FUNCS = ("mul", "add")
_AGG_FUNCS = ("add", "max", "min")


def _expand_rel(rel_e, x_e):
    """Broadcast gathered relation rows against gathered node rows."""
    if rel_e.ndim == x_e.ndim:
        return rel_e
    # rel [E, D] vs x [E, B, D]
    return rel_e[:, None, :]


def _messages(edge_index, edge_type, edge_weight, relation, x, msg):
    src = edge_index[:, 0]
    x_e = x[src]
    rel_e = _expand_rel(relation[edge_type], x_e)
    if msg == "mul":
        m = rel_e * x_e
    elif msg == "add":
        m = rel_e + x_e
    elif msg == "none":  # internal: backward of transe w.r.t. input
        m = jnp.broadcast_to(x_e, jnp.broadcast_shapes(rel_e.shape, x_e.shape))
    else:
        raise ValueError(f"unknown message function {msg!r}")
    w = edge_weight.reshape((-1,) + (1,) * (m.ndim - 1))
    return m * w


def _segment(values, segment_ids, num_segments, agg):
    if agg == "add":
        return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    if agg == "max":
        return jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    if agg == "min":
        return jax.ops.segment_min(values, segment_ids, num_segments=num_segments)
    raise ValueError(f"unknown aggregate function {agg!r}")


def _rspmm_xla(edge_index, edge_type, edge_weight, relation, x, *, msg, agg, num_nodes):
    m = _messages(edge_index, edge_type, edge_weight, relation, x, msg)
    out = _segment(m, edge_index[:, 1], num_nodes, agg)
    if agg in ("max", "min"):
        # empty segments come back as +/-inf from segment_max/min; the reference
        # kernel yields the identity of the semiring with zero terms = 0
        # contribution, then folds the boundary in. Use 0 for empty rows so
        # downstream max(update, boundary) matches the dense fallback
        # (layer.py:93 scatter_max with dim_size fills absent rows with 0).
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    return out


def _dispatch_fwd(edge_index, edge_type, edge_weight, relation, x, *, msg, agg, num_nodes, impl):
    if impl == "pallas":
        from . import rspmm_pallas

        return rspmm_pallas.rspmm_fwd(
            edge_index, edge_type, edge_weight, relation, x,
            msg=msg, agg=agg, num_nodes=num_nodes,
        )
    return _rspmm_xla(
        edge_index, edge_type, edge_weight, relation, x,
        msg=msg, agg=agg, num_nodes=num_nodes,
    )


@lru_cache(maxsize=None)
def _make_rspmm_add(msg: str, num_nodes: int, impl: str):
    """Build (and cache, for stable jit identity) the custom-VJP rspmm for
    AGG='add'. edge_weight is treated as a constant here (no edge gradients —
    the path-visualization variant that differentiates through edge weights
    uses the plain autodiff implementation instead)."""

    def fwd_only(edge_index, edge_type, edge_weight, relation, x):
        return _dispatch_fwd(
            edge_index, edge_type, edge_weight, relation, x,
            msg=msg, agg="add", num_nodes=num_nodes, impl=impl,
        )

    @jax.custom_vjp
    def rspmm(edge_index, edge_type, edge_weight, relation, x):
        return fwd_only(edge_index, edge_type, edge_weight, relation, x)

    def rspmm_fwd(edge_index, edge_type, edge_weight, relation, x):
        out = fwd_only(edge_index, edge_type, edge_weight, relation, x)
        return out, (edge_index, edge_type, edge_weight, relation, x)

    def rspmm_bwd(res, g):
        edge_index, edge_type, edge_weight, relation, x = res
        rev_index = edge_index[:, ::-1]
        # d_input[h] = sum_e w_e * (rel_e * g[t_e])   (mul)
        #            = sum_e w_e * g[t_e]             (add)
        dx = _dispatch_fwd(
            rev_index, edge_type, edge_weight, relation, g,
            msg="mul" if msg == "mul" else "none",
            agg="add", num_nodes=x.shape[0], impl=impl,
        )
        # d_relation[r] = sum_{e: type r} w_e * (x[h_e] * g[t_e])  (mul)
        #              = sum_{e: type r} w_e * g[t_e]              (add)
        src, dst = edge_index[:, 0], edge_index[:, 1]
        if msg == "mul":
            dr_e = x[src] * g[dst]
        else:
            dr_e = g[dst]
        w = edge_weight.reshape((-1,) + (1,) * (dr_e.ndim - 1))
        dr = jax.ops.segment_sum(dr_e * w, edge_type, num_segments=relation.shape[0])
        if relation.ndim < dr.ndim:  # shared relation: sum over batch dim
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        zero_i = jnp.zeros(edge_index.shape, dtype=jax.dtypes.float0)
        zero_t = jnp.zeros(edge_type.shape, dtype=jax.dtypes.float0)
        dw = jnp.zeros_like(edge_weight)
        return zero_i, zero_t, dw, dr, dx

    rspmm.defvjp(rspmm_fwd, rspmm_bwd)
    return rspmm


def generalized_rspmm(
    edge_index,
    edge_type,
    edge_weight,
    relation,
    x,
    *,
    msg: str = "mul",
    agg: str = "add",
    num_nodes: int,
    impl: str = "xla",
    edge_grad: bool = False,
):
    """Relational SpMM. See module docstring for semantics and shapes.

    Args:
      msg: "mul" (distmult) or "add" (transe).
      agg: "add", "max" or "min".
      impl: "xla" (segment ops) or "pallas" (fused TPU kernel, AGG='add' only).
      edge_grad: if True, use the plain autodiff path so gradients flow to
        ``edge_weight`` (needed by path interpretability; costs message
        materialization like the reference's O(E) fallback at layer.py:112).
    """
    if msg not in _MSG_FUNCS:
        raise ValueError(f"msg must be one of {_MSG_FUNCS}, got {msg!r}")
    if agg not in _AGG_FUNCS:
        raise ValueError(f"agg must be one of {_AGG_FUNCS}, got {agg!r}")
    if agg == "add" and not edge_grad:
        fn = _make_rspmm_add(msg, int(num_nodes), impl)
        return fn(edge_index, edge_type, edge_weight, relation, x)
    # max/min (and the edge-grad variant): plain autodiff through segment ops.
    return _rspmm_xla(
        edge_index, edge_type, edge_weight, relation, x,
        msg=msg, agg=agg, num_nodes=int(num_nodes),
    )
