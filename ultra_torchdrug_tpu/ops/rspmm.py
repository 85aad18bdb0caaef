"""Generalized relational sparse-dense matrix multiply (rspmm).

The hot op of NBFNet-style propagation:

    out[t] = AGG_{e=(h,t,r)} edge_weight[e] * (relation[r] MSG x[h])

with MSG in {mul (distmult), add (transe)} and AGG in {add, max, min}.

This is the TPU-native equivalent of torchdrug's C++/CUDA
``generalized_rspmm`` extension (called from /root/reference/ultra/layer.py:134-178;
advertised in the reference README as the O(V)-memory fast path). Here:

  * ``impl='xla'``   — segment-op formulation; correct everywhere (CPU/TPU),
    materializes [E, B, D] messages. The semantics oracle for tests.
  * ``impl='pallas'`` — fused TPU kernels (ops/rspmm_pallas.py); O(V·D)
    memory, per-edge HBM row DMAs with CSR layouts precomputed per graph
    (ops/csr.py — pass via ``layouts``).

For AGG='add' a custom VJP avoids saving messages: the backward is two more
rspmm-shaped reductions (a transposed SpMM for d_input and an SDDMM-style
segment-by-relation reduction for d_relation) — the same structure as the
reference kernel's backward pass.

Shapes:
  relation: [R, D] (shared across batch) or [R, B, D] (per-batch, the
            query-conditioned case of layer.py:298-330)
  input:    [V, B, D]
  out:      [V, B, D]

Flat mode: input [V, F] with relation [R, F] (F = B*D, relation
pre-broadcast by the caller). Semantically identical, but [V, F] is the
kernels' native lane-aligned layout — callers that keep activations flat
skip a [V, B, D] relayout copy on every kernel boundary (~0.6 ms each at
FB scale). d_relation comes back [R, F] (no shared-relation batch-sum).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

__all__ = ["generalized_rspmm"]

_MSG_FUNCS = ("mul", "add", "rotate")
_AGG_FUNCS = ("add", "max", "min")


def _expand_rel(rel_e, x_e):
    if rel_e.ndim == x_e.ndim:
        return rel_e
    return rel_e[:, None, :]  # [E, D] vs [E, B, D]


def _messages(edge_index, edge_type, edge_weight, relation, x, msg):
    src = edge_index[:, 0]
    x_e = x[src]
    rel_e = _expand_rel(relation[edge_type], x_e)
    if msg == "mul":
        m = rel_e * x_e
    elif msg == "add":
        m = rel_e + x_e
    elif msg in ("rotate", "rotate_conj"):
        # RotatE complex multiply: D blocks store re in [:D/2], im in [D/2:]
        # (reference layer.py:75-80); rotate_conj (internal, the backward's
        # d_input message) conjugates the relation
        d2 = x_e.shape[-1] // 2
        xr, xi = x_e[..., :d2], x_e[..., d2:]
        rr, ri = rel_e[..., :d2], rel_e[..., d2:]
        if msg == "rotate_conj":
            ri = -ri
        m = jnp.concatenate([rr * xr - ri * xi, rr * xi + xr * ri], axis=-1)
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
        # empty rows come back +/-inf; the dense fallback semantics fill 0
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    return out


def _xla_bwd(edge_index, edge_type, edge_weight, relation, x, g, *, msg):
    """(d_relation, d_input) via segment ops."""
    rev = edge_index[:, ::-1]
    bwd_msg = {"mul": "mul", "add": "none", "rotate": "rotate_conj"}[msg]
    dx = _rspmm_xla(
        rev, edge_type, edge_weight, relation, g,
        msg=bwd_msg, agg="add", num_nodes=x.shape[0],
    )
    src, dst = edge_index[:, 0], edge_index[:, 1]
    if msg == "rotate":
        # d_rel = conj(x) (x) g per edge
        x_e, g_e = x[src], g[dst]
        if x_e.ndim < g_e.ndim:
            x_e = x_e[:, None, :]
        d2 = x_e.shape[-1] // 2
        xr, xi = x_e[..., :d2], x_e[..., d2:]
        gr, gi = g_e[..., :d2], g_e[..., d2:]
        dr_e = jnp.concatenate([xr * gr + xi * gi, xr * gi - xi * gr], axis=-1)
    else:
        dr_e = x[src] * g[dst] if msg == "mul" else g[dst]
    w = edge_weight.reshape((-1,) + (1,) * (dr_e.ndim - 1))
    dr = jax.ops.segment_sum(dr_e * w, edge_type, num_segments=relation.shape[0])
    if relation.ndim < dr.ndim:  # shared relation: sum over batch dim
        dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
    return dr, dx


def _zeros_cotangent(tree):
    def z(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(z, tree)


@lru_cache(maxsize=None)
def _make_rspmm_add(msg: str, num_nodes: int, impl: str, compute_dtype: str = "float32"):
    """custom-VJP rspmm for AGG='add' (cached for stable jit identity).
    edge_weight is constant here (edge gradients go through the plain autodiff
    path used by path visualization)."""

    def _pallas_ok(layouts):
        if impl != "pallas" or layouts is None:
            return False
        if msg == "rotate":  # rotate rides the blocked layouts only
            return getattr(layouts, "fwd_blk", None) is not None
        return True

    def fwd_impl(edge_index, edge_type, edge_weight, relation, x, layouts):
        if _pallas_ok(layouts):
            from .rspmm_pallas import rspmm_fwd_pallas

            return rspmm_fwd_pallas(
                layouts, edge_weight, relation, x, msg=msg, num_nodes=num_nodes,
                compute_dtype=jnp.dtype(compute_dtype),
            )
        return _rspmm_xla(
            edge_index, edge_type, edge_weight, relation, x,
            msg=msg, agg="add", num_nodes=num_nodes,
        )

    @jax.custom_vjp
    def rspmm(edge_index, edge_type, edge_weight, relation, x, layouts):
        return fwd_impl(edge_index, edge_type, edge_weight, relation, x, layouts)

    def rspmm_fwd(edge_index, edge_type, edge_weight, relation, x, layouts):
        out = fwd_impl(edge_index, edge_type, edge_weight, relation, x, layouts)
        return out, (edge_index, edge_type, edge_weight, relation, x, layouts)

    def rspmm_bwd(res, g):
        edge_index, edge_type, edge_weight, relation, x, layouts = res
        if _pallas_ok(layouts):
            from .rspmm_pallas import rspmm_bwd_pallas

            dr, dx = rspmm_bwd_pallas(
                layouts, edge_weight, relation, x, g, msg=msg,
                compute_dtype=jnp.dtype(compute_dtype),
            )
        else:
            dr, dx = _xla_bwd(
                edge_index, edge_type, edge_weight, relation, x, g, msg=msg
            )
        zero_i = jnp.zeros(edge_index.shape, dtype=jax.dtypes.float0)
        zero_t = jnp.zeros(edge_type.shape, dtype=jax.dtypes.float0)
        dlay = None if layouts is None else _zeros_cotangent(layouts)
        return zero_i, zero_t, jnp.zeros_like(edge_weight), dr, dx, dlay

    rspmm.defvjp(rspmm_fwd, rspmm_bwd)
    return rspmm


@lru_cache(maxsize=None)
def _make_rspmm_minmax(msg: str, agg: str, num_nodes: int):
    """custom-VJP rspmm for AGG in {max, min} through the Pallas kernels:
    forward saves the extremum; backward is one fused argext pass producing
    both gradients (the structure of the reference CUDA kernel's backward,
    /root/reference README:40-52). Gradient flows to every tied edge."""

    def fwd_impl(edge_weight, relation, x, layouts):
        from .rspmm_pallas import rspmm_fwd_pallas

        return rspmm_fwd_pallas(
            layouts, edge_weight, relation, x, msg=msg, num_nodes=num_nodes,
            agg=agg,
        )

    @jax.custom_vjp
    def rspmm(edge_weight, relation, x, layouts):
        return fwd_impl(edge_weight, relation, x, layouts)

    def rspmm_fwd(edge_weight, relation, x, layouts):
        out = fwd_impl(edge_weight, relation, x, layouts)
        return out, (edge_weight, relation, x, out, layouts)

    def rspmm_bwd(res, g):
        edge_weight, relation, x, out, layouts = res
        from .rspmm_pallas import rspmm_bwd_pallas_minmax

        dr, dx = rspmm_bwd_pallas_minmax(
            layouts, edge_weight, relation, x, out, g, msg=msg
        )
        dlay = None if layouts is None else _zeros_cotangent(layouts)
        return jnp.zeros_like(edge_weight), dr, dx, dlay

    rspmm.defvjp(rspmm_fwd, rspmm_bwd)
    return rspmm


@lru_cache(maxsize=None)
def _make_rspmm_maxmin_pair(msg: str, num_nodes: int):
    """custom-VJP fused max+min rspmm (the pna aggregate issues both on the
    same operands): forward runs ONE blocked kernel producing both extrema
    from a single x stream + message compute; backward runs ONE 4-plane
    argext pass sharing the message recompute between the two equality
    gates. Bitwise identical to separate max and min calls."""

    def fwd_impl(edge_weight, relation, x, layouts):
        from .rspmm_pallas import rspmm_fwd_pallas_maxmin

        return rspmm_fwd_pallas_maxmin(
            layouts, edge_weight, relation, x, msg=msg, num_nodes=num_nodes
        )

    @jax.custom_vjp
    def rspmm(edge_weight, relation, x, layouts):
        return fwd_impl(edge_weight, relation, x, layouts)

    def rspmm_fwd(edge_weight, relation, x, layouts):
        mx, mn = fwd_impl(edge_weight, relation, x, layouts)
        return (mx, mn), (edge_weight, relation, x, mx, mn, layouts)

    def rspmm_bwd(res, g):
        edge_weight, relation, x, mx, mn, layouts = res
        g_mx, g_mn = g
        from .rspmm_pallas import rspmm_bwd_pallas_maxmin

        dr, dx = rspmm_bwd_pallas_maxmin(
            layouts, edge_weight, relation, x, mx, mn, g_mx, g_mn, msg=msg
        )
        dlay = None if layouts is None else _zeros_cotangent(layouts)
        return jnp.zeros_like(edge_weight), dr, dx, dlay

    rspmm.defvjp(rspmm_fwd, rspmm_bwd)
    return rspmm


def generalized_rspmm_maxmin(
    edge_index,
    edge_type,
    edge_weight,
    relation,
    x,
    *,
    msg: str = "mul",
    num_nodes: int,
    impl: str = "xla",
    layouts=None,
    edge_grad: bool = False,
):
    """(max, min) aggregations of the same messages in one fused pass when
    the blocked Pallas layouts are available — the pna aggregate's extremum
    pair (models/layers.py) — otherwise two generalized_rspmm calls.
    Returns (out_max, out_min)."""
    fused = (impl == "pallas" and not edge_grad and msg in ("mul", "add")
             and layouts is not None
             and getattr(layouts, "fwd_blk", None) is not None)
    if fused:
        fn = _make_rspmm_maxmin_pair(msg, int(num_nodes))
        return fn(edge_weight, relation, x, layouts)
    mk = dict(msg=msg, num_nodes=num_nodes, impl=impl, layouts=layouts,
              edge_grad=edge_grad)
    return (
        generalized_rspmm(edge_index, edge_type, edge_weight, relation, x,
                          agg="max", **mk),
        generalized_rspmm(edge_index, edge_type, edge_weight, relation, x,
                          agg="min", **mk),
    )


@lru_cache(maxsize=None)
def _make_rspmm_addsq_pair(num_nodes: int):
    """custom-VJP fused (sum, sum-of-squares) rspmm for the distmult pna
    moments: s = sum(w*rel*x), sq = sum(w*(rel*x)^2) from ONE blocked pass;
    the backward streams (g_s, g_sq) pairs and factors both gradients
    through the shared inner term w*g_s + 2*msg*w*g_sq."""

    def fwd_impl(edge_weight, relation, x, layouts):
        from .rspmm_pallas import rspmm_fwd_pallas_addsq

        return rspmm_fwd_pallas_addsq(
            layouts, edge_weight, relation, x, num_nodes=num_nodes
        )

    @jax.custom_vjp
    def rspmm(edge_weight, relation, x, layouts):
        return fwd_impl(edge_weight, relation, x, layouts)

    def rspmm_fwd(edge_weight, relation, x, layouts):
        out = fwd_impl(edge_weight, relation, x, layouts)
        return out, (edge_weight, relation, x, layouts)

    def rspmm_bwd(res, g):
        edge_weight, relation, x, layouts = res
        g_s, g_sq = g
        from .rspmm_pallas import rspmm_bwd_pallas_addsq

        dr, dx = rspmm_bwd_pallas_addsq(
            layouts, edge_weight, relation, x, g_s, g_sq
        )
        dlay = None if layouts is None else _zeros_cotangent(layouts)
        return jnp.zeros_like(edge_weight), dr, dx, dlay

    rspmm.defvjp(rspmm_fwd, rspmm_bwd)
    return rspmm


def generalized_rspmm_addsq(
    edge_index,
    edge_type,
    edge_weight,
    relation,
    x,
    *,
    num_nodes: int,
    impl: str = "xla",
    layouts=None,
    edge_grad: bool = False,
):
    """pna's first and second moments of the same distmult messages:
    (sum(w*rel*x), sum(w*(rel*x)^2)) in one fused pass when the blocked
    Pallas layouts are available, otherwise the two-call formulation
    spmm(rel, x, add) + spmm(rel^2, x^2, add). Returns (s, sq)."""
    fused = (impl == "pallas" and not edge_grad and layouts is not None
             and getattr(layouts, "fwd_blk", None) is not None
             and getattr(layouts, "rev_blk", None) is not None)
    if fused:
        fn = _make_rspmm_addsq_pair(int(num_nodes))
        return fn(edge_weight, relation, x, layouts)
    mk = dict(msg="mul", agg="add", num_nodes=num_nodes, impl=impl,
              layouts=layouts, edge_grad=edge_grad)
    return (
        generalized_rspmm(edge_index, edge_type, edge_weight, relation, x,
                          **mk),
        generalized_rspmm(edge_index, edge_type, edge_weight,
                          relation**2, x**2, **mk),
    )


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
    layouts=None,
    edge_grad: bool = False,
    compute_dtype: str = "float32",
):
    """Relational SpMM. See module docstring for semantics and shapes.

    Args:
      msg: "mul" (distmult) or "add" (transe).
      agg: "add", "max" or "min".
      impl: "xla" (segment ops) or "pallas" (fused TPU kernels for all three
        aggregations; max/min carry an argext custom VJP).
      layouts: ops.csr.RspmmLayouts for this edge set (required for pallas).
      edge_grad: use the plain autodiff path so gradients flow to
        ``edge_weight`` (path interpretability; O(E) message materialization
        like the reference fallback at layer.py:112).
      compute_dtype: "float32" (default, reference parity) or "bfloat16" —
        pallas kernels then gather/multiply in bf16 with f32 accumulation
        (halves gather bytes; opt-in production mode).
    """
    if msg not in _MSG_FUNCS:
        raise ValueError(f"msg must be one of {_MSG_FUNCS}, got {msg!r}")
    if agg not in _AGG_FUNCS:
        raise ValueError(f"agg must be one of {_AGG_FUNCS}, got {agg!r}")
    if msg == "rotate" and (x.ndim != 3 or x.shape[-1] % 2):
        raise ValueError("rotate needs [V, B, D] inputs with even D "
                         "(D blocks store re in [:D/2], im in [D/2:])")
    if agg == "add" and not edge_grad:
        fn = _make_rspmm_add(msg, int(num_nodes), impl, compute_dtype)
        return fn(edge_index, edge_type, edge_weight, relation, x, layouts)
    if (agg in ("max", "min") and not edge_grad and impl == "pallas"
            and layouts is not None and msg != "rotate"):
        fn = _make_rspmm_minmax(msg, agg, int(num_nodes))
        return fn(edge_weight, relation, x, layouts)
    return _rspmm_xla(
        edge_index, edge_type, edge_weight, relation, x,
        msg=msg, agg=agg, num_nodes=int(num_nodes),
    )
