"""Generalized relational message-passing layer (NBFNet conv).

TPU-native re-design of the reference's GeneralizedRelationalConvNBF /
GeneralizedRelationalConvNBFMod (/root/reference/ultra/layer.py:14-392). One
layer covers all three relation-parameterization modes:

  * "embedding":  learned per-relation vectors (dependent=False)
  * "dependent":  relations projected from the query (dependent=True)
  * "injected":   relation vectors supplied by the caller (the Mod variant —
                  used by all shipped configs), optionally passed through a
                  per-layer 2-layer MLP ("project")

Message functions: transe (add), distmult (mul), rotate (complex mul).
Aggregations: sum / mean / max / pna, each with a "_nobound" variant; the
boundary condition is folded into the aggregation exactly as the reference's
fused path does (layer.py:154-178).

distmult/transe run through ops.rspmm (O(V·D)-memory fused op); rotate takes
the O(E) materialized path, mirroring the reference's fallback (layer.py:112).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..nn.core import (
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
from ..ops.rspmm import (
    generalized_rspmm,
    generalized_rspmm_addsq,
    generalized_rspmm_maxmin,
)

EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ConvConfig:
    input_dim: int
    output_dim: int
    num_relations: int
    query_input_dim: int
    message_func: str = "distmult"  # transe | distmult | rotate
    aggregate_func: str = "pna"  # sum|mean|max|pna (+ _nobound)
    layer_norm: bool = False
    activation: str = "relu"
    rel_mode: str = "injected"  # embedding | dependent | injected
    project: bool = True  # injected mode: per-layer MLP on relation vectors
    rspmm_impl: str = "xla"  # xla | pallas | ring (row-sharded multi-chip)
    edge_axis: str = ""  # mesh axis name for edge partitioning ("" = off)
    compute_dtype: str = "float32"  # bfloat16 = faster gathers, f32 accum
    ring_exchange: str = "ppermute"  # | rdma (Pallas remote-DMA prototype)


def conv_init(key, cfg: ConvConfig) -> dict:
    keys = jax.random.split(key, 3)
    base = cfg.aggregate_func.replace("_nobound", "")
    in_mult = 13 if base == "pna" else 2
    p = {"linear": linear_init(keys[0], cfg.input_dim * in_mult, cfg.output_dim)}
    if cfg.layer_norm:
        p["layer_norm"] = layer_norm_init(cfg.output_dim)
    if cfg.rel_mode == "embedding":
        # torch nn.Embedding default: N(0, 1)
        p["relation"] = {
            "weight": jax.random.normal(
                keys[1], (cfg.num_relations, cfg.input_dim), jnp.float32
            )
        }
    elif cfg.rel_mode == "dependent":
        p["relation_linear"] = linear_init(
            keys[1], cfg.query_input_dim, cfg.num_relations * cfg.input_dim
        )
    elif cfg.rel_mode == "injected":
        if cfg.project:
            p["relation_projection"] = mlp_init(
                keys[1], cfg.query_input_dim, [cfg.input_dim, cfg.input_dim]
            )
    else:
        raise ValueError(f"unknown rel_mode {cfg.rel_mode!r}")
    return p


def _relation_input(params, cfg: ConvConfig, query, rel_injected):
    """Resolve per-relation vectors: [R, D] (shared) or [R, B, D] (per-batch)."""
    if cfg.rel_mode == "embedding":
        return params["relation"]["weight"]  # [R, D]
    if cfg.rel_mode == "dependent":
        # query: [B, Q] -> [B, R, D] -> [R, B, D]
        rel = linear_apply(params["relation_linear"], query)
        rel = rel.reshape(query.shape[0], cfg.num_relations, cfg.input_dim)
        return rel.transpose(1, 0, 2)
    # injected: [R, D] or [B, R, D]
    rel = rel_injected
    if cfg.project:
        rel = mlp_apply(params["relation_projection"], rel)
    if rel.ndim == 3:  # [B, R, D] -> [R, B, D]
        rel = rel.transpose(1, 0, 2)
    return rel


def _rotate_messages_aggregate(graph, rel, x, agg: str):
    """O(E) rotate path: complex multiplication messages + segment reduce.
    rel: [R, D] or [R, B, D]; x: [V, B, D]. agg "sq_add" reduces
    sum(msg^2 * w) — the PNA second moment over the ROTATE messages (the
    reference's dense fallback computes scatter(message**2 * edge_weight),
    layer.py:285; squaring the operands first would be wrong for rotate)."""
    src, dst = graph.edge_index[:, 0], graph.edge_index[:, 1]
    x_e = x[src]  # [E, B, D]
    rel_e = rel[graph.edge_type]
    if rel_e.ndim == 2:
        rel_e = rel_e[:, None, :]
    d = x_e.shape[-1] // 2
    xr, xi = x_e[..., :d], x_e[..., d:]
    rr, ri = rel_e[..., :d], rel_e[..., d:]
    m = jnp.concatenate([xr * rr - xi * ri, xr * ri + xi * rr], axis=-1)
    w = graph.edge_weight[:, None, None]
    if agg == "sq_add":
        return jax.ops.segment_sum(m * m * w, dst, num_segments=graph.num_nodes)
    m = m * w
    if agg == "max":
        out = jax.ops.segment_max(m, dst, num_segments=graph.num_nodes)
        return jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    if agg == "min":
        out = jax.ops.segment_min(m, dst, num_segments=graph.num_nodes)
        return jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    return jax.ops.segment_sum(m, dst, num_segments=graph.num_nodes)


def ring_block_domain(cfg: ConvConfig, graph, edge_grad: bool = False):
    """The ring-path block-domain contract: returns the graph's
    RingRspmmInputs when EVERY spmm of a propagation over `graph` will route
    through the ring op in permuted-IO mode (so the model should carry node
    states as padded block-domain rows for the whole stack), else None.

    Must mirror conv_apply's routing exactly — if any spmm could fall to a
    single-chip path (off-mesh, edge-grad, non-add aggregation, rotate's O(E)
    path), block-domain states would silently misindex the original-order
    edge arrays, so this returns None for all of those."""
    ri = getattr(graph, "ring_inputs", None)
    if ri is None or not ri.permuted_io:
        return None
    if cfg.rspmm_impl != "ring" or not cfg.edge_axis or edge_grad:
        return None
    if cfg.message_func not in ("distmult", "transe"):
        return None
    if cfg.aggregate_func.replace("_nobound", "") not in (
        "sum", "mean", "max", "pna"
    ):
        return None  # every statistic these need now rides the ring
    from ..parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None or cfg.edge_axis not in mesh.axis_names:
        return None
    return ri


def _broadcast_rel_flat(relation, B):
    """[R, D] or [R, B, D] -> flat [R, B*D] (b-major, matching x's flat
    layout). Gradients flow back through the broadcast (summing the batch
    axis for shared relations) automatically."""
    if relation.ndim == 2:
        R, D = relation.shape
        return jnp.broadcast_to(relation[:, None, :], (R, B, D)).reshape(R, B * D)
    return relation.reshape(relation.shape[0], -1)


def conv_apply(
    params: dict,
    cfg: ConvConfig,
    graph,
    x: jnp.ndarray,
    boundary: jnp.ndarray,
    query: Optional[jnp.ndarray] = None,
    rel_injected: Optional[jnp.ndarray] = None,
    edge_grad: bool = False,
    block_domain: bool = False,
) -> jnp.ndarray:
    """One message-passing step.

    Args:
      graph: data.Graph (already undirected+inverse where applicable)
      x: node states — flat [V, B*D] (the native lane-aligned layout: a
         [*, B, 64] array pads its 64-wide minor dim to 128 lanes, 2x the
         bytes of the flat form) or [V, B, D] (legacy; reshaped at entry,
         output comes back [V, B, Dout])
      boundary: boundary condition, same layout as x (folded into aggregation)
      query: [B, Q] query vectors ("dependent" mode only)
      rel_injected: externally supplied relation reps ("injected" mode)
      edge_grad: route through the autodiff path so d(edge_weight) flows
        (path interpretability; mirrors layer.py:112's fallback condition)
      block_domain: the caller passes x/boundary in the ring path's padded
        block domain (see ring_block_domain) — REQUIRED for a permuted_io
        ring graph to take the ring route; without it the conv falls back to
        the replicated paths, since original-order states must never meet
        relabeled ring buckets
    Returns: flat [V, B*output_dim] (or [V, B, output_dim] for 3D input)
    """
    rel = _relation_input(params, cfg, query, rel_injected)
    D = cfg.input_dim
    flat_in = x.ndim == 2
    V = x.shape[0]
    B = (x.shape[1] // D) if flat_in else x.shape[1]
    x = x if flat_in else x.reshape(V, B * D)
    boundary = boundary if boundary.ndim == 2 else boundary.reshape(V, -1)

    def spmm(relation, xx, agg):
        out = _spmm_raw(relation, xx, agg)
        # named for remat policies: remat="save_rspmm" keeps these results so
        # the backward pass skips re-running the gather kernels
        return checkpoint_name(out, "rspmm_out")

    def _ring_pair_route(xx):
        """Mesh-active ring inputs usable for a fused pair call, or None.
        Mirrors _spmm_raw's ring gating (incl. the permuted_io/block_domain
        ownership rule)."""
        if not (cfg.edge_axis and cfg.rspmm_impl == "ring" and not edge_grad):
            return None
        from ..parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is None or cfg.edge_axis not in mesh.axis_names:
            return None
        ri = graph.ring_inputs
        if ri is None or (ri.permuted_io and not block_domain):
            return None
        return mesh, ri

    def spmm_maxmin(relation, xx):
        """pna's extremum pair: one fused pass for both (max, min).
        Ring route: ONE ring rotation of x feeds both extrema and the
        backward rotates the packed 4 planes through one transposed ring
        (parallel/ring_rspmm.py::ring_rspmm_maxmin) — two separate ring
        calls pay the n-1 [V/n, B*D] ppermutes twice. Single-chip blocked
        Pallas route: one x stream + one message compute
        (ops/rspmm.py::generalized_rspmm_maxmin). Every other route (xla,
        sharded-replicated, rotate, edge_grad, dense) keeps the two-call
        semantics."""
        if os.environ.get("RSPMM_FUSED_PNA") != "0":
            route = _ring_pair_route(xx)
            if route is not None:
                from ..parallel.ring_rspmm import ring_rspmm_maxmin

                mesh, ri = route
                m = {"transe": "add", "distmult": "mul"}[cfg.message_func]
                mx, mn = ring_rspmm_maxmin(
                    graph.edge_weight, ri,
                    relation, xx.reshape(xx.shape[0], B, D),
                    msg=m, mesh=mesh, axis=cfg.edge_axis,
                    exchange=cfg.ring_exchange,
                )
                return (checkpoint_name(mx.reshape(mx.shape[0], -1),
                                        "rspmm_out"),
                        checkpoint_name(mn.reshape(mn.shape[0], -1),
                                        "rspmm_out"))
        impl = cfg.rspmm_impl
        if impl == "ring":
            impl = "pallas" if graph.layouts is not None else "xla"
        fused = (
            cfg.message_func in ("transe", "distmult")
            and impl == "pallas" and not edge_grad and not cfg.edge_axis
            and graph.layouts is not None
            and getattr(graph.layouts, "fwd_blk", None) is not None
            and os.environ.get("RSPMM_FUSED_PNA") != "0"  # A/B escape
        )
        if not fused:
            return spmm(relation, xx, "max"), spmm(relation, xx, "min")
        msg = {"transe": "add", "distmult": "mul"}[cfg.message_func]
        mx, mn = generalized_rspmm_maxmin(
            graph.edge_index, graph.edge_type, graph.edge_weight,
            _broadcast_rel_flat(relation, B), xx,
            msg=msg, num_nodes=graph.num_nodes, impl="pallas",
            layouts=graph.layouts,
        )
        return (checkpoint_name(mx, "rspmm_out"),
                checkpoint_name(mn, "rspmm_out"))

    def spmm_addsq(relation, xx):
        """pna's first/second moments: one fused kernel for (sum, sq_sum)
        when the single-chip blocked Pallas path applies AND the message is
        distmult (sum(w*(rel*x)^2) == sum(w*rel^2*x^2) there; transe's
        reference convention sums rel^2+x^2, which does not factor through
        the message — ref layer.py:163-167). Rotate keeps its planar
        sq_add path; every other route keeps the two-call semantics.
        Ring route: one rotation feeds both moments
        (parallel/ring_rspmm.py::ring_rspmm_addsq)."""
        if (cfg.message_func == "distmult"
                and os.environ.get("RSPMM_FUSED_PNA") != "0"):
            route = _ring_pair_route(xx)
            if route is not None:
                from ..parallel.ring_rspmm import ring_rspmm_addsq

                mesh, ri = route
                s, sq = ring_rspmm_addsq(
                    graph.edge_weight, ri,
                    relation, xx.reshape(xx.shape[0], B, D),
                    mesh=mesh, axis=cfg.edge_axis,
                    exchange=cfg.ring_exchange,
                )
                return (checkpoint_name(s.reshape(s.shape[0], -1),
                                        "rspmm_out"),
                        checkpoint_name(sq.reshape(sq.shape[0], -1),
                                        "rspmm_out"))
        impl = cfg.rspmm_impl
        if impl == "ring":
            impl = "pallas" if graph.layouts is not None else "xla"
        fused = (
            cfg.message_func == "distmult"
            and impl == "pallas" and not edge_grad and not cfg.edge_axis
            and cfg.compute_dtype == "float32"
            and graph.layouts is not None
            and getattr(graph.layouts, "fwd_blk", None) is not None
            and getattr(graph.layouts, "rev_blk", None) is not None
            and os.environ.get("RSPMM_FUSED_PNA") != "0"  # A/B escape
        )
        if not fused:
            s = spmm(relation, xx, "add")
            if cfg.message_func == "rotate":
                sq = spmm(relation, xx, "sq_add")
            else:
                sq = spmm(relation**2, xx**2, "add")
            return s, sq
        s, sq = generalized_rspmm_addsq(
            graph.edge_index, graph.edge_type, graph.edge_weight,
            _broadcast_rel_flat(relation, B), xx,
            num_nodes=graph.num_nodes, impl="pallas",
            layouts=graph.layouts,
        )
        return (checkpoint_name(s, "rspmm_out"),
                checkpoint_name(sq, "rspmm_out"))

    def _spmm_raw(relation, xx, agg):
        """xx: flat [Vrows, B*D]; returns flat [Vrows, B*D]."""
        if cfg.message_func == "rotate":
            assert agg in ("add", "max", "min", "sq_add")
            impl = cfg.rspmm_impl
            if impl == "ring":
                impl = "pallas" if graph.layouts is not None else "xla"
            if (agg == "add" and impl == "pallas" and not edge_grad
                    and not cfg.edge_axis and graph.layouts is not None
                    and graph.layouts.fwd_blk is not None):
                # BEYOND the reference: its rotate always materializes
                # O(E*F) messages (layer.py:112-113); sum-aggregated rotate
                # rides the blocked streamed kernels here (complex multiply
                # over planar re/im rows). sq_add/max/min keep the O(E) path.
                out = generalized_rspmm(
                    graph.edge_index, graph.edge_type, graph.edge_weight,
                    relation, xx.reshape(xx.shape[0], B, D),
                    msg="rotate", agg="add", num_nodes=graph.num_nodes,
                    impl="pallas", layouts=graph.layouts,
                )
                return out.reshape(out.shape[0], -1)
            out = _rotate_messages_aggregate(
                graph, relation, xx.reshape(xx.shape[0], B, D), agg
            )
            return out.reshape(out.shape[0], -1)
        msg = {"transe": "add", "distmult": "mul"}[cfg.message_func]
        if (graph.dense_adj is not None and agg == "add" and not edge_grad
                and not cfg.edge_axis):
            # small dense graph (the ULTRA relation graph): sum aggregation
            # decomposes into per-etype MXU matmuls — ~100x the per-edge
            # kernel path at full pattern-product density (ops/dense.py).
            # max/min (non-decomposable) fall through to the sparse kernels.
            from ..ops.dense import dense_rspmm

            return dense_rspmm(
                graph.dense_adj, _broadcast_rel_flat(relation, B), xx, msg=msg
            )
        if cfg.edge_axis and agg in ("add", "max", "min") and not edge_grad:
            from ..parallel.mesh import current_mesh
            from ..parallel.sharded_rspmm import (
                partitioned_rspmm_pallas,
                sharded_rspmm,
            )

            mesh = current_mesh()
            if mesh is not None and cfg.edge_axis in mesh.axis_names:
                ri = graph.ring_inputs
                if ri is not None and ri.permuted_io and not block_domain:
                    # x is in original node order (the caller did not take
                    # block-domain ownership) — ring's relabeled buckets
                    # must not see it; fall to the replicated paths
                    ri = None
                xx3 = xx.reshape(xx.shape[0], B, D)
                if cfg.rspmm_impl == "ring" and ri is not None:
                    from ..parallel.ring_rspmm import ring_rspmm

                    out = ring_rspmm(
                        graph.edge_weight, graph.ring_inputs, relation, xx3,
                        msg=msg, agg=agg, mesh=mesh, axis=cfg.edge_axis,
                        compute_dtype=cfg.compute_dtype,
                        exchange=cfg.ring_exchange,
                    )
                elif agg != "add":
                    # max/min are ring-only among the partitioned paths;
                    # replicated-x impls fall to the single-chip kernels
                    out = None
                elif (cfg.rspmm_impl == "pallas"
                        and graph.part_layouts is not None):
                    out = partitioned_rspmm_pallas(
                        graph.edge_weight, graph.part_layouts, relation, xx3,
                        msg=msg, mesh=mesh, axis=cfg.edge_axis,
                        compute_dtype=cfg.compute_dtype,
                    )
                else:
                    out = sharded_rspmm(
                        graph.edge_index, graph.edge_type, graph.edge_weight,
                        relation, xx3, msg=msg, num_nodes=graph.num_nodes,
                        mesh=mesh, axis=cfg.edge_axis,
                    )
                if out is not None:
                    return out.reshape(out.shape[0], -1)
        # "ring" is a mesh-only impl; off-mesh (or for the paths the ring
        # doesn't cover) fall back to the best single-chip kernel available
        impl = cfg.rspmm_impl
        if impl == "ring":
            impl = "pallas" if graph.layouts is not None else "xla"
        if impl == "pallas" and graph.layouts is not None and not edge_grad:
            # pallas runs natively on the flat layout (ops/rspmm_pallas.py);
            # relation pre-broadcast to [R, B*D]
            return generalized_rspmm(
                graph.edge_index, graph.edge_type, graph.edge_weight,
                _broadcast_rel_flat(relation, B), xx,
                msg=msg, agg=agg, num_nodes=graph.num_nodes, impl=impl,
                layouts=graph.layouts, edge_grad=edge_grad,
                compute_dtype=cfg.compute_dtype,
            )
        # xla segment-op path: keep the [R, D] relation (cheaper [E, D]
        # gathers than a pre-broadcast [E, B*D] one) and a 3D state view
        out = generalized_rspmm(
            graph.edge_index, graph.edge_type, graph.edge_weight,
            relation, xx.reshape(V, B, D),
            msg=msg, agg=agg, num_nodes=graph.num_nodes, impl="xla",
            layouts=None, edge_grad=edge_grad,
            compute_dtype=cfg.compute_dtype,
        )
        return out.reshape(V, -1)

    agg = cfg.aggregate_func
    base = agg.replace("_nobound", "")
    bounded = not agg.endswith("_nobound")
    degree = graph.degree_out() + 1.0
    if block_domain:
        # states live in the ring's padded block domain: pad the degree to
        # v_pad rows and relabel when degree-balanced (pad rows get degree 1
        # -> log-scale 0, and they are edge-free so their values never reach
        # real rows)
        ri = graph.ring_inputs
        v_pad = ri.v_block * ri.n_shards
        degree = jnp.concatenate(
            [degree, jnp.ones((v_pad - degree.shape[0],), degree.dtype)], 0
        )
        if ri.to_old is not None:
            degree = degree[ri.to_old]
    degree = degree[:, None]  # [V, 1] — broadcasts over the flat feature dim

    if base == "sum":
        update = spmm(rel, x, "add")
        if bounded:
            update = update + boundary
    elif base == "mean":
        update = spmm(rel, x, "add")
        if bounded:
            update = (update + boundary) / degree
        else:
            update = update / degree
    elif base == "max":
        update = spmm(rel, x, "max")
        if bounded:
            update = jnp.maximum(update, boundary)
    elif base == "pna":
        s, sq = spmm_addsq(rel, x)
        mx, mn = spmm_maxmin(rel, x)
        if bounded:
            mean = (s + boundary) / degree
            sq_mean = (sq + boundary**2) / degree
            mx = jnp.maximum(mx, boundary)
            mn = jnp.minimum(mn, boundary)
        else:
            mean = s / degree
            sq_mean = sq / degree
        std = jnp.sqrt(jnp.clip(sq_mean - mean**2, EPS, None))
        # flat layout keeps the reference element order: stacking the four
        # statistics last then flattening yields per-(b, d) interleaved
        # [mean, max, min, std] — identical to reshape([V, B, 4D]) flattened
        features = jnp.stack([mean, mx, mn, std], axis=-1)  # [V, B*D, 4]
        features = features.reshape(V, -1)  # [V, B*4D]
        scale = jnp.log(degree)  # [V, 1]
        # normalize by the mean over REAL nodes: block-domain pad rows carry
        # log(1)=0 and must not dilute it (no-op off the ring path)
        scale = scale / (scale.sum() / graph.num_nodes)
        inv = 1.0 / jnp.clip(scale, 1e-2, None)
        scales = jnp.concatenate(
            [jnp.ones_like(scale), scale, inv], axis=-1
        )  # [V, 3]
        update = (features[:, :, None] * scales[:, None, :]).reshape(
            V, -1
        )  # [V, B*12D]
    else:
        raise ValueError(f"unknown aggregate function {agg!r}")

    # concat([x, update]) @ W split into x @ W[:D] + update @ W[D:] — same
    # math (W rows ordered x-part then update-part, matching the reference's
    # cat order at layer.py:180-186), but the [V, B, 2D] concat is never
    # materialized (measured -1.2 ms/layer at FB scale;
    # script/diagnostics/layout_micro.py). The matmul contracts over the
    # per-b D slice, so the operands pass through a transient [V, B, *] view;
    # only this fusion zone touches the lane-padded layout — all stored
    # tensors (carries, boundary, rspmm outputs) stay flat.
    w = params["linear"]["w"]
    out = (
        jnp.dot(x.reshape(V, B, D), w[:D],
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(update.reshape(V, B, -1), w[D:],
                  precision=jax.lax.Precision.HIGHEST)
        + params["linear"]["b"]
    )
    if cfg.layer_norm:
        out = layer_norm_apply(params["layer_norm"], out)
    if cfg.activation == "relu":
        out = jax.nn.relu(out)
    elif cfg.activation and cfg.activation != "none":
        out = getattr(jax.nn, cfg.activation)(out)
    return out.reshape(V, -1) if flat_in else out
