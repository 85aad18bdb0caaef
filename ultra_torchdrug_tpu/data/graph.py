"""Immutable knowledge-graph container as a JAX pytree.

TPU-native replacement for torchdrug's ``data.Graph`` as used by the reference
(/root/reference/ultra/dataset.py, /root/reference/ultra/model.py:166 — only the
capabilities the reference exercises: edge_list of (head, tail, relation),
num_node/num_edge/num_relation, degree_out, undirected(add_inverse=True),
edge masking, attribute-free construction).

Differences from the reference by design:
  * arrays + static metadata instead of a mutable object with attribute
    context-managers; "with graph.edge(): ..." semantics become explicit fields
  * edges are never deleted under jit — ``edge_weight`` is multiplied by a mask
    instead (same math: a weight-0 edge contributes nothing to any aggregation)
  * shapes are static: the edge count is fixed at construction
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A static-shape relational graph.

    Fields
      edge_index: int32 [E, 2] — (head, tail) node ids
      edge_type:  int32 [E]    — relation id per edge
      edge_weight: float32 [E] — multiplicative edge weight (0 == masked out)
      num_nodes: static int
      num_relations: static int — size of the relation vocabulary (0 for
        homogeneous graphs, mirroring the reference's ``num_relation`` falsiness
        check at /root/reference/ultra/model.py:163)
    """

    edge_index: jnp.ndarray
    edge_type: jnp.ndarray
    edge_weight: jnp.ndarray
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_relations: int = dataclasses.field(metadata=dict(static=True))
    # optional precomputed CSR layouts for the Pallas rspmm kernels; a pure
    # function of topology (ops/csr.py), so weight-only transforms keep it
    layouts: object = None
    # optional per-shard layouts for the edge-partitioned multi-chip path
    # (parallel/sharded_rspmm.py::PartitionedRspmmLayouts); topology-pure too
    part_layouts: object = None
    # optional ring buckets for the row-sharded O(V/n)-memory multi-chip path
    # (parallel/ring_rspmm.py::RingRspmmInputs); topology-pure too
    ring_inputs: object = None
    # optional dense per-etype adjacency [T, N, N] (A[t, d, s] = summed edge
    # weight) for the MXU spmm path (ops/dense.py) — only attached to small
    # dense graphs (relation graphs). Weights are FOLDED IN, so weight-only
    # transforms (with_edge_weight / mask_edges) drop it and the conv falls
    # back to the sparse kernels.
    dense_adj: Optional[jnp.ndarray] = None
    # optional pre-sorted edge index for the per-step easy-edge pattern join
    # (ops/match.py::PatternJoinIndex) — pure topology function; join_index_ht
    # is the wildcard-relation variant (remove_one_hop)
    join_index: object = None
    join_index_ht: object = None

    # ---- constructors -----------------------------------------------------

    @staticmethod
    def from_triplets(
        triplets,
        num_nodes: int,
        num_relations: int,
        edge_weight=None,
    ) -> "Graph":
        """Build from an [E, 3] array of (head, tail, relation) rows.

        All slicing/shaping happens in host numpy BEFORE the single
        device-put per array: on remote-TPU setups, device-side slicing
        plus a device->host readback of the slices costs minutes of
        tunnel round-trips (observed: 128 s for a 557k-edge graph vs
        <1 s host-side).
        """
        tri = np.asarray(triplets, dtype=np.int32)
        if tri.ndim != 2 or tri.shape[-1] != 3:
            raise ValueError(f"triplets must be [E, 3], got {tri.shape}")
        ei_host = np.ascontiguousarray(tri[:, :2])
        et_host = np.ascontiguousarray(tri[:, 2])
        if edge_weight is None:
            edge_weight = np.ones((tri.shape[0],), dtype=np.float32)
        edge_weight = jnp.asarray(np.asarray(edge_weight, dtype=np.float32))
        g = Graph(
            edge_index=jnp.asarray(ei_host),
            edge_type=jnp.asarray(et_host),
            edge_weight=edge_weight,
            num_nodes=int(num_nodes),
            num_relations=int(num_relations),
        )
        g._set_host_cache(ei_host, et_host)
        return g

    # ---- host-side copies (preprocessing without device round-trips) ------
    # Device->host fetches can be catastrophically slow on remote-TPU setups;
    # graphs built from host data keep numpy copies OUTSIDE the pytree (set
    # via object.__setattr__, so jit/tree_map never see them) and all host
    # preprocessing reads these.

    def _set_host_cache(self, edge_index: np.ndarray, edge_type: np.ndarray):
        object.__setattr__(self, "_host_edges", (edge_index, edge_type))

    def _replace_keep_host(self, **kw) -> "Graph":
        """dataclasses.replace that carries the host edge cache over — for the
        topology-preserving prepare_* attachments (host-side only; a plain
        replace would silently downgrade later host_edge_index() calls to
        device fetches, which cost seconds over a remote-TPU tunnel)."""
        g = dataclasses.replace(self, **kw)
        cache = getattr(self, "_host_edges", None)
        if cache is not None:
            g._set_host_cache(*cache)
        return g

    def host_edge_index(self) -> np.ndarray:
        cache = getattr(self, "_host_edges", None)
        if cache is not None:
            return cache[0]
        return np.asarray(self.edge_index)

    def host_edge_type(self) -> np.ndarray:
        cache = getattr(self, "_host_edges", None)
        if cache is not None:
            return cache[1]
        return np.asarray(self.edge_type)

    # ---- basic properties -------------------------------------------------

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[0])

    @property
    def heads(self) -> jnp.ndarray:
        return self.edge_index[:, 0]

    @property
    def tails(self) -> jnp.ndarray:
        return self.edge_index[:, 1]

    @property
    def edge_list(self) -> jnp.ndarray:
        """[E, 3] (head, tail, relation) — the reference's ``edge_list`` layout."""
        return jnp.concatenate(
            [self.edge_index, self.edge_type[:, None].astype(jnp.int32)], axis=1
        )

    # ---- derived quantities ----------------------------------------------

    def degree_out(self) -> jnp.ndarray:
        """Weighted in-degree by edge target — matches torchdrug's
        ``degree_out`` (sum of edge weights grouped by the *receiving* node),
        used as the +1-smoothed normalizer in the conv layer
        (/root/reference/ultra/layer.py:121,309)."""
        return jax.ops.segment_sum(
            self.edge_weight, self.tails, num_segments=self.num_nodes
        )

    def degree_in(self) -> jnp.ndarray:
        return jax.ops.segment_sum(
            self.edge_weight, self.heads, num_segments=self.num_nodes
        )

    # ---- transforms (all shape-static, cacheable per graph) ---------------

    def undirected_with_inverse(self) -> "Graph":
        """Append inverse edges (t, h, r + R); doubles E and the relation
        vocabulary. Mirrors ``graph.undirected(add_inverse=True)``
        (/root/reference/ultra/model.py:166, rel_model.py:92)."""
        inv_index = self.edge_index[:, ::-1]
        inv_type = self.edge_type + self.num_relations
        g = Graph(
            edge_index=jnp.concatenate([self.edge_index, inv_index], axis=0),
            edge_type=jnp.concatenate([self.edge_type, inv_type], axis=0),
            edge_weight=jnp.concatenate([self.edge_weight, self.edge_weight], axis=0),
            num_nodes=self.num_nodes,
            num_relations=self.num_relations * 2,
        )
        cache = getattr(self, "_host_edges", None)
        if cache is not None:
            ei, et = cache
            g._set_host_cache(
                np.concatenate([ei, ei[:, ::-1]], axis=0),
                np.concatenate([et, et + self.num_relations], axis=0),
            )
        return g

    def with_edge_weight(self, edge_weight: jnp.ndarray) -> "Graph":
        # dense_adj has the OLD weights folded in — drop it (see field doc)
        return dataclasses.replace(
            self, edge_weight=edge_weight, dense_adj=None
        )

    def mask_edges(self, keep_mask: jnp.ndarray) -> "Graph":
        """Static-shape analog of torchdrug ``graph.edge_mask``: zero out the
        weight of dropped edges instead of removing rows."""
        return self.with_edge_weight(self.edge_weight * keep_mask.astype(jnp.float32))

    def select_edges(self, keep_mask) -> "Graph":
        """Host-side (non-jit) true edge removal; changes E. For preprocessing
        only — e.g. carving fact graphs out of the full graph."""
        keep = np.asarray(keep_mask)
        ei = self.host_edge_index()[keep]
        et = self.host_edge_type()[keep]
        g = Graph(
            edge_index=jnp.asarray(ei),
            edge_type=jnp.asarray(et),
            edge_weight=jnp.asarray(np.asarray(self.edge_weight)[keep]),
            num_nodes=self.num_nodes,
            num_relations=self.num_relations,
        )
        g._set_host_cache(ei, et)
        return g

    def prepare_pallas(
        self,
        tile_rows: int = 256,
        tile_edges: int = 256,
        include_rel_layout: bool = False,
        hot_rows: int = None,
        blocked="auto",
        block_rows: int = 1024,
        interleave="auto",
        bwd_block_rows: int = None,
    ) -> "Graph":
        """Attach CSR layouts for the Pallas rspmm kernels (host-side; call
        once per graph after all topology transforms). include_rel_layout is
        only needed for the transe message function. hot_rows: size of the
        VMEM-resident hot-source row table for the forward kernel (default:
        1024 for graphs too large to be fully VMEM-resident; 0 disables).
        blocked: build blocked-source layouts (VMEM-streamed source blocks,
        zero per-edge DMAs) for the add forward / fused backward — 'auto'
        when the streaming traffic beats per-edge gathers (dense-ish graphs:
        V^2/block_rows < 2E)."""
        from ..ops.csr import build_rspmm_layouts

        if hot_rows is None:
            hot_rows = 1024 if self.num_nodes > 2048 else 0
        layouts = build_rspmm_layouts(
            self.host_edge_index(),
            self.host_edge_type(),
            self.num_nodes,
            max(self.num_relations, 1),
            tile_rows=tile_rows,
            tile_edges=tile_edges,
            include_rel_layout=include_rel_layout,
            hot_rows=hot_rows,
            blocked=blocked,
            block_rows=block_rows,
            interleave=interleave,
            bwd_block_rows=bwd_block_rows,
        )
        return self._replace_keep_host(layouts=layouts)

    def prepare_pallas_sharded(
        self,
        n_shards: int,
        tile_rows: int = 256,
        tile_edges: int = 256,
        include_rel_layout: bool = False,
        balance="auto",
    ) -> "Graph":
        """Attach per-shard CSR layouts for the edge-partitioned multi-chip
        Pallas path (destination/source row-block partitioning — see
        parallel/sharded_rspmm.py). Composable with prepare_pallas (the
        single-chip layouts serve ops outside the sharded conv)."""
        from ..parallel.sharded_rspmm import build_partitioned_rspmm_inputs

        part = build_partitioned_rspmm_inputs(
            self.host_edge_index(),
            self.host_edge_type(),
            self.num_nodes,
            max(self.num_relations, 1),
            n_shards,
            tile_rows=tile_rows,
            tile_edges=tile_edges,
            include_rel_layout=include_rel_layout,
            balance=balance,
        )
        return self._replace_keep_host(part_layouts=part)

    def prepare_ring(
        self, n_shards: int, pallas: bool = False,
        tile_rows: int = 256, tile_edges: int = 256, balance=False,
        permuted_io: bool = False,
    ) -> "Graph":
        """Attach edge buckets for the ring-pipelined ROW-SHARDED multi-chip
        path (parallel/ring_rspmm.py): node states live sharded [V/n] per
        chip and rotate over ICI, so peak node-state memory scales down with
        the mesh — the path for graphs whose [V, B, D] states exceed one
        chip's HBM. pallas=True additionally builds per-bucket CSR layouts
        so each ring step runs the fused gather kernels (msg='mul')."""
        from ..parallel.ring_rspmm import build_ring_rspmm_inputs

        ring = build_ring_rspmm_inputs(
            self.host_edge_index(), self.host_edge_type(),
            self.num_nodes, n_shards, pallas=pallas,
            tile_rows=tile_rows, tile_edges=tile_edges, balance=balance,
            permuted_io=permuted_io,
        )
        return self._replace_keep_host(ring_inputs=ring)

    def prepare_dense(
        self,
        max_bytes: int = 64 * 1024 * 1024,
        min_density: float = 0.02,
    ) -> "Graph":
        """Attach a dense per-etype adjacency [T, N, N] for the MXU spmm path
        (ops/dense.py): on TPU a relational graph dense enough that
        E / (N²·T) >= min_density is far cheaper as T dense matmuls on the
        systolic array than as per-edge gathers (measured: the fully dense
        474-node FB relation graph runs ~100x faster dense). Returns self
        unchanged when the graph is too large or too sparse — callers can
        apply this unconditionally. Current edge weights are folded into A;
        weight-only transforms drop the attachment (sparse fallback)."""
        T = max(self.num_relations, 1)
        N = self.num_nodes
        if T * N * N * 4 > max_bytes:
            return self
        E = self.num_edges
        if E < min_density * N * N * T:
            return self
        ei, et = self.host_edge_index(), self.host_edge_type()
        A = np.zeros((T, N, N), np.float32)
        np.add.at(
            A, (et, ei[:, 1], ei[:, 0]), np.asarray(self.edge_weight)
        )
        return self._replace_keep_host(dense_adj=jnp.asarray(A))

    def prepare_join(self, one_hop: bool = False) -> "Graph":
        """Attach the sorted-edge PatternJoinIndex for the per-step easy-edge
        mask (models/ultra.py::_mask_easy_edges): the join's sort moves from
        every train step to one host-side lexsort here. one_hop additionally
        builds the wildcard-relation variant (remove_one_hop configs)."""
        from ..ops.match import build_pattern_join

        ji = self.join_index or build_pattern_join(
            self.host_edge_index(), self.host_edge_type()
        )
        ji_ht = self.join_index_ht
        if one_hop and ji_ht is None:
            ji_ht = build_pattern_join(
                self.host_edge_index(), self.host_edge_type(), wildcard_rel=True
            )
        return self._replace_keep_host(join_index=ji, join_index_ht=ji_ht)

    def sorted_by_tail(self) -> "Graph":
        """Reorder edges so targets are ascending — the CSR layout the Pallas
        rspmm kernel consumes. Host-side preprocessing (stable order)."""
        ei, et = self.host_edge_index(), self.host_edge_type()
        order = np.argsort(ei[:, 1], kind="stable")
        g = Graph(
            edge_index=jnp.asarray(ei[order]),
            edge_type=jnp.asarray(et[order]),
            edge_weight=jnp.asarray(np.asarray(self.edge_weight)[order]),
            num_nodes=self.num_nodes,
            num_relations=self.num_relations,
        )
        g._set_host_cache(ei[order], et[order])
        return g

    def __repr__(self):  # pragma: no cover
        return (
            f"Graph(num_nodes={self.num_nodes}, num_edges={self.num_edges}, "
            f"num_relations={self.num_relations})"
        )


def pack(graphs):
    """The reference packs lists of relation graphs into one buffer
    (``data.Graph.pack`` at /root/reference/ultra/task.py:224). Graphs here are
    plain pytrees, so a tuple is the packed form."""
    return tuple(graphs)
