"""Static-shape triple matching — the jit-safe replacement for torchdrug's
wildcard ``graph.match`` (used by the reference for easy-edge removal at
/root/reference/ultra/model.py:57-74, filtered-ranking masks at task.py:65-100
and strict negative sampling at task.py:102-118).

The reference returns variable-length index lists; under XLA we instead return
fixed-shape boolean masks with identical semantics:

  * ``edges_in_patterns``  — [E] bool: does edge e match any (h, t, r) pattern?
    (sort-merge join, O((E+P) log(E+P)); replaces match + as_mask + edge_mask)
  * ``tail_truth_mask`` / ``head_truth_mask`` — [B, V] bool: which candidate
    entities complete a true triple (pattern (h, *, r) resp. (*, t, r))?
    (broadcast compare + segment scatter, O(B·E))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edges_in_patterns(edge_list: jnp.ndarray, patterns: jnp.ndarray) -> jnp.ndarray:
    """[E] bool — True where edge (h, t, r) equals ANY pattern row.

    Args:
      edge_list: int32 [E, 3] (head, tail, relation)
      patterns:  int32 [P, 3] (head, tail, relation); no wildcards here —
        the reference's easy-edge patterns are always fully specified.
    """
    E = edge_list.shape[0]
    P = patterns.shape[0]
    h = jnp.concatenate([edge_list[:, 0], patterns[:, 0]])
    t = jnp.concatenate([edge_list[:, 1], patterns[:, 1]])
    r = jnp.concatenate([edge_list[:, 2], patterns[:, 2]])
    is_pattern = jnp.concatenate(
        [jnp.zeros((E,), jnp.int32), jnp.ones((P,), jnp.int32)]
    )
    # lexsort: last key is primary -> sort by (h, t, r)
    order = jnp.lexsort((r, t, h))
    hs, ts, rs, ps = h[order], t[order], r[order], is_pattern[order]
    new_run = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (
                (hs[1:] != hs[:-1]) | (ts[1:] != ts[:-1]) | (rs[1:] != rs[:-1])
            ).astype(jnp.int32),
        ]
    )
    run_id = jnp.cumsum(new_run) - 1
    num_runs = E + P  # upper bound; extra segments stay zero
    run_has_pattern = jax.ops.segment_max(ps, run_id, num_segments=num_runs)
    matched_sorted = (run_has_pattern[run_id] > 0) & (ps == 0)
    matched = jnp.zeros((E + P,), bool).at[order].set(matched_sorted)
    return matched[:E]


def _truth_mask(anchor, rel, batch_anchor, batch_rel, other, num_nodes):
    """[B, V] bool: True at (b, v) if some edge has (anchor==batch_anchor[b],
    rel==batch_rel[b]) and its `other` endpoint is v."""
    hit = (anchor[None, :] == batch_anchor[:, None]) & (
        rel[None, :] == batch_rel[:, None]
    )  # [B, E]
    scattered = jax.ops.segment_max(
        hit.astype(jnp.int32).T, other, num_segments=num_nodes
    )  # [V, B]
    return scattered.T > 0


def tail_truth_mask(edge_list, pos_h, pos_r, num_nodes: int) -> jnp.ndarray:
    """[B, V] bool: v is a true tail of (pos_h[b], v, pos_r[b]) in edge_list.
    Semantics of task.py:65-82's ``1 - t_mask`` (there the mask marks
    *allowed* negatives; call sites here invert explicitly)."""
    return _truth_mask(
        edge_list[:, 0], edge_list[:, 2], pos_h, pos_r, edge_list[:, 1], num_nodes
    )


def head_truth_mask(edge_list, pos_t, pos_r, num_nodes: int) -> jnp.ndarray:
    """[B, V] bool: v is a true head of (v, pos_t[b], pos_r[b]) in edge_list."""
    return _truth_mask(
        edge_list[:, 1], edge_list[:, 2], pos_t, pos_r, edge_list[:, 0], num_nodes
    )
