"""Ragged-batch ("variadic") primitives, static-shape style.

TPU-native counterparts of /root/reference/ultra/functional.py: same sort-trick
formulations (offset each segment into a disjoint value range, sort once
globally), but with padded fixed-size outputs instead of dynamic lengths.
A ragged batch is (values [N], sizes [S]) with sum(sizes) == N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_ids_from_sizes(sizes: jnp.ndarray, total: int) -> jnp.ndarray:
    """repeat_interleave(sizes) with static output length `total`."""
    # position i belongs to segment j iff cumsum(sizes)[j-1] <= i < cumsum[j]
    ends = jnp.cumsum(sizes)
    return jnp.searchsorted(ends, jnp.arange(total), side="right").astype(jnp.int32)


def variadic_sort(values: jnp.ndarray, sizes: jnp.ndarray, descending: bool = False):
    """Sort within each segment; returns (sorted_values, permutation).
    Mirrors functional.variadic_sort (reference functional.py:33-52) via a
    single global sort keyed by (segment, value)."""
    n = values.shape[0]
    seg = segment_ids_from_sizes(sizes, n)
    v = -values if descending else values
    order = jnp.lexsort((v, seg))
    return values[order], order


def variadic_shuffle(key, values: jnp.ndarray, sizes: jnp.ndarray):
    """Independent uniform shuffle within each segment (functional.py:55-58)."""
    rand = jax.random.uniform(key, (values.shape[0],))
    _, order = variadic_sort(rand, sizes)
    return values[order], sizes


def _worst_value(dtype, largest: bool):
    """The padding value for empty segments: worst possible under the order."""
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf if largest else jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.array(info.min if largest else info.max, dtype)


def variadic_topk(values: jnp.ndarray, sizes: jnp.ndarray, k: int, largest: bool = True):
    """Per-segment top-k, padded: segments shorter than k repeat their last
    valid entry (torchdrug variadic_topk semantics used by beam search at
    /root/reference/ultra/model.py:455).

    Returns (topk_values [S, k], topk_index [S, k]) where index is absolute
    into `values`. Empty segments get sentinel rows: index -1 and the dtype's
    worst value (-inf / iinfo.min when largest, +inf / iinfo.max otherwise) —
    without the sentinel an empty segment's start offset equals the next
    segment's and would silently return that segment's best entry.
    """
    n = values.shape[0]
    seg = segment_ids_from_sizes(sizes, n)
    v = values if largest else -values
    order = jnp.lexsort((-v, seg))  # within segment: descending by v
    starts = jnp.cumsum(sizes) - sizes
    valid_rank = jnp.minimum(jnp.arange(k)[None, :], jnp.maximum(sizes[:, None] - 1, 0))
    pos = jnp.clip(starts[:, None] + valid_rank, 0, n - 1)
    idx = order[pos]
    empty = sizes[:, None] == 0
    vals = jnp.where(empty, _worst_value(values.dtype, largest), values[idx])
    idx = jnp.where(empty, -1, idx)
    return vals, idx


def variadic_topks(values: jnp.ndarray, sizes: jnp.ndarray, ks: jnp.ndarray,
                   largest: bool = True):
    """Per-segment top-k with PER-SEGMENT k (the reference's variadic_topks,
    functional.py:6-30). Padded formulation: returns (top_values [S, max_k],
    top_index [S, max_k], valid [S, max_k]) where row s carries its top
    min(ks[s], sizes[s]) entries followed by padding repeats of the last
    valid entry; `valid` marks the first ks[s] slots."""
    n = values.shape[0]
    # static output width: the caller must pass concrete ks (host-side beam
    # search does). A traced ks would force an [S, n] result — refuse loudly.
    try:
        max_k = int(jnp.max(ks)) if ks.size else 0
    except jax.errors.JAXTypeError as e:
        raise ValueError(
            "variadic_topks needs concrete (non-traced) ks to size its static "
            "output; hoist ks out of jit or use variadic_topk with a fixed k"
        ) from e
    seg = segment_ids_from_sizes(sizes, n)
    v = values if largest else -values
    order = jnp.lexsort((-v, seg))
    starts = jnp.cumsum(sizes) - sizes
    rank = jnp.minimum(jnp.arange(max_k)[None, :], jnp.maximum(sizes[:, None] - 1, 0))
    pos = jnp.clip(starts[:, None] + rank, 0, n - 1)
    idx = order[pos]
    empty = sizes[:, None] == 0
    vals = jnp.where(empty, _worst_value(values.dtype, largest), values[idx])
    idx = jnp.where(empty, -1, idx)
    valid = (jnp.arange(max_k)[None, :] < ks[:, None]) & ~empty
    return vals, idx, valid


def variadic_unique(values: jnp.ndarray, sizes: jnp.ndarray):
    """Deduplicate within segments. Returns (unique_values_padded [N],
    new_sizes [S], keep_mask [N]) over the segment-sorted ordering: duplicates
    are compacted to the front of each segment; trailing slots are padding.
    (Static-shape analog of functional.py:61-87.)"""
    n = values.shape[0]
    seg = segment_ids_from_sizes(sizes, n)
    order = jnp.lexsort((values, seg))
    sv, sseg = values[order], seg[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (sv[1:] != sv[:-1]) | (sseg[1:] != sseg[:-1])]
    )
    new_sizes = jax.ops.segment_sum(
        first.astype(jnp.int32), sseg, num_segments=sizes.shape[0]
    )
    # compact uniques to the front of each segment, keep static length
    dest_rank = jnp.cumsum(first) - 1  # global rank among uniques
    starts_new = jnp.cumsum(new_sizes) - new_sizes
    within = dest_rank - starts_new[sseg]
    starts_old = jnp.cumsum(sizes) - sizes
    dest = starts_old[sseg] + within
    # duplicates of the same (segment, value) share a dest slot; they scatter
    # the IDENTICAL sorted value sv, so the scatter race is benign
    out = jnp.zeros_like(values).at[dest].set(sv)
    keep = jnp.zeros((n,), bool).at[dest].max(first)
    return out, new_sizes, keep


def bincount(values: jnp.ndarray, length: int) -> jnp.ndarray:
    """Static-length bincount. The reference works around slow GPU atomics with
    a bucketize trick (functional.py:90-105); on TPU XLA lowers segment_sum to
    a deterministic sorted reduction already."""
    return jax.ops.segment_sum(
        jnp.ones_like(values, dtype=jnp.int32), values, num_segments=length
    )
