"""Top-k selection and merge.

This implements — correctly — the piece the reference stubbed: its CUDA
bruteforce kernel keeps a per-thread insertion-sorted top-k but never reduces
across threads ("only thread 0 for now", ``engine/kernels.cuh:172-184``), so
block results silently drop candidates. On TPU, top-k is a first-class XLA op
(``jax.lax.top_k`` / the much faster ``jax.lax.approx_min_k`` which maps onto
the TPU's hardware-friendly bitonic partial reduction — see TPU-KNN,
arXiv:2206.14286), and cross-block merge is a concat + re-select.

All selection here is over *distances* (smaller = closer). Invalid slots are
encoded as ``+inf`` distance / ``-1`` index, the device analog of the
reference's FLT_MAX / UINT64_MAX sentinels (``engine/ivf_flat_index.cpp:380-383``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_smallest(
    d: jax.Array,
    k: int,
    idx: jax.Array | None = None,
    approx: bool = False,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Select the k smallest entries of ``d [..., N]``.

    Returns ``(dists [..., k], indices [..., k])`` sorted ascending. If
    ``idx`` is given, it supplies the identity of each column (e.g. global
    arena positions) and is gathered instead of returning column numbers.

    ``approx=True`` uses ``jax.lax.approx_min_k`` — the TPU-optimal partial
    reduction — trading a tiny recall loss for large speedups at big N.
    """
    if approx:
        vals, cols = jax.lax.approx_min_k(d, k, recall_target=recall_target)
    else:
        neg_vals, cols = jax.lax.top_k(-d, k)
        vals = -neg_vals
    if idx is not None:
        out_idx = jnp.take_along_axis(idx, cols, axis=-1)
    else:
        out_idx = cols
    return vals, out_idx


def merge_topk(
    d_a: jax.Array,
    i_a: jax.Array,
    d_b: jax.Array,
    i_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two top-k candidate sets along the last axis and re-select k.

    The device-side replacement for the reference's host ``merge_results``
    sort+dedup loop (``engine/ivf_flat_index.cpp:474-518``). Dedup is
    unnecessary here: every vector lives in exactly one inverted list, so a
    global arena position appears at most once across partial results.
    """
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    return topk_smallest(d, k, idx=i)
