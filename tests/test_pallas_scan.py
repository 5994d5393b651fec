"""Pallas fused-scan kernel parity (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric
from cuda_acceleratedvectordatabaseengine_tpu.ops.scan import scan_probed_lists
from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
    scan_probed_lists_pallas,
)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_pallas_scan_matches_gather_scan(rng, metric):
    nlist, cap, dim, B, P, k = 8, 128, 32, 4, 3, 6
    arena = np.zeros((nlist, cap, dim), np.float32)
    counts = rng.integers(1, cap + 1, nlist).astype(np.int32)
    for l in range(nlist):
        arena[l, :counts[l]] = rng.standard_normal((counts[l], dim))
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    probe[0, -1] = -1
    args = (
        jnp.asarray(q), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        jnp.asarray(probe), k,
    )
    d1, p1 = scan_probed_lists(*args, metric)
    d2, p2 = scan_probed_lists_pallas(*args, metric, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_pallas_sorted_scan_matches_gather_scan(rng, metric):
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_sorted,
    )

    nlist, cap, dim, B, P, k = 8, 128, 32, 5, 4, 6
    arena = np.zeros((nlist, cap, dim), np.float32)
    counts = rng.integers(1, cap + 1, nlist).astype(np.int32)
    for l in range(nlist):
        arena[l, :counts[l]] = rng.standard_normal((counts[l], dim))
    q = rng.standard_normal((B, dim)).astype(np.float32)
    # deliberately overlapping probes across queries (the dedup case)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    probe[0, -1] = -1
    args = (
        jnp.asarray(q), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        jnp.asarray(probe), k,
    )
    d1, p1 = scan_probed_lists(*args, metric)
    d2, p2 = scan_probed_lists_pallas_sorted(*args, metric, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_pallas_grouped_scan_matches_gather_scan(rng, metric):
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_grouped,
    )

    nlist, cap, dim, B, P, k = 8, 128, 32, 6, 4, 5
    arena = np.zeros((nlist, cap, dim), np.float32)
    counts = rng.integers(1, cap + 1, nlist).astype(np.int32)
    for l in range(nlist):
        arena[l, :counts[l]] = rng.standard_normal((counts[l], dim))
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    probe[0, -1] = -1
    args = (
        jnp.asarray(q), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        jnp.asarray(probe), k,
    )
    d1, p1 = scan_probed_lists(*args, metric)
    d2, p2 = scan_probed_lists_pallas_grouped(
        *args, metric, interpret=True, m_budget=8
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grouped_hot_list(rng):
    """Many queries probing the SAME list (multi-row list) stays exact."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_grouped,
    )

    nlist, cap, dim, B, k = 4, 128, 16, 32, 5
    arena = rng.standard_normal((nlist, cap, dim)).astype(np.float32)
    counts = np.full(nlist, cap, np.int32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.zeros((B, 2), np.int32)      # all queries probe list 0
    probe[:, 1] = 1
    args = (
        jnp.asarray(q), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        jnp.asarray(probe), k,
    )
    d1, p1 = scan_probed_lists(*args, Metric.L2)
    d2, p2 = scan_probed_lists_pallas_grouped(
        *args, Metric.L2, interpret=True, m_budget=8
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_sorted_int8_path(rng):
    """int8 fast path (int8×int8 MXU dots + exact norms): distances must
    match the same math computed in numpy, and candidate sets must match
    the fp32 gather scan on well-separated data."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_sorted,
    )

    nlist, cap, dim, B, P, k = 8, 128, 32, 4, 3, 5
    x = rng.standard_normal((nlist * cap, dim)).astype(np.float32)
    arena_f = x.reshape(nlist, cap, dim)
    counts = np.full(nlist, cap, np.int32)
    # per-list int8 quantization (same as the build path)
    scale = np.abs(arena_f).max(axis=(1, 2)) / 127.0
    arena_i8 = np.clip(
        np.round(arena_f / scale[:, None, None]), -127, 127
    ).astype(np.int8)
    arena_sq = (arena_f ** 2).sum(-1).astype(np.float32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)

    d, pos = scan_probed_lists_pallas_sorted(
        jnp.asarray(q), jnp.asarray(arena_i8), jnp.asarray(arena_sq),
        jnp.asarray(counts), jnp.asarray(probe), k, Metric.L2,
        interpret=True, arena_scale=jnp.asarray(scale.astype(np.float32)),
    )
    d, pos = np.asarray(d), np.asarray(pos)

    # numpy reference of the same quantized math (queries stay exact fp32)
    for b in range(B):
        cand_d = []
        cand_p = []
        for l in probe[b]:
            dots = arena_i8[l].astype(np.float32) @ q[b]
            s = scale[l]
            dd = np.maximum(
                (q[b] ** 2).sum() - 2 * s * dots + arena_sq[l], 0
            )
            cand_d.append(dd)
            cand_p.append(l * cap + np.arange(cap))
        cand_d = np.concatenate(cand_d)
        cand_p = np.concatenate(cand_p)
        ref_order = np.argsort(cand_d, kind="stable")[:k]
        np.testing.assert_allclose(
            d[b], cand_d[ref_order], rtol=1e-5, atol=1e-5
        )
        assert set(pos[b].tolist()) == set(cand_p[ref_order].tolist())
