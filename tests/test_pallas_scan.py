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
