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


def _quantize_per_row(arena_f, anchors=None):
    """Per-row symmetric int8 quantization (same math as the build path);
    optional residual anchors [nlist, dim]."""
    res = arena_f - (anchors[:, None, :] if anchors is not None else 0.0)
    scale = np.maximum(np.abs(res).max(axis=-1), 1e-12) / 127.0
    codes = np.clip(
        np.round(res / scale[:, :, None]), -127, 127
    ).astype(np.int8)
    deq = codes.astype(np.float32) * scale[:, :, None]
    if anchors is not None:
        deq = deq + anchors[:, None, :]
    return codes, scale.astype(np.float32), deq


def _numpy_int8_reference(q, arena_i8, scale, arena_sq, probe, cap, k,
                          anchors=None, bf16_query_dot=False):
    """Quantized-math L2 reference: d = ‖q‖² − 2(q·a + s⊙(q·code)) + ‖x̂‖².

    ``bf16_query_dot`` models the TPU kernels' int8 fast path exactly: the
    scale-folded dot uses the bf16-rounded query (int8 values are exact in
    bf16 and the products accumulate exactly in fp32), while ‖q‖² and the
    anchor dot stay fp32 — a per-query-constant offset that cancels in
    ranking."""
    import ml_dtypes

    q_dot = (
        q.astype(ml_dtypes.bfloat16).astype(np.float32)
        if bf16_query_dot else q
    )
    B = q.shape[0]
    out_d, out_p = [], []
    for b in range(B):
        cand_d, cand_p = [], []
        for l in probe[b]:
            dots = arena_i8[l].astype(np.float32) @ q_dot[b]
            qx = scale[l] * dots
            if anchors is not None:
                qx = qx + anchors[l] @ q[b]
            dd = np.maximum((q[b] ** 2).sum() - 2 * qx + arena_sq[l], 0)
            cand_d.append(dd)
            cand_p.append(l * cap + np.arange(cap))
        cand_d = np.concatenate(cand_d)
        cand_p = np.concatenate(cand_p)
        ref_order = np.argsort(cand_d, kind="stable")[:k]
        out_d.append(cand_d[ref_order])
        out_p.append(cand_p[ref_order])
    return np.stack(out_d), np.stack(out_p)


@pytest.mark.parametrize("use_anchors", [False, True])
@pytest.mark.parametrize("impl", ["sorted", "grouped", "gather", "ragged"])
def test_int8_per_row_scale_paths(rng, impl, use_anchors):
    """int8 quantized math (per-row scales, optional residual anchors):
    every scan implementation must match the numpy reference exactly."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_grouped,
        scan_probed_lists_pallas_sorted,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.scan import (
        scan_probed_lists_ragged,
    )

    nlist, cap, dim, B, P, k = 8, 128, 32, 4, 3, 5
    x = rng.standard_normal((nlist * cap, dim)).astype(np.float32)
    arena_f = x.reshape(nlist, cap, dim)
    counts = np.full(nlist, cap, np.int32)
    anchors = (
        rng.standard_normal((nlist, dim)).astype(np.float32)
        if use_anchors else None
    )
    arena_i8, scale, deq = _quantize_per_row(arena_f, anchors)
    arena_sq = (deq ** 2).sum(-1).astype(np.float32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)

    kw = dict(
        arena_scale=jnp.asarray(scale),
        arena_anchors=jnp.asarray(anchors) if use_anchors else None,
    )
    args = (
        jnp.asarray(q), jnp.asarray(arena_i8), jnp.asarray(arena_sq),
        jnp.asarray(counts), jnp.asarray(probe), k, Metric.L2,
    )
    if impl == "sorted":
        d, pos = scan_probed_lists_pallas_sorted(
            *args, interpret=True, **kw
        )
    elif impl == "grouped":
        d, pos = scan_probed_lists_pallas_grouped(
            *args, interpret=True, m_budget=8, **kw
        )
    elif impl == "ragged":
        d, pos = scan_probed_lists_ragged(*args, approx=False, **kw)
    else:
        d, pos = scan_probed_lists(*args, **kw)
    d, pos = np.asarray(d), np.asarray(pos)

    ref_d, ref_p = _numpy_int8_reference(
        q, arena_i8, scale, arena_sq, probe, cap, k, anchors
    )
    for b in range(B):
        np.testing.assert_allclose(d[b], ref_d[b], rtol=1e-4, atol=1e-4)
        assert set(pos[b].tolist()) == set(ref_p[b].tolist())

    if impl in ("sorted", "grouped"):
        # Opt-in bf16 staging: dots use the bf16-rounded query (int8 is
        # exact in bf16, products accumulate exactly in fp32) — matches
        # the bf16-query reference and stays within int8-noise scale of
        # exact fp32 math.
        if impl == "sorted":
            d2, pos2 = scan_probed_lists_pallas_sorted(
                *args, interpret=True, stage_bf16=True, **kw
            )
        else:
            d2, pos2 = scan_probed_lists_pallas_grouped(
                *args, interpret=True, stage_bf16=True, m_budget=8, **kw
            )
            # stage_inline folds the widening cast into the dot instead of
            # the per-list staging sweep — identical fp32 math, so it must
            # match the exact reference bit-for-bit in semantics.
            d3, pos3 = scan_probed_lists_pallas_grouped(
                *args, interpret=True, stage_inline=True, m_budget=8, **kw
            )
            d3, pos3 = np.asarray(d3), np.asarray(pos3)
            for b in range(B):
                np.testing.assert_allclose(
                    d3[b], ref_d[b], rtol=1e-4, atol=1e-4
                )
                assert set(pos3[b].tolist()) == set(ref_p[b].tolist())
        d2 = np.asarray(d2)
        bq_d, bq_p = _numpy_int8_reference(
            q, arena_i8, scale, arena_sq, probe, cap, k, anchors,
            bf16_query_dot=True,
        )
        for b in range(B):
            np.testing.assert_allclose(d2[b], bq_d[b], rtol=1e-4, atol=1e-4)
            assert set(np.asarray(pos2)[b].tolist()) == set(
                bq_p[b].tolist()
            )
        np.testing.assert_allclose(d2, ref_d, rtol=3e-3, atol=3e-3)


def test_scan_capacity_prefix_parity(rng):
    """scan_capacity (the occupied-prefix bound) must not change results:
    kernels read only [:, :cap_s, :] blocks, which covers every live slot
    when cap_s >= max(counts). Exercises all three Pallas entry points and
    the PQ ADC kernel against their full-capacity outputs."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas,
        scan_probed_lists_pallas_grouped,
        scan_probed_lists_pallas_sorted,
    )

    nlist, cap, dim, B, P, k = 8, 384, 32, 4, 3, 5
    fill = 200                      # occupied prefix; cap_s rounds to 256
    arena_f = rng.standard_normal((nlist, cap, dim)).astype(np.float32)
    arena_f[:, fill:] = 0.0
    counts = rng.integers(64, fill + 1, (nlist,)).astype(np.int32)
    arena_sq = (arena_f ** 2).sum(-1).astype(np.float32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    args = (
        jnp.asarray(q), jnp.asarray(arena_f), jnp.asarray(arena_sq),
        jnp.asarray(counts), jnp.asarray(probe), k, Metric.L2,
    )
    for fn, kw in (
        (scan_probed_lists_pallas, {}),
        (scan_probed_lists_pallas_sorted, {}),
        (scan_probed_lists_pallas_grouped, {"m_budget": 8}),
    ):
        d_full, p_full = fn(*args, interpret=True, **kw)
        d_pre, p_pre = fn(
            *args, interpret=True, scan_capacity=int(counts.max()), **kw
        )
        np.testing.assert_allclose(
            np.asarray(d_pre), np.asarray(d_full), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(p_pre), np.asarray(p_full))


@pytest.mark.parametrize("topk_impl", ["passes", "t4"])
def test_grouped_topk_impls_parity(rng, topk_impl):
    """Both row top-k emitters (k-pass and quarter-width tournament) must
    reproduce the exact scan, including underfull rows (fewer valid slots
    than k → inf/-1 sentinels)."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_grouped,
    )

    nlist, cap, dim, B, P, k = 8, 512, 32, 6, 4, 10
    arena = rng.standard_normal((nlist, cap, dim)).astype(np.float32)
    arena_sq = (arena ** 2).sum(-1).astype(np.float32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    for counts in (
        rng.integers(1, cap + 1, (nlist,)).astype(np.int32),
        np.full(nlist, 2, np.int32),            # underfull: valid < k
    ):
        args = (
            jnp.asarray(q), jnp.asarray(arena), jnp.asarray(arena_sq),
            jnp.asarray(counts), jnp.asarray(probe), k, Metric.L2,
        )
        rd, rp = scan_probed_lists(*args)
        d, p = scan_probed_lists_pallas_grouped(
            *args, interpret=True, m_budget=8, topk_impl=topk_impl,
        )
        rd, rp = np.asarray(rd), np.asarray(rp)
        d, p = np.asarray(d), np.asarray(p)
        fin = np.isfinite(rd)
        np.testing.assert_allclose(d[fin], rd[fin], rtol=1e-5, atol=1e-5)
        assert ((p >= 0) == fin).all()
        for b in range(B):
            assert set(p[b][fin[b]].tolist()) == set(
                rp[b][fin[b]].tolist()
            )


def test_residual_quantization_is_finer(rng):
    """Residual (anchored) int8 encoding reconstructs clustered data much
    more accurately than raw-value encoding — the recall lever."""
    nlist, cap, dim = 8, 64, 32
    centers = 4.0 * rng.standard_normal((nlist, dim)).astype(np.float32)
    noise = 0.25 * rng.standard_normal((nlist, cap, dim)).astype(np.float32)
    arena_f = centers[:, None, :] + noise
    _, _, deq_raw = _quantize_per_row(arena_f, None)
    _, _, deq_res = _quantize_per_row(arena_f, centers)
    err_raw = np.abs(deq_raw - arena_f).mean()
    err_res = np.abs(deq_res - arena_f).mean()
    assert err_res < err_raw / 4.0, (err_raw, err_res)


def test_grouped_row_bound_guard_and_probe_chunking(rng, monkeypatch):
    """Huge probe sets (e.g. a full-probe exact pass at big batch) must not
    build an SMEM row table past the budget: the kernel raises a clear
    error, and _ivf_search_device splits the probe axis into chunks whose
    merged top-k is exact (probe chunks cover disjoint lists)."""
    import functools

    from cuda_acceleratedvectordatabaseengine_tpu.models import ivf_flat
    from cuda_acceleratedvectordatabaseengine_tpu.ops import pallas_scan

    # the guard itself
    with pytest.raises(ValueError, match="SMEM"):
        pallas_scan._check_row_table(pallas_scan.GROUPED_SMEM_ROWS_MAX + 1)
    # bound formula mirrors the kernel: tiny shapes stay tiny
    assert pallas_scan.grouped_row_bound(4, 3, 8) <= 12

    nlist, cap, dim, B, k = 8, 64, 16, 6, 5
    arena = np.zeros((nlist, cap, dim), np.float32)
    counts = rng.integers(1, cap + 1, nlist).astype(np.int32)
    for l in range(nlist):
        arena[l, :counts[l]] = rng.standard_normal((counts[l], dim))
    q = rng.standard_normal((B, dim)).astype(np.float32)

    # Force chunking: a row budget so small every nprobe=nlist search
    # must split, and an interpret-mode kernel so it runs on CPU.
    monkeypatch.setattr(pallas_scan, "GROUPED_SMEM_ROWS_MAX", 6)
    monkeypatch.setattr(
        pallas_scan,
        "scan_probed_lists_pallas_grouped",
        functools.partial(
            pallas_scan.scan_probed_lists_pallas_grouped, interpret=True,
        ),
    )
    want = ivf_flat._ivf_search_device(
        jnp.asarray(q), jnp.asarray(arena.mean(1)), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        nlist, k, Metric.L2, "gather", False, 0, None, None, None, None,
    )
    got = ivf_flat._ivf_search_device(
        jnp.asarray(q), jnp.asarray(arena.mean(1)), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        nlist, k, Metric.L2, "pallas_grouped", False, 0, None, None, None,
        None,
    )
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               rtol=1e-5, atol=1e-5)

    # The HBM pair budget (GROUPED_QROWS_BYTES_MAX: the deep-probe query-
    # row pre-gather transient, HOSTILE_r05 OOM) must chunk with the same
    # exactness — force nprobe chunks of 2 pairs per query.
    monkeypatch.setattr(pallas_scan, "GROUPED_SMEM_ROWS_MAX", 100_000)
    monkeypatch.setattr(
        pallas_scan, "grouped_pair_budget", lambda dim: B * 2
    )
    # k differs from the first pass so the jit cache cannot reuse the
    # SMEM-chunked executable — this trace runs under the pair budget.
    k2 = k - 1
    want2 = ivf_flat._ivf_search_device(
        jnp.asarray(q), jnp.asarray(arena.mean(1)), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        nlist, k2, Metric.L2, "gather", False, 0, None, None, None, None,
    )
    got2 = ivf_flat._ivf_search_device(
        jnp.asarray(q), jnp.asarray(arena.mean(1)), jnp.asarray(arena),
        jnp.asarray((arena ** 2).sum(-1)), jnp.asarray(counts),
        nlist, k2, Metric.L2, "pallas_grouped", False, 0, None, None, None,
        None,
    )
    np.testing.assert_array_equal(np.asarray(want2[1]), np.asarray(got2[1]))
    np.testing.assert_allclose(np.asarray(want2[0]), np.asarray(got2[0]),
                               rtol=1e-5, atol=1e-5)


def test_grouped_auto_gate_t4_at_m16_parity(rng):
    """The auto gate lowers to the tournament at m >= 16 (measured win at
    the 10M headline, KERNEL_r03.json t4_gate_update_late_r03) — exercise
    the AUTO path at exactly the gate boundary (cap % 512 == 0, m=16)
    against the reference scan."""
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pallas_scan import (
        scan_probed_lists_pallas_grouped,
    )

    nlist, cap, dim, B, P, k = 8, 512, 32, 12, 4, 10
    arena = rng.standard_normal((nlist, cap, dim)).astype(np.float32)
    arena_sq = (arena ** 2).sum(-1).astype(np.float32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    probe = np.stack([
        rng.choice(nlist, P, replace=False) for _ in range(B)
    ]).astype(np.int32)
    counts = rng.integers(1, cap + 1, (nlist,)).astype(np.int32)
    args = (
        jnp.asarray(q), jnp.asarray(arena), jnp.asarray(arena_sq),
        jnp.asarray(counts), jnp.asarray(probe), k, Metric.L2,
    )
    rd, rp = scan_probed_lists(*args)
    d, p = scan_probed_lists_pallas_grouped(
        *args, interpret=True, m_budget=16,   # topk_impl defaults to auto
    )
    rd, rp = np.asarray(rd), np.asarray(rp)
    d, p = np.asarray(d), np.asarray(p)
    fin = np.isfinite(rd)
    np.testing.assert_allclose(d[fin], rd[fin], rtol=1e-5, atol=1e-5)
    assert ((p >= 0) == fin).all()
    for b in range(B):
        assert set(p[b][fin[b]].tolist()) == set(rp[b][fin[b]].tolist())
