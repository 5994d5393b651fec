"""Pallas TPU kernel: probed-list distance scan with scalar-prefetch DMA.

Third implementation of the hot scan (besides the XLA gather scan and the
ragged grouped matmul). The XLA gather path materializes every gathered
list block in HBM before the matmul reads it back — 2× HBM traffic and
gather-granularity access. This kernel uses ``PrefetchScalarGridSpec``: the
probe-id table is prefetched to SMEM, each grid step's arena block is
selected *by probe id* in the BlockSpec index_map, and the Pallas pipeline
emitter double-buffers the HBM→VMEM DMA of the next list block behind the
current block's compute (the guide's scalar-prefetch + double-buffering
patterns). List blocks never round-trip through HBM; only the [cap]
distance row is written out.

Quantization contract (matches ``models/arena.PackedListArena``): a stored
point is ``x̂ = anchor[l] + scale[l, slot] · code`` (anchor 0 / scale 1 when
absent), ``arena_sq`` holds exact fp32 ``‖x̂‖²``, and the kernels recover
``q·x̂ = q·anchor[l] + scale ⊙ (q·code)`` — per-row scales ride as a
``[1, cap]`` VMEM row, the anchor as a ``[1, D]`` block with one extra tiny
dot per distinct list.

TPU tiling notes (Mosaic requires the last two block dims to be 8/128
multiples or full-size):
  - queries ride as ONE full-array VMEM block (B·D·4 bytes ≪ VMEM);
  - per-list rows (norms, scales) ride as (8, cap) blocks indexed l//8;
  - blocks are staged to VMEM scratch once per DISTINCT list (the sorted
    grid revisits lists). Mosaic's mixed bf16→fp32 dot lowering trips a
    verifier bug and int8→int32 dots aren't lowered, so both operands get
    one dtype — fp32 by default (exact parity with the XLA scans). int8
    arenas can opt into ``stage_bf16``: int8 is exact in bf16 and
    bf16·bf16 products accumulate exactly in fp32, halving staging VMEM
    and running single-pass MXU dots, at the cost of the query's own bf16
    rounding. Measured at 10M×768 int8 b8192 the kernel is NOT MXU-bound
    (no QPS gain) and the rounding costs ~1% recall in dense clusters, so
    fp32 stays the default.

The final top-k runs outside (XLA), as in the ragged path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric
from cuda_acceleratedvectordatabaseengine_tpu.ops.topk import topk_smallest

_VMEM_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,  # v5e has 128MB VMEM; the default
    # 16MB scoped limit rejects fp32 staging of big list blocks
)


def _local_counts(counts, cap, slot_stride, slot_offset):
    """Valid LOCAL slots per list under round-robin slot striping.

    With the arena's slot axis striped across N chips (local slot ``j`` on
    shard ``s`` holds logical slot ``j*N + s`` — see ``parallel/sharded``),
    the in-kernel validity test stays the plain ``local_slot < count`` form
    if we hand the kernel the per-shard count ``ceil((count - offset) / N)``
    instead of the global one. Keeps the kernels striping-oblivious."""
    if slot_stride == 1:
        return counts
    lc = (counts - slot_offset + slot_stride - 1) // slot_stride
    return jnp.clip(lc, 0, cap).astype(counts.dtype)


def _striped_positions(probe_ids, counts, cap, slot_stride, slot_offset,
                       global_cap):
    """[B, P, cap] global arena positions (-1 invalid) in LOGICAL slot
    space, shared epilogue of the Pallas scans."""
    safe = jnp.maximum(probe_ids, 0)
    slot_logical = (
        jnp.arange(cap, dtype=jnp.int32) * slot_stride + slot_offset
    )
    valid = (slot_logical[None, None, :] < counts[safe][:, :, None]) & (
        probe_ids >= 0
    )[:, :, None]
    return jnp.where(
        valid, safe[:, :, None] * global_cap + slot_logical[None, None, :], -1
    )


def _pad_rows8(a):
    """Pad a [nlist, ...] per-list table to an 8-multiple of rows so it can
    ride as (8, cap) VMEM blocks."""
    nlist = a.shape[0]
    pad = -nlist % 8
    return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a


def _effective_cap(cap: int, scan_capacity: int | None) -> int:
    """Slot-prefix width the kernels actually scan. ``scan_capacity`` is the
    caller's bound on ``max(counts)`` (see ``PackedListArena.counts_max``);
    rounded up to the 128-slot tile so blocks stay Mosaic-legal. Every
    BlockSpec then reads only ``[*, :cap_s, *]`` of the arena — allocation
    headroom above the fill costs no DMA, staging, dots or top-k sweeps.
    Results are exact as long as ``scan_capacity >= max(counts)`` (the
    callers derive it from true counts; violating it silently drops the
    overflow slots)."""
    if scan_capacity is None or scan_capacity >= cap:
        return cap
    return min(cap, max(128, -(-scan_capacity // 128) * 128))


def _kernel(probe_ref, counts_ref, q_ref, block_ref, out_ref,
            *, metric: Metric):
    b = pl.program_id(0)
    p = pl.program_id(1)
    list_id = probe_ref[b, p]
    q = q_ref[pl.ds(b, 1), :].astype(jnp.float32)       # [1, D]
    blk = block_ref[0]                                  # [cap, D] in VMEM
    cap = blk.shape[0]
    # fp32 operands: Mosaic's mixed bf16→fp32 dot lowering trips a verifier
    # bug; the cast is free relative to the HBM DMA this kernel hides.
    blk_f = blk.astype(jnp.float32)
    dots = jax.lax.dot_general(
        blk_f, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(1, cap)
    if metric == Metric.L2:
        q_sq = jnp.sum(q * q)
        blk_sq = jnp.sum(blk_f * blk_f, axis=-1).reshape(1, cap)
        d = jnp.maximum(q_sq - 2.0 * dots + blk_sq, 0.0)
    elif metric == Metric.INNER_PRODUCT:
        d = -dots
    else:  # cosine over pre-normalized inputs
        d = 1.0 - dots
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    valid = (slot < counts_ref[jnp.maximum(list_id, 0)]) & (list_id >= 0)
    out_ref[0, p, :] = jnp.where(valid, d, jnp.inf)[0]


def _sorted_kernel(*refs, metric: Metric, has_scale: bool, has_anchor: bool,
                   stage_bf16: bool = False):
    """Probe-dedup sorted scan step: one (query, probe) pair per grid step,
    arena block staged to fp32 scratch once per DISTINCT list. The dot is
    the only O(cap·D) op per step; norms arrive exact as a blocked input
    and per-row dequant scales fold into the [1, cap] dots."""
    (rows_ref, lists_ref, counts_ref, qsq_ref, q_ref, block_ref,
     blocksq_ref) = refs[:7]
    pos = 7
    scale_ref = anchor_ref = None
    if has_scale:
        scale_ref = refs[pos]
        pos += 1
    if has_anchor:
        anchor_ref = refs[pos]
        pos += 1
    out_ref, cast_ref, last_ref = refs[pos:pos + 3]

    i = pl.program_id(0)
    b = rows_ref[i]
    list_id = lists_ref[i]
    safe_l = jnp.maximum(list_id, 0)
    q_row = q_ref[pl.ds(jnp.maximum(b, 0), 1), :]       # (1, D) fp32 exact
    cap = block_ref.shape[1]
    # Cast the block once per DISTINCT list: the grid is sorted by list, so
    # consecutive steps reuse the cast staged in persistent VMEM scratch —
    # the cast sweep was the dominant per-step cost.
    @pl.when((i == 0) | (last_ref[0] != list_id))
    def _():
        cast_ref[...] = block_ref[0].astype(cast_ref.dtype)
        last_ref[0] = list_id

    # int8 arenas stage to bf16 for single-pass MXU dots (exact int
    # products in fp32 accumulation; see _grouped_kernel).
    q_op = q_row.astype(jnp.bfloat16) if stage_bf16 else q_row
    dots = jax.lax.dot_general(
        cast_ref[...], q_op,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(1, cap)
    qx = dots
    if has_scale:
        qx = qx * scale_ref[pl.ds(safe_l % 8, 1), :]    # (1, cap) per-row
    if has_anchor:
        qa = jax.lax.dot_general(                       # (1, 1) q·anchor
            anchor_ref[0], q_row,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qx = qx + qa
    if metric == Metric.L2:
        blk_sq = blocksq_ref[pl.ds(safe_l % 8, 1), :]   # (1, cap) exact fp32
        d = jnp.maximum(
            qsq_ref[jnp.maximum(b, 0)] - 2.0 * qx + blk_sq, 0.0
        )
    elif metric == Metric.INNER_PRODUCT:
        d = -qx
    else:
        d = 1.0 - qx
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    valid = (slot < counts_ref[safe_l]) & (b >= 0)
    out_ref[i % 8, :] = jnp.where(valid, d, jnp.inf)[0]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx", "interpret", "slot_stride",
                     "global_capacity", "stage_bf16", "scan_capacity"),
)
def scan_probed_lists_pallas_sorted(
    queries: jax.Array,
    arena: jax.Array,
    arena_sq: jax.Array,
    counts: jax.Array,
    probe_ids: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    approx: bool = False,
    interpret: bool = False,
    arena_scale: jax.Array | None = None,
    arena_anchors: jax.Array | None = None,
    slot_stride: int = 1,
    slot_offset: jax.Array | int = 0,
    global_capacity: int | None = None,
    stage_bf16: bool = False,
    scan_capacity: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Probe-deduplicated Pallas scan.

    The (query, probe) pairs are sorted by list id before the kernel runs a
    1-D grid over them: the arena BlockSpec index is the *sorted* list id,
    so consecutive grid steps hitting the same list reuse the VMEM-resident
    block — Pallas elides the DMA when an input's block index repeats. At
    serving batch sizes probes overlap heavily (B·P draws over nlist
    lists), so HBM traffic drops from B·P blocks to ~unique-lists blocks —
    the same dedup the ragged grouped matmul gets, with the DMA pipeline's
    latency hiding.

    ``slot_stride``/``slot_offset``/``global_capacity`` support the
    multi-chip slot-striped arena (see ``ops/scan.scan_probed_lists`` and
    ``parallel/sharded.py``): the kernel runs on local slots against
    per-shard counts; positions come back in logical (global) space.
    """
    batch, nprobe = probe_ids.shape
    nlist, cap, dim = arena.shape
    global_cap = global_capacity if global_capacity is not None else cap
    cap_s = _effective_cap(cap, scan_capacity)
    kernel_counts = _local_counts(counts, cap, slot_stride, slot_offset)
    q = queries.astype(jnp.float32)
    q_sq = jnp.sum(q * q, axis=-1)
    n_rows = batch * nprobe
    has_scale = arena_scale is not None
    has_anchor = arena_anchors is not None

    flat = probe_ids.reshape(-1)
    order = jnp.argsort(jnp.maximum(flat, 0), stable=True)
    sorted_lists = jnp.maximum(flat, 0)[order].astype(jnp.int32)
    # row → query index; -1 marks rows that came from invalid (-1) probes
    rows = jnp.where(
        flat[order] >= 0, (order // nprobe).astype(jnp.int32), -1
    )

    out_shape = jax.ShapeDtypeStruct(
        (-(-n_rows // 8) * 8, cap_s), jnp.float32
    )

    in_specs = [
        pl.BlockSpec((batch, dim), lambda i, r, l, c, qs: (0, 0)),
        pl.BlockSpec(
            (1, cap_s, dim), lambda i, r, l, c, qs: (l[i], 0, 0)
        ),
        pl.BlockSpec((8, cap_s), lambda i, r, l, c, qs: (l[i] // 8, 0)),
    ]
    operands = [q, arena, _pad_rows8(arena_sq)]
    if has_scale:
        in_specs.append(
            pl.BlockSpec((8, cap_s), lambda i, r, l, c, qs: (l[i] // 8, 0))
        )
        operands.append(_pad_rows8(arena_scale.astype(jnp.float32)))
    if has_anchor:
        # [nlist, 1, D] with (1, 1, D) blocks: a plain (1, D) block violates
        # Mosaic's 8/128-or-full rule on the last two dims.
        in_specs.append(
            pl.BlockSpec((1, 1, dim), lambda i, r, l, c, qs: (l[i], 0, 0))
        )
        operands.append(
            arena_anchors.astype(jnp.float32)[:, None, :]
        )

    # stage_bf16 halves staging VMEM and runs single-pass MXU dots (int8
    # is exact in bf16) at the cost of bf16-rounding the query — measured
    # at 10M x 768 int8: no QPS gain (the kernel is not MXU-bound) and ~1%
    # recall, so fp32 staging is the default.
    stage_bf16 = stage_bf16 and arena.dtype == jnp.int8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # rows, lists, counts, qsq
        grid=(n_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, cap_s), lambda i, r, l, c, qs: (i // 8, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM(                 # cast cache (see _sorted_kernel)
                (cap_s, dim),
                jnp.bfloat16 if stage_bf16 else jnp.float32,
            ),
            pltpu.SMEM((1,), jnp.int32),           # last cast list id
        ],
    )
    run = pl.pallas_call(
        functools.partial(_sorted_kernel, metric=metric,
                          has_scale=has_scale, has_anchor=has_anchor,
                          stage_bf16=stage_bf16),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )
    d_sorted = run(rows, sorted_lists, kernel_counts, q_sq, *operands)[:n_rows]

    inv = jnp.argsort(order)
    d = d_sorted[inv].reshape(batch, nprobe, cap_s)     # back to (b, p)

    pos = _striped_positions(
        probe_ids, counts, cap_s, slot_stride, slot_offset, global_cap
    )
    return topk_smallest(
        d.reshape(batch, nprobe * cap_s),
        k,
        idx=pos.reshape(batch, nprobe * cap_s),
        approx=approx,
    )


def _emit_row_topk(d, cnt, k: int, out_d_ref, out_s_ref):
    """Shared grouped-kernel tail: mask invalid slots, then k
    min-extraction passes over [M, cap] on the VPU — shrinks the kernel
    output from M·cap distances to M·k candidates. Row validity (padded
    slots, sentinel rows) is an epilogue concern — junk rows are simply
    never gathered there."""
    m, cap = d.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (m, cap), 1)
    d = jnp.where(slot < cnt, d, jnp.inf)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
    big = jnp.int32(cap + 1)

    def extract(j, carry):
        d_cur, best_d, best_s = carry
        val = jnp.min(d_cur, axis=1, keepdims=True)     # [M, 1]
        is_min = d_cur == val
        idx = jnp.min(
            jnp.where(is_min, slot, big), axis=1, keepdims=True
        )                                               # [M, 1] first argmin
        write = col == j
        best_d = jnp.where(write, val, best_d)
        best_s = jnp.where(write, idx, best_s)
        d_cur = jnp.where(slot == idx, jnp.inf, d_cur)
        return d_cur, best_d, best_s

    _, best_d, best_s = jax.lax.fori_loop(
        0, k, extract,
        (d, jnp.full((m, k), jnp.inf, jnp.float32),
         jnp.full((m, k), -1, jnp.int32)),
    )
    out_d_ref[0] = best_d
    out_s_ref[0] = best_s


def _emit_row_topk_t4(d, cnt, k: int, out_d_ref, out_s_ref):
    """Tournament variant of ``_emit_row_topk``: fold the row into four
    quarter-width (value, slot) lanes sorted per column (5 compare-swap
    stages), then run the k min-extraction passes at QUARTER width with a
    loser-promotion shift on extraction. Exact values/slots (tie ORDER
    among equal distances may differ from the k-pass variant — any
    consistent tie-break is valid for the epilogue merge). Per-pass VPU
    work drops from ~6 full-row sweeps to ~14 quarter-row ops; the one-time
    sort costs ~6 full-row equivalents, so it wins for k ≳ 3. Requires
    ``cap % 512 == 0`` so quarter slices stay lane-tile aligned (the
    caller's auto gate checks this)."""
    m, cap = d.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (m, cap), 1)
    d = jnp.where(slot < cnt, d, jnp.inf)
    qw = cap // 4
    # Born-2D quarters via iota arithmetic instead of lane-offset slices of
    # the full row (offset slices of [M, cap] trip a Mosaic lowering check
    # at M > 8: ``limits[i] <= dim(i)``).
    qslot0 = jax.lax.broadcasted_iota(jnp.int32, (m, qw), 1)
    vals = [d[:, i * qw:(i + 1) * qw] for i in range(4)]
    slots = [qslot0 + i * qw for i in range(4)]

    def _cas(i, j):
        c = vals[j] < vals[i]
        vals[i], vals[j] = (
            jnp.where(c, vals[j], vals[i]), jnp.where(c, vals[i], vals[j])
        )
        slots[i], slots[j] = (
            jnp.where(c, slots[j], slots[i]),
            jnp.where(c, slots[i], slots[j]),
        )

    _cas(0, 1)
    _cas(2, 3)
    _cas(0, 2)
    _cas(1, 3)
    _cas(1, 2)

    qslot = jax.lax.broadcasted_iota(jnp.int32, (m, qw), 1)
    big = jnp.int32(cap + 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)

    def extract(j, carry):
        (w, x1, x2, x3, sw, s1, s2, s3, best_d, best_s) = carry
        val = jnp.min(w, axis=1, keepdims=True)             # [M, 1]
        qidx = jnp.min(
            jnp.where(w == val, qslot, big), axis=1, keepdims=True
        )
        mask = qslot == qidx
        sout = jnp.min(jnp.where(mask, sw, big), axis=1, keepdims=True)
        write = col == j
        best_d = jnp.where(write, val, best_d)
        best_s = jnp.where(write, sout, best_s)
        # Promote the column's loser chain one step; the tail dies to inf.
        w = jnp.where(mask, x1, w)
        sw = jnp.where(mask, s1, sw)
        x1 = jnp.where(mask, x2, x1)
        s1 = jnp.where(mask, s2, s1)
        x2 = jnp.where(mask, x3, x2)
        s2 = jnp.where(mask, s3, s2)
        x3 = jnp.where(mask, jnp.inf, x3)
        return (w, x1, x2, x3, sw, s1, s2, s3, best_d, best_s)

    # Static unroll (k is small): fori_loop's 10-buffer loop carry trips
    # the Mosaic lowering here, an unrolled chain does not.
    carry = tuple(vals) + tuple(slots) + (
        jnp.full((m, k), jnp.inf, jnp.float32),
        jnp.full((m, k), -1, jnp.int32),
    )
    for j in range(k):
        carry = extract(j, carry)
    out_d_ref[0] = carry[8]
    out_s_ref[0] = carry[9]


def _row_topk(d, cnt, k, out_d_ref, out_s_ref, topk_impl: str = "auto"):
    """Dispatch between the k-pass and tournament row top-k emitters.

    auto picks the tournament when quarters stay lane-tile aligned
    (cap % 512 == 0), k is big enough to amortize the one-time 4-way
    sort (k ≥ 3), and the row is wide enough that per-op issue overhead
    doesn't dominate (m ≥ 16 — measured at 10M×768 b8192: t4 wins at
    m=48/p16 (58.7→53.4 ms/batch), m=24/p4 (29.9→28.0) and m=16/p4
    (28.2→27.5, the auto-nprobe headline point), but LOSES at m=8/b512
    (12.7→21.5 ms/batch: too few rows to amortize the extraction
    passes)."""
    m, cap = d.shape
    if topk_impl == "t4" or (
        topk_impl == "auto" and cap % 512 == 0 and k >= 3 and m >= 16
    ):
        _emit_row_topk_t4(d, cnt, k, out_d_ref, out_s_ref)
    else:
        _emit_row_topk(d, cnt, k, out_d_ref, out_s_ref)


# SMEM budget (in rows) for the grouped kernels' scalar-prefetch row
# table: row_list [n_rows] i32 + counts [nlist] i32 must fit the ~1 MB
# of SMEM. Measured failure without the bound: nprobe=4096 at b=8192
# builds a 528K-row table → "Allocation (size=2117632) would exceed
# memory (size=1048576)" from Mosaic. 100K rows = 400 KB leaves room
# for counts and per-step scalars at any practical nlist.
GROUPED_SMEM_ROWS_MAX = 100_000


# HBM budget for the grouped kernel's XLA query-row pre-gather: q_rows is
# [n_rows_pad, M, D] fp32 ≈ n_pairs·D·4 bytes (+ an nlist·M·D·4 partial-row
# term). At nprobe=96 × b8192 × 768-D it reached 3.0 GB and pushed a full
# 10M zipf replica arena 58 MB past HBM (HOSTILE_r05 first attempt). Probe
# chunks are disjoint lists, so splitting the probe axis and top-k-merging
# is exact; 1.5 GB keeps every measured headline shape single-chunk
# (b8192 × nprobe≤48 at 768-D) while capping the hostile deep-probe tail.
GROUPED_QROWS_BYTES_MAX = 1_500_000_000


def grouped_pair_budget(dim: int) -> int:
    """Max (query, probe) pairs per grouped-kernel call under
    ``GROUPED_QROWS_BYTES_MAX`` (see above)."""
    return max(GROUPED_QROWS_BYTES_MAX // (max(dim, 1) * 4), 1024)


def auto_m_budget(n_pairs: int, nlist: int) -> int:
    """Shared auto ``m_budget`` law for BOTH grouped kernels and their
    row-bound mirror (one definition — a divergence here once made
    ``grouped_row_bound`` under-predict the grid and crash the search in
    ``_check_row_table``).

    m* ≈ 8·√(mean pairs-per-list), snapped to the measured-good widths
    {8, 16, 32, 48, 64}. Fits every measured optimum at 10M×768 int8
    (nlist=4096; r2 dev sweep + r3 latency/kernel sweeps): mean→m* of
    2→8, 4→16, 8→16, 16→32, 32→48, 64→64. The earlier 2×-mean law
    matched all but the mean=32 point (picked 64 where 48 measures ~4%
    faster with the t4 epilogue, KERNEL_r03.json); the raw sqrt value is
    snapped because in-between widths underperform BOTH neighbors
    (m=24 at mean=8/nprobe=4: 274K QPS vs 289K@16 and 288K@32)."""
    mean_ppl = n_pairs / max(nlist, 1)
    raw = min(64.0, max(8.0, 8.0 * mean_ppl ** 0.5))
    return min((8, 16, 32, 48, 64), key=lambda w: (abs(w - raw), w))


def grouped_row_bound(
    batch: int, nprobe: int, nlist: int, m_budget: int | None = None,
) -> int:
    """Static grid-row bound of the grouped kernels for this shape — the
    mirror of the computation inside ``scan_probed_lists_pallas_grouped``.
    Callers compare it against ``GROUPED_SMEM_ROWS_MAX`` to decide how to
    chunk the probe axis (``models/ivf_flat._ivf_search_device`` does so
    automatically)."""
    n_pairs = batch * nprobe
    m = m_budget or auto_m_budget(n_pairs, nlist)
    return max(min(n_pairs // m + nlist + 1, n_pairs), 1)


def _check_row_table(n_rows: int) -> None:
    if n_rows > GROUPED_SMEM_ROWS_MAX:
        raise ValueError(
            f"grouped-kernel scalar-prefetch row table ({n_rows} rows) "
            f"exceeds the SMEM budget ({GROUPED_SMEM_ROWS_MAX}); split "
            "the probe axis into chunks and merge top-k (the IVF search "
            "drivers do this automatically)"
        )


def _pack_pairs_into_rows(probe_ids, nlist: int, m: int, n_rows: int):
    """Sort (query, probe) pairs by list id and pack them into list-rows of
    up to M same-list queries (shared by the grouped scan kernels).

    Returns ``(order, key_sorted, row_of_pair, m_of_pair, row_list,
    qrow_table)`` where ``row_list [n_rows]`` maps grid row → list id
    (sentinel ``nlist`` for unused rows) and ``qrow_table [n_rows_pad, m]``
    maps (row, m-slot) → query index (−1 empty)."""
    batch, nprobe = probe_ids.shape
    n_pairs = batch * nprobe
    flat = probe_ids.reshape(-1)
    pair_b = jnp.arange(n_pairs, dtype=jnp.int32) // nprobe
    key = jnp.where(flat >= 0, flat, nlist)             # invalid → sentinel
    order = jnp.argsort(key, stable=True)
    key_sorted = key[order]
    gcounts = jax.ops.segment_sum(
        jnp.ones((n_pairs,), jnp.int32), key_sorted,
        num_segments=nlist + 1,
    )
    gstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(gcounts)[:-1].astype(
            jnp.int32)]
    )
    r_in_list = jnp.arange(n_pairs, dtype=jnp.int32) - gstart[key_sorted]
    rows_per_list = -(-gcounts // m)
    row_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(rows_per_list)[:-1].astype(jnp.int32)]
    )
    row_of_pair = row_offset[key_sorted] + r_in_list // m
    m_of_pair = r_in_list % m

    row_list = jnp.full((n_rows,), nlist, jnp.int32).at[row_of_pair].set(
        key_sorted
    )
    qrow_table = jnp.full((n_rows, m), -1, jnp.int32).at[
        row_of_pair, m_of_pair
    ].set(jnp.where(flat[order] >= 0, pair_b[order], -1))
    n_rows_pad = -(-n_rows // 8) * 8
    qrow_table = jnp.pad(
        qrow_table, ((0, n_rows_pad - n_rows), (0, 0)),
        constant_values=-1,
    )
    return order, key_sorted, row_of_pair, m_of_pair, row_list, qrow_table


def _grouped_epilogue(out_d, out_s, pack, batch, nprobe, k, nlist,
                      global_cap, slot_stride, slot_offset, approx,
                      k_inner=None):
    """Per-pair candidate rows back to (b, p) order, then a tiny final
    top-k over nprobe·k_inner candidates per query (shared by the grouped
    scan kernels). Local slots map to logical ones under striping.
    ``k_inner`` is the kernel's per-(query, list) candidate count — equal
    to ``k`` for exact scans, smaller for shortlist mode."""
    ki = k if k_inner is None else k_inner
    order, key_sorted, row_of_pair, m_of_pair, _, _ = pack
    pair_d = out_d[row_of_pair, m_of_pair]             # [BP, ki] sorted
    pair_s = out_s[row_of_pair, m_of_pair]
    real = (
        (pair_s >= 0) & (key_sorted[:, None] < nlist)
        & jnp.isfinite(pair_d)
    )
    pair_d = jnp.where(real, pair_d, jnp.inf)
    pair_pos = jnp.where(
        real,
        key_sorted[:, None] * global_cap
        + (pair_s * slot_stride + slot_offset),
        -1,
    )
    inv = jnp.argsort(order)
    d = pair_d[inv].reshape(batch, nprobe * ki)
    pos = pair_pos[inv].reshape(batch, nprobe * ki)
    return topk_smallest(d, k, idx=pos, approx=approx)


def _grouped_kernel(*refs, metric: Metric, k: int, has_scale: bool,
                    has_anchor: bool, stage_bf16: bool = False,
                    stage_inline: bool = False, topk_impl: str = "auto"):
    # Mosaic note: every intermediate is born 2-D (keepdims reductions) —
    # 1-D→2-D vector reshapes don't lower.
    (row_list_ref, counts_ref, qrows_ref, block_ref, blocksq_ref) = refs[:5]
    pos = 5
    scale_ref = anchor_ref = None
    if has_scale:
        scale_ref = refs[pos]
        pos += 1
    if has_anchor:
        anchor_ref = refs[pos]
        pos += 1
    if stage_inline:
        out_d_ref, out_s_ref = refs[pos:pos + 2]
        cast_ref = last_ref = None
    else:
        out_d_ref, out_s_ref, cast_ref, last_ref = refs[pos:pos + 4]

    i = pl.program_id(0)
    list_id = row_list_ref[i]
    nlist = counts_ref.shape[0]
    cap = block_ref.shape[1]
    m = qrows_ref.shape[1]
    safe_l = jnp.minimum(jnp.maximum(list_id, 0), nlist - 1)

    # The grid's static row bound is pairs//M + nlist + 1 (one possible
    # partial row per list); unused rows carry the sentinel list id. When
    # probes spread evenly (serving batches), sentinel rows can be up to
    # HALF the grid — guard the whole body so they cost only the ~µs step
    # bookkeeping instead of a full staging cast + MXU dot. Their out
    # blocks stay unwritten; the epilogue only gathers real pair rows.
    @pl.when(list_id < nlist)
    def _body():
        # Staged cast of the raw block once per DISTINCT list in
        # persistent scratch (rows of the same list are consecutive). int8
        # arenas may stage to bf16: every int8 value is exact in bf16 and
        # bf16·bf16 products accumulate exactly in fp32, so the dot runs
        # at single-pass MXU rate with only the query's bf16 rounding
        # (~2e-4 relative) as error; a per-query-constant norm mismatch
        # cancels in ranking.
        if not stage_inline:
            @pl.when((i == 0) | (last_ref[0] != list_id))
            def _():
                cast_ref[...] = block_ref[0].astype(cast_ref.dtype)
                last_ref[0] = list_id

        # This row's M query vectors arrive pre-gathered by XLA
        # ([n_rows, M, D] blocks): a fixed ~M·D·4 bytes/step of HBM
        # instead of the one-hot gather matmul whose cost scaled with
        # batch × steps.
        q_sub = qrows_ref[0]                            # [M, D] fp32
        q_op = q_sub.astype(jnp.bfloat16) if stage_bf16 else q_sub
        if stage_inline:
            blk_op = block_ref[0].astype(
                jnp.bfloat16 if stage_bf16 else jnp.float32
            )
        else:
            blk_op = cast_ref[...]
        dots = jax.lax.dot_general(                     # [M, cap] MXU
            q_op, blk_op,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qx = dots
        if has_scale:
            qx = qx * scale_ref[pl.ds(safe_l % 8, 1), :]  # (1, cap)/row
        if has_anchor:
            qa = jax.lax.dot_general(                   # [M, 1] q·anchor
                q_sub, anchor_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            qx = qx + qa
        if metric == Metric.L2:
            q_sq = jnp.sum(q_sub * q_sub, axis=-1, keepdims=True)  # [M, 1]
            d = jnp.maximum(
                q_sq - 2.0 * qx + blocksq_ref[pl.ds(safe_l % 8, 1), :], 0.0
            )
        elif metric == Metric.INNER_PRODUCT:
            d = -qx
        else:
            d = 1.0 - qx
        _row_topk(d, counts_ref[safe_l], k, out_d_ref, out_s_ref,
                  topk_impl)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx", "interpret", "m_budget",
                     "stage_bf16", "stage_inline",
                     "slot_stride", "global_capacity", "scan_capacity",
                     "topk_impl"),
)
def scan_probed_lists_pallas_grouped(
    queries: jax.Array,
    arena: jax.Array,
    arena_sq: jax.Array,
    counts: jax.Array,
    probe_ids: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    approx: bool = False,
    interpret: bool = False,
    m_budget: int | None = None,
    arena_scale: jax.Array | None = None,
    arena_anchors: jax.Array | None = None,
    slot_stride: int = 1,
    slot_offset: jax.Array | int = 0,
    global_capacity: int | None = None,
    stage_bf16: bool = False,
    stage_inline: bool | None = None,
    scan_capacity: int | None = None,
    topk_impl: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """List-centric grouped Pallas scan — the fastest single-chip path.

    The sorted per-pair kernel still pays one grid step (≈µs of pipeline
    bookkeeping) per (query, probe) pair. Here pairs are packed into
    *list-rows*: up to M same-list queries per row, grid over rows. Each
    step is one real MXU matmul ``[M, D] × [D, cap]`` against the
    VMEM-resident list block (DMA elided across consecutive rows of the
    same list), followed by an in-kernel k-pass top-k that shrinks the
    output from M·cap distances to M·k candidates — so the XLA epilogue
    top-k runs over ``nprobe·k`` per query instead of ``nprobe·cap``.
    """
    batch, nprobe = probe_ids.shape
    nlist, cap, dim = arena.shape
    global_cap = global_capacity if global_capacity is not None else cap
    cap_s = _effective_cap(cap, scan_capacity)
    kernel_counts = _local_counts(counts, cap, slot_stride, slot_offset)
    n_pairs = batch * nprobe
    if m_budget is None:
        m_budget = auto_m_budget(n_pairs, nlist)
    m = m_budget
    # Static row bound: full rows + one partial row per list (+ the
    # invalid-probe group). Also bounded by n_pairs — every used row holds
    # at least one pair — which is the binding bound at small batches
    # (b·nprobe < nlist): without it a b=64 grid would be ~2/3 sentinel
    # steps of pure bookkeeping (the round-2 small-batch grid tax).
    n_rows = max(min(n_pairs // m + nlist + 1, n_pairs), 1)
    _check_row_table(n_rows)
    has_scale = arena_scale is not None
    has_anchor = arena_anchors is not None

    q = queries.astype(jnp.float32)
    pack = _pack_pairs_into_rows(probe_ids, nlist, m, n_rows)
    (order, key_sorted, row_of_pair, m_of_pair, row_list, qrow_table) = pack

    def _blk(i, rl, cnt):
        return jnp.minimum(jnp.maximum(rl[i], 0), cnt.shape[0] - 1)

    # Pre-gather each row's M queries in XLA (junk slots read q[0]; the
    # epilogue's `real` mask drops them).
    q_rows = q[jnp.maximum(qrow_table, 0)]              # [n_rows_pad, M, D]

    def _qblk(i, rl, cnt):
        # Sentinel tail rows all read block 0: a repeated block index makes
        # the pipeline emitter elide the [1, m, D] DMA, so unused rows cost
        # only step bookkeeping, not HBM traffic.
        return jnp.where(rl[i] < cnt.shape[0], i, 0)

    in_specs = [
        pl.BlockSpec((1, m, dim), lambda i, rl, cnt: (_qblk(i, rl, cnt), 0, 0)),
        pl.BlockSpec(
            (1, cap_s, dim), lambda i, rl, cnt: (_blk(i, rl, cnt), 0, 0)
        ),
        pl.BlockSpec(
            (8, cap_s), lambda i, rl, cnt: (_blk(i, rl, cnt) // 8, 0)
        ),
    ]
    operands = [q_rows, arena, _pad_rows8(arena_sq)]
    if has_scale:
        in_specs.append(pl.BlockSpec(
            (8, cap_s), lambda i, rl, cnt: (_blk(i, rl, cnt) // 8, 0)
        ))
        operands.append(_pad_rows8(arena_scale.astype(jnp.float32)))
    if has_anchor:
        # [nlist, 1, D] with (1, 1, D) blocks (Mosaic last-two-dims rule).
        in_specs.append(pl.BlockSpec(
            (1, 1, dim), lambda i, rl, cnt: (_blk(i, rl, cnt), 0, 0)
        ))
        operands.append(
            arena_anchors.astype(jnp.float32)[:, None, :]
        )

    # fp32 staging default — see scan_probed_lists_pallas_sorted.
    stage_bf16 = stage_bf16 and arena.dtype == jnp.int8
    # stage_inline: skip the per-list VMEM staging sweep and widen the raw
    # block inside the dot operand instead — identical fp32 math, but the
    # cast re-runs on every grid row of the same list. Auto (None): enable
    # exactly when the mean pairs-per-list fits one row (n_pairs ≤
    # nlist·m), i.e. the staging sweep could not have amortized anyway —
    # measured 74.4→68.3 ms/batch at the 10M×768 b8192 nprobe=16 point
    # (decomposition sweep, round 3). With multiple rows per list the
    # staged copy is read m-row times and wins; keep it there.
    if stage_inline is None:
        stage_inline = n_pairs <= nlist * m
    scratch_shapes = [] if stage_inline else [
        pltpu.VMEM(                     # cast cache (see _grouped_kernel)
            (cap_s, dim),
            jnp.bfloat16 if stage_bf16 else jnp.float32,
        ),
        pltpu.SMEM((1,), jnp.int32),               # last cast list id
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # row→list, counts
        grid=(n_rows,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, m, k), lambda i, rl, cnt: (i, 0, 0)),
            pl.BlockSpec((1, m, k), lambda i, rl, cnt: (i, 0, 0)),
        ),
        scratch_shapes=scratch_shapes,
    )
    run = pl.pallas_call(
        functools.partial(_grouped_kernel, metric=metric, k=k,
                          has_scale=has_scale, has_anchor=has_anchor,
                          stage_bf16=stage_bf16, stage_inline=stage_inline,
                          topk_impl=topk_impl),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, m, k), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, m, k), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )
    out_d, out_s = run(row_list, kernel_counts, *operands)
    return _grouped_epilogue(
        out_d, out_s, pack, batch, nprobe, k, nlist, global_cap,
        slot_stride, slot_offset, approx,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx", "interpret", "slot_stride",
                     "global_capacity", "scan_capacity"),
)
def scan_probed_lists_pallas(
    queries: jax.Array,     # [B, D] fp32 (pre-normalized if cosine)
    arena: jax.Array,       # [nlist, cap, D]
    arena_sq: jax.Array,    # [nlist, cap] fp32 (unused: norms in-kernel)
    counts: jax.Array,      # [nlist] int32
    probe_ids: jax.Array,   # [B, P] int32 (-1 = no probe)
    k: int,
    metric: Metric = Metric.L2,
    approx: bool = False,
    interpret: bool = False,
    slot_stride: int = 1,
    slot_offset: jax.Array | int = 0,
    global_capacity: int | None = None,
    scan_capacity: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    del arena_sq  # norms are recomputed from the stored block in-kernel
    batch, nprobe = probe_ids.shape
    nlist, cap, dim = arena.shape
    global_cap = global_capacity if global_capacity is not None else cap
    cap_s = _effective_cap(cap, scan_capacity)
    kernel_counts = _local_counts(counts, cap, slot_stride, slot_offset)
    q = queries.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # probe table + counts
        grid=(batch, nprobe),
        in_specs=[
            # all queries as one resident VMEM block
            pl.BlockSpec((batch, dim), lambda b, p, probe, cnt: (0, 0)),
            # arena block selected BY PROBE ID (the scalar-prefetch trick)
            pl.BlockSpec(
                (1, cap_s, dim),
                lambda b, p, probe, cnt: (
                    jnp.maximum(probe[b, p], 0), 0, 0
                ),
            ),
        ],
        # query b's whole [P, cap] output group; revisited over p, flushed
        # when b advances
        out_specs=pl.BlockSpec(
            (1, nprobe, cap_s), lambda b, p, probe, cnt: (b, 0, 0)
        ),
    )
    run = pl.pallas_call(
        functools.partial(_kernel, metric=metric),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, nprobe, cap_s), jnp.float32),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )
    d = run(probe_ids, kernel_counts, q, arena)         # [B, P, cap_s]

    pos = _striped_positions(
        probe_ids, counts, cap_s, slot_stride, slot_offset, global_cap
    )
    return topk_smallest(
        d.reshape(batch, nprobe * cap_s),
        k,
        idx=pos.reshape(batch, nprobe * cap_s),
        approx=approx,
    )


def _grouped_pq_kernel(row_list_ref, counts_ref, qrows_ref, codes_ref,
                       codesq_ref, cbt_ref, anchor_ref, *rest,
                       metric: Metric, k: int, dsub: int, ks: int,
                       emit_full: bool = False, topk_impl: str = "auto"):
    """Grouped ADC scan: PQ decode-staging instead of dtype cast-staging.

    The insight that makes ADC TPU-native: ADC over a list's codes is
    EXACTLY a scan of the PQ-decoded vectors (Σ_j table[b,j,code] =
    ‖q − c_l − r̂‖² with r̂ = concat_j codebook_j[code_j]). Mosaic has no
    gather, so the table lookup becomes per-subspace one-hot MXU matmuls
    staged ONCE per distinct list: decode_T[j·dsub:(j+1)·dsub, :] =
    cbT_j [dsub, ks] × onehot_j [ks, cap]. After staging, each grid step is
    the same [M, D] × [D, cap] dot as the int8 grouped kernel — the decode
    (the expensive part of the reference's per-code shared-memory lookup
    loop, ``engine/kernels.cuh:281-288``) amortizes over every query
    probing the list.

    ``emit_full``: write the masked full [M, cap] distance row instead of
    running the k-pass top-k (whose cost is linear in k — prohibitive for
    the deep shortlists host-store rerank wants); the caller does ONE
    top-k over the materialized rows (measured ~0.1 ms for top-512 of 82K
    columns on v5e — the k-pass tax was the whole bottleneck)."""
    if emit_full:
        out_d_ref, decode_ref, last_ref = rest
        out_s_ref = None
    else:
        out_d_ref, out_s_ref, decode_ref, last_ref = rest
    i = pl.program_id(0)
    list_id = row_list_ref[i]
    nlist = counts_ref.shape[0]
    m_sub = codes_ref.shape[1]
    cap = codes_ref.shape[2]
    safe_l = jnp.minimum(jnp.maximum(list_id, 0), nlist - 1)

    # Sentinel rows (static bound padding — see _grouped_kernel) skip the
    # decode staging AND the dots entirely.
    @pl.when(list_id < nlist)
    def _body():
        @pl.when((i == 0) | (last_ref[0] != list_id))
        def _():
            codes = codes_ref[0].astype(jnp.int32)      # [m, cap]
            for j in range(m_sub):                      # static unroll
                cj = codes[j:j + 1, :]                  # [1, cap]
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (ks, cap), 0) == cj
                ).astype(jnp.float32)                   # [ks, cap]
                dec = jax.lax.dot_general(              # [dsub, cap] MXU
                    cbt_ref[j * dsub:(j + 1) * dsub, :], onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                decode_ref[j * dsub:(j + 1) * dsub, :] = dec
            last_ref[0] = list_id

        q_sub = qrows_ref[0]                            # [M, D] fp32
        dots = jax.lax.dot_general(                     # [M, cap] MXU
            q_sub, decode_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qa = jax.lax.dot_general(                       # [M, 1] q·centroid
            q_sub, anchor_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qx = dots + qa                                  # q·(c_l + r̂)
        if metric == Metric.L2:
            q_sq = jnp.sum(q_sub * q_sub, axis=-1, keepdims=True)
            d = jnp.maximum(
                q_sq - 2.0 * qx + codesq_ref[pl.ds(safe_l % 8, 1), :], 0.0
            )
        elif metric == Metric.INNER_PRODUCT:
            d = -qx
        else:
            d = 1.0 - qx
        if emit_full:
            slot = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            out_d_ref[0] = jnp.where(slot < counts_ref[safe_l], d, jnp.inf)
        else:
            _row_topk(d, counts_ref[safe_l], k, out_d_ref, out_s_ref,
                      topk_impl)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx", "interpret", "m_budget",
                     "slot_stride", "global_capacity", "k_inner",
                     "emit_full", "scan_capacity", "topk_impl"),
)
def scan_probed_codes_pallas_grouped(
    queries: jax.Array,     # [B, D] fp32 (pre-normalized if cosine)
    codes_t: jax.Array,     # [nlist, m, cap] uint8 (TRANSPOSED code arena)
    code_sq: jax.Array,     # [nlist, cap] fp32 ‖c_l + r̂‖² of decoded points
    counts: jax.Array,      # [nlist] int32
    centroids: jax.Array,   # [nlist, D] fp32 coarse centroids (PQ anchors)
    codebooks: jax.Array,   # [m, ks, dsub] fp32
    probe_ids: jax.Array,   # [B, P] int32 (-1 = no probe)
    k: int,
    metric: Metric = Metric.L2,
    approx: bool = False,
    interpret: bool = False,
    m_budget: int | None = None,
    slot_stride: int = 1,
    slot_offset: jax.Array | int = 0,
    global_capacity: int | None = None,
    k_inner: int | None = None,
    emit_full: bool = False,
    scan_capacity: int | None = None,
    topk_impl: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """List-centric grouped Pallas ADC scan — the TPU IVF-PQ fast path.

    Replaces the XLA ``take_along_axis`` ADC lookup (TPU-pathological: 15
    QPS measured at 1M×768 m=96) with the decode-staging grouped kernel
    (see ``_grouped_pq_kernel``). Reads ``m`` bytes/vector instead of the
    int8 arena's ``D`` — the ~8× bandwidth lever (D=768, m=96) that makes
    corpora beyond int8's HBM reach servable from one chip. Distances are
    bit-exact ADC distances (quantized representation, fp32 queries);
    cosine callers convert the L2-space result themselves, as the XLA path
    does (``models/ivf_pq._ivf_pq_search_device``).

    ``k_inner`` (shortlist mode): the in-kernel top-k costs k sequential
    min-extraction passes per grid row, so a deep shortlist (k=128..512
    for host-store exact rerank) pays ~k× the epilogue. With ``k_inner``
    set, each (query, probed list) pair contributes only its top-k_inner
    candidates and the final top-k runs over nprobe·k_inner — no longer
    the exact ADC top-k over the probe union (a candidate ranked below
    k_inner *within its own list* can be lost), which a following exact
    rerank stage absorbs. Leave ``None`` for exact scans. Measured at 20M
    (nlist=8192, uniform queries) the truncation CAPPED recall at the
    k_inner-deep value — clustered corpora put every true neighbor in the
    query's home list, so per-list truncation ≡ global truncation there.

    ``emit_full`` is the deep-shortlist mode that stays EXACT: the kernel
    writes full masked distance rows ([n_rows, m, cap] fp32 transient —
    ~0.8 GB at b=512, nprobe=32, cap=2560) and ONE top-k runs over the
    nprobe·cap union per query (top-512 of 82K columns measured ~0.1 ms
    on v5e; the per-row k-pass, linear in k, was the deep-k bottleneck).
    Overrides ``k_inner``.

    ``topk_impl`` selects the in-kernel row top-k (``_row_topk``), same
    semantics as the flat grouped kernel. The ``auto`` t4 gate rarely
    fires for PQ in practice (list capacities like 384/3200 fail the
    cap%512 alignment), and the tiny-arena probe shows t4 LOSING on
    small grids (nlist=16: 4.1 vs 0.04 ms/call) — bit-exact either way
    (verified on-device), so this is an opt-in perf knob for measured
    cap%512==0 deployments, not a default win."""
    batch, nprobe = probe_ids.shape
    nlist, m_sub, cap = codes_t.shape
    mq, ks, dsub = codebooks.shape
    assert mq == m_sub
    dim = m_sub * dsub
    cap_s = _effective_cap(cap, scan_capacity)
    # Effective in-kernel candidate count: the final top-k needs at least
    # k candidates across nprobe lists, and >cap per list is meaningless.
    ki = k if k_inner is None else min(max(k_inner, -(-k // nprobe)),
                                       cap_s, k)
    global_cap = global_capacity if global_capacity is not None else cap
    kernel_counts = _local_counts(counts, cap, slot_stride, slot_offset)
    n_pairs = batch * nprobe
    if m_budget is None:
        # Inherits the flat kernel's sqrt law (same per-step dot shape
        # after decode staging; PQ-specific m optima not independently
        # swept). Must stay in lockstep with grouped_row_bound.
        m_budget = auto_m_budget(n_pairs, nlist)
    m = m_budget
    # Static row bound — see scan_probed_lists_pallas_grouped.
    n_rows = max(min(n_pairs // m + nlist + 1, n_pairs), 1)
    _check_row_table(n_rows)

    q = queries.astype(jnp.float32)
    pack = _pack_pairs_into_rows(probe_ids, nlist, m, n_rows)
    (_, _, _, _, row_list, qrow_table) = pack
    q_rows = q[jnp.maximum(qrow_table, 0)]              # [n_rows_pad, M, D]
    # codebooks → [dim, ks] with rows j·dsub:(j+1)·dsub = cb_j.T
    cbt = codebooks.transpose(0, 2, 1).reshape(dim, ks).astype(jnp.float32)

    def _blk(i, rl, cnt):
        return jnp.minimum(jnp.maximum(rl[i], 0), cnt.shape[0] - 1)

    def _qblk(i, rl, cnt):
        # Sentinel rows read block 0 → repeated index → DMA elided.
        return jnp.where(rl[i] < cnt.shape[0], i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # row→list, counts
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(
                (1, m, dim), lambda i, rl, cnt: (_qblk(i, rl, cnt), 0, 0)
            ),
            pl.BlockSpec(
                (1, m_sub, cap_s),
                lambda i, rl, cnt: (_blk(i, rl, cnt), 0, 0)
            ),
            pl.BlockSpec(
                (8, cap_s), lambda i, rl, cnt: (_blk(i, rl, cnt) // 8, 0)
            ),
            pl.BlockSpec((dim, ks), lambda i, rl, cnt: (0, 0)),
            pl.BlockSpec(
                (1, 1, dim), lambda i, rl, cnt: (_blk(i, rl, cnt), 0, 0)
            ),
        ],
        out_specs=(
            (pl.BlockSpec((1, m, cap_s), lambda i, rl, cnt: (i, 0, 0)),)
            if emit_full else (
                pl.BlockSpec((1, m, ki), lambda i, rl, cnt: (i, 0, 0)),
                pl.BlockSpec((1, m, ki), lambda i, rl, cnt: (i, 0, 0)),
            )
        ),
        scratch_shapes=[
            pltpu.VMEM((dim, cap_s), jnp.float32),  # decoded block (T)
            pltpu.SMEM((1,), jnp.int32),           # last decoded list id
        ],
    )
    run = pl.pallas_call(
        functools.partial(_grouped_pq_kernel, metric=metric, k=ki,
                          dsub=dsub, ks=ks, emit_full=emit_full,
                          topk_impl=topk_impl),
        grid_spec=grid_spec,
        out_shape=(
            (jax.ShapeDtypeStruct((n_rows, m, cap_s), jnp.float32),)
            if emit_full else (
                jax.ShapeDtypeStruct((n_rows, m, ki), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, m, ki), jnp.int32),
            )
        ),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )
    outs = run(
        row_list, kernel_counts, q_rows, codes_t,
        _pad_rows8(code_sq), cbt,
        centroids.astype(jnp.float32)[:, None, :],
    )
    if emit_full:
        # Gather each pair's full distance row, map (list, slot) to global
        # positions, ONE exact top-k over the whole probe union.
        order, key_sorted, row_of_pair, m_of_pair, _, _ = pack
        pair_d = outs[0][row_of_pair, m_of_pair]       # [BP, cap_s]
        real = (key_sorted[:, None] < nlist) & jnp.isfinite(pair_d)
        pair_d = jnp.where(real, pair_d, jnp.inf)
        slot_logical = (
            jnp.arange(cap_s, dtype=jnp.int32) * slot_stride + slot_offset
        )
        pair_pos = jnp.where(
            real,
            key_sorted[:, None] * global_cap + slot_logical[None, :],
            -1,
        )
        inv = jnp.argsort(order)
        return topk_smallest(
            pair_d[inv].reshape(batch, nprobe * cap_s),
            k,
            idx=pair_pos[inv].reshape(batch, nprobe * cap_s),
            approx=approx,
        )
    out_d, out_s = outs
    return _grouped_epilogue(
        out_d, out_s, pack, batch, nprobe, k, nlist, global_cap,
        slot_stride, slot_offset, approx, k_inner=ki,
    )
