"""Dev-only TPU sweep: build the BASELINE 10M x 768 int8 index once, then
measure QPS/recall across scan impls, batch sizes, and grouped m_budget.

Usage (one TPU process at a time — see CLAUDE.md):
    python scripts/dev_sweep.py --n 10000000 \
        --config pallas_sorted:512 --config pallas_grouped:512:16 ...

Prints one JSON line per config to stdout.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import clustered_corpus, make_oracle_updater, _stage  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dtype", default="int8")
    p.add_argument("--n-batches", type=int, default=20)
    p.add_argument("--max-batch", type=int, default=1024)
    p.add_argument(
        "--config", action="append", default=[],
        help="impl:batch[:m_budget[:flags]], e.g. pallas_grouped:512:16 or "
             "pallas_grouped:512:16:bf16,k1,p16 (flags: bf16 = stage_bf16, "
             "kN = override k for timing isolation, pN = override nprobe, "
             "ip = inner-product metric for timing isolation, inline = "
             "stage_inline experimental kernel variant, cb16 = bf16 "
             "coarse-probe matmul)",
    )
    p.add_argument(
        "--roofline", action="store_true",
        help="per-term roofline accounting for each grouped config: the "
             "kernel's exact per-batch DMA byte model (from the real pack "
             "tables: distinct block loads after same-list elision, live "
             "query rows, outputs) vs chained-timing measurements of the "
             "full pipeline and the coarse term — emits achieved GB/s "
             "against the chip's nominal HBM peak (KERNEL_r05)",
    )
    args = p.parse_args()
    if not args.config:
        args.config = [
            "pallas_sorted:512",
            "pallas_grouped:512:8",
            "pallas_grouped:512:16",
            "pallas_grouped:1024:16",
            "pallas_grouped:1024:32",
        ]

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu import (
        IVFFlatConfig,
        IVFFlatIndex,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
        _ivf_search_device,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops import pallas_scan
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import (
        Metric,
        pairwise_distance,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.topk import (
        topk_smallest,
    )

    key = jax.random.PRNGKey(42)
    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype=args.dtype,
        train_sample_per_list=128, max_capacity_factor=4.0,
    )
    idx = IVFFlatIndex(cfg)
    # Size the query pool to the LARGEST configured batch — slicing a
    # smaller pool silently shrinks the actual batch while QPS still
    # multiplies by the nominal one (measured: an 8× inflation).
    nq = max([args.max_batch] + [int(c.split(":")[1]) for c in args.config])

    chunk_n = 500_000
    mean = args.n // args.nlist
    capacity = -(-int(mean * 1.35) // 128) * 128
    starts = list(range(0, args.n, chunk_n))
    kx = key
    chunk_keys = []
    for _ in starts:
        kx, sub = jax.random.split(kx)
        chunk_keys.append(sub)
    # ONE global mixture shared by every chunk (see bench.clustered_corpus).
    centers_g = jax.random.normal(
        jax.random.PRNGKey(1234), (args.nlist, args.dim), jnp.float32
    )

    # Oracle in 512-query slices: the [nq, 500K] distance intermediate at
    # nq=2048 is 4 GB — alongside the 10 GB arena that OOMs the chip.
    oracle_update = make_oracle_updater(args.k)
    q_slice = 512
    gt_d = [
        jnp.full((q_slice, args.k), jnp.inf, jnp.float32)
        for _ in range(nq // q_slice)
    ]
    gt_i = [
        jnp.full((q_slice, args.k), -1, jnp.int64)
        for _ in range(nq // q_slice)
    ]
    chunk_queries = None
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(7))
    t0 = time.time()
    for ci, start in enumerate(starts):
        m = min(chunk_n, args.n - start)
        _stage(f"chunk {ci}/{len(starts)}")
        xc, _ = clustered_corpus(
            chunk_keys[ci], m, args.dim, n_clusters=args.nlist, noise=0.25,
            centers=centers_g, base=start,
        )
        xc.block_until_ready()
        if ci == 0:
            idx.train_from_device(xc)
            jax.block_until_ready(idx.centroids)
            qi0 = jax.random.randint(kq1, (nq,), 0, m)
            chunk_queries = xc[qi0].astype(jnp.float32) + \
                0.1 * jax.random.normal(kq2, (nq, args.dim), jnp.float32)
        idx.append_balanced(
            xc, ids=np.arange(start, start + m, dtype=np.uint64),
            capacity=capacity,
        )
        jax.block_until_ready(idx.arena.arena)
        for qi in range(nq // q_slice):
            s = slice(qi * q_slice, (qi + 1) * q_slice)
            gt_d[qi], gt_i[qi] = oracle_update(
                gt_d[qi], gt_i[qi], chunk_queries[s], xc, jnp.int64(start)
            )
            gt_d[qi].block_until_ready()
        del xc
    truth = np.concatenate([np.asarray(g) for g in gt_i])
    _stage(f"build done in {time.time()-t0:.0f}s cap={idx.arena.capacity} "
           f"counts_max={idx.arena.counts_max} "
           f"scan_cap={idx.arena.scan_capacity_hint()} "
           f"arena_gb={idx.arena.nbytes_device()/(1<<30):.2f}")

    arena = idx.arena
    sargs = (idx.centroids, arena.arena, arena.arena_sq, arena.counts)

    for spec in args.config:
        parts = spec.split(":")
        impl, batch = parts[0], int(parts[1])
        m_budget = int(parts[2]) if len(parts) > 2 and parts[2] else None
        flags = set(parts[3].split(",")) if len(parts) > 3 else set()
        stage_bf16 = "bf16" in flags
        stage_inline = "inline" in flags
        coarse_bf16 = "cb16" in flags
        metric_run = Metric.INNER_PRODUCT if "ip" in flags else Metric.L2
        k_run = args.k
        nprobe_run = args.nprobe
        for f in flags:
            if f.startswith("k") and f[1:].isdigit():
                k_run = int(f[1:])
            if f.startswith("p") and f[1:].isdigit():
                nprobe_run = int(f[1:])
        q = chunk_queries[:batch]

        if impl == "pallas_grouped" and (m_budget is not None or flags):
            # stage_inline: explicit flag wins; otherwise the kernel's
            # auto gate decides. fullcap disables the occupied-prefix
            # bound for A/B against the full-capacity scan.
            inline_opt = True if stage_inline else (
                False if "noinline" in flags else None
            )
            scan_cap = None if "fullcap" in flags else \
                arena.scan_capacity_hint()
            topk_impl = ("t4" if "t4" in flags
                         else "passes" if "passes" in flags else "auto")

            # One jitted program per config: an eager coarse stage costs a
            # relay dispatch per OP — harmless for the 2-op lax.top_k path
            # but ruinous for multi-op selectors (the jnp tournament eagerly
            # dispatched ~50 ops/batch: measured 153.9K -> 37K QPS).
            # The arena arrays MUST be jit ARGUMENTS: closure-captured
            # device arrays embed as HLO constants and the 9.8 GB arena
            # blows the relay's compile-request size cap (HTTP 413).
            @functools.partial(
                jax.jit,
                static_argnames=("_m", "_bf", "_k", "_np", "_met", "_inl",
                                 "_sc", "_tk", "_cb"),
            )
            def _dev_search(qq, cents, arena_a, arena_sq, counts, scale,
                            anchors, _m, _bf, _k, _np, _met, _inl, _sc,
                            _tk, _cb):
                qf = qq.astype(jnp.float32)
                # Probe with the scan's metric (IP probes by IP, like the
                # library path); cosine isn't swept here.
                coarse_met = (Metric.INNER_PRODUCT
                              if _met == Metric.INNER_PRODUCT else Metric.L2)
                coarse = pairwise_distance(
                    qf, cents, coarse_met,
                    compute_dtype=jnp.bfloat16 if _cb else None,
                )
                _, probe = topk_smallest(coarse, _np)
                return pallas_scan.scan_probed_lists_pallas_grouped(
                    qf, arena_a, arena_sq, counts,
                    probe.astype(jnp.int32), _k, _met,
                    m_budget=_m, arena_scale=scale,
                    arena_anchors=anchors, stage_bf16=_bf,
                    stage_inline=_inl, scan_capacity=_sc, topk_impl=_tk,
                    interpret=jax.default_backend() != "tpu",
                )

            def dev_search(qq, _m=m_budget, _bf=stage_bf16, _k=k_run,
                           _np=nprobe_run, _met=metric_run,
                           _inl=inline_opt, _sc=scan_cap, _tk=topk_impl,
                           _cb=coarse_bf16):
                return _dev_search(
                    qq, idx.centroids, arena.arena, arena.arena_sq,
                    arena.counts, arena.arena_scale, arena.anchors,
                    _m=_m, _bf=_bf, _k=_k, _np=_np, _met=_met, _inl=_inl,
                    _sc=_sc, _tk=_tk, _cb=_cb,
                )
        else:
            def dev_search(qq, _impl=impl, _bf=stage_bf16, _k=k_run,
                           _np=nprobe_run):
                d, pos, _ = _ivf_search_device(
                    qq, *sargs, _np, _k, Metric.L2, _impl,
                    False, 0, None, arena.arena_scale, arena.anchors,
                    None, _bf,
                )
                return d, pos

        _stage(f"{spec}: compile")
        tc = time.time()
        d, pos = dev_search(q)
        jax.block_until_ready((d, pos))
        compile_s = time.time() - tc

        got = idx.arena.positions_to_ids(np.asarray(pos)).astype(np.int64)
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(got, truth[:batch])
        ])

        _stage(f"{spec}: throughput")
        # Auto-scale batch count so small batches measure enough queries.
        n_b = max(args.n_batches, min(-(-40960 // batch), 640))
        t1 = time.time()
        results = [dev_search(q) for _ in range(n_b)]
        jax.block_until_ready(results)
        dt = time.time() - t1
        qps = n_b * batch / dt
        lats = []
        for _ in range(20):
            t2 = time.time()
            jax.block_until_ready(dev_search(q))
            lats.append((time.time() - t2) * 1000)
        lats = np.sort(np.array(lats))
        out_row = {
            "config": spec, "qps": round(qps, 1),
            "recall": round(float(recall), 4),
            "batch_ms_p50": round(float(np.median(lats)), 1),
            "batch_ms_p99": round(float(lats[-1]), 1),
            "pipelined_ms_per_batch": round(dt / n_b * 1000, 1),
            "n_batches": n_b,
            "compile_s": round(compile_s, 1),
        }
        if args.roofline and impl == "pallas_grouped":
            cap_r = (
                arena.capacity if "fullcap" in flags
                else arena.scan_capacity_hint()
            )
            out_row["roofline"] = _roofline(
                q, idx, arena, batch, nprobe_run, k_run, m_budget, cap_r,
                args,
            )
        print(json.dumps(out_row), flush=True)


def _roofline(q, idx, arena, batch, nprobe, k, m_budget, scan_cap, args):
    """Exact per-batch DMA byte model from the kernel's own pack tables +
    chained-timing term measurements (the relay under-measures small
    programs without a data dependency chain — CLAUDE.md).

    Terms: coarse (probe matmul + tournament top-nprobe) is measured
    directly; scan+merge = total − coarse. The byte model counts what the
    grouped kernel's BlockSpecs actually move: one [cap_s, D] int8 block
    per DISTINCT grid row list id (consecutive same-list rows elide the
    DMA), per-row [M, D] fp32 query blocks, per-row anchor rows, and the
    [rows, M, K] candidate outputs the epilogue reads back."""
    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu.ops import pallas_scan
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import (
        Metric,
        pairwise_distance,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.topk import (
        topk_smallest,
    )

    nlist, cap, dim = arena.arena.shape
    cap_s = scan_cap or cap
    m = m_budget or pallas_scan.auto_m_budget(batch * nprobe, nlist)
    n_pairs = batch * nprobe
    n_rows = max(min(n_pairs // m + nlist + 1, n_pairs), 1)

    # The real probe table → the kernel's real pack.
    coarse = pairwise_distance(q, idx.centroids, Metric.L2)
    _, probe = topk_smallest(coarse, nprobe)
    pack = pallas_scan._pack_pairs_into_rows(
        probe.astype(jnp.int32), nlist, m, n_rows
    )
    row_list = np.asarray(pack[4])
    valid = row_list < nlist
    prev_differs = np.concatenate([[True], row_list[1:] != row_list[:-1]])
    distinct_blocks = int(np.sum(valid & prev_differs))
    n_live_rows = int(valid.sum())

    itemsize = arena.arena.dtype.itemsize
    per_slot = dim * itemsize + 4          # codes + fp32 norms
    if arena.arena_scale is not None:
        per_slot += 4                      # per-row scales
    arena_bytes = distinct_blocks * cap_s * per_slot
    q_bytes = n_live_rows * m * dim * 4
    anchor_bytes = (
        n_live_rows * dim * 4 if arena.anchors is not None else 0
    )
    out_bytes = row_list.shape[0] * m * k * 8  # fp32 dist + i32 slot
    scan_bytes = arena_bytes + q_bytes + anchor_bytes + out_bytes

    # Chained-timing: each step's input depends on the previous step's
    # scalar, so the relay cannot overlap or drop light programs. Device
    # arrays ride as jit ARGUMENTS — closure capture embeds the 10 GB
    # arena as HLO constants (blows the relay compile request).
    def _chained_ms(step, iters=16):
        s = jnp.zeros((), jnp.float32)
        s = step(s)
        s.block_until_ready()              # warm/compile
        t0 = time.time()
        s = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            s = step(s)
        float(s)
        return (time.time() - t0) / iters * 1000

    @jax.jit
    def _coarse_step(s, qq0, cents):
        qq = qq0 + s * 0.0
        vals, _ = topk_smallest(
            pairwise_distance(qq, cents, Metric.L2), nprobe
        )
        return s + vals.sum()

    @functools.partial(
        jax.jit, static_argnames=("_m", "_sc", "_interp"),
    )
    def _full_step(s, qq0, cents, arena_a, arena_sq, counts, scale,
                   anchors, _m, _sc, _interp):
        qq = qq0 + s * 0.0
        c = pairwise_distance(qq, cents, Metric.L2)
        _, pr = topk_smallest(c, nprobe)
        d, _pos = pallas_scan.scan_probed_lists_pallas_grouped(
            qq, arena_a, arena_sq, counts,
            pr.astype(jnp.int32), k, Metric.L2, m_budget=_m,
            arena_scale=scale, arena_anchors=anchors,
            scan_capacity=_sc, interpret=_interp,
        )
        return s + jnp.where(jnp.isfinite(d), d, 0.0).sum()

    interp = jax.default_backend() != "tpu"
    coarse_ms = _chained_ms(
        lambda s: _coarse_step(s, q, idx.centroids)
    )
    total_ms = _chained_ms(
        lambda s: _full_step(
            s, q, idx.centroids, arena.arena, arena.arena_sq,
            arena.counts, arena.arena_scale, arena.anchors,
            _m=m_budget, _sc=scan_cap, _interp=interp,
        )
    )
    scan_ms = max(total_ms - coarse_ms, 1e-6)
    peak_gbps = 819.0                      # v5e nominal HBM bandwidth
    achieved = scan_bytes / (scan_ms / 1e3) / 1e9
    return {
        "m": m, "cap_s": cap_s,
        "grid_rows": int(row_list.shape[0]),
        "live_rows": n_live_rows,
        "distinct_block_loads": distinct_blocks,
        "bytes_per_batch": {
            "arena_blocks": arena_bytes,
            "query_rows": q_bytes,
            "anchors": anchor_bytes,
            "candidate_out": out_bytes,
            "total": scan_bytes,
        },
        "measured_ms": {
            "total_chained": round(total_ms, 2),
            "coarse_chained": round(coarse_ms, 2),
            "scan_plus_merge": round(scan_ms, 2),
        },
        "dma_floor_ms_at_peak": round(scan_bytes / peak_gbps / 1e6, 2),
        "achieved_gbps": round(achieved, 1),
        "pct_of_hbm_peak": round(100 * achieved / peak_gbps, 1),
        "peak_gbps_nominal": peak_gbps,
    }


if __name__ == "__main__":
    main()
