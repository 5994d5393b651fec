"""Headline benchmark: IVF-Flat QPS at recall@10 ≥ 0.95 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: 45,000 QPS at p99 < 6 ms (reference's self-reported A100-40GB row,
README.md:42 — never actually measured there; no benchmark artifacts exist in
the reference repo, and recall was never measured at all).

Workload: BASELINE target parameters (nlist=4096, nprobe=32, k=10, 768D)
scaled to the single available chip (N defaults to 1M so f32 ground-truth +
bf16 arena fit in one v5e's 16 GB HBM; the 10M point runs sharded on v5e-8).

Data model: mixture of gaussians, one mode per list (SIFT-style clustered
corpus; isotropic gaussian data has no coarse-quantizer structure and no
ANN system can probe meaningfully on it — see the ``--clusters-per-list``
help for the measured geometry study). Everything is generated, built, and
queried on device: the networked-TPU harness has ~0.04 GB/s H2D, so corpus
upload would dominate and measure nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _stage(msg: str) -> None:
    """Progress to stderr (stdout carries only the final JSON line)."""
    print(f"[bench {time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _corpus_gen(k, base, centers, noise, idx):
    """Round-robin cluster membership: every natural cluster has exactly
    n/n_clusters points, so a coarse quantizer that locks onto the cluster
    structure yields balanced inverted lists — mimicking a deduplicated
    real-world embedding corpus rather than a Zipf mess."""
    import jax
    import jax.numpy as jnp

    ci = (base + idx) % centers.shape[0]
    pts = centers[ci] + noise * jax.random.normal(
        k, (idx.shape[0], centers.shape[1]), jnp.float32
    )
    # bf16 corpus: halves HBM footprint; the index stores bf16 anyway,
    # and the oracle ranks the same bf16-rounded corpus exactly.
    return pts.astype(jnp.bfloat16)


def _corpus_gen_skew(k, base, centers, cum, n_total, noise, idx):
    """Zipf-skewed membership, chunk-coherent: global row g is mapped
    through a fixed bijection perm(g) = (g * P) mod n (P coprime to n, so
    every residue appears exactly once) and bucketed by the cumulative
    mode-size table ``cum`` — mode j receives exactly cum[j]-cum[j-1]
    rows regardless of how the build is chunked."""
    import jax
    import jax.numpy as jnp

    g = (base + idx).astype(jnp.uint32)
    # 2654435761 = Knuth's multiplicative-hash constant; coprime to any
    # n not divisible by it (asserted host-side in clustered_corpus).
    r = (g * jnp.uint32(2654435761)) % jnp.uint32(n_total)
    ci = jnp.searchsorted(cum, r.astype(jnp.int64), side="right")
    pts = centers[ci] + noise * jax.random.normal(
        k, (idx.shape[0], centers.shape[1]), jnp.float32
    )
    return pts.astype(jnp.bfloat16)


_corpus_gen_jit = None
_corpus_gen_skew_jit = None


def zipf_cumulative(n, n_modes, s=1.0):
    """Exact zipf mode sizes summing to n: size_j ∝ (j+1)^-s, largest
    remainders distributed to the head. Returns int64 cumulative table
    [n_modes] with cum[-1] == n."""
    w = (np.arange(1, n_modes + 1, dtype=np.float64)) ** (-s)
    sizes = np.floor(w / w.sum() * n).astype(np.int64)
    sizes[: int(n - sizes.sum())] += 1
    assert sizes.sum() == n
    return np.cumsum(sizes)


def clustered_corpus(key, n, dim, n_clusters, noise, chunk=250_000,
                     centers=None, base=0, skew_cum=None, n_total=None):
    """On-device mixture-of-gaussians corpus + cluster assignment.

    Chunked builds MUST pass shared ``centers`` (and the chunk's global row
    offset as ``base``) so every chunk draws from the SAME mixture —
    per-chunk centers would give the corpus nlist·n_chunks latent clusters,
    and a quantizer trained on one chunk probes foreign chunks at chance
    (observed: recall 0.064 at 10M/20 chunks before this contract).

    The generator is jitted ONCE at module scope with centers/base as
    traced arguments: a per-call closure would inline the multi-MB centers
    array as an HLO constant and recompile for every chunk — ~10 min of
    remote-compiler round trips over a 40-chunk build (measured)."""
    import jax
    import jax.numpy as jnp

    global _corpus_gen_jit, _corpus_gen_skew_jit
    if _corpus_gen_jit is None:
        _corpus_gen_jit = jax.jit(_corpus_gen, static_argnames=("noise",))
    if _corpus_gen_skew_jit is None:
        _corpus_gen_skew_jit = jax.jit(
            _corpus_gen_skew, static_argnames=("n_total", "noise")
        )

    kc, kx = jax.random.split(key)
    if centers is None:
        centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
    centers = jnp.asarray(centers)
    if skew_cum is not None:
        n_total = int(n_total if n_total is not None else n)
        assert n_total % 2654435761 != 0 and n_total < 2**31
        skew_cum = jnp.asarray(skew_cum, jnp.int64)

    chunks = []
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        kx, sub = jax.random.split(kx)
        if skew_cum is None:
            chunks.append(_corpus_gen_jit(
                sub, jnp.int32(base + start), centers, noise, jnp.arange(m)
            ))
        else:
            chunks.append(_corpus_gen_skew_jit(
                sub, jnp.uint32(base + start), centers, skew_cum,
                n_total, noise, jnp.arange(m)
            ))
    return jnp.concatenate(chunks, axis=0), centers


def make_oracle_updater(k: int):
    """Device-side exact ground truth via k min-extraction passes.

    Exact TopK over hundreds of thousands of columns stalls XLA's sort-based
    lowering, and downloading multi-GB corpora for a host oracle crawls at
    relay H2D speeds. k extraction passes (argmin + mask) over the [B, C]
    chunk distances are exact, cheap (k reduction sweeps), and keep the
    ground-truth computation entirely on device.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def update(best_d, best_i, q, xc, base):
        qf = q.astype(jnp.float32)
        xf = xc.astype(jnp.float32)
        d = (
            jnp.sum(qf * qf, -1, keepdims=True)
            - 2.0 * qf @ xf.T
            + jnp.sum(xf * xf, -1)[None, :]
        )
        col = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]

        def extract(j, carry):
            d_cur, bd, bi = carry
            val = jnp.min(d_cur, axis=1)
            idx = jnp.argmin(d_cur, axis=1)
            bd = bd.at[:, j].set(val)
            bi = bi.at[:, j].set(base + idx.astype(jnp.int64))
            d_cur = jnp.where(col == idx[:, None], jnp.inf, d_cur)
            return d_cur, bd, bi

        nd = jnp.full_like(best_d, jnp.inf)
        ni = jnp.full_like(best_i, -1)
        _, nd, ni = jax.lax.fori_loop(0, k, extract, (d, nd, ni))
        # merge with running top-k (tiny: 2k columns)
        md = jnp.concatenate([best_d, nd], axis=1)
        mi = jnp.concatenate([best_i, ni], axis=1)
        neg, cols = jax.lax.top_k(-md, k)
        return -neg, jnp.take_along_axis(mi, cols, axis=1)

    return update


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=0,
                   help="coarse probes per query; 0 (default) = auto from "
                        "measured probe coverage: the smallest candidate "
                        "covering >=99%% of the exact top-k's lists "
                        "(IVFFlatIndex.calibrate_nprobe logic, reusing "
                        "this bench's exact oracle). Measured at the 10M "
                        "headline: coverage@16 ~= coverage@32 ~= 1.0, so "
                        "auto picks 16 and nearly halves scan bandwidth "
                        "at identical recall (0.9878)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--n-batches", type=int, default=40)
    p.add_argument("--m-budget", type=int, default=0,
                   help="pallas_grouped query rows per grid step "
                        "(0 = auto from batch/nlist)")
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke config (CI / CPU)")
    p.add_argument("--dtype", default="int8",
                   choices=["bfloat16", "int8", "float32"],
                   help="arena storage dtype (int8 halves scan bandwidth "
                        "and fits 10M x 768 on one v5e chip)")
    p.add_argument("--force-chunked", action="store_true",
                   help="exercise the chunked-build path regardless of size")
    p.add_argument("--mesh1", type=int, default=1,
                   help="1 (default): after the headline measurement, "
                        "publish the arena onto a 1-device mesh (zero-copy)"
                        " and record the SPMD serving path's QPS/recall "
                        "parity on real silicon (detail.mesh1). 0 = skip")
    p.add_argument("--clusters-per-list", type=int, default=1,
                   help="mixture modes per inverted list (default 1: one "
                        "gaussian ball per list — the stable, "
                        "probe-friendly benchmark geometry). >1 builds a "
                        "HIERARCHY (sub-modes offset 0.4/coord around "
                        "each center); measured at 1.2M/1024: flat iid "
                        "extra modes break probing outright (recall 0.55 "
                        "— near-equidistant to every centroid in 768-D) "
                        "and even hierarchical sub-modes cost ~7% probe "
                        "recall (0.926 bf16) because 10-iter k-means "
                        "anchors families unevenly. Single-ball recall is "
                        "quantization-bound instead (int8 0.960 / bf16 "
                        "0.969 at 1.2M)")
    p.add_argument("--skew", default="none", choices=["none", "zipf"],
                   help="mixture-mode popularity: none = round-robin "
                        "(every mode n/n_modes rows); zipf = mode sizes "
                        "proportional to rank^-s (--skew-s), the hostile "
                        "'Zipf mess' geometry — k-means must adapt "
                        "centroid density and the packer must absorb "
                        "capacity overflow via guarded spill. Queries "
                        "are drawn uniformly over ROWS, so the query "
                        "load inherits the same skew")
    p.add_argument("--split-threshold", type=float, default=1.5,
                   help="coarse-quantizer overfull trigger (x mean train "
                        "count; bisecting clone reseeds). Tightening it "
                        "below the 1.35x-mean chunked-build capacity "
                        "clamp MEASURED WORSE on zipf (2M x 64 CPU diag: "
                        "recall 0.975 vs 0.995, full lists 201 vs 72 — "
                        "the extra clone churn orphans more modes than "
                        "the overflow it prevents); keep 1.5 unless "
                        "re-measured")
    p.add_argument("--assign-choices", type=int, default=4,
                   help="balanced-assignment spill depth (top-t nearest "
                        "lists a row may land in); deeper walks measured "
                        "no gain over 4 on zipf heads (see "
                        "--split-threshold)")
    p.add_argument("--skew-s", type=float, default=1.0,
                   help="zipf exponent (1.0: the largest of 4096 modes "
                        "holds ~11%% of the corpus)")
    p.add_argument("--multi-assign-eps", type=float, default=0.0,
                   help=">0 stores a SECOND copy of rows whose 2nd-nearest "
                        "centroid passes d2 <= (1+eps)^2*d1 (the zipf "
                        "coverage-bound falsification experiment, "
                        "HOSTILE_r04): replicas lift probe coverage on "
                        "dense head modes at the cost of arena HBM; "
                        "search scans 2k and dedups ids. Forces the "
                        "chunked build path")
    p.add_argument("--multi-assign-budget", type=float, default=1.0,
                   help="cap on replicas per chunk (fraction of chunk "
                        "rows); only the tightest d2/d1 ratios keep their "
                        "copy — bounds arena HBM on skewed corpora")
    p.add_argument("--capacity-factor", type=float, default=1.35,
                   help="chunked-build per-list capacity clamp (x mean "
                        "rows/list); raise with --multi-assign-eps to "
                        "leave slack for the replicas")
    p.add_argument("--scan", default=os.environ.get("VDB_SCAN", "pallas_grouped"),
                   choices=["gather", "ragged", "pallas", "pallas_sorted", "pallas_grouped"],
                   help="scan implementation (pallas: DMA-pipelined "
                        "kernel, the TPU fast path; ragged stalls this "
                        "harness's remote compiler)")
    args = p.parse_args()
    if args.quick:
        # nprobe stays 0 → the auto-calibration path runs in CI too.
        args.n, args.dim, args.nlist = 50_000, 64, 128
        args.batch, args.n_batches = 64, 5

    import jax

    # Optional persistent compilation cache (set JAX_COMPILATION_CACHE_DIR).
    # Off by default: on remote-compile TPU runtimes the cache round trip
    # has been observed to stall large compiles.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # noqa: BLE001 — cache is an optimization only
            pass

    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu import (
        IVFFlatConfig,
        IVFFlatIndex,
        SearchParams,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
        _ivf_search_device,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric

    if jax.default_backend() != "tpu" and args.scan.startswith("pallas"):
        # Mosaic kernels need a TPU; --quick CI runs fall back to XLA.
        args.scan = "gather"

    cpl = max(args.clusters_per_list, 1)
    n_modes = args.nlist * cpl
    skew_cum = (zipf_cumulative(args.n, n_modes, args.skew_s)
                if args.skew == "zipf" else None)

    def make_centers():
        """Hierarchical mixture centers [n_modes, dim]: sub-mode j orbits
        super-cluster j // cpl. Geometry (768-D): intra-sub spread² ≈ 96,
        sub separation² ≈ 245, super separation² ≈ 1536 — k-means (nlist
        centroids) locks onto the supers (clean probing) while each list
        holds cpl resolved sub-modes (realistic local density)."""
        ks, ko = jax.random.split(jax.random.PRNGKey(1234))
        sup = jax.random.normal(ks, (args.nlist, args.dim), jnp.float32)
        if cpl == 1:
            return sup
        return sup[jnp.arange(n_modes) // cpl] + 0.4 * jax.random.normal(
            ko, (n_modes, args.dim), jnp.float32
        )

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype=args.dtype,
        train_sample_per_list=128, max_capacity_factor=4.0,
        split_threshold=args.split_threshold,
        assign_choices=args.assign_choices,
        multi_assign_eps=args.multi_assign_eps,
        multi_assign_budget=args.multi_assign_budget,
    )
    idx = IVFFlatIndex(cfg)
    itemsize = 2  # bf16 corpus chunks
    chunked = (
        args.force_chunked
        or args.multi_assign_eps > 0  # replication lives in append_balanced
        or args.n * args.dim * itemsize > 4 << 30
    )
    x_host = None
    chunk_build_s: list = []
    if not chunked:
        # One (even-sized) natural cluster per list with moderate spread:
        # the trained quantizer aligns with the structure, keeping lists
        # balanced (capacity ≈ mean → minimal padding → minimal bandwidth).
        _stage("generating corpus")
        x, centers = clustered_corpus(
            key, args.n, args.dim, n_clusters=n_modes, noise=0.25,
            centers=make_centers(), skew_cum=skew_cum, n_total=args.n,
        )
        x.block_until_ready()
        del centers
        t_gen = time.time() - t0
        t0 = time.time()
        _stage("training coarse quantizer")
        idx.train_from_device(x)
        jax.block_until_ready(idx.centroids)
        t_train = time.time() - t0
        t0 = time.time()
        _stage("bulk build")
        idx.build_from_device(x)
        jax.block_until_ready(idx.arena.arena)
        t_build = time.time() - t0
    else:
        # Chunked build: the corpus exceeds comfortable device residency
        # (e.g. the full 10M×768 baseline config). Chunk generation is
        # keyed deterministically, so two passes see identical data:
        # pass 1 extracts query base rows spread across ALL chunks (not
        # just chunk 0); pass 2 regenerates each chunk to train → balanced
        # append → exact-oracle update, never holding two chunks at once.
        chunk_n = 500_000
        mean = args.n // args.nlist
        capacity = -(-int(mean * args.capacity_factor) // 128) * 128
        t_gen = t_train = t_build = 0.0
        chunk_build_s: list = []
        starts = list(range(0, args.n, chunk_n))
        kx = key
        chunk_keys = []
        for _ in starts:
            kx, sub = jax.random.split(kx)
            chunk_keys.append(sub)
        # ONE global mixture shared by every chunk (see clustered_corpus).
        centers_g = make_centers()

        # Query plan: args.batch corpus rows sampled uniformly over [0, n).
        kq1, kq2 = jax.random.split(jax.random.PRNGKey(7))
        qi_global = np.sort(np.asarray(
            jax.random.randint(kq1, (args.batch,), 0, args.n)
        ))
        q_base = np.zeros((args.batch, args.dim), np.float32)
        _stage("pass 1: sampling query rows across all chunks")
        for ci, start in enumerate(starts):
            m = min(chunk_n, args.n - start)
            sel = np.flatnonzero(
                (qi_global >= start) & (qi_global < start + m)
            )
            if sel.size == 0:
                continue
            tg = time.time()
            xc, _ = clustered_corpus(
                chunk_keys[ci], m, args.dim, n_clusters=n_modes,
                noise=0.25, centers=centers_g, base=start,
                skew_cum=skew_cum, n_total=args.n,
            )
            q_base[sel] = np.asarray(
                xc[jnp.asarray(qi_global[sel] - start)].astype(jnp.float32)
            )
            t_gen += time.time() - tg
            del xc
        chunk_queries = jnp.asarray(q_base) + 0.1 * jax.random.normal(
            kq2, (args.batch, args.dim), jnp.float32
        )

        # Oracle in 512-query slices: the [batch, chunk] fp32 distance
        # intermediate at batch=8192 would be 16 GB — OOM next to the arena.
        oracle_update = make_oracle_updater(args.k)
        q_slice = min(512, args.batch)
        n_slices = -(-args.batch // q_slice)
        gt_d = [jnp.full((q_slice, args.k), jnp.inf, jnp.float32)
                for _ in range(n_slices)]
        gt_i = [jnp.full((q_slice, args.k), -1, jnp.int64)
                for _ in range(n_slices)]
        q_pad = jnp.pad(
            chunk_queries, ((0, n_slices * q_slice - args.batch), (0, 0))
        )
        for ci, start in enumerate(starts):
            m = min(chunk_n, args.n - start)
            _stage(f"chunk {ci}: generate {m}")
            tg = time.time()
            xc, _ = clustered_corpus(
                chunk_keys[ci], m, args.dim, n_clusters=n_modes,
                noise=0.25, centers=centers_g, base=start,
                skew_cum=skew_cum, n_total=args.n,
            )
            xc.block_until_ready()
            t_gen += time.time() - tg
            if ci == 0:
                tt = time.time()
                _stage("training coarse quantizer (chunk 0)")
                idx.train_from_device(xc)
                jax.block_until_ready(idx.centroids)
                t_train = time.time() - tt
            tb = time.time()
            _stage(f"chunk {ci}: balanced append")
            idx.append_balanced(
                xc,
                ids=np.arange(start, start + m, dtype=np.uint64),
                capacity=capacity,
            )
            jax.block_until_ready(idx.arena.arena)
            chunk_build_s.append(time.time() - tb)
            t_build += chunk_build_s[-1]
            # exact ground truth, updated on device (no corpus download)
            for qi in range(n_slices):
                s = slice(qi * q_slice, (qi + 1) * q_slice)
                gt_d[qi], gt_i[qi] = oracle_update(
                    gt_d[qi], gt_i[qi], q_pad[s], xc, jnp.int64(start)
                )
                gt_d[qi].block_until_ready()
            del xc
        chunked_truth = np.concatenate(
            [np.asarray(g) for g in gt_i]
        )[: args.batch]
        chunked_truth_d = np.concatenate(
            [np.asarray(g) for g in gt_d]
        )[: args.batch]
        x_host = None
        x = None
    cnts = np.asarray(idx.arena.counts)
    _stage(
        f"built: capacity={idx.arena.capacity} counts p50={int(np.percentile(cnts, 50))} "
        f"p99={int(np.percentile(cnts, 99))} max={int(cnts.max())} "
        f"arena_gb={idx.arena.nbytes_device() / (1 << 30):.2f}"
    )

    # Queries: perturbed corpus points (standard ANN-benchmark style).
    if chunked:
        queries = chunk_queries
    else:
        kq1, kq2 = jax.random.split(jax.random.PRNGKey(7))
        n_q = args.batch
        qi_h = np.asarray(jax.random.randint(kq1, (n_q,), 0, args.n))
        base = np.asarray(
            jax.device_get(x[jnp.asarray(qi_h)])
        ).astype(np.float32)
        queries = jnp.asarray(base) + 0.1 * jax.random.normal(
            kq2, (n_q, args.dim), jnp.float32
        )

    search_args = (
        idx.centroids, idx.arena.arena, idx.arena.arena_sq, idx.arena.counts,
    )

    # Multi-assignment arenas scan a doubled shortlist (a replicated row
    # can appear once per copy) and dedup ids host-side — same contract as
    # IVFFlatIndex.search.
    k_dev = 2 * args.k if args.multi_assign_eps > 0 else args.k

    def device_search(q):
        d, pos, probes = _ivf_search_device(
            q, *search_args, min(args.nprobe, args.nlist), k_dev,
            Metric.L2, args.scan, False, 0, None, idx.arena.arena_scale,
            idx.arena.anchors, args.m_budget or None,
            scan_capacity=idx.arena.scan_capacity_hint(),
        )
        return d, pos, probes

    # Exact oracle FIRST: auto-nprobe calibration derives from it.
    _stage("exact oracle")
    if chunked:
        true_pos = chunked_truth
        truth_d = chunked_truth_d
    else:
        upd = make_oracle_updater(args.k)
        q_slice = min(512, args.batch)
        n_slices = -(-args.batch // q_slice)
        q_pad = jnp.pad(
            queries, ((0, n_slices * q_slice - args.batch), (0, 0))
        )
        gt_i, gt_dl = [], []
        step_n = 500_000
        for qi in range(n_slices):
            s = slice(qi * q_slice, (qi + 1) * q_slice)
            sd = jnp.full((q_slice, args.k), jnp.inf, jnp.float32)
            si = jnp.full((q_slice, args.k), -1, jnp.int64)
            for start in range(0, args.n, step_n):
                sd, si = upd(
                    sd, si, q_pad[s],
                    jax.lax.dynamic_slice_in_dim(
                        x, start, min(step_n, args.n - start)
                    ) if args.n - start >= step_n else x[start:],
                    jnp.int64(start),
                )
            sd.block_until_ready()
            gt_i.append(np.asarray(si))
            gt_dl.append(np.asarray(sd))
        true_pos = np.concatenate(gt_i)[: args.batch]
        truth_d = np.concatenate(gt_dl)[: args.batch]
    cap = idx.arena.capacity
    truth = np.asarray(true_pos)

    # Map each true id to its resident list via the host id table — shared
    # by the auto-nprobe calibration and the probe-coverage report.
    ids_tab = idx.arena.ids.reshape(-1)
    order_ids = np.argsort(ids_tab)
    sorted_ids = ids_tab[order_ids]
    locs = np.clip(
        np.searchsorted(sorted_ids, truth.astype(np.uint64)),
        0, sorted_ids.size - 1,
    )
    matched = sorted_ids[locs] == truth.astype(np.uint64)
    true_list = order_ids[locs] // cap
    # Multi-assignment: a true id may have a SECOND resident copy
    # (adjacent in the sorted table). Coverage/auto-nprobe must count a
    # true neighbor as covered when EITHER copy's list is probed.
    matched2 = np.zeros_like(matched)
    true_list2 = true_list
    if args.multi_assign_eps > 0:
        locs2 = np.minimum(locs + 1, sorted_ids.size - 1)
        matched2 = (
            (sorted_ids[locs2] == truth.astype(np.uint64))
            & (locs2 != locs) & matched
        )
        true_list2 = order_ids[locs2] // cap

    nprobe_curve, coverage_limited = None, False
    if args.nprobe <= 0:
        # Measured-coverage auto-scaling — the same construction as
        # IVFFlatIndex.calibrate_nprobe (models/ivf_flat.py), reusing this
        # bench's exact oracle instead of a second full-probe search: the
        # smallest candidate nprobe whose coarse probes cover >= 99% of
        # the true top-k's lists.
        from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import (
            pairwise_distance,
        )

        coarse = np.asarray(
            pairwise_distance(queries, idx.centroids, Metric.L2)
        )
        ranks = np.argsort(np.argsort(coarse, axis=1), axis=1)
        rank_of_true = np.take_along_axis(
            ranks, np.clip(true_list, 0, args.nlist - 1), axis=1
        )
        if matched2.any():
            # replicated true ids: covered at the EARLIER of the two
            # copies' probe ranks
            rank2 = np.take_along_axis(
                ranks, np.clip(true_list2, 0, args.nlist - 1), axis=1
            )
            rank_of_true = np.where(
                matched2, np.minimum(rank_of_true, rank2), rank_of_true
            )
        n_valid = max(int(matched.sum()), 1)
        nprobe_curve, chosen = {}, None
        # The grid starts at 4 because the mechanism is coverage-DRIVEN:
        # on corpora whose coarse structure genuinely covers the true
        # top-k with 4 probes (this bench's balanced mixture does), 4 is
        # the honest operating point; on hostile geometry (cpl>=2, zipf)
        # the measured curve pushes the choice up automatically
        # (HOSTILE_r03.json shows the adaptation).
        for cand in (4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
            if cand > args.nlist:
                break
            cov = float((rank_of_true[matched] < cand).sum() / n_valid)
            nprobe_curve[cand] = round(cov, 4)
            if chosen is None and cov >= 0.99:
                chosen = cand
        coverage_limited = chosen is None
        if coverage_limited:
            # Coverage plateaus below target (e.g. zipf head modes: the
            # true top-k scatter near-uniformly across a dense mode's many
            # cells, so extra probes buy ~nothing — measured s=1.0 curve:
            # 0.429@8 → 0.459@128). Escalating to a full scan would be
            # dishonest QPS-wise AND unservable; pick the knee instead —
            # the smallest nprobe within 1% absolute of the best measured
            # coverage — and report coverage_limited so the artifact says
            # identity-recall is geometry-bound, not mistuned.
            best = max(nprobe_curve.values())
            chosen = min(
                p for p, c in nprobe_curve.items() if c >= best - 0.01
            )
        args.nprobe = chosen
        _stage(f"auto-nprobe: {chosen} (coverage curve: {nprobe_curve}"
               f"{', coverage-limited' if coverage_limited else ''})")

    # Warm (compile) + recall measurement.
    _stage("warm compile + first search")
    d, pos, probes = device_search(queries)
    jax.block_until_ready((d, pos))
    got = np.asarray(pos)
    # arena position → original row id via the host id table
    got_ids_u = idx.arena.positions_to_ids(got)
    d_h = np.asarray(d).copy()
    if args.multi_assign_eps > 0:
        from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
            dedup_topk,
        )

        got_ids_u = got_ids_u.copy()
        got_ids_u[got < 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
        d_h, got_ids_u = dedup_topk(d_h, got_ids_u, args.k)
    got_ids = got_ids_u.astype(np.int64)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / args.k
        for a, b in zip(got_ids, truth)
    ])
    # Epsilon-recall: fraction of RETURNED neighbors within 5% (in L2
    # distance) of the exact kth neighbor. On dense duplicated-mass
    # geometry (zipf head modes) identity recall@k is ill-posed — the
    # rank-2..k neighbors are near-ties scattered across a mode's many
    # cells — while the returned set is metrically indistinguishable from
    # the true one; this metric (standard in ANN benchmarking) separates
    # the two failure modes. Returned d is the stored-representation
    # (int8-dequant) distance, truth is exact bf16: the representation
    # gap is ~1%, well inside the 5% tolerance.
    ret_d = np.sqrt(np.maximum(d_h[: truth.shape[0], : args.k], 0.0))
    true_dk = np.sqrt(np.maximum(truth_d[:, args.k - 1], 0.0))
    recall_eps = float(np.mean(ret_d <= 1.05 * true_dk[:, None] + 1e-6))

    # Probe coverage: the fraction of TRUE top-k whose list was probed —
    # splits recall loss into its probe-miss component (coverage < 1) and
    # its quantized-ranking component (coverage − recall).
    probes_h = np.asarray(probes)[: truth.shape[0]]

    def _covered(b):
        hit = np.isin(true_list[b][matched[b]], probes_h[b])
        if matched2[b].any():
            # replicated true ids count as covered via either copy
            hit |= matched2[b][matched[b]] & np.isin(
                true_list2[b][matched[b]], probes_h[b]
            )
        return float(np.mean(hit))

    coverage = np.mean([
        _covered(b) if matched[b].any() else 0.0
        for b in range(truth.shape[0])
    ])

    # Throughput: pipelined async dispatch, block once at the end.
    t0 = time.time()
    _stage("throughput loop")
    results = [device_search(queries) for _ in range(args.n_batches)]
    jax.block_until_ready(results)
    dt = time.time() - t0
    qps = args.n_batches * args.batch / dt

    # Per-batch latency (sequential blocking — includes host dispatch).
    lats = []
    for _ in range(10):
        t1 = time.time()
        jax.block_until_ready(device_search(queries))
        lats.append((time.time() - t1) * 1000)
    lats = np.array(lats)

    # Mesh-1 parity on real silicon (VERDICT r4 #5): publish the SAME
    # arena onto a 1-device jax mesh (zero-copy at n=1) and run the SPMD
    # serving path — shard_map + Pallas grouped scan + ICI merge — against
    # the unsharded numbers above. First-ever execution of the sharded
    # executables on a TPU happens here; guarded so a Mosaic regression
    # degrades the artifact, not the headline.
    mesh1 = None
    if (args.mesh1 and jax.default_backend() == "tpu"
            and args.multi_assign_eps == 0):
        try:
            from cuda_acceleratedvectordatabaseengine_tpu.parallel import (
                ShardedIVFFlatIndex,
                make_mesh,
            )
            from cuda_acceleratedvectordatabaseengine_tpu import SearchParams

            _stage("mesh-1: publish + compile (SPMD path on real silicon)")
            sh = ShardedIVFFlatIndex(idx, make_mesh(1))
            sp = SearchParams(nprobe=args.nprobe, k=args.k)
            # Device-resident queries — the unsharded loop above also keeps
            # the batch on device; a numpy round trip here re-uploads 25 MB
            # per batch through the relay (630 ms — the first r5 mesh-1
            # section measured the H2D tax, not the SPMD path).
            q_h = queries
            tc1 = time.time()
            d_m, ids_m = sh.search(q_h, sp)
            mesh_compile_s = time.time() - tc1
            recall_m = np.mean([
                len(set(a.tolist()) & set(b.tolist())) / args.k
                for a, b in zip(ids_m.astype(np.int64), truth)
            ])
            _stage(f"mesh-1: throughput (recall {recall_m:.4f})")
            # Same loop semantics as the unsharded measurement above:
            # async device dispatches, ONE block at the end, no per-batch
            # result fetch (search_async's per-batch D2H through the relay
            # measured 77.6K QPS where the device path runs ~4x that).
            n_mb = max(args.n_batches // 2, 5)
            tm = time.time()
            dev_results = [
                sh.search_device(q_h, sp) for _ in range(n_mb)
            ]
            jax.block_until_ready(dev_results)
            dt_m = time.time() - tm
            mesh1 = {
                "qps": round(n_mb * args.batch / dt_m, 1),
                "recall_at_10": round(float(recall_m), 4),
                "vs_unsharded_qps_pct": None,  # filled below (needs qps)
                "compile_s": round(mesh_compile_s, 1),
                "scan_impl": sh.scan_impl,
                "interpret": bool(sh.interpret),
            }
            mesh1["vs_unsharded_qps_pct"] = round(
                100.0 * mesh1["qps"] / max(qps, 1e-9), 1
            )
        except Exception as e:  # noqa: BLE001 — artifact-only path
            mesh1 = {"error": f"{type(e).__name__}: {e}"}

    detail = {
        "recall_at_10": round(float(recall), 4),
        "recall_eps_05": round(recall_eps, 4),
        "probe_coverage": round(float(coverage), 4),
        "coverage_limited": coverage_limited,
        "p50_batch_ms": round(float(np.percentile(lats, 50)), 2),
        "p99_batch_ms": round(float(np.percentile(lats, 99)), 2),
        "batch": args.batch,
        "n": args.n,
        "dim": args.dim,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "k": args.k,
        "nprobe_curve": nprobe_curve,
        "skew": args.skew,
        "split_threshold": args.split_threshold,
        "assign_choices": args.assign_choices,
        "multi_assign_eps": args.multi_assign_eps,
        "multi_assign_budget": args.multi_assign_budget,
        "replication_factor": (
            round(idx.arena.total_vectors / args.n, 4)
            if args.multi_assign_eps > 0 else None
        ),
        "capacity_factor": args.capacity_factor,
        "clusters_per_list": cpl,
        "arena_dtype": args.dtype,
        "scan_impl": args.scan,
        "capacity_per_list": cap,
        "gen_s": round(t_gen, 1),
        "train_s": round(t_train, 1),
        "build_s": round(t_build, 1),
        # Ingest = assign + quantize + pack (the balanced-append passes),
        # comparable to the reference's add() throughput row: 3.8M vec/min
        # on A100 (/root/reference/README.md:42). Excludes synthetic-data
        # generation time, which a real ingest wouldn't pay. Only emitted
        # at ≥1M rows: below that the relay's compile+dispatch overhead
        # dominates t_build and the rate is meaningless.
        "ingest_mvec_per_min": (
            round(args.n / t_build / 1e6 * 60, 2)
            if t_build and args.n >= 1_000_000 else None
        ),
        "ingest_vs_baseline": (
            round(args.n / t_build / 1e6 * 60 / 3.8, 2)
            if t_build and args.n >= 1_000_000 else None
        ),
        # Run-to-run ingest variance decomposition (VERDICT r3 item 8: the
        # 11.4 vs 17.9 Mvec/min discrepancy): per-chunk append walls show
        # where the time went. Chunk 0 carries the append/assign compiles;
        # the rest vary with relay state (lazy HBM frees, compile-cache
        # warmth — CLAUDE.md gotchas). ingest_steady strips chunk 0, so it
        # is the reproducible figure; ingest_mvec_per_min (whole build,
        # compiles included) stays the conservative artifact of record.
        "chunk_build_s": [round(s, 2) for s in chunk_build_s],
        "mesh1": mesh1,
        "ingest_steady_mvec_per_min": (
            round(
                (args.n - args.n // len(chunk_build_s))
                / max(sum(chunk_build_s[1:]), 1e-9) / 1e6 * 60, 2
            )
            if len(chunk_build_s) > 1 and args.n >= 1_000_000 else None
        ),
        "device": str(jax.devices()[0]),
    }
    # Per-request wire latency (VERDICT #5): measured separately against
    # the live gRPC server by scripts/run-wire-bench.sh (ONE TPU process at
    # a time forbids running the server inside this bench). Embed the most
    # recent artifact so the headline JSON carries the request-level view.
    wire_files = sorted(
        f for f in os.listdir(os.path.dirname(os.path.abspath(__file__)))
        if f.startswith("WIRE_r") and f.endswith(".json")
    )
    if wire_files:
        try:
            with open(wire_files[-1]) as f:
                wire = json.load(f)
            # Each embedded figure keeps its OWN run's latency (never pair
            # one run's QPS with another's p99 — ADVICE r4).
            best = wire.get("best_sustained") or {
                "qps": wire.get("qps_best_sustained", wire.get("qps_best")),
            }
            detail["wire"] = {
                "source": wire_files[-1],
                "best_sustained": best,
                "best_unary": wire.get("best_unary"),
                "b1_client_p99_ms": wire.get("b1_client_p99_ms"),
            }
        except Exception:  # noqa: BLE001 — artifact is optional
            pass
    _stage("done")
    print(json.dumps({
        "metric": "ivfflat_search_qps@recall0.95",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 45000.0, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
