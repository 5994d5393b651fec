"""Dev-only TPU measurement: the PQ CAPACITY tier past the HBM wall.

20M x 768 is the size where int8-residual flat no longer fits one v5e chip
(the padded arena is nlist x cap x dim = 16.1 GB > 16 GB HBM; bf16 would be
32 GB). Two designs serve it from one chip:

  streaming tier (STREAM_r03): int8 host store + bounded HBM list cache —
      device-speed QPS *iff the workload has locality* (hot working set
      fits the cache); uniform traffic degenerates to H2D bandwidth.
  PQ capacity tier (THIS script): IVF-PQ codes resident on device
      (nlist x m x cap = 2.0 GB at m=96 — 8x smaller than int8 rows),
      exact rerank host-side from the same int8 store
      (io_host/host_rerank). No locality requirement: each batch touches
      only B x R host rows and ships nothing to the device.

Reuses the persisted streaming store (--store-dir) for centroids + rerank
rows; regenerates corpus chunks ON device (deterministic keys) to encode
PQ codes, so the build adds zero relay downloads. Ground truth is the
exact on-device oracle over all 20M rows with a UNIFORM query workload —
deliberately the streaming tier's worst case.

Prints one JSON line with ADC-only and rerank-sweep operating points.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stage, clustered_corpus, make_oracle_updater  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=20_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--m", type=int, default=96)
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n-batches", type=int, default=20)
    p.add_argument("--rerank", default="0,128,256,512",
                   help="comma list of host rerank depths (0 = ADC only); "
                        "an entry R@M adds an adaptive ADC margin M (only "
                        "candidates within (1+M)x the k-th ADC distance "
                        "are gathered+dotted on the host, e.g. 512@0.3)")
    p.add_argument("--k-inner", type=int, default=0,
                   help="0 (default) = exact emit_full deep-shortlist scan; "
                        ">0 opts into per-list k_inner truncation, which "
                        "CAPS recall on clustered corpora (see pallas_scan)")
    p.add_argument("--store-dir", default="/tmp/streamstore_i8",
                   help="persisted int8 host store from dev_streaming_bench "
                        "(provides centroids + rerank rows)")
    p.add_argument("--opq", action="store_true")
    p.add_argument("--preload", action="store_true",
                   help="sequentially page the zero-copy host store into "
                        "RAM before measuring (cold random 4K faults are "
                        "seek-bound on this harness's disk)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu.io_host.host_rerank import (
        HostReranker,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.io_host.streaming import (
        HostListStore,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_pq import (
        IVFPQConfig,
        IVFPQIndex,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
        SearchParams,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.kmeans import (
        kmeans_assign,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric
    from cuda_acceleratedvectordatabaseengine_tpu.ops.pq import (
        opq_fit,
        train_product_quantizer,
    )

    sd = args.store_dir
    meta_path = os.path.join(sd, "meta.npz")
    if not os.path.isfile(meta_path):
        raise SystemExit(
            f"no persisted store at {sd} — run dev_streaming_bench first"
        )
    meta = np.load(meta_path)
    centroids_h = meta["centroids"]
    assert centroids_h.shape == (args.nlist, args.dim), (
        "store was built with different nlist/dim"
    )
    centroids = jnp.asarray(centroids_h)
    cnts = meta["counts"]
    cap_needed = int(cnts.max())

    # Same chunk-key derivation as dev_streaming_bench: the store's rows
    # regenerate bit-identically on device.
    chunk_n = 500_000
    starts = list(range(0, args.n, chunk_n))
    kx = jax.random.PRNGKey(42)
    chunk_keys = []
    for _ in starts:
        kx, sub = jax.random.split(kx)
        chunk_keys.append(sub)
    centers_g = jax.random.normal(
        jax.random.PRNGKey(1234), (args.nlist, args.dim), jnp.float32
    )

    # ---------------- PQ train (chunk 0 residual sample) ----------------
    cfg = IVFPQConfig(
        dimension=args.dim, nlist=args.nlist, m=args.m,
        keep_raw=False, opq=args.opq,
    )
    idx = IVFPQIndex(cfg)
    t0 = time.time()
    _stage("chunk 0: generate + PQ train")
    n0 = min(chunk_n, args.n)
    xc0, _ = clustered_corpus(
        chunk_keys[0], n0, args.dim, n_clusters=args.nlist, noise=0.25,
        centers=centers_g, base=0,
    )
    rng = np.random.default_rng(7)
    assigns0 = kmeans_assign(xc0, centroids, Metric.L2)
    sub = jnp.asarray(np.sort(
        rng.choice(n0, min(cfg.pq_train_sample, n0), replace=False)
    ))
    residuals = xc0[sub].astype(jnp.float32) - centroids[assigns0[sub]]
    key = jax.random.PRNGKey(cfg.seed)
    if args.opq:
        idx.opq_R, idx.codebooks = opq_fit(
            key, residuals, cfg.m, cfg.ks, iters=cfg.train_iters,
            opq_iters=cfg.opq_iters,
        )
        idx.centroids = jnp.matmul(
            centroids, idx.opq_R, precision=jax.lax.Precision.HIGHEST
        )
    else:
        idx.codebooks = train_product_quantizer(
            key, residuals, cfg.m, cfg.ks, iters=cfg.train_iters
        )
        idx.centroids = centroids
    idx.trained = True
    idx.reserve(cap_needed)
    train_s = time.time() - t0
    _stage(f"PQ trained in {train_s:.0f}s; code arena "
           f"{idx.code_arena_t.size / (1 << 30):.2f} GB "
           f"(cap {idx.capacity})")

    # Uniform query workload: perturbed rows of chunk 0 (round-robin
    # membership covers all nlist clusters uniformly).
    qi = rng.choice(n0, args.batch, replace=False)
    queries = xc0[jnp.asarray(np.sort(qi))].astype(jnp.float32) + \
        0.1 * jax.random.normal(
            jax.random.PRNGKey(9), (args.batch, args.dim), jnp.float32
        )

    # ---------------- encode all chunks + exact oracle ----------------
    truth_path = os.path.join(sd, "truth_pqcap.npz")
    have_truth = False
    if os.path.isfile(truth_path):
        tz = np.load(truth_path)
        if tz["queries"].shape == (args.batch, args.dim):
            truth = tz["truth"]
            queries = jnp.asarray(tz["queries"])
            have_truth = True
            _stage("reusing persisted uniform-workload truth")
    oracle = make_oracle_updater(args.k)
    gt_d = jnp.full((args.batch, args.k), jnp.inf, jnp.float32)
    gt_i = jnp.full((args.batch, args.k), -1, jnp.int64)
    tb = time.time()
    for ci, start in enumerate(starts):
        m_rows = min(chunk_n, args.n - start)
        if ci == 0:
            xc = xc0
        else:
            _stage(f"chunk {ci}/{len(starts)}: generate + encode")
            xc, _ = clustered_corpus(
                chunk_keys[ci], m_rows, args.dim, n_clusters=args.nlist,
                noise=0.25, centers=centers_g, base=start,
            )
        if not have_truth:
            gt_d, gt_i = oracle(gt_d, gt_i, queries, xc, jnp.int64(start))
        idx.add_from_device(
            xc, ids=np.arange(start, start + m_rows, dtype=np.uint64)
        )
        # Serialize chunks: deep async queues hold every in-flight
        # program's buffers (measured OOM long after steady-state fits).
        jax.block_until_ready(idx.code_arena_t)
        del xc
    if not have_truth:
        truth = np.asarray(gt_i)
        try:
            np.savez(truth_path, truth=truth, queries=np.asarray(queries))
        except Exception as e:  # noqa: BLE001
            _stage(f"truth persist failed ({e}); continuing")
    build_s = time.time() - t0
    stats = idx.memory_stats()
    flat_equiv_gb = args.nlist * idx.capacity * args.dim / (1 << 30)
    _stage(f"build done in {build_s:.0f}s; device "
           f"{stats['total_bytes'] / (1 << 30):.2f} GB vs int8-flat "
           f"{flat_equiv_gb:.1f} GB (HBM 16)")

    # ---------------- host store for rerank ----------------
    _stage("loading host store for rerank")
    store = HostListStore(args.nlist, args.dim, dtype="int8")
    store.anchors = np.asarray(centroids_h, np.float32)
    offs = meta["offsets"]
    sqs, scales, ids_all = meta["sq"], meta["scale"], meta["ids"]
    vecs = np.load(os.path.join(sd, "vecs.npy"), mmap_mode="r")
    o = 0
    for l in range(args.nlist):
        c = int(cnts[l])
        store.vectors[l] = vecs[offs[l]:offs[l] + c]
        store.sq[l] = sqs[o:o + c]
        store.scale[l] = scales[o:o + c]
        store.ids[l] = ids_all[o:o + c]
        o += c
    tr = time.time()
    reranker = HostReranker(store)
    if args.preload:
        reranker.preload()
    _stage(f"reranker flat arrays built in {time.time()-tr:.0f}s "
           f"({reranker.nbytes() / (1 << 30):.1f} GB host"
           f"{', preloaded' if args.preload else ''})")

    # ---------------- measure ----------------
    q_host = np.asarray(queries)
    points = []
    for spec in args.rerank.split(","):
        r, _, mg = spec.partition("@")
        r, margin = int(r), float(mg or 0.0)
        if r > 0:
            idx._host_rr = None
            idx.attach_host_rerank(reranker, rerank_k=r,
                                   k_inner=args.k_inner, margin=margin)
            params = SearchParams(
                nprobe=args.nprobe, k=args.k, use_exact_rerank=True
            )
        else:
            idx._host_rr = None
            params = SearchParams(nprobe=args.nprobe, k=args.k)
        name = f"adc+host_rerank_{r}" if r else "adc_only"
        if margin:
            name += f"@m{margin}"
        _stage(f"{name}: compile")
        tc = time.time()
        d, ids = idx.search(q_host, params)
        compile_s = time.time() - tc
        recall = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(ids.astype(np.int64), truth)
        ])
        # Two untimed warm batches: page in this point's candidate rows
        # (cold random faults are seek-bound) and settle executables.
        idx.search(q_host, params)
        idx.search(q_host, params)
        _stage(f"{name}: sequential throughput (recall {recall:.4f})")
        t1 = time.time()
        for _ in range(args.n_batches):
            idx.search(q_host, params)
        dt = time.time() - t1
        # Pipelined two-stage loop: device ADC of batch i+1 overlaps the
        # host rerank of batch i — the capacity tier's production loop.
        _stage(f"{name}: pipelined throughput")
        t2 = time.time()
        for _ in idx.search_batches_pipelined(
            [q_host] * args.n_batches, params
        ):
            pass
        dt_pipe = time.time() - t2
        points.append({
            "name": name, "rerank_k": r,
            "margin": margin or None,
            "mean_reranked": (
                round(idx.last_rerank_kept, 1)
                if margin and idx.last_rerank_kept is not None else None
            ),
            "k_inner": args.k_inner if r else None,
            "qps": round(args.n_batches * args.batch / dt, 1),
            "qps_pipelined": round(args.n_batches * args.batch / dt_pipe, 1),
            "recall_at_10": round(float(recall), 4),
            "batch_ms": round(dt / args.n_batches * 1000, 1),
            "batch_ms_pipelined": round(dt_pipe / args.n_batches * 1000, 1),
            "compile_s": round(compile_s, 1),
        })
        print(json.dumps(points[-1]), flush=True)

    print(json.dumps({
        "metric": "pq_capacity_tier_20m",
        "n": args.n, "dim": args.dim, "nlist": args.nlist, "m": args.m,
        "nprobe": args.nprobe, "batch": args.batch, "k": args.k,
        "opq": bool(args.opq),
        "device_gb": round(stats["total_bytes"] / (1 << 30), 2),
        "int8_flat_equiv_gb": round(flat_equiv_gb, 1),
        "host_store_gb": round(reranker.nbytes() / (1 << 30), 1),
        "build_s": round(build_s, 1),
        "workload": "uniform over all clusters (streaming tier worst case)",
        "points": points,
    }), flush=True)


if __name__ == "__main__":
    main()
