"""Dev-only TPU measurement of the >HBM streaming tier (VERDICT #7).

Workload: 20M x 768 (57 GB fp32 / 28.6 GB bf16 raw — exceeds the 16 GB HBM
of one v5e chip), nlist=8192, HBM cache bounded to a fraction of lists.
The corpus lives in host RAM as an INT8-RESIDUAL HostListStore (codes +
per-row scales + per-list anchors — 14.3 GB host, 1 byte/dim per cache-miss
upload); the chip holds only centroids + the quantized list cache, scanned
with the grouped Pallas kernel. Phases:

  1. chunked build: generate each 500K chunk ON device, train (chunk 0),
     assign on device, quantize residuals vs the ASSIGNED centroid on
     device, update the exact oracle for the query set, download the chunk
     once (int8 codes + scales) and pack into the host store.
  2. warm: probe the query workload, prefetch its working set (measures the
     cold upload path: bytes + seconds through the relay's ~0.04 GB/s H2D).
  3. serve: batched searches on the warmed cache (QPS, recall@10, hit rate)
     plus a short eviction-pressure sample from cold clusters.

The query workload is cluster-skewed (drawn from `--hot-clusters` natural
clusters) — the regime a list cache exists for; uniform queries over a
corpus 2x the cache simply measure upload bandwidth.

Prints one JSON line with all figures.
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
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--n-batches", type=int, default=20)
    p.add_argument("--hot-clusters", type=int, default=400)
    p.add_argument("--cache-frac", type=float, default=0.125)
    p.add_argument("--store-dir", default="/tmp/streamstore_i8",
                   help="persist/reuse the packed host store (the 20M "
                        "build costs ~40 min through the relay)")
    p.add_argument("--scan-impl", default="auto")
    p.add_argument("--policy", default="lfu", choices=["lru", "lfu"],
                   help="cache eviction policy. lfu (default) pins the hot "
                        "working set when it exceeds the slot count — LRU "
                        "degenerates to ~0%% hits on cyclic wave scans")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu.io_host.streaming import (
        HostListStore,
        StreamingIVFFlatIndex,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_flat import (
        IVFFlatConfig,
        SearchParams,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import (
        Metric,
        pairwise_distance,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_fit,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.topk import topk_smallest

    key = jax.random.PRNGKey(42)
    chunk_n = 500_000
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

    # Host store build: generate + assign on device, quantize residuals vs
    # the ASSIGNED trained centroid on device (the per-list anchor contract
    # the quantized cache scan needs), download each chunk ONCE as int8
    # codes + fp32 scales/norms (the relay measured 0.007 GB/s D2H for
    # fp32-converted arrays — int8 is 4x the wire efficiency). The packed
    # store is persisted to --store-dir and reused on rerun.
    import os as _os

    sd = args.store_dir
    oracle = make_oracle_updater(args.k)
    rng = np.random.default_rng(7)
    have_store = _os.path.isfile(_os.path.join(sd, "meta.npz"))
    have_truth = _os.path.isfile(_os.path.join(sd, "truth.npz"))
    if have_truth:
        # The persisted truth pins the QUERY WORKLOAD too — reusing it with
        # different --hot-clusters/--batch silently serves the old queries.
        tz0 = np.load(_os.path.join(sd, "truth.npz"))
        if (int(tz0.get("hot_clusters", -1)) != args.hot_clusters
                or tz0["queries"].shape[0] != args.batch):
            _stage("persisted truth is for a different query workload — "
                   "rebuilding ground truth (store itself is reused)")
            have_truth = False
        del tz0

    @jax.jit
    def quantize_chunk(xc, anchor_rows):
        res = xc.astype(jnp.float32) - anchor_rows
        scale = jnp.maximum(jnp.max(jnp.abs(res), axis=-1), 1e-12) / 127.0
        codes_f = jnp.clip(jnp.round(res / scale[:, None]), -127, 127)
        deq = anchor_rows + codes_f * scale[:, None]
        sq = jnp.sum(deq * deq, -1)     # stored-representation norms
        return codes_f.astype(jnp.int8), scale, sq

    t0 = time.time()
    t_d2h = 0.0
    pieces_v = [[] for _ in range(args.nlist)]
    pieces_s = [[] for _ in range(args.nlist)]
    pieces_q = [[] for _ in range(args.nlist)]
    pieces_i = [[] for _ in range(args.nlist)]
    centroids = None
    queries = None
    gt_d = jnp.full((args.batch, args.k), jnp.inf, jnp.float32)
    gt_i = jnp.full((args.batch, args.k), -1, jnp.int64)
    for ci, start in enumerate(starts):
        if have_store and have_truth and ci > 0:
            continue            # centroids/queries come from chunk 0 only
        m = min(chunk_n, args.n - start)
        _stage(f"chunk {ci}/{len(starts)}: generate")
        xc, _ = clustered_corpus(
            chunk_keys[ci], m, args.dim, n_clusters=args.nlist, noise=0.25,
            centers=centers_g, base=start,
        )
        xc.block_until_ready()
        if ci == 0:
            if have_store:
                # The packed store was built against the persisted
                # centroids — retraining (even deterministically) wastes
                # ~5 min; the list assignment contract requires these.
                centroids = jnp.asarray(np.load(
                    _os.path.join(sd, "meta.npz")
                )["centroids"])
            else:
                _stage("train coarse quantizer (chunk 0)")
                k1, _ = jax.random.split(jax.random.PRNGKey(0))
                centroids, _ = kmeans_fit(
                    k1, xc.astype(jnp.float32), args.nlist, iters=40
                )
                centroids.block_until_ready()
            # Hot-cluster query workload: rows whose natural cluster id is
            # < hot_clusters (round-robin membership → (start+i) % nlist).
            hot_rows = np.flatnonzero(
                (start + np.arange(m)) % args.nlist < args.hot_clusters
            )
            qi = rng.choice(hot_rows, args.batch)
            queries = xc[jnp.asarray(qi)].astype(jnp.float32) + \
                0.1 * jax.random.normal(
                    jax.random.PRNGKey(9), (args.batch, args.dim),
                    jnp.float32,
                )
        _stage(f"chunk {ci}: assign + oracle")
        gt_d, gt_i = oracle(gt_d, gt_i, queries, xc, jnp.int64(start))
        gt_d.block_until_ready()
        if have_store:
            # Truth-only pass: the packed store already fixes assignments.
            del xc
            continue
        assigns_d = kmeans_assign(xc, centroids, Metric.L2)
        assigns = np.asarray(assigns_d)
        codes_d, scale_d, sq_d = quantize_chunk(xc, centroids[assigns_d])
        td = time.time()
        codes = np.asarray(codes_d)
        scale = np.asarray(scale_d)
        sq = np.asarray(sq_d)
        t_d2h += time.time() - td
        del xc, codes_d, scale_d, sq_d
        order = np.argsort(assigns, kind="stable")
        sl = assigns[order]
        bounds = np.searchsorted(sl, np.arange(args.nlist + 1))
        ids_chunk = np.arange(start, start + m, dtype=np.uint64)
        for l in range(args.nlist):
            rows = order[bounds[l]:bounds[l + 1]]
            if rows.size:
                pieces_v[l].append(codes[rows])
                pieces_s[l].append(scale[rows])
                pieces_q[l].append(sq[rows])
                pieces_i[l].append(ids_chunk[rows])
        del codes, scale, sq
    if have_store and have_truth:
        tz = np.load(_os.path.join(sd, "truth.npz"))
        truth = tz["truth"]
        queries = jnp.asarray(tz["queries"])
        centroids = jnp.asarray(np.load(_os.path.join(sd, "meta.npz"))[
            "centroids"
        ])
    else:
        truth = np.asarray(gt_i)
        if have_store:
            # Store reused but truth rebuilt (new query workload): persist
            # the fresh truth so the next rerun skips the oracle pass.
            try:
                np.savez(_os.path.join(sd, "truth.npz"), truth=truth,
                         queries=np.asarray(queries),
                         hot_clusters=args.hot_clusters)
            except Exception as e:  # noqa: BLE001
                _stage(f"truth persist failed ({e}); continuing")
    _stage(f"build pass done in {time.time()-t0:.0f}s (d2h {t_d2h:.0f}s)")

    store = HostListStore(args.nlist, args.dim, dtype="int8")
    store.anchors = np.asarray(centroids, dtype=np.float32)
    if have_store:
        _stage(f"loading persisted store from {sd}")
        meta = np.load(_os.path.join(sd, "meta.npz"))
        offs, cnts = meta["offsets"], meta["counts"]
        sqs, scales, ids_all = meta["sq"], meta["scale"], meta["ids"]
        vecs = np.load(_os.path.join(sd, "vecs.npy"), mmap_mode="r")
        o = 0
        for l in range(args.nlist):
            c = int(cnts[l])
            store.vectors[l] = vecs[offs[l]:offs[l] + c]
            store.sq[l] = sqs[o:o + c]
            store.scale[l] = scales[o:o + c]
            store.ids[l] = ids_all[o:o + c]
            o += c
    else:
        _stage("packing host store")
        for l in range(args.nlist):
            if pieces_v[l]:
                store.vectors[l] = np.concatenate(pieces_v[l])
                store.scale[l] = np.concatenate(pieces_s[l])
                store.sq[l] = np.concatenate(pieces_q[l])
                store.ids[l] = np.concatenate(pieces_i[l])
            pieces_v[l] = pieces_s[l] = pieces_q[l] = pieces_i[l] = None
        _stage(f"persisting store to {sd}")
        # Stream codes through a memmap: np.concatenate would double the
        # store in RAM (measured host OOM kill at 130 GB RSS on fp32).
        try:
            _os.makedirs(sd, exist_ok=True)
            cnts = np.asarray([v.shape[0] for v in store.vectors], np.int64)
            offs = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            mm = np.lib.format.open_memmap(
                _os.path.join(sd, "vecs.npy"), mode="w+",
                dtype=np.int8, shape=(int(cnts.sum()), args.dim),
            )
            o = 0
            for l in range(args.nlist):
                c = int(cnts[l])
                mm[o:o + c] = store.vectors[l]
                o += c
            mm.flush()
            del mm
            np.savez(_os.path.join(sd, "meta.npz"),
                     offsets=offs, counts=cnts,
                     sq=np.concatenate(store.sq),
                     scale=np.concatenate(store.scale),
                     ids=np.concatenate(store.ids),
                     centroids=np.asarray(centroids))
            np.savez(_os.path.join(sd, "truth.npz"), truth=truth,
                     queries=np.asarray(queries),
                     hot_clusters=args.hot_clusters)
        except Exception as e:  # noqa: BLE001 — persistence is best-effort
            _stage(f"persist failed ({e}); continuing without")
    host_gb = store.nbytes() / (1 << 30)
    corpus_gb = args.n * args.dim * 2 / (1 << 30)
    _stage(f"host store {host_gb:.1f} GB int8 (bf16 corpus "
           f"{corpus_gb:.1f} GB)")

    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype="int8",
    )
    cache_slots = max(int(args.nlist * args.cache_frac), 1)
    tier = StreamingIVFFlatIndex.from_store(
        store, centroids, cfg, cache_slots=cache_slots,
        scan_impl=args.scan_impl, policy=args.policy,
    )
    device_gb = tier.cache.memory_bytes() / (1 << 30)
    _stage(f"cache: {cache_slots} slots, {device_gb:.1f} GB device")

    # Warm: upload the workload's working set (the measured cold path).
    _stage("warm prefetch (cold upload path)")
    coarse = pairwise_distance(queries, centroids, Metric.L2)
    _, probe = topk_smallest(coarse, args.nprobe)
    wanted, freq = np.unique(np.asarray(probe), return_counts=True)
    workload_lists = int(wanted.size)
    _stage(f"workload probe union: {workload_lists} lists "
           f"({cache_slots} slots) — warm serving requires union <= slots")
    if wanted.size > cache_slots:
        wanted = wanted[np.argsort(-freq)][:cache_slots]
    tw = time.time()
    tier.prefetch_lists(wanted)
    jax.block_until_ready(tier.cache.cache_arena)
    warm_s = time.time() - tw
    slot_bytes = tier.cache.capacity * (
        args.dim * tier.cache.dtype.itemsize
        + (8 if tier.cache.quantized else 4)   # sq (+ scale)
    )
    warm_mb = wanted.size * slot_bytes / (1 << 20)

    # Serve from the warmed cache.
    params = SearchParams(nprobe=args.nprobe, k=args.k)
    q_host = np.asarray(queries)
    _stage("warm compile + recall")
    d, ids = tier.search(q_host, params)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / args.k
        for a, b in zip(ids.astype(np.int64), truth)
    ])
    tier.cache.hits = tier.cache.misses = 0
    _stage("throughput")
    t1 = time.time()
    for _ in range(args.n_batches):
        tier.search(q_host, params)
    dt = time.time() - t1
    qps = args.n_batches * args.batch / dt
    hit_rate = tier.cache.get_hit_rate()

    # Eviction-pressure sample: cold clusters force miss waves.
    _stage("eviction pressure sample")
    cold = rng.integers(args.nlist // 2, args.nlist, args.batch)
    cold_q = centroids[jnp.asarray(cold)] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(11), (args.batch, args.dim), jnp.float32
    )
    m0 = tier.cache.misses
    t2 = time.time()
    tier.search(np.asarray(cold_q), params)
    cold_s = time.time() - t2
    cold_misses = tier.cache.misses - m0
    cold_mb = cold_misses * slot_bytes / (1 << 20)

    # Hotness-restage under a shifting working set (STREAM_r05, VERDICT
    # r4 #6): the server's background loop calls prefetch_hot_lists every
    # prefetch_hot_interval_s (service.py:_hotness_loop). Scenario: the
    # long-lived hot workload A gets evicted by a cold burst B; when A's
    # traffic returns, compare its hit rate and batch time (a) cold-return
    # with no background restage vs (b) after ONE restage call — the
    # staged-ahead effect the wiring exists to produce. A's recency-
    # decayed counts dominate B's brief burst (half-life 60 s), so the
    # hottest-N pick recovers A's lists, not B's.
    cold_q_h = np.asarray(cold_q)

    def evict_with_cold_burst():
        for _ in range(2):
            tier.search(cold_q_h, params)

    def a_return():
        tier.cache.hits = tier.cache.misses = 0
        t = time.time()
        tier.search(q_host, params)
        dt_ret = time.time() - t
        h, m = tier.cache.hits, tier.cache.misses
        return dt_ret, h / max(h + m, 1)

    _stage("hotness: cold burst then A-return WITHOUT restage")
    evict_with_cold_burst()
    norestage_s, norestage_hit = a_return()

    _stage("hotness: re-warm A, cold burst, restage, A-return")
    for _ in range(3):          # restore A's hotness + residency
        tier.search(q_host, params)
    evict_with_cold_burst()
    tstg = time.time()
    staged = tier.prefetch_hot_lists()        # the server loop's call
    jax.block_until_ready(tier.cache.cache_arena)
    restage_s = time.time() - tstg
    staged_in_union = (
        int(np.isin(np.asarray(staged, np.int64), wanted).sum())
        if len(staged) else 0
    )
    withrestage_s, withrestage_hit = a_return()

    print(json.dumps({
        "metric": "streaming_tier_20m_int8",
        "n": args.n, "dim": args.dim, "nlist": args.nlist,
        "nprobe": args.nprobe, "batch": args.batch,
        "corpus_gb_bf16": round(corpus_gb, 1),
        "host_store_gb": round(host_gb, 1),
        "device_cache_gb": round(device_gb, 2),
        "cache_slots": cache_slots,
        "policy": args.policy,
        "workload_probe_union_lists": workload_lists,
        "qps_warm": round(qps, 1),
        "recall_at_10": round(float(recall), 4),
        "hit_rate_warm": round(hit_rate, 4),
        "warm_upload_mb": round(warm_mb, 1),
        "warm_upload_s": round(warm_s, 1),
        "cold_batch_s": round(cold_s, 1),
        "cold_miss_lists": int(cold_misses),
        "cold_upload_mb": round(cold_mb, 1),
        "relay_h2d_gbps_note": round(warm_mb / 1024 / max(warm_s, 1e-9), 3),
        "hotness_restage": {
            "a_return_no_restage_hit_rate": round(norestage_hit, 4),
            "a_return_no_restage_batch_s": round(norestage_s, 2),
            "restage_lists": len(staged),
            "restage_lists_in_a_union": staged_in_union,
            "restage_s": round(restage_s, 2),
            "a_return_after_restage_hit_rate": round(withrestage_hit, 4),
            "a_return_after_restage_batch_s": round(withrestage_s, 2),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
