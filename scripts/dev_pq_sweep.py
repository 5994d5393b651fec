"""Dev-only TPU measurement for IVF-PQ (VERDICT #6 gate): build 1M x 768
m=96 on the real chip, then measure the grouped Pallas ADC kernel's
QPS/recall with and without exact rerank.

Usage:  python scripts/dev_pq_sweep.py --n 1000000 \
            --config 512:0 --config 512:40 --config 2048:40:p16

Config format: batch[:rerank_k[:pN]] (pN overrides nprobe).
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stage, make_oracle_updater  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--m", type=int, default=96)
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-batches", type=int, default=10)
    p.add_argument("--max-batch", type=int, default=2048)
    p.add_argument("--raw-dtype", default="bfloat16")
    p.add_argument("--capacity-factor", type=float, default=1.3,
                   help="pre-grow arenas to mean*factor (1.5 OOMed a 10M "
                        "int8+PQ build: 13.4 GB resident + transients)")
    p.add_argument("--config", action="append", default=[],
                   help="batch[:rerank_k]")
    p.add_argument("--opq", action="store_true",
                   help="learn an OPQ rotation (IVFPQConfig.opq)")
    p.add_argument("--aniso", type=float, default=0.0,
                   help="corpus anisotropy: scale dim i by (1+i)^-aniso "
                        "then mix through a fixed random rotation (real "
                        "embedding spectra decay; isotropic synthetic "
                        "gaussians are PQ's best case and OPQ's no-op)")
    args = p.parse_args()
    if not args.config:
        args.config = ["512:0", "512:40", "2048:40"]

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu import (
        IVFPQConfig,
        IVFPQIndex,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.models.ivf_pq import (
        _ivf_pq_search_device,
    )

    rng = np.random.default_rng(42)
    # Device-generated single-ball mixture (one mode per list), matching
    # the headline bench geometry. Everything stays on device: the relay's
    # ~0.04 GB/s H2D made host-generated builds both slow and prone to
    # staging-buffer HBM exhaustion (three OOM'd runs before this).
    from bench import clustered_corpus

    centers_g = jax.random.normal(
        jax.random.PRNGKey(1234), (args.nlist, args.dim), jnp.float32
    )

    cfg = IVFPQConfig(
        dimension=args.dim, nlist=args.nlist, m=args.m,
        raw_dtype=args.raw_dtype, train_sample_per_list=64,
        opq=args.opq,
    )
    idx = IVFPQIndex(cfg)

    if args.aniso > 0:
        aniso_spec = (1.0 + jnp.arange(args.dim, dtype=jnp.float32)) ** (
            -args.aniso
        )
        mix, _ = jnp.linalg.qr(jax.random.normal(
            jax.random.PRNGKey(77), (args.dim, args.dim), jnp.float32
        ))
        warp = jax.jit(lambda xc: (xc * aniso_spec[None]) @ mix)
    else:
        warp = None

    chunk_n = 500_000
    nq = args.max_batch
    oracle = make_oracle_updater(args.k)
    # Oracle in 512-query slices: the [nq, 500K] distance intermediate at
    # nq=2048 is 4 GB — alongside a 10M-scale index that OOMs the chip.
    q_slice = min(512, nq)
    gt_d = [
        jnp.full((q_slice, args.k), jnp.inf, jnp.float32)
        for _ in range(nq // q_slice)
    ]
    gt_i = [
        jnp.full((q_slice, args.k), -1, jnp.int64)
        for _ in range(nq // q_slice)
    ]
    queries = None
    kx = jax.random.PRNGKey(42)
    chunk_keys = []
    for _ in range(0, args.n, chunk_n):
        kx, sub = jax.random.split(kx)
        chunk_keys.append(sub)
    t0 = time.time()
    for ci, start in enumerate(range(0, args.n, chunk_n)):
        mrows = min(chunk_n, args.n - start)
        _stage(f"chunk {ci}: device-gen {mrows}")
        xc, _ = clustered_corpus(
            chunk_keys[ci], mrows, args.dim, n_clusters=args.nlist,
            noise=0.25, centers=centers_g, base=start,
        )
        xc = xc.astype(jnp.float32)
        if warp is not None:
            xc = warp(xc)
        xc.block_until_ready()
        if ci == 0:
            _stage("train (coarse + PQ codebooks)")
            idx.train_from_device(xc)
            jax.block_until_ready(idx.codebooks)
            # Pre-grow both arenas to final capacity: per-chunk growth
            # reallocates multi-GB device buffers every chunk.
            final_cap = -(-int(
                args.n / args.nlist * args.capacity_factor
            ) // 128) * 128
            idx._grow(final_cap)
            jax.block_until_ready(idx.code_arena_t)
            qi = jnp.asarray(rng.integers(0, mrows, nq))
            queries = xc[qi] + 0.1 * jax.random.normal(
                jax.random.PRNGKey(9), (nq, args.dim), jnp.float32
            )
        _stage(f"chunk {ci}: add")
        # 125K sub-slices with barriers: the relay frees device buffers
        # lazily, and a full-chunk ingest's transients stack on top of the
        # still-allocated training/generation buffers (observed OOMs).
        sub = 125_000
        for s0 in range(0, mrows, sub):
            s1 = min(s0 + sub, mrows)
            idx.add_from_device(
                xc[s0:s1],
                ids=np.arange(start + s0, start + s1, dtype=np.uint64),
            )
            jax.block_until_ready(idx.code_arena_t)
        _stage(f"chunk {ci}: oracle")
        for qi in range(nq // q_slice):
            s = slice(qi * q_slice, (qi + 1) * q_slice)
            gt_d[qi], gt_i[qi] = oracle(
                gt_d[qi], gt_i[qi], queries[s], xc, jnp.int64(start)
            )
            gt_d[qi].block_until_ready()
        del xc
    truth = np.concatenate([np.asarray(g) for g in gt_i])
    _stage(f"build done in {time.time() - t0:.0f}s cap={idx.capacity} "
           f"codes_mb={idx.code_arena_t.nbytes / (1 << 20):.0f}")

    raw = idx.raw
    sargs = dict(
        centroids=idx.centroids, codebooks=idx.codebooks,
        code_arena_t=idx.code_arena_t, code_sq=idx.code_sq,
        counts=idx.counts,
        raw_arena=raw.arena if raw else None,
        raw_sq=raw.arena_sq if raw else None,
        raw_scale=raw.arena_scale if raw else None,
        raw_anchors=raw.anchors if raw else None,
        opq_R=idx.opq_R,
    )
    flat_ids = idx.ids.reshape(-1)

    for spec in args.config:
        parts = spec.split(":")
        batch = int(parts[0])
        rerank_k = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        nprobe_run = args.nprobe
        out_k = args.k
        for f in parts[2:]:
            if f.startswith("p") and f[1:].isdigit():
                nprobe_run = int(f[1:])
            elif f.startswith("k") and f[1:].isdigit():
                # Diagnostic: return the WHOLE reranked shortlist (out_k =
                # rerank_k). Its id SET is exactly the ADC top-R shortlist,
                # so containment of the true top-k in it separates
                # ADC-ordering misses (shortlist never held the neighbor)
                # from rerank-path misses (held it, ranked it out) —
                # the PQ_r05 mechanism question (VERDICT r4 #2).
                out_k = int(f[1:])
        q = queries[:batch]

        interp = jax.default_backend() != "tpu"

        def dev_search(qq, _r=rerank_k, _np=nprobe_run, _k=out_k):
            return _ivf_pq_search_device(
                qq, nprobe=_np, k=_k, metric=idx.metric,
                rerank_k=_r, scan_impl="pallas", interpret=interp, **sargs,
            )

        _stage(f"{spec}: compile")
        tc = time.time()
        d, pos = dev_search(q)
        jax.block_until_ready((d, pos))
        compile_s = time.time() - tc

        got = flat_ids[np.clip(np.asarray(pos), 0, flat_ids.size - 1)]
        got = got.astype(np.int64)
        got[np.asarray(pos) < 0] = -9
        recall = np.mean([
            len(set(a[: args.k].tolist()) & set(b.tolist())) / args.k
            for a, b in zip(got, truth[:batch])
        ])
        containment = (
            np.mean([
                len(set(a.tolist()) & set(b.tolist())) / args.k
                for a, b in zip(got, truth[:batch])
            ])
            if out_k > args.k else None
        )

        _stage(f"{spec}: throughput")
        t1 = time.time()
        results = [dev_search(q) for _ in range(args.n_batches)]
        jax.block_until_ready(results)
        dt = time.time() - t1
        lats = []
        for _ in range(5):
            t2 = time.time()
            jax.block_until_ready(dev_search(q))
            lats.append((time.time() - t2) * 1000)
        print(json.dumps({
            "config": spec, "qps": round(args.n_batches * batch / dt, 1),
            "recall": round(float(recall), 4),
            "shortlist_containment": (
                round(float(containment), 4)
                if containment is not None else None
            ),
            "batch_ms_p50": round(float(np.median(lats)), 1),
            "compile_s": round(compile_s, 1),
            "opq": bool(args.opq), "aniso": args.aniso,
        }), flush=True)


if __name__ == "__main__":
    main()
