"""Mesh-1 on real TPU silicon (VERDICT r4 #5): the SPMD serving path —
shard_map + Pallas grouped scan over slot-striped arenas — had only ever
executed on the virtual CPU mesh. This script builds an index on the one
real chip, publishes it onto a 1-device mesh, and measures (a) that
Mosaic-under-shard_map compiles and runs on silicon, (b) recall parity
with the unsharded path, (c) the SPMD wrapper's QPS overhead.

Usage: python scripts/dev_mesh1_tpu.py [--n 2000000] [--batch 4096]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stage, clustered_corpus  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--n-batches", type=int, default=20)
    p.add_argument("--dtype", default="int8")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu import (
        IVFFlatConfig,
        IVFFlatIndex,
        SearchParams,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.parallel import (
        ShardedIVFFlatIndex,
        make_mesh,
    )

    t0 = time.time()
    _stage(f"generate {args.n}x{args.dim} on device")
    x, _ = clustered_corpus(
        jax.random.PRNGKey(42), args.n, args.dim, n_clusters=args.nlist,
        noise=0.25,
    )
    x.block_until_ready()

    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype=args.dtype,
        train_sample_per_list=64,
    )
    idx = IVFFlatIndex(cfg)
    _stage("train")
    idx.train_from_device(x)
    _stage("build")
    idx.build_from_device(x)
    jax.block_until_ready(idx.arena.arena)
    build_s = time.time() - t0

    rng = np.random.default_rng(7)
    qi = jnp.asarray(np.sort(rng.integers(0, args.n, args.batch)))
    queries = x[qi].astype(jnp.float32) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), (args.batch, args.dim), jnp.float32
    )
    q_host = np.asarray(queries)
    del x
    params = SearchParams(nprobe=args.nprobe, k=args.k)

    # ---- unsharded single-chip baseline ----
    _stage("unsharded: warm + measure")
    tc = time.time()
    d0, i0 = idx.search(q_host, params)
    base_compile_s = time.time() - tc
    t1 = time.time()
    for _ in range(args.n_batches):
        idx.search(q_host, params)
    base_dt = time.time() - t1
    qps_base = args.n_batches * args.batch / base_dt

    # ---- the same index on a 1-device mesh (SPMD path, real silicon) ----
    _stage("mesh-1: publish + warm (Mosaic under shard_map)")
    mesh = make_mesh(1)
    tm = time.time()
    sharded = ShardedIVFFlatIndex(idx, mesh)
    publish_s = time.time() - tm
    tc = time.time()
    d1, i1 = sharded.search(q_host, params)
    mesh_compile_s = time.time() - tc
    t2 = time.time()
    for _ in range(args.n_batches):
        sharded.search(q_host, params)
    mesh_dt = time.time() - t2
    qps_mesh = args.n_batches * args.batch / mesh_dt

    id_match = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / args.k
        for a, b in zip(i0.astype(np.int64), i1.astype(np.int64))
    ]))
    print(json.dumps({
        "metric": "mesh1_real_tpu_parity",
        "device": str(jax.devices()[0]),
        "n": args.n, "dim": args.dim, "nlist": args.nlist,
        "nprobe": args.nprobe, "k": args.k, "batch": args.batch,
        "dtype": args.dtype,
        "build_s": round(build_s, 1),
        "scan_impl_mesh": sharded.scan_impl,
        "interpret": bool(sharded.interpret),   # MUST be false on TPU
        "qps_unsharded": round(qps_base, 1),
        "qps_mesh1": round(qps_mesh, 1),
        "mesh_overhead_pct": round(100 * (qps_base / qps_mesh - 1), 2),
        "result_set_overlap": round(id_match, 4),
        "publish_s": round(publish_s, 1),
        "compile_s_unsharded": round(base_compile_s, 1),
        "compile_s_mesh1": round(mesh_compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
