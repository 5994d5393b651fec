"""Host-rerank stage microbenchmark at the pq_capacity design point.

PQCAP_r03's steady-state decomposition measured the capacity tier's host
stage (gather + dequant + exact dot + top-k over B×R int8 store rows) at
590 ms/batch — ABOVE the 375 ms device ADC stage, so the pipelined tier
was host-bound on this harness's single-vCPU host. Three fixes landed
since: the native fused rerank (``native/vdbhost.cc::vdb_rerank``),
per-candidate anchor dots (replacing the [B, nlist] anchor GEMM), and
adaptive ADC-margin depth. This script measures the host stage alone, at
the exact 20M×768 operating point (store resident in RAM — the serving
assumption), so the tier's pipelined bound can be located without a
34-minute relay store rebuild.

Emits one JSON object: per-(R, path) p50 ms/batch, the implied pipelined
QPS against PQCAP_r03's measured 375 ms device stage, and the single-core
floor statement (this host HAS one vCPU — the stage is embarrassingly
parallel over queries, so C cores divide it by ~C; that claim is an
argument, not a measurement, and is labeled as such).

Usage: python scripts/dev_host_rerank_bench.py [--n 20000000] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep JAX off the import path cost and off the TPU: this is host-only.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


class _FakeStore:
    """Duck-typed HostListStore: consecutive per-list views over one
    backing array (the persisted-store layout — exercises HostReranker's
    zero-copy flatten)."""

    def __init__(self, n, nlist, dim, rng, id_offset=0):
        self.dim = dim
        self.nlist = nlist
        self.dtype = "int8"
        per = n // nlist
        n = per * nlist
        # One shot of random int8: the values don't matter for timing,
        # only the footprint and the gather pattern.
        base = rng.integers(-127, 128, size=(n, dim), dtype=np.int8)
        # id_offset > 2n forces HostReranker's sorted-binary-search id
        # path (dense arange ids take its O(1) inverse table — the default
        # here, which ADVICE r4 notes understates arbitrary-uint64 stores).
        self.id_offset = int(id_offset)
        ids = np.arange(n, dtype=np.uint64) + np.uint64(self.id_offset)
        sq = rng.random(n, dtype=np.float32) * 700.0 + 50.0
        scale = (rng.random(n, dtype=np.float32) * 0.02 + 0.01).astype(
            np.float32
        )
        self.anchors = rng.standard_normal((nlist, dim)).astype(np.float32)
        self.vectors = [base[i * per:(i + 1) * per] for i in range(nlist)]
        self.ids = [ids[i * per:(i + 1) * per] for i in range(nlist)]
        self.sq = [sq[i * per:(i + 1) * per] for i in range(nlist)]
        self.scale = [scale[i * per:(i + 1) * per] for i in range(nlist)]
        self.n = n
        self.per = per


def make_candidates(rng, batch, r, nprobe, store):
    """[B, R] candidate ids with the capacity tier's locality: each
    query's shortlist comes from its nprobe probed lists."""
    lists = np.stack([
        rng.choice(store.nlist, size=nprobe, replace=False)
        for _ in range(batch)
    ])                                                  # [B, nprobe]
    src = lists[:, rng.integers(0, nprobe, size=r)]     # [B, R] list ids
    offs = rng.integers(0, store.per, size=(batch, r))
    return (
        src.astype(np.uint64) * store.per + offs
        + np.uint64(store.id_offset)
    ).astype(np.uint64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=20_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--nprobe", type=int, default=32)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--rerank", default="128,256,512")
    p.add_argument("--device-stage-ms", type=float, default=375.0,
                   help="PQCAP_r03's measured device ADC+emit_full stage "
                        "at this operating point (ms/batch)")
    p.add_argument("--nondense", action="store_true",
                   help="offset store ids beyond the dense-inverse "
                        "threshold so id mapping pays the per-batch "
                        "searchsorted cost (arbitrary-uint64 stores)")
    args = p.parse_args()

    from cuda_acceleratedvectordatabaseengine_tpu.io_host.host_rerank import (
        HostReranker,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    store = _FakeStore(
        args.n, args.nlist, args.dim, rng,
        id_offset=(1 << 40) if args.nondense else 0,
    )
    gen_s = time.perf_counter() - t0
    rr = HostReranker(store)
    assert rr.vecs.base is not None, "zero-copy flatten regressed"
    queries = rng.standard_normal((args.batch, args.dim)).astype(np.float32)

    out = {
        "metric": "pqcap_host_rerank_stage",
        "host": f"{os.cpu_count()} vCPU (harness host)",
        "workload": {
            "n": store.n, "dim": args.dim, "nlist": args.nlist,
            "nprobe": args.nprobe, "batch": args.batch, "k": args.k,
            "store_gb": round(rr.nbytes() / 2**30, 2),
            "resident": True,
            # Which id→row path the measurement exercises (ADVICE r4:
            # dense arange ids take the O(1) inverse table and skip the
            # per-batch searchsorted an arbitrary-uint64 store would pay).
            "id_path": (
                "searchsorted" if rr._inv is None else "dense_inverse"
            ),
        },
        "store_gen_s": round(gen_s, 1),
        "points": [],
    }
    for r in [int(v) for v in args.rerank.split(",")]:
        cand = make_candidates(rng, args.batch, r, args.nprobe, store)
        for use_native in (True, False):
            rr.use_native = use_native
            rr.rerank(queries, cand, Metric.L2, args.k)  # warm
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                d, i = rr.rerank(queries, cand, Metric.L2, args.k)
                times.append((time.perf_counter() - t0) * 1e3)
            ms = float(np.median(times))
            pipelined_ms = max(ms, args.device_stage_ms)
            out["points"].append({
                "rerank_k": r,
                "path": "native" if use_native else "numpy",
                "host_ms_p50": round(ms, 1),
                # Uncontended floor: on this shared single-vCPU host the
                # median can sit in a contention mode (ADVICE r4 — the
                # r04 numpy R=512 sample spanned 395-1885 ms); min is the
                # honest cross-path comparison point.
                "host_ms_min": round(float(np.min(times)), 1),
                "host_ms_all": [round(t, 1) for t in times],
                "rows_per_s": round(args.batch * r / (ms / 1e3)),
                "implied_pipelined_qps": round(
                    args.batch / (pipelined_ms / 1e3), 1
                ),
            })
            print(json.dumps(out["points"][-1]), flush=True)
    print(json.dumps(out), flush=True)
    with open("/tmp/pqcap_host_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
