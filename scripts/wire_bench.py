"""Wire-level latency benchmark support (VERDICT #5).

Measures per-REQUEST p50/p95/p99 over gRPC against the live server on the
real device — the figure the reference publishes (p99 rows,
``/root/reference/README.md:41-43``) but never measured (no artifacts).

Two subcommands, run as separate processes because the harness allows ONE
TPU process at a time:

  prepare  — build a clustered-corpus IVF-Flat index on device and lay out a
             server data dir (indices/<name>/config.json + activated epoch
             snapshot), then exit, releasing the chip.
  report   — merge one or more load_test JSON outputs into WIRE_rNN.json.

Orchestrated end-to-end by ``scripts/run-wire-bench.sh``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def prepare(args) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import clustered_corpus

    import jax
    import numpy as np

    from cuda_acceleratedvectordatabaseengine_tpu import (
        IVFFlatConfig,
        IVFFlatIndex,
    )
    from cuda_acceleratedvectordatabaseengine_tpu.storage.epoch import (
        EpochManager,
    )

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    print(f"[wire-prep] generating {args.n}x{args.dim} on device")
    x, _ = clustered_corpus(
        key, args.n, args.dim, n_clusters=args.nlist, noise=0.25
    )
    x.block_until_ready()

    cfg = IVFFlatConfig(
        dimension=args.dim, nlist=args.nlist, dtype=args.dtype,
        train_sample_per_list=64, max_capacity_factor=4.0,
    )
    idx = IVFFlatIndex(cfg)
    print(f"[wire-prep] train ({time.time() - t0:.0f}s)")
    idx.train_from_device(x)
    print(f"[wire-prep] build ({time.time() - t0:.0f}s)")
    idx.build_from_device(x)
    jax.block_until_ready(idx.arena.arena)
    del x

    # Server data-dir layout the engine's _recover() expects.
    data = args.data_path
    idir = os.path.join(data, "indices", args.index_name)
    os.makedirs(idir, exist_ok=True)
    with open(os.path.join(idir, "config.json"), "w") as f:
        json.dump({
            "dimension": args.dim, "metric": "L2", "nlist": args.nlist,
            "m": 0, "nbits": 8, "dtype": args.dtype,
        }, f, indent=2)
    em = EpochManager(os.path.join(data, "epochs"))
    epoch_id, epoch_dir = em.create_epoch(args.index_name)
    print(f"[wire-prep] snapshot -> {epoch_dir} ({time.time() - t0:.0f}s)")
    idx.save(epoch_dir)
    em.activate_epoch(args.index_name, epoch_id)
    counts = np.asarray(idx.arena.counts)
    print(json.dumps({
        "phase": "prepare", "n": args.n, "dim": args.dim,
        "nlist": args.nlist, "dtype": args.dtype, "epoch": epoch_id,
        "capacity": idx.arena.capacity,
        "counts_max": int(counts.max()),
        "prep_s": round(time.time() - t0, 1),
    }))
    return 0




def report(args) -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from cuda_acceleratedvectordatabaseengine_tpu.tools.load_test import (
        parse_stage_metrics,
    )

    runs = {}
    for path in args.run:
        with open(path) as f:
            runs[os.path.splitext(os.path.basename(path))[0]] = json.load(f)
    complete = {
        name: r for name, r in runs.items()
        if r.get("success_rate", 0) >= 0.99
    }

    def _summ(name):
        r = runs[name]
        return {
            "run": name,
            "qps": r["qps"],
            "p50_ms": r["p50_ms"],
            "p99_ms": r["p99_ms"],
            "server_p99_ms": r.get("server_p99_ms"),
            "batch": r.get("batch"),
            "stream": bool(r.get("stream")),
            "success_rate": r.get("success_rate"),
        }

    # Every headline figure travels WITH its own run's latencies (the r4
    # summary paired the streaming ladder's QPS with the b1 run's p99 —
    # off by ~37x; ADVICE r4). Only >=99%-success scenarios qualify.
    best_qps_name = max(complete, key=lambda n: complete[n]["qps"])
    unary = {n: r for n, r in complete.items() if not r.get("stream")}
    best_unary_name = (
        max(unary, key=lambda n: unary[n]["qps"]) if unary else None
    )
    best_p99_name = min(complete, key=lambda n: complete[n]["p99_ms"])
    b1 = next(
        (r for name, r in runs.items() if name.startswith("b1")), None
    )
    stages = {}
    if args.stages and os.path.isfile(args.stages):
        with open(args.stages) as f:
            stages = parse_stage_metrics(f.read())
    out = {
        "metric": "wire_request_latency",
        "best_sustained": _summ(best_qps_name),
        "best_unary": _summ(best_unary_name) if best_unary_name else None,
        "lowest_p99": _summ(best_p99_name),
        # Back-compat scalar (bench.py embeds it); its latency context is
        # best_sustained above — do NOT pair it with another run's p99.
        "qps_best_sustained": complete[best_qps_name]["qps"],
        # The b1 operating point VERDICT r3 item 2 targets (server p50
        # within 10 ms of the ~29 ms relay dispatch floor), with its own
        # isolated serving-stage decomposition (decode / queue_wait /
        # dispatch / fetch / encode — each scenario resets the windows).
        "b1_server_p50_ms": b1.get("server_p50_ms") if b1 else None,
        "b1_client_p50_ms": b1.get("p50_ms") if b1 else None,
        "b1_client_p99_ms": b1.get("p99_ms") if b1 else None,
        "b1_server_stages_ms": b1.get("server_stages_ms") if b1 else None,
        "relay_dispatch_floor_ms": 29.0,
        "runs": runs,
        "server_stages_ms_final": stages,
        "note": (
            "per-request latency over gRPC against the live server on one "
            "TPU chip; client-observed figures include python-proto "
            "serialization and the shared single-vCPU test host — "
            "server_* percentiles measure inside the Search RPC. Query "
            "H2D rides the harness relay at ~0.04 GB/s (a datacenter TPU "
            "host moves the same batch >100x faster over PCIe), so "
            "sustained wire QPS here is transport-bound, not engine-bound."
        ),
    }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("prepare")
    pp.add_argument("--data-path", required=True)
    pp.add_argument("--n", type=int, default=1_000_000)
    pp.add_argument("--dim", type=int, default=768)
    pp.add_argument("--nlist", type=int, default=4096)
    pp.add_argument("--dtype", default="int8")
    pp.add_argument("--index-name", default="default")
    pp.add_argument("--seed", type=int, default=42)
    pr = sub.add_parser("report")
    pr.add_argument("--run", action="append", required=True,
                    help="load_test JSON output file (repeatable)")
    pr.add_argument("--stages", default="",
                    help="file holding the server's /metrics text (the "
                         "vdb_stage_milliseconds decomposition)")
    pr.add_argument("--output", default="WIRE.json")
    args = p.parse_args(argv)
    return prepare(args) if args.cmd == "prepare" else report(args)


if __name__ == "__main__":
    raise SystemExit(main())
