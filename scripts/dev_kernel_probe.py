"""Dev-only: cheap REAL-TPU compile/correctness probe for grouped-kernel
variants. Uses a tiny arena with production-shaped blocks (cap/dim/m/k),
so Mosaic lowering issues surface in ~seconds without a 10M build.

    python scripts/dev_kernel_probe.py --topk t4 --cap 2560 --m 48

Prints PROBE_OK with timings, or crashes the way the full bench would —
run it before wiring any new kernel variant into a long sweep.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nlist", type=int, default=16)
    p.add_argument("--cap", type=int, default=2560)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--m", type=int, default=48)
    p.add_argument("--topk", default="auto")
    p.add_argument("--inline", action="store_true")
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cuda_acceleratedvectordatabaseengine_tpu.ops import pallas_scan
    from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric
    from cuda_acceleratedvectordatabaseengine_tpu.ops.scan import (
        scan_probed_lists,
    )

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kk = jax.random.split(key, 6)
    nlist, cap, dim = args.nlist, args.cap, args.dim
    arena_f = jax.random.normal(kk[0], (nlist, cap, dim), jnp.float32)
    anchors = jax.random.normal(kk[1], (nlist, dim), jnp.float32) * 4.0
    res = arena_f
    amax = jnp.max(jnp.abs(res), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    arena = jnp.clip(
        jnp.round(res / scale[:, :, None]), -127, 127
    ).astype(jnp.int8)
    deq = anchors[:, None, :] + arena.astype(jnp.float32) * scale[:, :, None]
    arena_sq = jnp.sum(deq * deq, axis=-1)
    counts = jnp.full((nlist,), cap - 128, jnp.int32)
    q = jax.random.normal(kk[2], (args.batch, dim), jnp.float32)
    # distinct probes per row (duplicate probes duplicate candidates and
    # make the top-k SET legitimately tie-ambiguous across impls)
    rkeys = jax.random.uniform(kk[3], (args.batch, nlist))
    probe = jnp.argsort(rkeys, axis=1)[:, :args.nprobe].astype(jnp.int32)

    common = dict(
        k=args.k, metric=Metric.L2,
        arena_scale=scale, arena_anchors=anchors,
    )
    t0 = time.time()
    d, pos = pallas_scan.scan_probed_lists_pallas_grouped(
        q, arena, arena_sq, counts, probe, m_budget=args.m,
        topk_impl=args.topk, stage_inline=(True if args.inline else None),
        **common,
    )
    jax.block_until_ready((d, pos))
    compile_s = time.time() - t0

    # Value sanity vs the XLA scan (accumulation order differs on the MXU,
    # so only distances compare — boundary ties can swap positions).
    rd, _ = scan_probed_lists(q, arena, arena_sq, counts, probe, **common)
    rd = np.asarray(rd)
    d, pos = np.asarray(d), np.asarray(pos)
    fin = np.isfinite(rd)
    np.testing.assert_allclose(d[fin], rd[fin], rtol=2e-4, atol=2e-4)
    # Exact positional parity vs the k-pass emitter ON DEVICE (identical
    # distance math — only the selection algorithm differs).
    if args.topk != "passes":
        pd, ppos = pallas_scan.scan_probed_lists_pallas_grouped(
            q, arena, arena_sq, counts, probe, m_budget=args.m,
            topk_impl="passes",
            stage_inline=(True if args.inline else None), **common,
        )
        pd, ppos = np.asarray(pd), np.asarray(ppos)
        np.testing.assert_allclose(d[fin], pd[fin], rtol=0, atol=0)
        ok = all(
            set(a[f].tolist()) == set(b[f].tolist())
            for a, b, f in zip(pos, ppos, fin)
        )
        assert ok, "position mismatch vs passes emitter"

    t1 = time.time()
    outs = [
        pallas_scan.scan_probed_lists_pallas_grouped(
            q, arena, arena_sq, counts, probe, m_budget=args.m,
            topk_impl=args.topk,
            stage_inline=(True if args.inline else None), **common,
        )
        for _ in range(args.reps)
    ]
    jax.block_until_ready(outs)
    dt = (time.time() - t1) / args.reps * 1000
    print(
        f"PROBE_OK topk={args.topk} compile={compile_s:.1f}s "
        f"per_call={dt:.2f}ms", flush=True,
    )


if __name__ == "__main__":
    main()
