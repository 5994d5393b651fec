"""Pallas TPU kernel: probed-list distance scan with scalar-prefetch DMA.

Third implementation of the hot scan (besides the XLA gather scan and the
ragged grouped matmul). The XLA gather path materializes every gathered
list block in HBM before the matmul reads it back — 2× HBM traffic. This
kernel uses ``PrefetchScalarGridSpec``: the probe-id table is prefetched to
SMEM, the BlockSpec index_map selects each grid step's arena block *by
probe id*, and the Pallas pipeline emitter double-buffers the HBM→VMEM DMA
of the next list block behind the current block's compute (the pattern from
the TPU kernel guide's scalar-prefetch / double-buffering sections). The
block never round-trips through HBM: it lands in VMEM, is reduced against
the query there, and only the [cap] distance row is written out.

Distance semantics match ``ops.scan._block_distances`` exactly; the final
top-k runs outside (XLA), like the ragged path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_acceleratedvectordatabaseengine_tpu.ops.distance import Metric
from cuda_acceleratedvectordatabaseengine_tpu.ops.topk import topk_smallest


def _kernel(probe_ref, counts_ref, q_ref, block_ref, block_sq_ref, out_ref,
            *, metric: Metric):
    b = pl.program_id(0)
    p = pl.program_id(1)
    list_id = probe_ref[b, p]
    q = q_ref[:].astype(jnp.float32)            # [1, D]
    blk = block_ref[0]                          # [cap, D] (VMEM)
    cap = blk.shape[0]
    # [cap, 1] matvec on the MXU with fp32 accumulation.
    dots = jax.lax.dot_general(
        blk, q.astype(blk.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(1, cap)
    if metric == Metric.L2:
        q_sq = jnp.sum(q * q)
        d = jnp.maximum(q_sq - 2.0 * dots + block_sq_ref[:], 0.0)
    elif metric == Metric.INNER_PRODUCT:
        d = -dots
    else:  # cosine over pre-normalized inputs
        d = 1.0 - dots
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    valid = (slot < counts_ref[jnp.maximum(list_id, 0)]) & (list_id >= 0)
    out_ref[:] = jnp.where(valid, d, jnp.inf).reshape(1, 1, cap)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "approx", "interpret"),
)
def scan_probed_lists_pallas(
    queries: jax.Array,     # [B, D] fp32 (pre-normalized if cosine)
    arena: jax.Array,       # [nlist, cap, D]
    arena_sq: jax.Array,    # [nlist, cap] fp32
    counts: jax.Array,      # [nlist] int32
    probe_ids: jax.Array,   # [B, P] int32 (-1 = no probe)
    k: int,
    metric: Metric = Metric.L2,
    approx: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    batch, nprobe = probe_ids.shape
    nlist, cap, dim = arena.shape
    q = queries.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # probe table + counts
        grid=(batch, nprobe),
        in_specs=[
            # query row for this b
            pl.BlockSpec((1, dim), lambda b, p, probe, cnt: (b, 0)),
            # arena block selected BY PROBE ID (the scalar-prefetch trick)
            pl.BlockSpec(
                (1, cap, dim),
                lambda b, p, probe, cnt: (
                    jnp.maximum(probe[b, p], 0), 0, 0
                ),
            ),
            pl.BlockSpec(
                (1, cap),
                lambda b, p, probe, cnt: (jnp.maximum(probe[b, p], 0), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, cap), lambda b, p, probe, cnt: (b, p, 0)),
    )
    run = pl.pallas_call(
        functools.partial(_kernel, metric=metric),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, nprobe, cap), jnp.float32),
        interpret=interpret,
    )
    d = run(probe_ids, counts, q, arena, arena_sq)   # [B, P, cap]

    safe = jnp.maximum(probe_ids, 0)
    slot_iota = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.where(
        (slot_iota[None, None, :] < counts[safe][:, :, None])
        & (probe_ids >= 0)[:, :, None],
        safe[:, :, None] * cap + slot_iota[None, None, :],
        -1,
    )
    return topk_smallest(
        d.reshape(batch, nprobe * cap),
        k,
        idx=pos.reshape(batch, nprobe * cap),
        approx=approx,
    )
