"""Dev-only: characterize the axon relay's host-RSS retention on H2D
staging (observed: a 20M streaming serve loop grew to 130 GB RSS and was
OOM-killed).

Measured result (2026-08-18, one v5e chip over the relay): RSS grows by
EXACTLY the staged bytes on every jnp.asarray H2D transfer (+235 MB/iter
for a 128x2560x768 int8 stack) and is never released — not by refcount,
not by explicit ``arr.delete()`` + ``gc.collect()``. The retention is
inside the axon PJRT plugin (libaxon_pjrt.so), which also explains the
apparent 1.2 GB/s "upload" speed: the client records the literal and
ships it lazily. Nothing app-side can free it; long miss-heavy streaming
runs on THIS HARNESS are host-RAM-bounded at ~(RAM / staged GB) batches.
Real TPU-VM hosts do not have this pathology.

Runs the exact upload shape HbmListCache uses: a [slots, cap, dim] int8
arena updated by a donated scatter of ~260 MB staging batches. Prints RSS
after every iteration. On a healthy backend RSS is flat after iter 1.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np


def rss_gb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / (1 << 20)
    return -1.0


def main():
    import jax
    import jax.numpy as jnp

    slots, cap, dim = 512, 2560, 768
    batch = 128                      # lists per staged upload (~250 MB)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter(arena, idx, stack):
        return arena.at[idx].set(stack)

    arena = jnp.zeros((slots, cap, dim), jnp.int8)
    arena.block_until_ready()
    print(f"arena ready: {arena.nbytes / (1 << 30):.2f} GB device, "
          f"host RSS {rss_gb():.2f} GB", flush=True)

    rng = np.random.default_rng(0)
    for it in range(16):
        stack = rng.integers(-127, 127, (batch, cap, dim)).astype(np.int8)
        idx = np.arange(batch, dtype=np.int32) + (it * batch) % (slots - batch)
        t0 = time.time()
        arena = scatter(arena, jnp.asarray(idx), jnp.asarray(stack))
        arena.block_until_ready()
        del stack
        print(f"iter {it}: {time.time() - t0:6.1f}s upload, "
              f"RSS {rss_gb():6.2f} GB", flush=True)


if __name__ == "__main__":
    main()
