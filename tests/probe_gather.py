"""Gather-throughput probe: single-element vs contiguous-slice gathers
from an 8M i32 array at the production query count (1M addresses)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def t(tag, fn, n=4):
    import jax
    best = None
    for _ in range(n):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("%-34s %8.1f ms" % (tag, best * 1e3), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    _ = np.asarray(jnp.zeros(4) + 1)
    rng = np.random.RandomState(0)
    N = 1 << 23
    ih = jnp.asarray(rng.randint(0, 1 << 24, N).astype(np.int32))
    nq = 1 << 20
    idx = jnp.asarray(rng.randint(0, N - 64, nq).astype(np.int32))
    jax.block_until_ready((ih, idx))

    g1 = jax.jit(lambda ih, idx: ih[idx])
    t("1-elem gather x 1M", lambda: g1(ih, idx))

    for K in (4, 8, 16, 32):
        def gk(ih, idx, K=K):
            # contiguous K-slice per address via gather slice_sizes
            return jax.vmap(
                lambda i: jax.lax.dynamic_slice(ih, (i,), (K,)))(idx)
        gkj = jax.jit(gk)
        t("%2d-contig slice x 1M" % K, lambda: gkj(ih, idx))

    # 2-D layout alternative: ih reshaped (N//128, 128); gather rows
    ih2 = ih.reshape(-1, 128)
    ridx = idx >> 7
    g2 = jax.jit(lambda a, r: a[r])
    t("128-row gather x 1M (2D)", lambda: g2(ih2, ridx))


if __name__ == "__main__":
    main()
