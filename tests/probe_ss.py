"""n_coarse sweep for _ss_left_2level at the production shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from longqc_tpu.engine import device_overlap as do

    _ = np.asarray(jnp.zeros(4) + 1)
    rng = np.random.RandomState(0)
    N = 1 << 23
    ih = jnp.asarray(np.sort(rng.randint(0, 1 << 24, N).astype(np.int32)))
    q = jnp.asarray(rng.randint(0, 1 << 24, (128, 4096)).astype(np.int32))
    jax.block_until_ready((ih, q))

    ref = None
    for nc in (512, 1024, 2048, 4096, 8192):
        fn = jax.jit(lambda ih, q, nc=nc: do._ss_left_2level(
            ih, q, n_coarse=nc))
        best = None
        for _ in range(4):
            t0 = time.time()
            r = fn(ih, q)
            jax.block_until_ready(r)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        r_np = np.asarray(r)
        if ref is None:
            ref = r_np
        ok = bool((r_np == ref).all())
        print("n_coarse %5d: %7.1f ms  match=%s" % (nc, best * 1e3, ok),
              flush=True)


if __name__ == "__main__":
    main()
