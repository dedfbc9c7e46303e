"""Microbenchmarks of the primitives the engine leans on: lax.sort at
various sizes/operand counts, host->device transfer bandwidth, dispatch
latency. Informs the round-3 redesign."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    rng = np.random.RandomState(0)

    # 1D sort, 1 key + payloads, various sizes
    for N in (1 << 20, 1 << 22, 1 << 24):
        h = jnp.asarray(rng.randint(0, 1 << 31, N, np.int32))
        p1 = jnp.asarray(rng.randint(0, 1 << 31, N, np.int32))
        p2 = jnp.asarray(rng.randint(0, 1 << 31, N, np.int32))

        f1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0])
        f3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        f3k = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3))
        print("sort1d N=%d 1op: %.3fs" % (N, timeit(f1, h)), flush=True)
        print("sort1d N=%d 3op 1key: %.3fs" % (N, timeit(f3, h, p1, p2)),
              flush=True)
        print("sort1d N=%d 3op 3key: %.3fs" % (N, timeit(f3k, h, p1, p2)),
              flush=True)

    # 2D row sort (Q, A)
    for Q, A in ((128, 8192), (128, 32768)):
        x = jnp.asarray(rng.randint(0, 1 << 31, (Q, A), np.int32))
        y = jnp.asarray(rng.randint(0, 1 << 31, (Q, A), np.int32))
        z = jnp.asarray(rng.randint(0, 1 << 31, (Q, A), np.int32))
        f = jax.jit(lambda a, b, c: jax.lax.sort(
            (a, b, c), dimension=1, num_keys=2, is_stable=True))
        print("sort2d (%d,%d) 3op 2key stable: %.3fs"
              % (Q, A, timeit(f, x, y, z)), flush=True)
        fa = jax.jit(lambda a: jnp.argsort(a, axis=1))
        print("argsort2d (%d,%d): %.3fs" % (Q, A, timeit(fa, x)), flush=True)

    # host->device transfer
    for MB in (4, 32):
        a = np.zeros(MB << 20, np.uint8)
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(jnp.asarray(a))
        dt = (time.time() - t0) / 3
        print("h2d %dMB: %.3fs (%.1f MB/s)" % (MB, dt, MB / dt), flush=True)

    # device->host
    d = jnp.zeros(32 << 20, jnp.uint8)
    jax.block_until_ready(d)
    t0 = time.time()
    _ = np.asarray(d)
    print("d2h 32MB: %.3fs (%.1f MB/s)" % (time.time() - t0,
                                           32 / (time.time() - t0)),
          flush=True)

    # dispatch latency: tiny jitted op round trip
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    f(x)
    t0 = time.time()
    for _ in range(100):
        x = f(x)
    jax.block_until_ready(x)
    print("dispatch chain x100: %.4fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(f(x))
    print("dispatch roundtrip x20: %.4fs" % (time.time() - t0), flush=True)

    # cumsum/scan over big 1D
    g = jax.jit(lambda a: jnp.cumsum(a))
    h1 = jnp.ones(1 << 24, jnp.int32)
    print("cumsum 16M: %.3fs" % timeit(g, h1), flush=True)


if __name__ == "__main__":
    main()
