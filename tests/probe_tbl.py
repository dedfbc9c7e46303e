"""Direct-address left-table feasibility probe (k=12, 2k=24)."""
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
    r = None
    for _ in range(n):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("%-30s %8.1f ms" % (tag, best * 1e3), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp

    _ = np.asarray(jnp.zeros(4) + 1)
    rng = np.random.RandomState(0)
    N = 1 << 23
    B = 1 << 24
    ih_np = np.sort(rng.randint(0, B, N).astype(np.int32))
    # sentinel-pad tail like the canonical index
    ih_np[-(N // 8):] = np.int32(0x7FFFFFFF)
    ih_np = np.sort(ih_np)
    ih = jnp.asarray(ih_np)
    q = jnp.asarray(rng.randint(0, B, (128, 4096)).astype(np.int32))
    jax.block_until_ready((ih, q))

    @jax.jit
    def build_hist(ih):
        v = jnp.clip(ih, 0, B)  # sentinel -> bin B (dropped)
        cnt = jnp.zeros((B + 2,), jnp.int32).at[v + 1].add(
            jnp.where(ih < B, 1, 0), mode="drop")
        return jnp.cumsum(cnt[:B + 2])

    tbl = t("build scatter-add+cumsum", lambda: build_hist(ih))

    @jax.jit
    def build_starts(ih):
        idx = jnp.arange(N, dtype=jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ih[:-1]])
        is_start = (ih != prev) & (ih < B)
        tb = jnp.full((B + 1,), -1, jnp.int32).at[
            jnp.where(is_start, jnp.clip(ih, 0, B), B)].max(
            jnp.where(is_start, idx, -1), mode="drop")
        # backfill: left[v] = next defined start at or after v
        n_valid = jnp.sum((ih < B).astype(jnp.int32))
        rev = jnp.flip(tb)
        filled = jax.lax.associative_scan(
            lambda a, b: jnp.where(b >= 0, b, a),
            jnp.concatenate([jnp.full((1,), n_valid, jnp.int32),
                             rev]))
        return jnp.flip(filled)[:B + 1]

    tbl2 = t("build start-scatter+scan", lambda: build_starts(ih))

    @jax.jit
    def lookup(tbl, q):
        l = tbl[q]
        r = tbl[q + 1]
        return l, r - l

    t("lookup (128,4096) x2", lambda: lookup(tbl, q))

    # correctness vs searchsorted
    l_ref = np.searchsorted(ih_np, np.asarray(q).ravel(), side="left")
    l1 = np.asarray(tbl)[np.asarray(q).ravel() + 1]
    print("hist table match:", bool((l1 == l_ref).all()), flush=True)
    l2 = np.asarray(tbl2)[np.asarray(q).ravel()]
    print("start table match:", bool((l2 == l_ref).all()), flush=True)


if __name__ == "__main__":
    main()
