"""Tile-path timing probe (real TPU): per-tile device time for the
fused sketch kernel + expansion + per-tile sort, at the production
tile shapes, plus the canonical merge and one count/step pair.

Usage: python tests/probe_tile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def t(tag, fn, n=3):
    import jax
    best = None
    r = None
    for _ in range(n):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("%-34s %8.1f ms" % (tag, best * 1e3), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from util_synth import make_genome, sample_reads
    from longqc_tpu.engine import device_index as di

    _ = np.asarray(jnp.zeros(4) + 1)   # open d2h: honest timings

    rng = np.random.RandomState(4321)
    n_reads = int(os.environ.get("PROBE_N", "10000"))
    genome = make_genome(rng, 20000000)
    reads = sample_reads(rng, genome, n_reads, min_len=800,
                         max_len=2500, err=0.12, junk_frac=0.1)
    k, w = 12, 5

    tiles, jumbo = di.pack_part_tiles(reads, w)
    tiles = tiles + jumbo
    print("tiles:", [(tt.R, tt.W) for tt in tiles], flush=True)

    tt = tiles[0]
    args = tuple(jnp.asarray(a) for a in (
        tt.codes2, tt.nmask, tt.startmask, tt.endmask, tt.starts,
        tt.gids, tt.used))
    jax.block_until_ready(args)
    use_p = di.use_pallas_sketch(tt.W, k, w, False)
    print("pallas:", use_p, flush=True)

    # full tile_flat
    t("tile_flat (1 tile)", lambda: di.tile_flat(
        *args, R=tt.R, W=tt.W, k=k, w=w, wide=False, pallas=use_p))

    # sketch kernel alone
    if use_p:
        from longqc_tpu.ops import sketch_pallas as skp

        packed = (tt.codes2, tt.nmask, tt.startmask, tt.endmask)

        def put(a, width):
            buf = np.zeros((width, tt.R), np.int32)
            buf[:, :] = np.asarray(a).astype(np.uint32).view(np.int32).T
            return jnp.asarray(buf)

        def puti(a):
            buf = np.zeros((skp._RPR, tt.R), np.int32)
            buf[:, :] = np.asarray(a, dtype=np.int32).T
            return jnp.asarray(buf)

        targs = (put(tt.codes2, tt.W // 16), put(tt.nmask, tt.W // 32),
                 put(tt.startmask, tt.W // 32),
                 put(tt.endmask, tt.W // 32),
                 puti(tt.starts), puti(tt.gids))
        jax.block_until_ready(targs)
        t("sketch kernel (R=%d,W=%d)" % (tt.R, tt.W),
          lambda: skp._sketch_pallas_t(
              *targs, W=tt.W, k=k, w=w, n_blk=tt.R // skp._LAN,
              interpret=False))

    # all tiles (the tiles phase of the index build)
    t("all tiles", lambda: [di.tile_flat(
        jnp.asarray(x.codes2), jnp.asarray(x.nmask),
        jnp.asarray(x.startmask), jnp.asarray(x.endmask),
        jnp.asarray(x.starts), jnp.asarray(x.gids),
        jnp.asarray(x.used),
        R=x.R, W=x.W, k=k, w=w, wide=False,
        pallas=di.use_pallas_sketch(x.W, k, w, False)) for x in tiles],
      n=2)


if __name__ == "__main__":
    main()
