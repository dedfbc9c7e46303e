"""Compile-cost probe: time the cold compile of every canonical program
the device overlap engine needs, sequentially and concurrently.

Run with the persistent cache off to measure true cold cost:
  LONGQC_JAX_CACHE=off python tests/probe_compile.py [seq|conc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sds(shape, dtype=jnp.int32):
    return jax.ShapeDtypeStruct(shape, dtype)


def lower_all():
    """Return [(name, lowered)] for every canonical program."""
    from longqc_tpu.engine import device_index as di
    from longqc_tpu.engine import device_overlap as do
    from longqc_tpu.ops.sketch import sketch_batch
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt

    k, w = 12, 5
    out = []

    for (R, W) in di.TILE_LADDER:
        out.append((
            "tile_flat(%d,%d)" % (R, W),
            di.tile_flat.lower(
                sds((R, W // 16), jnp.uint32), sds((R, W // 32), jnp.uint32),
                sds((R, W // 32), jnp.uint32), sds((R, di.READS_PER_ROW)),
                sds((R, di.READS_PER_ROW)), sds((R,)),
                R=R, W=W, k=k, w=w)))
    base = di.TILE_LADDER[0][0] * di.TILE_LADDER[0][1] // 4
    n = base
    while n < di.N_IDX_SIZES[0]:
        out.append((
            "merge_sorted(%dk)" % (n // 1024),
            di.merge_sorted.lower(*([sds((n,))] * 6), n=n)))
        n *= 2
    out.append(("pad_to(16M)",
                di.pad_to.lower(*([sds((base,))] * 3),
                                n_out=di.N_IDX_SIZES[0])))
    out.append(("index_runlens(16M)",
                di.index_runlens.lower(sds((di.N_IDX_SIZES[0],)))))
    out.append(("kth_runlen(16M)",
                di.kth_runlen.lower(sds((di.N_IDX_SIZES[0],), jnp.bool_),
                                    sds((di.N_IDX_SIZES[0],)),
                                    sds((), jnp.int32))))

    B, blen = do.GROUP_Q, 4096
    M, M2 = blen // 2, blen
    out.append(("sketch_batch(%d,%d)" % (B, blen),
                sketch_batch.lower(sds((B, blen), jnp.uint8), sds((B,)),
                                   w=w, k=k)))
    out.append(("compact_sketch",
                do._compact_sketch.lower(
                    sds((B, blen)), sds((B, blen), jnp.uint32),
                    sds((B, blen)), sds((B, blen)), M=M)))
    out.append(("group_expand",
                do._group_expand.lower(sds((B, M)), sds((B,)), M2=M2)))

    cfg = OverlapConfig(index=IndexOpt(k=k, w=w),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    eng = do.DeviceOverlapEngine.__new__(do.DeviceOverlapEngine)
    eng.cfg = cfg
    eng.k, eng.w = k, w
    eng.lanes = do.GROUP_Q
    eng.interpret = jax.default_backend() != "tpu"

    class _G:
        pass

    g = _G()
    g.M, g.M2 = M, M2
    N = di.N_IDX_SIZES[0]
    Bp = do.B_PADS[0]
    for A in do.A_LADDER:
        st = do.DeviceOverlapEngine._static(eng, g, A)
        out.append((
            "step(A=%d)" % A,
            do._step.lower(
                sds((N,)), sds((N,)), sds((N,)), sds((Bp,)), sds((Bp,)),
                sds((), jnp.int32),
                sds((B, M)), sds((B, M)), sds((B, M)), sds((B, M2)),
                sds((B,)), sds((B,)), sds((B,)), sds((B,)), sds((B,)),
                sds((B,), jnp.int64), sds((B,), jnp.int64), sds((B,)),
                sds((B, M2)), sds((5,)), st=st)))
    out.append(("finalize_group",
                do._finalize_group.lower(
                    sds((B,), jnp.int64), sds((B,), jnp.int64),
                    sds((B, M2)), sds((B,)))))
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "seq"
    jax.devices()
    t00 = time.time()
    lowered = lower_all()
    print("lowering: %.1fs" % (time.time() - t00), flush=True)

    if mode == "seq":
        total = 0.0
        for name, lo in lowered:
            t0 = time.time()
            lo.compile()
            dt = time.time() - t0
            total += dt
            print("%-28s %7.2fs" % (name, dt), flush=True)
        print("TOTAL sequential: %.1fs" % total, flush=True)
    else:
        import concurrent.futures as cf
        nw = int(os.environ.get("PROBE_WORKERS", "8"))
        t0 = time.time()
        with cf.ThreadPoolExecutor(max_workers=nw) as ex:
            futs = {ex.submit(lo.compile): name for name, lo in lowered}
            for f in cf.as_completed(futs):
                f.result()
                print("%-28s done at %6.1fs" % (futs[f], time.time() - t0),
                      flush=True)
        print("TOTAL concurrent (%d workers): %.1fs"
              % (nw, time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
