"""Compile-vetting probe: compile every canonical engine program
sequentially with per-program wall times, writing successes into the
persistent cache. Run this after ANY change to the engine's jitted
programs BEFORE running the engine on the tunneled backend — a single
pathological compile (known cases: step at A=131072, merge at >= 4M
slots, runlens/kth at 16M as unrolled graphs) starves every
device->host pull behind it and can wedge the backend for ~20 minutes
past client death.

  python tests/probe_compile.py [conc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine.device_overlap import precompile_lowered


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "seq"
    print(jax.devices(), flush=True)
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    t0 = time.time()
    lowered = precompile_lowered(cfg, [4096])
    print("lowered %d programs in %.1fs" % (len(lowered), time.time() - t0),
          flush=True)

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
        from longqc_tpu.parallel.warm import compile_concurrently
        t0 = time.time()
        compile_concurrently(lowered, tag="probe")
        print("TOTAL concurrent: %.1fs" % (time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
