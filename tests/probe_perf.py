"""Perf probe: time the device overlap engine phase by phase.

Usage: python tests/probe_perf.py [n_target] [n_query]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    if os.environ.get("PROBE_STACK_DUMPS"):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["PROBE_STACK_DUMPS"]), repeat=True,
            file=sys.stderr)
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_query = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from util_synth import make_genome, sample_reads
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine.device_overlap import DeviceOverlapEngine

    rng = np.random.RandomState(1234)
    genome = make_genome(rng, 400000)
    reads = sample_reads(rng, genome, n_target, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:n_query]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))

    for it in range(3):
        t0 = time.time()
        eng = DeviceOverlapEngine(cfg, queries)
        t_init = time.time() - t0
        rows = eng.run(list(reads))
        wall = time.time() - t0
        print("iter %d: wall %.2fs (init %.2fs) rps %.1f phases %s "
              "fallback %d devcalls %d" % (
                  it, wall, t_init, n_target / wall,
                  {k: round(v, 2) for k, v in sorted(eng.phase_s.items())},
                  eng.n_host_fallback, eng.n_device_calls), flush=True)
    assert rows is not None


if __name__ == "__main__":
    main()
