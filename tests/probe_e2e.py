"""Large-point end-to-end engine timing (real TPU): mirrors bench.py's
timed loop (engine construction + full run) without the reference
build. Prints wall + phase split per run."""
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
    from util_synth import make_genome, sample_reads
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import device_overlap as do

    _ = np.asarray(jnp.zeros(4) + 1)
    n_reads = int(os.environ.get("PROBE_N", "10000"))
    rng = np.random.RandomState(4321)
    print("generating...", flush=True)
    genome = make_genome(rng, 20000000)
    reads = sample_reads(rng, genome, n_reads, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:1000]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))

    n_timed = int(os.environ.get("PROBE_TIMED", "3"))
    rows0 = None
    for i in range(n_timed + 1):
        t0 = time.time()
        eng = do.DeviceOverlapEngine(cfg, queries)
        rows = eng.run(iter([reads]), parts=[reads])
        wall = time.time() - t0
        tag = "warmup" if i == 0 else "timed %d" % i
        print("%s: %.2fs  (%.0f reads/s)  phases: %s  fallback=%d"
              % (tag, wall, len(reads) / wall,
                 {k: round(v, 3) for k, v in sorted(eng.phase_s.items())},
                 eng.n_host_fallback), flush=True)
        if rows0 is None:
            rows0 = rows
        elif rows != rows0:
            print("WARNING: rows differ between runs!", flush=True)


if __name__ == "__main__":
    main()
