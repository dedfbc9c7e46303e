"""Pre-warm the persistent XLA compilation cache for the device engine.

Compiles every canonical program of the overlap engine (plus the
chunk-QC kernels a sampleqc run needs) for the standard presets and
writes them to .cache/jaxcomp, so later runs — including bench.py under
the driver's budget — start from disk-cache hits instead of cold remote
compiles. Run on the target backend:

    python tools/warm_cache.py [preset ...]

The repo ships a pre-warmed cache for the attached TPU backend; this
script regenerates it after engine changes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from longqc_tpu import config as C
    from longqc_tpu.engine.device_overlap import precompile
    from longqc_tpu.parallel.warm import start_warm_pull

    print("backend: %s" % jax.default_backend(), flush=True)
    start_warm_pull()
    presets = sys.argv[1:] or ["pb-rs2", "ont-ligation"]
    t0 = time.time()
    seen = set()
    for name in presets:
        cfg = C.overlap_config_for_sample(C.PRESETS[name])
        key = (cfg.index.k, cfg.index.w)
        if key in seen:
            continue
        seen.add(key)
        print("precompiling k=%d w=%d ..." % key, flush=True)
        precompile(cfg, [4096, 16384], background=False)
    print("done in %.1fs" % (time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
