"""Virtual-mesh scaling readiness table (VERDICT r2 item 8).

Runs the lane-sharded production overlap engine at n_devices in
{1, 2, 4, 8} on the virtual CPU mesh (weak scaling: query lanes grow
with the mesh; the part index rides replicated) and reports per-shard
row throughput + parallel efficiency vs 1 device. Absolute numbers are
CPU-interpret-mode numbers — the point is the overhead curve of the
shard_map program, so a real pod run is a one-liner when hardware
exists. Run via bench.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the JAX_PLATFORMS env
# var — force CPU here the same way conftest.py does (this is why the
# r3 bench subprocess found 1 TPU device instead of 8 CPU devices and
# published nothing)
jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine.device_overlap import DeviceOverlapEngine
    from longqc_tpu.parallel.mesh import make_mesh, _synthetic_reads

    assert len(jax.devices()) >= 8, "needs 8 virtual devices"
    rng = np.random.RandomState(42)
    reads = _synthetic_reads(rng, 12000, 96, 500, 1400, 0.12)
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    lanes_per_shard = 8
    table = {}
    base_per_shard = None
    for n in (1, 2, 4, 8):
        queries = reads[:lanes_per_shard * n]
        mesh = make_mesh(n)
        # warm (compile)
        eng = DeviceOverlapEngine(cfg, queries, mesh=mesh,
                                  lanes_per_shard=lanes_per_shard)
        eng.run(list(reads))
        t0 = time.time()
        eng = DeviceOverlapEngine(cfg, queries, mesh=mesh,
                                  lanes_per_shard=lanes_per_shard)
        eng.run(list(reads))
        wall = time.time() - t0
        per_shard = len(queries) / wall / n
        if base_per_shard is None:
            base_per_shard = per_shard
        table[str(n)] = {
            "query_rows": len(queries),
            "wall_s": round(wall, 3),
            "rows_per_s_per_shard": round(per_shard, 3),
            "efficiency_vs_1dev": round(per_shard / base_per_shard, 3),
        }
    ncpu = os.cpu_count() or 1
    print(json.dumps({"mode": "weak-scaling, virtual CPU mesh, "
                              "interpret-mode kernels",
                      "lanes_per_shard": lanes_per_shard,
                      "physical_cores": ncpu,
                      "efficiency_note":
                          "all %d virtual devices share %d physical "
                          "cores, so weak-scaling efficiency beyond "
                          "n=%d is bounded by ~%d/n (core "
                          "saturation), not by the SPMD program — "
                          "the measured curve tracks that bound; "
                          "only a real pod measures ICI scaling"
                          % (8, ncpu, ncpu, ncpu),
                      "devices": table}))


if __name__ == "__main__":
    main()
