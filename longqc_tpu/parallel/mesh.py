"""Device-mesh data parallelism for the overlap pipeline.

Scaling model (SURVEY.md §2.3 P8, minimap2-coverage.c:434-444): the
reference's only scale axis is per-read-owned accumulator slots — each
thread owns its reads' lambda/m_cnts — with the sample index shared.
The mesh mapping is the same thing over chips: the part minimizer index
rides replicated, query lanes shard over the "data" axis, and per-read
state (lam/lam2/m_cnts/interval events) stays shard-local until the
host-side finalize. No collectives are needed in steady state; the QC
workload has no model weights, so shard_map data parallelism is the
whole story (engine/device_overlap._sharded_step).
"""

import jax
import numpy as np
from jax.sharding import Mesh

_BASES = "ACGT"


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _synthetic_reads(rng, genome_n, n_reads, min_len, max_len, err):
    """Tiny deterministic synthetic read set (mutated genome substrings
    plus junk) for the dryrun; mirrors tests/util_synth.sample_reads."""
    genome = "".join(_BASES[i] for i in rng.randint(0, 4, size=genome_n))
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(n_reads):
        ln = rng.randint(min_len, max_len)
        if rng.random_sample() < 0.1:
            seq = "".join(_BASES[j] for j in rng.randint(0, 4, size=ln))
        else:
            start = rng.randint(0, max(1, genome_n - ln))
            seq = genome[start:start + ln]
            if rng.random_sample() < 0.5:
                seq = seq.translate(comp)[::-1]
            out = []
            for ch in seq:
                r = rng.random_sample()
                if r < err * 0.5:
                    out.append(_BASES[rng.randint(0, 4)])
                elif r < err * 0.75:
                    pass
                elif r < err:
                    out.append(ch)
                    out.append(_BASES[rng.randint(0, 4)])
                else:
                    out.append(ch)
            seq = "".join(out)
        qual = "".join(chr(33 + q) for q in rng.randint(3, 41,
                                                        size=len(seq)))
        reads.append(["read%05d" % i, seq, qual])
    return reads


def overlap_dryrun(n_devices: int) -> None:
    """Run the PRODUCTION overlap engine lane-sharded over an n-device
    mesh (index replicated, query lanes split on the "data" axis) and
    assert its rows are identical to the single-device host spec —
    the real training-step analog of this framework, not a demo."""
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import overlap_host as oh
    from longqc_tpu.engine.device_overlap import overlap_run_device2

    mesh = make_mesh(n_devices)
    rng = np.random.RandomState(42)
    reads = _synthetic_reads(rng, 12000, 72, 500, 1400, 0.12)
    queries = reads[:4 * n_devices]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    rows = overlap_run_device2(list(reads), queries, cfg, mesh=mesh,
                               lanes_per_shard=8)
    rows_host = oh.overlap_run(list(reads), queries, cfg)
    assert rows == rows_host, "sharded engine rows diverge from host spec"
