"""Production glue of the fused Pallas sketch kernel, exercised on the
CPU test platform (interpret mode) via LONGQC_SKETCH_PALLAS=1.

Round-4 gap (ADVICE): the tile_flat pallas=True branch and the _Group
pallas sketch path only ever ran on real TPU hardware — the meta/emit
decode, flat (R, W)-column expansion, crop validation interplay and the
flag->re-sketch path had no CPU coverage. These tests pin them against
the pallas=False XLA path and the host spec.
"""

import numpy as np
import pytest

from longqc_tpu.engine import device_index as di
from longqc_tpu.ops.ringprop import INF32
from test_device_index import _rand_reads


def _flat_triples(res):
    ih, irid, ips = (np.asarray(res[0]), np.asarray(res[1]),
                     np.asarray(res[2]))
    keep = ih != INF32
    return sorted(zip(ih[keep].tolist(), irid[keep].tolist(),
                      ips[keep].tolist()))


@pytest.mark.parametrize("k,w", [(12, 5), (15, 10)])
def test_tile_flat_pallas_matches_xla(k, w):
    rng = np.random.RandomState(19)
    part = _rand_reads(rng, 50, 30, 1500)
    tiles, jumbo = di.pack_part_tiles(part, w,
                                      ladder=di.TILE_LADDER_SMALL)
    assert not jumbo
    n_pallas_ok = 0
    for t in tiles:
        args = (np.asarray(t.codes2), np.asarray(t.nmask),
                np.asarray(t.startmask), np.asarray(t.endmask),
                np.asarray(t.starts), np.asarray(t.gids),
                np.asarray(t.used))
        import jax.numpy as jnp
        jargs = tuple(jnp.asarray(a) for a in args)
        r0 = di.tile_flat(*jargs, R=t.R, W=t.W, k=k, w=w,
                          wide=False, pallas=False)
        if not di.sketch_pallas_ok(t.W, k, w, False, False):
            continue
        n_pallas_ok += 1
        r1 = di.tile_flat(*jargs, R=t.R, W=t.W, k=k, w=w,
                          wide=False, pallas=True)
        assert _flat_triples(r0) == _flat_triples(r1)
        assert int(np.asarray(r0[3])) == int(np.asarray(r1[3]))
        assert not np.asarray(r1[4]).any()       # no lane flagged
        assert not bool(np.asarray(r1[5]))
    assert n_pallas_ok > 0


def test_engine_rows_with_pallas_sketch(monkeypatch):
    """End-to-end device engine with the Pallas sketch path forced on
    (interpret mode): rows must equal the host spec, including the
    flag->re-sketch path for adversarial symmetric runs."""
    from util_synth import make_genome, sample_reads
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import overlap_host as oh
    from longqc_tpu.engine.device_overlap import overlap_run_device2

    monkeypatch.setenv("LONGQC_SKETCH_PALLAS", "1")
    rng = np.random.RandomState(31)
    genome = make_genome(rng, 15000) + "AT" * 400 + make_genome(rng, 4000)
    reads = sample_reads(rng, genome, 70, min_len=600, max_len=1800,
                         err=0.1, junk_frac=0.08)
    queries = reads[:24]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    rows_host = oh.overlap_run(list(reads), queries, cfg)
    rows_dev = overlap_run_device2(list(reads), queries, cfg)
    assert rows_dev == rows_host
