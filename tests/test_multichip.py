"""Multi-device sharding of the PRODUCTION overlap engine over the
virtual 8-device CPU mesh: lane-sharded engine rows must be identical
to the single-device host spec (and to the unsharded device engine)."""

import jax
import numpy as np
import pytest

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine import overlap_host as oh
from longqc_tpu.engine.device_overlap import overlap_run_device2
from longqc_tpu.parallel.mesh import make_mesh
from util_synth import make_genome, sample_reads


def _cfg():
    return OverlapConfig(index=IndexOpt(k=12, w=5),
                         map=MapOpt(min_score_med=80, min_score_good=160),
                         flt=FltOpt(min_ovlp=0))


def test_sharded_engine_rows_match_host():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    rng = np.random.RandomState(5)
    genome = make_genome(rng, 20000)
    reads = sample_reads(rng, genome, 90, min_len=500, max_len=1500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:24]
    cfg = _cfg()
    rows_host = oh.overlap_run(list(reads), queries, cfg)
    mesh = make_mesh(8)
    rows = overlap_run_device2(list(reads), queries, cfg, mesh=mesh,
                               lanes_per_shard=8)
    assert rows == rows_host


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
