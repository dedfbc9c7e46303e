"""Fused Pallas sketch kernel vs the XLA formulation and the oracle.

Runs in interpret mode on the CPU test platform; the same compiled
program runs on TPU. The kernel's output is position-aligned
(emit/hash/pos/strand/seg per column); comparisons reduce both sides
to multisets of (hash, pos, strand) with multiplicity per read.
"""

import numpy as np
import pytest

from longqc_tpu.engine import device_index as di
from longqc_tpu.ops.sketch_pallas import SENT  # noqa: F401
from oracles.sketch_ref import sketch as ref_sketch


def _rand_seq(rng, n, with_n=0.0):
    s = rng.choice(list("ACGT"), size=n)
    if with_n:
        s[rng.random_sample(n) < with_n] = "N"
    return "".join(s)


def _tile_for(reads, w, R, W):
    b = di._TileBuilder(R, W, max(w - 1, 1))
    for gid, r in enumerate(reads):
        b.add(gid, r[1])
    tiles = b.tiles()
    assert len(tiles) == 1
    return tiles[0]


def _run_kernel(t, k, w):
    from longqc_tpu.ops.sketch_pallas import sketch_tiles_pallas
    return sketch_tiles_pallas(t.codes2, t.nmask, t.startmask,
                               t.endmask, t.starts, t.gids,
                               W=t.W, k=k, w=w)


def _kernel_entries(res, t, row):
    """Per-read {gid: [(hash, local_pos, strand) x multiplicity]}."""
    emit = np.asarray(res["emit"][row])
    hsh = np.asarray(res["hash"][row])
    rid = np.asarray(res["rid"][row])
    pos = np.asarray(res["pos"][row])
    strand = np.asarray(res["strand"][row])
    out = {}
    for j in np.nonzero(emit > 0)[0]:
        out.setdefault(int(rid[j]), []).extend(
            [(int(np.uint32(hsh[j])), int(pos[j]), int(strand[j]))]
            * int(emit[j]))
    return out


@pytest.mark.parametrize("k,w", [(12, 5), (15, 5), (15, 10)])
def test_pallas_sketch_matches_oracle(k, w):
    rng = np.random.RandomState(17)
    reads = []
    for i in range(40):
        n = rng.randint(60, 420)
        reads.append(["r%d" % i, _rand_seq(rng, n)])
    # a few reads with Ns and short reads
    for i in range(6):
        reads.append(["n%d" % i, _rand_seq(rng, 200, with_n=0.05)])
    reads.append(["tiny", _rand_seq(rng, k + 2)])
    t = _tile_for(reads, w, R=4, W=4096)
    res = _run_kernel(t, k, w)
    flags = np.asarray(res["flags"])
    assert not flags[:len(t.used)].any()
    got = {}
    for row in range(4):
        got.update(_kernel_entries(res, t, row))
    mask = (1 << (2 * k)) - 1
    for gid, r in enumerate(reads):
        want = sorted(((int(x) >> 8) & mask, (int(y) >> 1) & 0x7FFFFFFF,
                       int(y) & 1)
                      for x, y in ref_sketch(r[1], w, k))
        have = sorted(got.get(gid, []))
        assert have == want, (gid, r[1][:40], len(have), len(want))


def test_pallas_sketch_flags_long_symmetric_runs():
    # (AT)n k-mers are their own reverse complement for even k: a long
    # run stalls the ring cursor past the attribution window -> flag
    rng = np.random.RandomState(3)
    good = _rand_seq(rng, 500)
    bad = _rand_seq(rng, 150) + "AT" * 200 + _rand_seq(rng, 150)
    t = _tile_for([["g", good], ["b", bad]], 5, R=1, W=4096)
    res = _run_kernel(t, 12, 5)
    # both reads share row 0; the row must be flagged
    assert np.asarray(res["flags"])[0] != 0


def test_pallas_sketch_multiread_rows_vs_core():
    """Dense multi-read rows: the kernel's per-read output equals the
    XLA seg-mode core's (both position-aligned on the same tile)."""
    import jax.numpy as jnp

    from longqc_tpu.ops.sketch import _sketch_core

    k, w = 12, 5
    rng = np.random.RandomState(29)
    reads = [["q%d" % i, _rand_seq(rng, rng.randint(80, 300))]
             for i in range(24)]
    t = _tile_for(reads, w, R=2, W=4096)
    res = _run_kernel(t, k, w)
    assert not np.asarray(res["flags"])[:2].any()

    codes = np.asarray(di._unpack2(jnp.asarray(t.codes2), 4096))
    amb = np.asarray(di._unpack1(jnp.asarray(t.nmask), 4096))
    startb = np.asarray(di._unpack1(jnp.asarray(t.startmask), 4096))
    codes = np.where(amb, 4, codes).astype(np.uint8)
    seg = np.cumsum(startb.astype(np.int32), axis=1) - 1
    core = _sketch_core(jnp.asarray(codes), jnp.asarray(t.used),
                        w=w, k=k, seg=jnp.asarray(seg))
    for row in range(2):
        kr = _kernel_entries(res, t, row)
        # core output is S-compacted; rebuild the same per-read map
        emit = np.asarray(core["emit"][row])
        hsh = np.asarray(core["hash"][row]).astype(np.uint64)
        pos = np.asarray(core["pos"][row])
        strand = np.asarray(core["strand"][row])
        segs = np.asarray(core["seg"][row])
        cr = {}
        for j in np.nonzero(emit > 0)[0]:
            g = t.gids[row][segs[j]]
            local = pos[j] - t.starts[row][segs[j]]
            cr.setdefault(int(g), []).extend(
                [(int(hsh[j]), int(local), int(strand[j]))]
                * int(emit[j]))
        for g in set(kr) | set(cr):
            assert sorted(kr.get(g, [])) == sorted(cr.get(g, [])), g
