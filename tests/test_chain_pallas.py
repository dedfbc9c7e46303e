"""Fused Pallas chain-DP kernel vs the validated scan implementation.

Runs in Pallas interpret mode on the CPU test platform; bit-identical
f/p/v/flags/carry are required, including across chunk-resume
boundaries."""

import numpy as np
import pytest

from longqc_tpu.ops.chain import (chain_dp_batch, gap_penalty_table,
                                  make_carry)
from longqc_tpu.ops.chain_pallas import (chain_dp_batch_pallas,
                                         make_carry_pallas,
                                         penalty_limbs)


def test_penalty_limbs_exact():
    bw = 500
    rng = np.random.RandomState(5)
    avgs = np.concatenate([
        rng.uniform(10.0, 26.0, 200),
        rng.uniform(1.0, 200.0, 100),
        [12.0, 15.0, 19.0, 25.5, 0.01]]).astype(np.float32)
    dd = np.arange(bw + 1)
    log_dd = np.zeros(bw + 1, np.int64)
    log_dd[1:] = np.floor(np.log2(dd[1:])).astype(np.int64)
    n_bad = 0
    for avg in avgs:
        limbs = penalty_limbs(float(avg), bw)
        if limbs is None:
            n_bad += 1
            continue
        tab = gap_penalty_table(avg, bw).astype(np.int64)
        M = sum(int(limbs[j]) << (16 * j) for j in range(5))
        lin = np.array([(int(d) * M) >> 64 for d in dd], np.int64)
        assert np.array_equal(lin + (log_dd >> 1), tab), avg
    assert n_bad == 0  # empty intersections should be ~measure-zero


def _rand_rows(rng, Q, A, n_lo, n_hi):
    """Random anchor rows with realistic structure: sorted target
    positions within a couple of (rid, rev) groups, clustered diagonals
    so chains and skip events actually occur."""
    axh = np.zeros((Q, A), np.int32)
    axl = np.zeros((Q, A), np.int32)
    aqb = np.zeros((Q, A), np.int32)
    asb = np.zeros((Q, A), np.int32)
    nb = np.zeros((Q,), np.int32)
    for r in range(Q):
        n = rng.randint(n_lo, n_hi)
        nb[r] = n
        n_grp = rng.randint(1, 4)
        grp = np.sort(rng.randint(0, n_grp, n))
        pos = np.sort(rng.randint(0, 20000, n)).astype(np.int64)
        diag = rng.randint(0, 3, n) * rng.randint(1, 400)
        q = pos - 5000 + diag + rng.randint(-40, 40, n)
        axh[r, :n] = grp
        axl[r, :n] = pos
        aqb[r, :n] = np.clip(q, 0, None)
        asb[r, :n] = 12
    return axh, axl, aqb, asb, nb


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_scan(seed):
    rng = np.random.RandomState(seed)
    Q, A, J, bw = 128, 512, 64, 500
    axh, axl, aqb, asb, nb = _rand_rows(rng, Q, A, 40, A)
    pen = np.zeros((Q, bw + 1), np.int32)
    limbs = np.zeros((5, Q), np.int32)
    rbad = np.zeros((1, Q), np.int32)
    for r in range(Q):
        avg = np.float32(asb[r, :nb[r]].sum() / nb[r])
        pen[r] = gap_penalty_table(avg, bw)
        lb = penalty_limbs(float(avg), bw)
        if lb is None:
            rbad[0, r] = 1
        else:
            limbs[:, r] = lb

    f0, p0, v0, fl0, c0 = chain_dp_batch(
        axh, axl, aqb, asb, nb, pen, make_carry(Q, J), np.int32(0))
    f1, p1, v1, fl1, c1 = chain_dp_batch_pallas(
        axh, axl, aqb, asb, nb, limbs, rbad, make_carry_pallas(Q, J),
        np.int32(0), interpret=True)

    f0, p0, v0, fl0 = map(np.asarray, (f0, p0, v0, fl0))
    assert np.array_equal(f0, f1)
    assert np.array_equal(p0, p1)
    assert np.array_equal(v0, v1)
    assert rbad.sum() == 0
    assert np.array_equal(fl0, fl1)
    # carry equality (transposed layout)
    for a, b in zip(c0[:7], c1[:7]):
        assert np.array_equal(np.asarray(a).T, np.asarray(b))
    assert np.array_equal(np.asarray(c0[7]),
                          np.asarray(c1[7]).reshape(-1) != 0)
    assert fl0.sum() < Q  # most rows exact on device


def test_pallas_chunk_resume():
    """Chunked calls with carry == one monolithic call."""
    rng = np.random.RandomState(7)
    Q, A, J = 128, 512, 64
    axh, axl, aqb, asb, nb = _rand_rows(rng, Q, A, A // 2, A)
    limbs = np.zeros((5, Q), np.int32)
    rbad = np.zeros((1, Q), np.int32)
    for r in range(Q):
        avg = np.float32(asb[r, :nb[r]].sum() / nb[r])
        lb = penalty_limbs(float(avg), 500)
        if lb is None:
            rbad[0, r] = 1
        else:
            limbs[:, r] = lb

    f0, p0, v0, fl0, _ = chain_dp_batch_pallas(
        axh, axl, aqb, asb, nb, limbs, rbad, make_carry_pallas(Q, J),
        np.int32(0), interpret=True)

    carry = make_carry_pallas(Q, J)
    H = A // 2
    f1 = np.zeros((Q, A), np.int32)
    p1 = np.zeros((Q, A), np.int32)
    v1 = np.zeros((Q, A), np.int32)
    fl1 = np.zeros((Q,), bool)
    for c0_ in (0, H):
        fa, pa, va, fla, carry = chain_dp_batch_pallas(
            axh[:, c0_:c0_ + H], axl[:, c0_:c0_ + H],
            aqb[:, c0_:c0_ + H], asb[:, c0_:c0_ + H],
            nb, limbs, rbad, carry, np.int32(c0_), interpret=True)
        f1[:, c0_:c0_ + H] = fa
        p1[:, c0_:c0_ + H] = pa
        v1[:, c0_:c0_ + H] = va
        fl1 |= fla
    assert np.array_equal(np.asarray(f0), f1)
    assert np.array_equal(np.asarray(p0), p1)
    assert np.array_equal(np.asarray(v0), v1)
    assert np.array_equal(np.asarray(fl0), fl1)


def test_pallas_j128_unflags_repeat_dense_rows():
    """Repeat-dense rows (every anchor within max_dist of every other)
    overflow the J=64 predecessor ring and flag; the J=128 escalation
    rung must clear most of them AND be bit-exact vs the sequential
    host fill (chain.c:41-80 semantics, host_fill in test_chain)."""
    from test_chain import host_fill

    rng = np.random.RandomState(11)
    Q, A, bw = 128, 256, 500
    axh = np.zeros((Q, A), np.int32)
    axl = np.zeros((Q, A), np.int32)
    aqb = np.zeros((Q, A), np.int32)
    asb = np.zeros((Q, A), np.int32)
    nb = np.zeros((Q,), np.int32)
    for r in range(Q):
        # the truncation regime: >64 anchors inside max_dist whose
        # pairings are mostly invalid (dd > bw), so no max_skip break
        # ever bounds the scan — the reference walks all the way back
        # (what (AT)n microsatellite reads produce); a thin diagonal
        # subset keeps f/p/v nontrivial
        n = rng.randint(70, 121)
        nb[r] = n
        pos = np.sort(rng.randint(0, 3000, n)).astype(np.int64)
        q = rng.randint(0, 20000, n).astype(np.int64)
        diag = rng.rand(n) < 0.2
        q[diag] = np.clip(pos[diag] + rng.randint(-50, 50, diag.sum()),
                          0, None)
        axl[r, :n] = pos
        aqb[r, :n] = q
        asb[r, :n] = 12
    limbs = np.zeros((5, Q), np.int32)
    rbad = np.zeros((1, Q), np.int32)
    for r in range(Q):
        lb = penalty_limbs(12.0, bw)
        assert lb is not None
        limbs[:, r] = lb

    _f64, _p64, _v64, fl64, _ = chain_dp_batch_pallas(
        axh, axl, aqb, asb, nb, limbs, rbad, make_carry_pallas(Q, 64),
        np.int32(0), J=64, interpret=True)
    f, p, v, fl128, _ = chain_dp_batch_pallas(
        axh, axl, aqb, asb, nb, limbs, rbad, make_carry_pallas(Q, 128),
        np.int32(0), J=128, interpret=True)
    assert fl64.sum() > Q // 2       # dense rows truncate the 64-ring
    assert fl128.sum() < fl64.sum() // 4
    for r in range(Q):
        if fl128[r]:
            continue
        n = int(nb[r])
        ax = axl[r, :n].astype(np.uint64)
        ay = (np.uint64(12) << np.uint64(32)) | \
            aqb[r, :n].astype(np.uint64)
        fh, ph, vh = host_fill(ax, ay, 10000, bw, 25)
        assert np.array_equal(np.asarray(f)[r, :n], fh)
        assert np.array_equal(np.asarray(p)[r, :n], ph)
        assert np.array_equal(np.asarray(v)[r, :n], vh)
