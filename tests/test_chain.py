"""Device chain-DP kernel vs the exact host implementation."""

import numpy as np

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine import overlap_host as oh
from longqc_tpu.ops.chain import (chain_dp_batch, gap_penalty_table,
                                  backtrack_chains)
from util_synth import make_genome, sample_reads


def host_fill(ax, ay, max_dist, bw, max_skip):
    """Exact f/p/v fill extracted from the host spec (same loop as
    oh.chain_dp's first half)."""
    n = len(ax)
    spans = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int64)
    avg_qspan = np.float32(spans.sum() / n)
    f = np.zeros(n, np.int64)
    p = np.full(n, -1, np.int64)
    t = np.zeros(n, np.int64)
    v = np.zeros(n, np.int64)
    xi = ax.astype(np.uint64)
    yq = (ay & np.uint64(0xFFFFFFFF)).astype(np.int64)
    st = 0
    for i in range(n):
        ri = int(xi[i])
        qi = int(yq[i])
        q_span = int(spans[i])
        max_f, max_j, n_skip = q_span, -1, 0
        while st < i and ri - int(xi[st]) > max_dist:
            st += 1
        j = i - 1
        while j >= st:
            dr = ri - int(xi[j])
            dq = qi - int(yq[j])
            if dr == 0 or dq <= 0 or dq > max_dist:
                j -= 1
                continue
            dd = abs(dr - dq)
            if dd > bw:
                j -= 1
                continue
            sc = min(min(dq, dr), q_span)
            log_dd = dd.bit_length() - 1 if dd else 0
            sc -= int(dd * 0.01 * avg_qspan) + (log_dd >> 1)
            sc += f[j]
            if sc > max_f:
                max_f, max_j = sc, j
                if n_skip > 0:
                    n_skip -= 1
            elif t[j] == i:
                n_skip += 1
                if n_skip > max_skip:
                    break
            if p[j] >= 0:
                t[p[j]] = i
            j -= 1
        f[i] = max_f
        p[i] = max_j
        v[i] = v[max_j] if (max_j >= 0 and v[max_j] > max_f) else max_f
    return f, p, v


def _make_anchor_sets():
    rng = np.random.RandomState(33)
    genome = make_genome(rng, 12000)
    reads = sample_reads(rng, genome, 40, min_len=700, max_len=2000,
                         err=0.12, junk_frac=0.1)
    queries = reads[:10]
    index = oh.build_index(reads, 12, 5)
    mid_occ = index.mid_occ(2e-4)
    sketches = oh.sketch_reads_device(queries, 12, 5)
    sets = []
    for qi, q in enumerate(queries):
        ax, ay, mp = oh.collect_seed_hits(index, q[0], len(q[1]),
                                          sketches[qi], mid_occ)
        if len(ax):
            sets.append((ax, ay))
    return sets


def test_chain_kernel_matches_host():
    sets = _make_anchor_sets()
    assert len(sets) >= 5
    max_dist, bw, max_skip, J = 10000, 500, 25, 64
    Q = len(sets)
    A = max(len(ax) for ax, _ in sets)
    A = ((A + 127) // 128) * 128
    axh = np.zeros((Q, A), np.int32)
    axl = np.zeros((Q, A), np.int32)
    aqb = np.zeros((Q, A), np.int32)
    asb = np.zeros((Q, A), np.int32)
    nb = np.zeros((Q,), np.int32)
    pen = np.zeros((Q, bw + 1), np.int32)
    for r, (ax, ay) in enumerate(sets):
        n = len(ax)
        axh[r, :n] = (ax >> np.uint64(32)).astype(np.uint32).view(np.int32)
        axl[r, :n] = (ax & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        aqb[r, :n] = (ay & np.uint64(0xFFFFFFFF)).astype(np.int32)
        asb[r, :n] = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
        nb[r] = n
        spans = asb[r, :n]
        pen[r] = gap_penalty_table(np.float32(spans.sum() / n), bw)
    from longqc_tpu.ops.chain import make_carry
    carry = make_carry(Q, J)
    f, p, v, flags, _ = chain_dp_batch(axh, axl, aqb, asb, nb, pen, carry,
                                       np.int32(0), J=J,
                                       max_dist=max_dist, bw=bw,
                                       max_skip=max_skip)
    f, p, v, flags = map(np.asarray, (f, p, v, flags))
    n_flagged = int(flags.sum())
    print("flagged rows: %d/%d" % (n_flagged, Q))
    for r, (ax, ay) in enumerate(sets):
        if flags[r]:
            continue  # host recompute path; exactness not claimed
        n = len(ax)
        hf, hp, hv = host_fill(ax, ay, max_dist, bw, max_skip)
        assert np.array_equal(f[r, :n], hf), "f mismatch row %d" % r
        assert np.array_equal(p[r, :n], hp), "p mismatch row %d" % r
        assert np.array_equal(v[r, :n], hv), "v mismatch row %d" % r
        # backtracking equivalence against the full host chain_dp
        chains_dev = backtrack_chains(f[r], p[r], v[r], n, 3, 40)
        chains_host = oh.chain_dp(ax, ay, max_dist, bw, max_skip, 3, 40)
        assert len(chains_dev) == len(chains_host)
        for (s1, i1), (s2, i2) in zip(chains_dev, chains_host):
            assert s1 == s2
            assert np.array_equal(i1, i2)
    assert n_flagged < Q  # at least some rows handled on device
