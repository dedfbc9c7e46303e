"""Equivalence of the array-parallel chain selection (ops/chainsel)
with the sequential greedy backtrack (ops/chain.backtrack_chains), on
random parent forests and on real DP outputs."""

import numpy as np

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine import overlap_host as oh
from longqc_tpu.ops.chain import backtrack_chains
from longqc_tpu.ops.chainsel import select_chains
from util_synth import make_genome, sample_reads


def _random_forest(rng, n, J=64):
    """Random (f, p, v) with the DP invariants: p[i] in [i-J, i-1] or
    -1, v[i] = max(f[i], v[p[i]]), f[root] == v[root]."""
    f = rng.randint(1, 200, size=n).astype(np.int64)
    p = np.full(n, -1, np.int64)
    v = f.copy()
    for i in range(n):
        if i > 0 and rng.rand() < 0.8:
            p[i] = rng.randint(max(0, i - J), i)
            v[i] = max(f[i], v[p[i]])
    return f, p, v


def _assert_same(chains_a, chains_b):
    assert len(chains_a) == len(chains_b)
    for (sa, ia), (sb, ib) in zip(chains_a, chains_b):
        assert sa == sb
        assert np.array_equal(ia, ib)


def test_select_chains_random_forests():
    rng = np.random.RandomState(42)
    for trial in range(300):
        n = rng.randint(1, 120)
        f, p, v = _random_forest(rng, n)
        min_cnt = rng.randint(1, 4)
        min_sc = rng.randint(1, 150)
        _assert_same(backtrack_chains(f, p, v, n, min_cnt, min_sc),
                     select_chains(f, p, v, n, min_cnt, min_sc))


def test_select_chains_tie_scores():
    # many equal scores -> exercises the (score, peak) tie order and
    # duplicate-peak rejection
    rng = np.random.RandomState(7)
    for trial in range(200):
        n = rng.randint(2, 80)
        f, p, v = _random_forest(rng, n)
        f = (f % 3) * 50 + 10
        v = f.copy()
        for i in range(n):
            if p[i] >= 0:
                v[i] = max(f[i], v[p[i]])
        _assert_same(backtrack_chains(f, p, v, n, 1, 10),
                     select_chains(f, p, v, n, 1, 10))


def test_select_chains_real_dp():
    rng = np.random.RandomState(3)
    genome = make_genome(rng, 20000)
    reads = sample_reads(rng, genome, 120, min_len=600, max_len=1800,
                         err=0.12, junk_frac=0.1)
    queries = reads[:25]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    k, w = cfg.index.k, cfg.index.w
    q_sk = oh.sketch_reads_device(queries, k, w)
    index = oh.build_index(list(reads), k, w)
    mid_occ = index.mid_occ(cfg.map.mid_occ_frac)
    m = cfg.map
    n_nonempty = 0
    for qi, q in enumerate(queries):
        ax, ay, _ = oh.collect_seed_hits(index, q[0], len(q[1]),
                                         q_sk[qi], mid_occ)
        n = len(ax)
        if n == 0:
            continue
        n_nonempty += 1
        # exact f/p/v via the host DP recurrence (re-run fill only)
        spans = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int64)
        f, p, v = _host_fill(ax, ay, spans, m)
        _assert_same(backtrack_chains(f, p, v, n, m.min_cnt,
                                      m.min_chain_score),
                     select_chains(f, p, v, n, m.min_cnt,
                                   m.min_chain_score))
    assert n_nonempty > 5


def _host_fill(ax, ay, spans, m):
    """f/p/v fill identical to oh.chain_dp's loop (without backtrack)."""
    n = len(ax)
    avg_qspan = np.float32(spans.sum() / n)
    f = np.zeros(n, np.int32)
    p = np.full(n, -1, np.int64)
    t = np.zeros(n, np.int64)
    v = np.zeros(n, np.int32)
    xi = ax.astype(np.uint64)
    yq = (ay & np.uint64(0xFFFFFFFF)).astype(np.int64)
    st = 0
    for i in range(n):
        ri = int(xi[i]); qi_ = int(yq[i]); q_span = int(spans[i])
        max_f = q_span; max_j = -1; n_skip = 0
        while st < i and int(ri - xi[st]) > m.max_gap:
            st += 1
        j = i - 1
        while j >= st:
            dr = ri - int(xi[j]); dq = int(qi_ - yq[j])
            if dr == 0 or dq <= 0 or dq > m.max_gap:
                j -= 1; continue
            dd = dr - dq if dr > dq else dq - dr
            if dd > m.bw:
                j -= 1; continue
            min_d = dq if dq < dr else dr
            sc = q_span if min_d > q_span else min_d
            log_dd = dd.bit_length() - 1 if dd else 0
            sc -= int(dd * 0.01 * avg_qspan) + (log_dd >> 1)
            sc += f[j]
            if sc > max_f:
                max_f = sc; max_j = j
                if n_skip > 0:
                    n_skip -= 1
            elif t[j] == i:
                n_skip += 1
                if n_skip > m.max_chain_skip:
                    break
            if p[j] >= 0:
                t[p[j]] = i
            j -= 1
        f[i] = max_f; p[i] = max_j
        v[i] = v[max_j] if (max_j >= 0 and v[max_j] > max_f) else max_f
    return f, p, v
