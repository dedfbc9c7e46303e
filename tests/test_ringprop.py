"""Ring-propagation kernels vs the numpy chainsel spec (interpret mode
on CPU; the same compiled kernels run on TPU)."""

import numpy as np

from longqc_tpu.ops.chainsel import INF_RANK, compute_peaks, chain_ranks
from longqc_tpu.ops.ringprop import peak_pass, minrank_pass

J = 64


def _random_forest(rng, n):
    f = rng.randint(1, 200, size=n).astype(np.int64)
    p = np.full(n, -1, np.int64)
    v = f.copy()
    for i in range(n):
        if i > 0 and rng.rand() < 0.85:
            p[i] = rng.randint(max(0, i - J), i)
            v[i] = max(f[i], v[p[i]])
    return f, p, v


def test_peak_and_minrank_pass_match_spec():
    rng = np.random.RandomState(5)
    Q, A = 8, 512
    fs = np.zeros((A, Q), np.int32)
    ps = np.full((A, Q), -1, np.int32)
    vs = np.zeros((A, Q), np.int32)
    owns = np.full((A, Q), INF_RANK, np.int32)
    ns = []
    expect_peak, expect_rank = [], []
    for q in range(Q):
        n = rng.randint(1, A + 1)
        ns.append(n)
        f, p, v = _random_forest(rng, n)
        fs[:n, q] = f
        ps[:n, q] = p
        vs[:n, q] = v
        expect_peak.append(compute_peaks(f, p, v))
        rank, order = chain_ranks(f, p, v, n, min_sc=30)
        expect_rank.append(rank)
        own = np.full(n, INF_RANK, np.int64)
        own[order] = np.arange(len(order))
        owns[:n, q] = own

    pk = np.asarray(peak_pass(fs, vs, ps, interpret=True))
    mr = np.asarray(minrank_pass(ps, owns, interpret=True))
    for q in range(Q):
        n = ns[q]
        assert np.array_equal(pk[:n, q], expect_peak[q]), q
        assert np.array_equal(mr[:n, q], expect_rank[q]), q
