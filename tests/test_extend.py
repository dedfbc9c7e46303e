"""ksw2-class banded extension: device kernel vs full-DP host oracle."""

import numpy as np

from longqc_tpu.ops.extend import extz_batch, extz_host
from longqc_tpu.ops.adapter import encode


def _mutate(rng, s, err):
    out = []
    for ch in s:
        r = rng.random_sample()
        if r < err * 0.5:
            out.append("ACGT"[rng.randint(0, 4)])
        elif r < err * 0.75:
            pass
        elif r < err:
            out.append(ch)
            out.append("ACGT"[rng.randint(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def test_extz_matches_host():
    rng = np.random.RandomState(9)
    B, Lq, Lt, W = 8, 256, 256, 32
    qs = np.full((B, Lq), 4, np.int32)
    ts = np.full((B, Lt), 4, np.int32)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    pairs = []
    for b in range(B):
        base = "".join("ACGT"[i] for i in rng.randint(0, 4, rng.randint(80, 250)))
        if b % 4 == 0:
            other = _mutate(rng, base, 0.1)           # homologous
        elif b % 4 == 1:
            other = "".join("ACGT"[i] for i in rng.randint(0, 4, len(base)))
        elif b % 4 == 2:
            other = _mutate(rng, base[: len(base) // 2], 0.05)  # prefix hit
        else:
            other = base                              # identical
        qc, tc = encode(base), encode(other)
        qc = qc[:Lq]
        tc = tc[:Lt]
        qs[b, :len(qc)] = qc
        ts[b, :len(tc)] = tc
        qlens[b] = len(qc)
        tlens[b] = len(tc)
        pairs.append((qc, tc))
    res = extz_batch(qs, qlens, ts, tlens, W=W, Lq=Lq, Lt=Lt)
    for b, (qc, tc) in enumerate(pairs):
        want = extz_host(qc, tc, w=W)
        got_max = int(np.asarray(res["max"])[b])
        assert got_max == want["max"], (b, got_max, want["max"])
        assert int(np.asarray(res["max_q"])[b]) == want["max_q"], b
        assert int(np.asarray(res["max_t"])[b]) == want["max_t"], b
        # end scores (reachable-end semantics) must agree when defined
        if want["mqe"] > -(10 ** 8):
            assert int(np.asarray(res["mqe"])[b]) == want["mqe"], b
