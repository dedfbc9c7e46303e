"""Adapter DP: device distance kernel vs brute-force host DP; trim
semantics."""

import random

import numpy as np

from longqc_tpu.ops.adapter import (adapter_dists, hw_align_host, encode,
                                    cut_adapter)


def brute_hw_dist(adp, window):
    m, n = len(adp), len(window)
    D = np.zeros((m + 1, n + 1), np.int32)
    D[:, 0] = np.arange(m + 1)
    for j in range(1, n + 1):
        for i in range(1, m + 1):
            c = 0 if adp[i - 1] == window[j - 1] else 1
            D[i, j] = min(D[i - 1, j - 1] + c, D[i - 1, j] + 1,
                          D[i, j - 1] + 1)
    return int(D[m, 1:].min()), int(np.argmin(D[m, 1:]))


def test_device_dist_matches_bruteforce():
    random.seed(5)
    adp = "ATCTCTCTCAACAACAACAACGGAGG"
    reads = []
    for i in range(12):
        s = "".join(random.choice("ACGT") for _ in range(400))
        if i % 3 == 0:  # plant the adapter with noise near the start
            noisy = "".join(c if random.random() > 0.1
                            else random.choice("ACGT") for c in adp)
            s = s[:10] + noisy + s[10 + len(noisy):]
        reads.append(["r%d" % i, s, "I" * len(s)])
    dists, ends, skipped = adapter_dists(reads, adp, "head", length=150)
    a = encode(adp)
    for i, r in enumerate(reads):
        w = encode(r[1][:150])
        want_d, want_e = brute_hw_dist(a, w)
        assert dists[i] == want_d, i
        assert ends[i] == want_e, i


def test_cut_adapter_trims():
    random.seed(6)
    adp = "AATGTACTTCGTTCAGTTACGTATTGCT"
    body = "".join(random.choice("ACGT") for _ in range(400))
    reads = [
        ["hit", adp + body, "I" * (len(adp) + 400)],
        ["miss", body, "I" * 400],
        ["short", "ACGT" * 10, "I" * 40],
    ]
    res = cut_adapter(reads, adp_t=adp, th=0.75, length=150)
    iden, num, pos = res
    assert num == 1
    assert iden > 0.99
    assert reads[0][1] == body  # exact adapter trimmed cleanly
    assert len(reads[0][2]) == len(reads[0][1])
    assert reads[1][1] == body  # untouched
    assert reads[2][1] == "ACGT" * 10  # skipped (too short)


def test_cut_adapter_tail():
    random.seed(7)
    adp = "GCAATACGTAACTGAACG"
    body = "".join(random.choice("ACGT") for _ in range(400))
    reads = [["hit", body + adp, "I" * (400 + len(adp))]]
    res = cut_adapter(reads, adp_b=adp, th=0.75, length=150)
    iden, num, pos = res
    assert num == 1
    assert reads[0][1] == body
    assert len(reads[0][2]) == 400
