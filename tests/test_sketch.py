"""Differential tests: ops/sketch.py vs the faithful sketch oracle."""

import random

import numpy as np
import pytest

from longqc_tpu.io.pack import pack_reads
from longqc_tpu.ops.sketch import sketch_batch, sketch_to_lists
from oracles.sketch_ref import sketch as ref_sketch


def _run_case(seqs, w, k):
    reads = [["r%d" % i, s, "I" * len(s)] for i, s in enumerate(seqs)]
    batch = pack_reads(reads)
    res = sketch_batch(np.asarray(batch.codes), np.asarray(batch.lengths),
                       w=w, k=k)
    got = sketch_to_lists(res, k)
    for i, s in enumerate(seqs):
        ref = ref_sketch(s, w, k)
        # compare as position-sorted multisets of (hash, pos, strand)
        ref_items = sorted(((x >> 8, (y >> 1) & 0x7FFFFFFF, y & 1)
                            for x, y in ref), key=lambda t: (t[1], t[0]))
        h, p, z, _sp = got[i]
        got_items = sorted(zip(h.tolist(), p.tolist(), z.tolist()),
                           key=lambda t: (t[1], t[0]))
        assert got_items == ref_items, (
            "read %d mismatch (w=%d k=%d len=%d): got %d ref %d"
            % (i, w, k, len(s), len(got_items), len(ref_items)))


@pytest.mark.parametrize("w,k", [(5, 12), (5, 15)])
def test_sketch_random(w, k):
    random.seed(42)
    seqs = ["".join(random.choice("ACGT") for _ in range(random.randint(60, 300)))
            for _ in range(20)]
    _run_case(seqs, w, k)


@pytest.mark.parametrize("w,k", [(5, 12)])
def test_sketch_with_ns(w, k):
    random.seed(43)
    seqs = ["".join(random.choice("ACGTN") for _ in range(random.randint(40, 250)))
            for _ in range(20)]
    _run_case(seqs, w, k)


def test_sketch_low_complexity():
    random.seed(44)
    seqs = []
    for alpha in ["A", "AT", "AC", "ACG", "ACGTACGTA"]:
        seqs.append("".join(random.choice(alpha) for _ in range(200)))
    _run_case(seqs, 5, 12)


def test_sketch_short_reads():
    seqs = ["ACGTACGTACGT", "ACGT" * 3, "A" * 20, "ACGTN" * 4]
    _run_case(seqs, 5, 5)


def test_sketch_hpc():
    import random as _r
    from longqc_tpu.ops.sketch_hpc import sketch_reads_hpc
    _r.seed(45)
    seqs = []
    for _ in range(10):
        # homopolymer-rich sequences
        s = ""
        while len(s) < 300:
            s += _r.choice("ACGT") * _r.randint(1, 6)
        seqs.append(s[:300])
    seqs.append("AAACCCGGGTTTNNAAACCC" * 10)
    reads = [["r%d" % i, s, "I" * len(s)] for i, s in enumerate(seqs)]
    got = sketch_reads_hpc(reads, 15, 10)
    for i, s in enumerate(seqs):
        ref = ref_sketch(s, 10, 15, is_hpc=True)
        ref_items = sorted(((x >> 8, x & 0xFF, (y >> 1) & 0x7FFFFFFF, y & 1)
                            for x, y in ref))
        h, p, z, sp = got[i]
        got_items = sorted(zip(h.tolist(), sp.tolist(), p.tolist(),
                               z.tolist()))
        assert got_items == ref_items, "hpc read %d: %d vs %d" % (
            i, len(got_items), len(ref_items))
