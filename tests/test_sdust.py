"""sdust: host spec vs the reference C binary; device screen soundness."""

import os
import random
import subprocess

import numpy as np
import pytest

from longqc_tpu.ops.sdust import (sdust_host, sdust_masked_length,
                                  masked_lengths)
from util_synth import make_genome

SDUST_BIN = "/tmp/ref-mm2cov/sdust"


def _make_seqs():
    random.seed(7)
    seqs = []
    # plain random (should be clean)
    for _ in range(8):
        seqs.append("".join(random.choice("ACGT") for _ in range(500)))
    # low-complexity injections
    base = "".join(random.choice("ACGT") for _ in range(300))
    seqs.append(base[:100] + "AT" * 40 + base[100:])
    seqs.append("A" * 120 + base)
    seqs.append(base[:50] + "CAG" * 35 + base[50:] + "TTTTTTTTTTTTTTTT")
    seqs.append(("ACGT" * 10 + "AAAAAAA") * 6)
    # with Ns straddling low-complexity
    seqs.append(base[:80] + "AT" * 20 + "N" + "AT" * 20 + base[80:])
    seqs.append("N" * 5 + "A" * 60 + "N" + base[:100])
    return seqs


def _ref_rows(seqs, tmp_path):
    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(">s%d\n%s\n" % (i, s))
    out = subprocess.run([SDUST_BIN, fa], capture_output=True, text=True)
    assert out.returncode == 0
    rows = [ln.split("\t") for ln in out.stdout.splitlines() if ln.strip()]
    return {r[0]: int(r[1]) for r in rows}


@pytest.mark.skipif(not os.path.exists(SDUST_BIN),
                    reason="reference sdust binary unavailable")
def test_sdust_host_matches_reference(tmp_path):
    seqs = _make_seqs()
    ref = _ref_rows(seqs, tmp_path)
    for i, s in enumerate(seqs):
        got = sdust_masked_length(s)
        assert got == ref["s%d" % i], (
            "seq %d: got %d ref %d (intervals=%s)"
            % (i, got, ref["s%d" % i], sdust_host(s)))


def test_screen_soundness_and_full_path():
    seqs = _make_seqs()
    reads = [["s%d" % i, s, "I" * len(s)] for i, s in enumerate(seqs)]
    got = masked_lengths(reads)
    for i, s in enumerate(seqs):
        want = sdust_masked_length(s)
        assert got[i] == want, "read %d: %d vs %d" % (i, got[i], want)


def test_screen_clean_on_random():
    rng = np.random.RandomState(3)
    reads = [["r%d" % i, make_genome(rng, 800), "I" * 800]
             for i in range(16)]
    got = masked_lengths(reads)
    for i, r in enumerate(reads):
        assert got[i] == sdust_masked_length(r[1])


@pytest.mark.skipif(not os.path.exists(SDUST_BIN),
                    reason="reference sdust binary unavailable")
def test_mask_table_matches_reference(tmp_path):
    from longqc_tpu.engine.masking import mask_table_rows
    random.seed(17)
    seqs = _make_seqs()
    reads = []
    for i, s in enumerate(seqs):
        qual = "".join(chr(33 + random.randint(2, 41)) for _ in s)
        reads.append(["s%d" % i, s, qual])
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        for n, s, q in reads:
            f.write("@%s\n%s\n+\n%s\n" % (n, s, q))
    out = subprocess.run([SDUST_BIN, fq], capture_output=True, text=True)
    assert out.returncode == 0
    ref_rows = [ln for ln in out.stdout.splitlines() if ln.strip()]
    got_rows = mask_table_rows(reads)
    assert got_rows == ref_rows
