"""Oracle test: host overlap engine vs the reference minimap2-coverage
binary, which is built on demand from the read-only reference checkout.

Skipped when the reference tree / toolchain is unavailable (e.g. CI
without the mounted reference)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine.overlap_host import overlap_run
from util_synth import make_genome, sample_reads, write_fastq_file

REF_SRC = "/root/reference/minimap2-coverage"
BUILD_DIR = "/tmp/ref-mm2cov"


def _binary():
    exe = os.path.join(BUILD_DIR, "minimap2-coverage")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF_SRC):
        return None
    shutil.copytree(REF_SRC, BUILD_DIR, dirs_exist_ok=True)
    r = subprocess.run(["make", "-j2"], cwd=BUILD_DIR,
                       capture_output=True)
    if r.returncode != 0 or not os.path.exists(exe):
        return None
    return exe


def _run_ref(exe, args, target, query, out):
    cmd = [exe] + args + [target, query]
    with open(out, "w") as fo:
        r = subprocess.run(cmd, stdout=fo, stderr=subprocess.DEVNULL)
    assert r.returncode == 0, "reference binary failed: %s" % cmd
    with open(out) as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


@pytest.mark.slow
def test_overlap_matches_reference(tmp_path):
    exe = _binary()
    if exe is None:
        pytest.skip("reference binary unavailable")

    rng = np.random.RandomState(11)
    genome = make_genome(rng, 20000)
    reads = sample_reads(rng, genome, 60, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.15)
    queries = reads[:20]

    target_fq = str(tmp_path / "target.fq")
    query_fq = str(tmp_path / "query.fq")
    write_fastq_file(target_fq, reads)
    write_fastq_file(query_fq, queries)

    ref_rows = _run_ref(
        exe, ["-Y", "-l", "0", "-q", "160", "-p", "80", "-k", "12",
              "-w", "5", "-t", "1"],
        target_fq, query_fq, str(tmp_path / "cov.txt"))

    cfg = OverlapConfig(
        index=IndexOpt(k=12, w=5),
        map=MapOpt(min_score_med=80, min_score_good=160),
        flt=FltOpt(min_ovlp=0),
    )
    got_rows = overlap_run(reads, queries, cfg)

    assert len(got_rows) == len(ref_rows)
    n_bad = 0
    for i, (g, r) in enumerate(zip(got_rows, ref_rows)):
        if g != r:
            n_bad += 1
            if n_bad <= 5:
                print("row %d:\n  got %s\n  ref %s" % (i, g, r))
    assert n_bad == 0, "%d/%d rows differ" % (n_bad, len(ref_rows))


@pytest.mark.slow
def test_device_overlap_matches_host():
    """Device-path engine rows must equal the host spec rows."""
    from longqc_tpu.engine.overlap import overlap_run_device

    rng = np.random.RandomState(12)
    from util_synth import make_genome as mg, sample_reads as sr
    genome = mg(rng, 15000)
    reads = sr(rng, genome, 50, min_len=700, max_len=2200, err=0.12,
               junk_frac=0.15)
    queries = reads[:15]
    cfg = OverlapConfig(
        index=IndexOpt(k=12, w=5),
        map=MapOpt(min_score_med=80, min_score_good=160),
        flt=FltOpt(min_ovlp=0),
    )
    host_rows = overlap_run(list(reads), queries, cfg)
    dev_rows = overlap_run_device(list(reads), queries, cfg)
    assert dev_rows == host_rows


@pytest.mark.slow
def test_multipart_index_matches_reference(tmp_path):
    """-I multi-part indexing: per-part mapping with cross-part
    accumulator merging must match the reference binary."""
    exe = _binary()
    if exe is None:
        pytest.skip("reference binary unavailable")
    rng = np.random.RandomState(77)
    genome = make_genome(rng, 18000)
    reads = sample_reads(rng, genome, 50, min_len=700, max_len=2000,
                         err=0.12, junk_frac=0.1)
    queries = reads[:15]
    target_fq = str(tmp_path / "t.fq")
    query_fq = str(tmp_path / "q.fq")
    write_fastq_file(target_fq, reads)
    write_fastq_file(query_fq, queries)
    # ~3 parts
    total_bp = sum(len(r[1]) for r in reads)
    bsz = total_bp // 3
    ref_rows = _run_ref(
        exe, ["-Y", "-l", "0", "-q", "160", "-p", "80", "-k", "12",
              "-w", "5", "-I", str(bsz), "-t", "1"],
        target_fq, query_fq, str(tmp_path / "cov.txt"))
    cfg = OverlapConfig(
        index=IndexOpt(k=12, w=5, batch_size=bsz),
        map=MapOpt(min_score_med=80, min_score_good=160),
        flt=FltOpt(min_ovlp=0),
    )
    got_rows = overlap_run(list(reads), queries, cfg)
    assert got_rows == ref_rows
