"""End-to-end sampleqc integration test on synthetic reads."""

import json
import os

import numpy as np
import pytest

from util_synth import make_genome, sample_reads, write_fastq_file


@pytest.mark.slow
def test_sampleqc_end_to_end(tmp_path):
    from longqc_tpu.engine.pipeline import run_sampleqc

    rng = np.random.RandomState(21)
    genome = make_genome(rng, 15000)
    reads = sample_reads(rng, genome, 80, min_len=700, max_len=2200,
                         err=0.1, junk_frac=0.1)
    # plant an ONT 5' adapter on some reads
    adp = "AATGTACTTCGTTCAGTTACGTATTGCT"
    for i in range(0, 30):
        reads[i][1] = adp + reads[i][1]
        reads[i][2] = "I" * len(adp) + reads[i][2]
    fq = str(tmp_path / "in.fq")
    write_fastq_file(fq, reads)

    out = str(tmp_path / "out")
    res = run_sampleqc(fq, out, "ont-ligation", nsample=40)

    assert res["Num_of_reads"] == 80
    assert res["Yield"] == sum(len(r[1]) for r in reads)
    assert "Coverage_stats" in res
    assert 0.0 <= res["Coverage_stats"][
        "Estimated non-sense read fraction"] <= 1.0
    # adapter stats: planted on 30/80 reads at the 5' end
    assert "Stats_for_adapter5" in res
    assert res["Stats_for_adapter5"]["Num_of_trimmed_reads_5"] >= 25

    # artifacts exist
    assert os.path.exists(os.path.join(out, "web_summary.html"))
    assert os.path.exists(os.path.join(
        out, "analysis", "minimap2", "coverage_out.txt"))
    assert os.path.exists(os.path.join(out, "analysis", "subsample.fastq"))
    assert os.path.exists(os.path.join(
        out, "analysis", "longqc_sdust.txt"))
    with open(os.path.join(out, "QC_vals_longQC_sampleqc.json")) as f:
        js = json.load(f)
    assert js["Yield"] == res["Yield"]
    figs = os.listdir(os.path.join(out, "figs"))
    assert len(figs) == 8


@pytest.mark.slow
def test_sampleqc_pb_sequel_bam(tmp_path):
    """BAM ingestion + PacBio preset with the HPC spike-in filter run."""
    from longqc_tpu.engine.pipeline import run_sampleqc
    from test_platform import write_bam, _bam_record

    rng = np.random.RandomState(31)
    genome = make_genome(rng, 12000)
    reads = sample_reads(rng, genome, 50, min_len=700, max_len=1800,
                         err=0.12, junk_frac=0.1)
    recs = [_bam_record(n, s) for n, s, _q in reads]
    bam = str(tmp_path / "in.bam")
    write_bam(bam, "@HD\tVN:1.5\n", recs)

    out = str(tmp_path / "out")
    res = run_sampleqc(bam, out, "pb-sequel", nsample=30)
    assert res["Num_of_reads"] == 50
    assert os.path.exists(os.path.join(
        out, "analysis", "minimap2", "spiked_in_control.txt"))
    assert os.path.exists(os.path.join(out, "web_summary.html"))


@pytest.mark.slow
def test_sampleqc_short_mode(tmp_path):
    from longqc_tpu.engine.pipeline import run_sampleqc

    rng = np.random.RandomState(32)
    genome = make_genome(rng, 10000)
    reads = sample_reads(rng, genome, 60, min_len=300, max_len=1500,
                         err=0.1)
    fq = str(tmp_path / "in.fq")
    write_fastq_file(fq, reads)
    out = str(tmp_path / "out")
    res = run_sampleqc(fq, out, "ont-ligation", nsample=40, short=True)
    assert res["Num_of_reads"] == 60
    # the short subsample file exists when short reads were sampled
    cov = open(os.path.join(out, "analysis", "minimap2",
                            "coverage_out.txt")).read().strip()
    assert len(cov.splitlines()) > 0
