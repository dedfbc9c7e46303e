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


@pytest.mark.slow
def test_sampleqc_gzip_input(tmp_path):
    """gzipped FASTQ end-to-end (format sniffing through gzip, chunked
    streaming, same outputs)."""
    import gzip

    from longqc_tpu.engine.pipeline import run_sampleqc

    rng = np.random.RandomState(31)
    genome = make_genome(rng, 9000)
    reads = sample_reads(rng, genome, 50, min_len=600, max_len=1500,
                         err=0.1, junk_frac=0.1)
    fq = str(tmp_path / "in.fq.gz")
    with gzip.open(fq, "wt") as f:
        for name, seq, qual in reads:
            f.write("@%s\n%s\n+\n%s\n" % (name, seq, qual))

    out = str(tmp_path / "out")
    res = run_sampleqc(fq, out, "ont-ligation", nsample=30)
    assert res["Num_of_reads"] == 50
    assert res["Yield"] == sum(len(r[1]) for r in reads)
    assert os.path.exists(os.path.join(
        out, "analysis", "minimap2", "coverage_out.txt"))


@pytest.mark.slow
def test_sampleqc_pb_hifi_preset(tmp_path):
    """pb-hifi preset end-to-end: HPC k=15 overlap run + the HPC
    spike-in filter run + the PacBio non-sense thresholds."""
    from longqc_tpu.engine.pipeline import run_sampleqc

    rng = np.random.RandomState(37)
    genome = make_genome(rng, 9000)
    reads = sample_reads(rng, genome, 50, min_len=600, max_len=1500,
                         err=0.02, junk_frac=0.05)
    fq = str(tmp_path / "in.fq")
    write_fastq_file(fq, reads)

    out = str(tmp_path / "out")
    res = run_sampleqc(fq, out, "pb-hifi", nsample=30)
    assert res["Num_of_reads"] == 50
    assert "Coverage_stats" in res
    # the spike-in control filter run must have produced its table
    assert os.path.exists(os.path.join(
        out, "analysis", "minimap2", "spiked_in_control.txt"))


@pytest.mark.slow
def test_sampleqc_transcript_mode(tmp_path):
    """-t/--transcript: the lognormal+normal mixture path drives the
    coverage stats (Mode/mu/sigma keys instead of Mean/SD)."""
    from longqc_tpu.engine.pipeline import run_sampleqc

    rng = np.random.RandomState(41)
    # transcript-like: a few short "transcripts" sampled with very
    # skewed abundances -> low/skewed per-read coverage
    transcripts = [make_genome(rng, n) for n in (2000, 3000, 2500)]
    reads = []
    for i in range(60):
        t = transcripts[0] if i % 3 else transcripts[i % len(transcripts)]
        r = sample_reads(rng, t, 1, min_len=500,
                         max_len=max(600, len(t) - 1), err=0.08,
                         junk_frac=0.15)[0]
        r[0] = "read%05d" % i
        reads.append(r)
    fq = str(tmp_path / "in.fq")
    write_fastq_file(fq, reads)

    out = str(tmp_path / "out")
    res = run_sampleqc(fq, out, "ont-ligation", nsample=40,
                       transcript=True)
    cov = res["Coverage_stats"]
    # lognormal+normal mixture path engaged (lq_coverage.py:552-566):
    # transcript mode reports Mode/mu/sigma, not Mean/SD
    assert "Mode_coverage" in cov
    assert "mu_coverage" in cov and "sigma_coverage" in cov
    assert "Mean_coverage" not in cov
    assert cov["sigma_coverage"] > 0


def test_sampleqc_fast5_dir_end_to_end(tmp_path):
    """sampleqc over a synthetic multi-read FAST5 directory (h5py
    fixture) — the fast5 ingestion path had no e2e coverage
    (lq_utils.py:211-236, longQC.py:302-303)."""
    h5py = pytest.importorskip("h5py")
    import json
    from util_synth import make_genome, sample_reads

    rng = np.random.RandomState(17)
    reads = sample_reads(rng, make_genome(rng, 9000), 48, min_len=600,
                         max_len=1500, err=0.1, junk_frac=0.1)
    f5dir = tmp_path / "f5"
    f5dir.mkdir()
    per_file = 16
    for fi in range(0, len(reads), per_file):
        with h5py.File(str(f5dir / ("batch%02d.fast5" % fi)), "w") as f:
            for name, seq, qual in reads[fi:fi + per_file]:
                g = f.create_group(
                    "read_%s/Analyses/Basecall_1D_000/"
                    "BaseCalled_template" % name)
                fq = "@%s ch=1\n%s\n+\n%s\n" % (name, seq, qual)
                g.create_dataset("Fastq", data=fq.encode("ascii"))
    out = tmp_path / "out"
    from longqc_tpu.cli import main as cli_main
    rc = cli_main(["sampleqc", "-x", "ont-ligation", "-n", "30",
                   "-o", str(out), str(f5dir)])
    assert rc == 0
    qc = json.load(open(next(out.glob("QC_vals_*.json"))))
    assert qc["Yield"] == sum(len(r[1]) for r in reads)
    assert qc["Num_of_reads"] == len(reads)
    cov = (out / "analysis" / "minimap2" /
           "coverage_out.txt").read_text().strip().splitlines()
    assert len(cov) == 30 and len(cov[0].split("\t")) == 9
    assert (out / "web_summary.html").exists()
