"""CLI surface parity: mmcov debug subcommand (-z / -d), sampleqc -d
index prefetch, hidden expert flags, help subcommand
(longQC.py:868-956; minimap2-coverage.c:37-197, 460-543)."""

import json
import os

import numpy as np
import pytest

from longqc_tpu.cli import build_parser, main
from util_synth import make_genome, sample_reads, write_fastq_file
from test_overlap_vs_ref import _binary, _run_ref


def _dataset(tmp_path, seed=13, n=60, nq=16):
    rng = np.random.RandomState(seed)
    genome = make_genome(rng, 15000)
    reads = sample_reads(rng, genome, n, min_len=600, max_len=1600,
                         err=0.12, junk_frac=0.1)
    tf = str(tmp_path / "target.fq")
    qf = str(tmp_path / "query.fq")
    write_fastq_file(tf, reads)
    write_fastq_file(qf, reads[:nq])
    return tf, qf


def test_mmcov_rows_match_reference_binary(tmp_path, capsys):
    exe = _binary()
    if exe is None:
        pytest.skip("reference binary unavailable")
    tf, qf = _dataset(tmp_path)
    ref_rows = _run_ref(exe, ["-Y", "-l", "0", "-q", "160", "-p", "80",
                              "-k", "12", "-w", "5", "-t", "2"],
                        tf, qf, str(tmp_path / "ref.txt"))
    assert main(["mmcov", "-k", "12", "-w", "5", "-p", "80", "-q", "160",
                 "-l", "0", tf, qf]) == 0
    out_rows = [ln for ln in capsys.readouterr().out.splitlines()
                if ln.strip()]
    assert out_rows == ref_rows


def test_mmcov_z_counts(tmp_path, capsys):
    tf, qf = _dataset(tmp_path, seed=19)
    assert main(["mmcov", "-z", tf, qf]) == 0
    cap = capsys.readouterr()
    rows_z = [ln for ln in cap.out.splitlines() if ln.strip()]
    counts = [int(ln.rsplit(" ", 1)[1]) for ln in cap.err.splitlines()
              if ln.startswith("[z]")]
    # rows unaffected by -z (the reference's -z pass precedes its normal
    # output loop and doesn't change it)
    assert main(["mmcov", tf, qf]) == 0
    rows_plain = [ln for ln in capsys.readouterr().out.splitlines()
                  if ln.strip()]
    assert rows_z == rows_plain
    # aggregation semantics: descending, and total equals the sum of
    # every query's m_cnts (khash sum-per-hash, minimap2-coverage.c:496)
    assert counts == sorted(counts, reverse=True)
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import overlap_host as oh
    from longqc_tpu.io.fastx import iter_fastx
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    queries = [[n, s, q or ""] for n, s, q in iter_fastx(qf)]
    targets = [[n, s, q or ""] for n, s, q in iter_fastx(tf)]
    _rows, states, q_sk = oh.overlap_run_with_states(
        iter(targets), queries, cfg)
    brute = {}
    for sk, st in zip(q_sk, states):
        for hh, c in zip(np.asarray(sk[0], np.uint64).tolist(),
                         st.m_cnts.tolist()):
            brute[hh] = brute.get(hh, 0) + int(c)
    assert sorted(counts, reverse=True) == sorted(brute.values(),
                                                  reverse=True)


def test_mmcov_index_dump_and_reuse(tmp_path, capsys):
    tf, qf = _dataset(tmp_path, seed=23)
    prefix = str(tmp_path / "tdb")
    # dump-only mode (no query; minimap2-coverage.c:460-468)
    assert main(["mmcov", "-d", prefix, tf]) == 0
    capsys.readouterr()
    assert os.path.exists(prefix + ".part0000.npz")
    # cached run must reproduce the fresh run bit-identically
    assert main(["mmcov", "-d", prefix, tf, qf]) == 0
    rows_cached = [ln for ln in capsys.readouterr().out.splitlines()
                   if ln.strip()]
    assert main(["mmcov", tf, qf]) == 0
    rows_fresh = [ln for ln in capsys.readouterr().out.splitlines()
                  if ln.strip()]
    assert rows_cached == rows_fresh


def test_sampleqc_db_prefetch(tmp_path):
    rng = np.random.RandomState(31)
    genome = make_genome(rng, 12000)
    reads = sample_reads(rng, genome, 50, min_len=600, max_len=1500,
                         err=0.1, junk_frac=0.1)
    fq = str(tmp_path / "in.fq")
    write_fastq_file(fq, reads)
    out1 = str(tmp_path / "out_db")
    out2 = str(tmp_path / "out_plain")
    assert main(["sampleqc", "-x", "ont-ligation", "-n", "30",
                 "-d", "-o", out1, fq]) == 0
    assert main(["sampleqc", "-x", "ont-ligation", "-n", "30",
                 "-o", out2, fq]) == 0
    # npz cache parts were persisted by the prefetch thread
    mm2 = os.path.join(out1, "analysis", "minimap2")
    assert any(f.startswith("t_db_longqc") and f.endswith(".npz")
               for f in os.listdir(mm2))
    # identical coverage tables and QC JSON
    c1 = open(os.path.join(mm2, "coverage_out.txt")).read()
    c2 = open(os.path.join(out2, "analysis", "minimap2",
                           "coverage_out.txt")).read()
    assert c1 == c2
    j1 = json.load(open(os.path.join(out1,
                                     "QC_vals_longQC_sampleqc.json")))
    j2 = json.load(open(os.path.join(out2,
                                     "QC_vals_longQC_sampleqc.json")))
    assert j1 == j2


def test_parser_expert_flags_and_help(capsys):
    p = build_parser()
    args = p.parse_args(["sampleqc", "-x", "pb-rs2", "-o", "x",
                         "--ont", "--pb", "--sequel", "-p", "8", "in.fq"])
    assert args.pb and args.sequel and args.ont and args.ncpu == 8
    # hidden flags stay hidden
    help_text = p.format_help()
    assert "--pb" not in help_text
    # help subcommand prints the target subparser's help and exits 0
    with pytest.raises(SystemExit) as e:
        main(["help", "sampleqc"])
    assert e.value.code == 0
    assert "sampleqc" in capsys.readouterr().out
