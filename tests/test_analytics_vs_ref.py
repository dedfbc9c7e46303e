"""Differential test of the analytics layer vs the reference
lq_coverage.LqCoverage (imported straight from /root/reference as the
oracle, like the C binaries in test_overlap_vs_ref).

Both sides consume one identical coverage TSV produced by the host
overlap spec (itself row-identical to the reference binary), so this
closes the contract chain TSV -> JSON-level numbers:

  exact:      unmapped fractions, high-div fraction, Poisson lambda
              bounds, low/no-coverage booleans, expected-zero-rate
              formula
  tolerance:  GMM main-component mean/sd (sklearn's unseeded kmeans
              init vs our deterministic init — the one documented
              divergence, ops/distfit.py:7-9), lognorm+normal EM
              parameters, Xome-size point estimate (derived from the
              GMM mean)

Reference behavior: lq_coverage.py:211-295 (__est_coverage),
:368-386 (calc_xome_size), :151-158 (get_expected_zero_rate).
"""

import math
import sys

import numpy as np
import pytest

from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
from longqc_tpu.engine import overlap_host as oh
from longqc_tpu.report.coverage import CoverageAnalytics
from util_synth import make_genome, sample_reads

REF = "/root/reference"


def _ref_lq_coverage():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import matplotlib
    matplotlib.use("Agg")
    try:
        import lq_coverage
    except Exception as e:  # pragma: no cover
        pytest.skip("reference lq_coverage unavailable: %r" % (e,))
    return lq_coverage


def _coverage_tsv(tmp_path, rng, n_reads=130, genome_n=22000,
                  junk_frac=0.1, err=0.12):
    genome = make_genome(rng, genome_n)
    reads = sample_reads(rng, genome, n_reads, min_len=700, max_len=1900,
                         err=err, junk_frac=junk_frac)
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    rows = oh.overlap_run(list(reads), reads, cfg)
    p = tmp_path / "coverage_out.txt"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _compare(path, is_transcript=False):
    lq_coverage = _ref_lq_coverage()
    np.random.seed(7)  # the oracle's sklearn GMM init is unseeded
    # pandas>=3 gives str columns arrow-backed arrays whose .values break
    # the oracle's `values[np.where(...)]` idiom (written for pandas<2);
    # pin those columns to object dtype for the oracle only
    import pandas as pd
    orig_read_table = pd.read_table

    def compat_read_table(*a, **k):
        df = orig_read_table(*a, **k)
        for c in (3, 4):
            if c in df.columns:
                df[c] = df[c].astype(object)
        return df

    pd.read_table = compat_read_table
    try:
        ref = lq_coverage.LqCoverage(path, isTranscript=is_transcript)
    finally:
        pd.read_table = orig_read_table
    ours = CoverageAnalytics(path, is_transcript=is_transcript)

    # exact-contract numbers
    assert ours.unmapped_frac_trimmed == ref.unmapped_frac_trimmed
    assert ours.unmapped_frac_med == ref.unmapped_frac_med
    assert ours.high_div_frac == ref.high_div_frac
    assert bool(ours.no_coverage) == bool(ref.no_coverage)
    assert bool(ours.low_coverage) == bool(ref.low_coverage)
    if ref.min_lambda is None:
        assert ours.min_lambda is None
    else:
        assert ours.min_lambda == pytest.approx(ref.min_lambda, rel=1e-12)
        assert ours.max_lambda == pytest.approx(ref.max_lambda, rel=1e-12)

    if ref.model is not None and ours.model is not None:
        # pinned divergence: component SELECTION must agree and the main
        # mean/sd must land on the same mixture solution; exactness is
        # impossible (sklearn kmeans init is unseeded/non-deterministic,
        # ours is deterministic by design)
        assert ours.mean_main == pytest.approx(ref.mean_main, rel=0.15)
        assert math.sqrt(ours.cov_main) == pytest.approx(
            math.sqrt(ref.cov_main), rel=0.35)

    if ref.mode_logn_main is not None:
        if math.isnan(ref.mode_logn_main):
            # degenerate EM (junk-dominated input): both sides must
            # agree the fit blew up the same way
            assert math.isnan(ours.mode_logn_main)
        else:
            assert ours.mode_logn_main == pytest.approx(
                ref.mode_logn_main, rel=0.1)
            assert ours.mu_logn_main == pytest.approx(ref.mu_logn_main,
                                                      rel=0.1)

    # expected zero rate rides the same empirical formula
    ez_ref = ref.get_expected_zero_rate()
    ez_ours = ours.get_expected_zero_rate()
    if math.isnan(ez_ref[0]):
        assert math.isnan(ez_ours[0])
    else:
        assert ez_ours[0] == pytest.approx(ez_ref[0], rel=0.15)
        assert ez_ours[1] == pytest.approx(ez_ref[1], rel=0.5)

    # Xome size string: same structure; integers within GMM tolerance
    # (skipped when the lognorm mode degenerated to NaN on both sides —
    # int(nan) raises in the oracle too)
    degenerate = (ref.mode_logn_main is not None
                  and math.isnan(ref.mode_logn_main)
                  and (ref.low_coverage or ref.isTranscript))
    if not degenerate:
        throughput = 3.3e6
        xs_ref = ref.calc_xome_size(throughput)
        xs_ours = ours.calc_xome_size(throughput)
        if xs_ref == "N/A":
            assert xs_ours == "N/A"
        else:
            parts_ref = [p.split(" ")[0] for p in xs_ref.split(", ")]
            parts_ours = [p.split(" ")[0] for p in xs_ours.split(", ")]
            assert len(parts_ref) == len(parts_ours)
            # first term derives from the fitted mean (tolerance); the
            # poisson-bound terms (if present) are exact math
            assert int(parts_ours[0]) == pytest.approx(int(parts_ref[0]),
                                                       rel=0.2)
            for a, b in zip(parts_ours[1:], parts_ref[1:]):
                assert int(a) == int(b)
    return ref, ours


def test_analytics_match_reference_normal_coverage(tmp_path):
    rng = np.random.RandomState(17)
    path = _coverage_tsv(tmp_path, rng, n_reads=130, junk_frac=0.1)
    ref, ours = _compare(path)
    assert ref.min_lambda is None  # sanity: this is the GMM regime


def test_analytics_match_reference_high_zero_coverage(tmp_path):
    # junk-dominated input drives unmapped_frac_med >= 0.4: the Poisson
    # lambda-bound branch (lq_coverage.py:245-250) must agree exactly
    rng = np.random.RandomState(29)
    path = _coverage_tsv(tmp_path, rng, n_reads=110, genome_n=18000,
                         junk_frac=0.75)
    ref, ours = _compare(path)
    assert ref.min_lambda is not None  # sanity: lambda branch exercised


def test_analytics_match_reference_transcript_mode(tmp_path):
    # -t preset: lognormal+normal mixture path (mixEM semantics)
    rng = np.random.RandomState(31)
    path = _coverage_tsv(tmp_path, rng, n_reads=120, genome_n=20000,
                         junk_frac=0.15)
    ref, ours = _compare(path, is_transcript=True)
    assert ref.mode_logn_main is not None
