"""Benchmark: overlap-sampling throughput vs the reference CPU binary.

Generates a deterministic synthetic long-read dataset, runs the
TPU-native overlap-coverage engine (the sampleqc hot path: sketch ->
index -> seed lookup -> chain DP -> coverage accounting), times it, and
compares with the reference minimap2-coverage binary on the same input
when buildable (compiled from the read-only reference checkout; results
also cross-checked row-for-row).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

N_TARGET = int(os.environ.get("BENCH_N_TARGET", "1500"))
N_QUERY = int(os.environ.get("BENCH_N_QUERY", "250"))
GENOME = int(os.environ.get("BENCH_GENOME", "120000"))

REF_SRC = "/root/reference/minimap2-coverage"
BUILD_DIR = "/tmp/ref-mm2cov"


def build_reference():
    exe = os.path.join(BUILD_DIR, "minimap2-coverage")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF_SRC):
        return None
    try:
        shutil.copytree(REF_SRC, BUILD_DIR, dirs_exist_ok=True)
        r = subprocess.run(["make", "-j2"], cwd=BUILD_DIR,
                           capture_output=True, timeout=300)
        if r.returncode == 0 and os.path.exists(exe):
            return exe
    except Exception:
        pass
    return None


def main():
    from util_synth import make_genome, sample_reads, write_fastq_file
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine.overlap import overlap_run_device

    rng = np.random.RandomState(1234)
    genome = make_genome(rng, GENOME)
    reads = sample_reads(rng, genome, N_TARGET, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:N_QUERY]
    n_bases = sum(len(r[1]) for r in reads)

    cfg = OverlapConfig(
        index=IndexOpt(k=12, w=5),
        map=MapOpt(min_score_med=80, min_score_good=160),
        flt=FltOpt(min_ovlp=0),
    )

    # warm-up on a slice (compile caches)
    print("bench: warm-up (compiles)...", file=sys.stderr, flush=True)
    t0 = time.time()
    overlap_run_device(list(reads[:200]), queries[:16], cfg)
    print("bench: warm-up done in %.1fs" % (time.time() - t0),
          file=sys.stderr, flush=True)

    t0 = time.time()
    rows = overlap_run_device(list(reads), queries, cfg)
    tpu_wall = time.time() - t0
    tpu_rps = N_TARGET / tpu_wall

    vs_baseline = 0.0
    ref_wall = None
    exe = build_reference()
    if exe is not None:
        tmp = "/tmp/longqc_bench"
        os.makedirs(tmp, exist_ok=True)
        tfq = os.path.join(tmp, "target.fq")
        qfq = os.path.join(tmp, "query.fq")
        write_fastq_file(tfq, reads)
        write_fastq_file(qfq, queries)
        ncpu = os.cpu_count() or 1
        t0 = time.time()
        with open(os.path.join(tmp, "ref_out.txt"), "w") as fo:
            subprocess.run(
                [exe, "-Y", "-l", "0", "-q", "160", "-p", "80", "-k", "12",
                 "-w", "5", "-t", str(ncpu), tfq, qfq],
                stdout=fo, stderr=subprocess.DEVNULL, check=True)
        ref_wall = time.time() - t0
        vs_baseline = (N_TARGET / ref_wall) and tpu_rps / (N_TARGET / ref_wall)
        with open(os.path.join(tmp, "ref_out.txt")) as f:
            ref_rows = [ln.rstrip("\n") for ln in f if ln.strip()]
        mism = sum(1 for a, b in zip(rows, ref_rows) if a != b)
        if mism:
            print("WARNING: %d/%d rows differ from reference"
                  % (mism, len(rows)), file=sys.stderr)

    print(json.dumps({
        "metric": "overlap-sampled target reads/s (1 chip, %d targets "
                  "%.1f Mbp vs %d sampled reads)"
                  % (N_TARGET, n_bases / 1e6, N_QUERY),
        "value": round(tpu_rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
