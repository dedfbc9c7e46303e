"""Benchmark: overlap-sampling throughput vs the reference CPU binary.

Generates a deterministic synthetic long-read dataset, runs the
TPU-native overlap-coverage engine (the sampleqc hot path: sketch ->
index -> seed lookup -> chain DP -> coverage accounting), times it, and
compares with the reference minimap2-coverage binary on the same input
(compiled from the read-only reference checkout; rows also cross-checked
for bit-identity).

Budget discipline (the round-2 bench timed out and published nothing —
never again): a watchdog thread prints the best-so-far JSON line and
exits the process at BENCH_BUDGET_S (default 480 s). Every section
updates the shared RESULT dict incrementally and is individually
try/except-guarded, so whatever has been measured by the deadline is
what gets published. Section order = value order: reference baseline
first (cheap, CPU), then engine warm-up + timed runs, then the optional
extras (adversarial fallback probe, extension-kernel roofline numbers,
virtual-mesh scaling table).

Methodology notes (recorded in the JSON):
- the reference runs with -t <all cores of this box>; BASELINE.md's
  north star denominator is a 16-core host, so `baseline_cores` states
  what was actually used.
- `warmup_s` is the first full-workload pass (compile + execute);
  compiled programs land in the persistent cache under .cache/jaxcomp
  and are reused across processes. `cache_hits`/`cache_misses` report
  how much of the warm-up was served from disk.
- host-fallback accounting (chain-kernel flags, exact-geometry flags)
  is reported for the standard workload and for an adversarial
  repeat-rich/low-complexity set; the device path is only honest if
  these stay near zero.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import shutil
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

N_TARGET = int(os.environ.get("BENCH_N_TARGET", "1500"))
N_QUERY = int(os.environ.get("BENCH_N_QUERY", "250"))
GENOME = int(os.environ.get("BENCH_GENOME", "400000"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))

REF_SRC = "/root/reference/minimap2-coverage"
BUILD_DIR = "/tmp/ref-mm2cov"

T0 = time.time()
RESULT = {
    "metric": "overlap-sampled target reads/s (1 chip)",
    "value": 0.0,
    "unit": "reads/s",
    "vs_baseline": 0.0,
}
_PRINTED = threading.Event()
_LOCK = threading.Lock()


def left():
    return BUDGET_S - (time.time() - T0)


def log(msg):
    print("bench[%5.1fs]: %s" % (time.time() - T0, msg), file=sys.stderr,
          flush=True)


def emit_and_exit(code=0):
    with _LOCK:
        if not _PRINTED.is_set():
            _PRINTED.set()
            print(json.dumps(RESULT), flush=True)
    os._exit(code)


def _watchdog():
    while True:
        r = left()
        if r <= 8.0:
            log("watchdog: budget reached, emitting best-so-far")
            emit_and_exit(0)
        time.sleep(min(r - 8.0, 5.0))


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
    except Exception as e:
        log("reference build failed: %r" % (e,))
    return None


def run_engine(reads, queries, cfg):
    from longqc_tpu.engine.device_overlap import DeviceOverlapEngine

    eng = DeviceOverlapEngine(cfg, queries)
    rows = eng.run(list(reads))
    return rows, eng


def cache_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".cache", "jaxcomp")


def n_cache_entries():
    try:
        return len(os.listdir(cache_dir()))
    except OSError:
        return 0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    if os.environ.get("BENCH_STACK_DUMPS"):
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["BENCH_STACK_DUMPS"]), repeat=True,
            file=sys.stderr)

    # absorb the tunnel's first-pull stall + feed the remote compiler
    # all canonical programs concurrently while data/baseline run below
    from longqc_tpu.parallel.warm import start_warm_pull
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    cfg = OverlapConfig(
        index=IndexOpt(k=12, w=5),
        map=MapOpt(min_score_med=80, min_score_good=160),
        flt=FltOpt(min_ovlp=0))
    import jax
    if jax.default_backend() == "tpu":
        start_warm_pull()
        from longqc_tpu.engine.device_overlap import A_LADDER, precompile
        # base anchor rung only: the big retry rung compiles lazily on
        # first F_ANCH overflow (and its compile is far more expensive)
        precompile(cfg, [4096], a_rungs=A_LADDER[:1], background=True)

    from util_synth import make_genome, sample_reads, write_fastq_file

    rng = np.random.RandomState(1234)
    log("generating %d synthetic reads..." % N_TARGET)
    genome = make_genome(rng, GENOME)
    reads = sample_reads(rng, genome, N_TARGET, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:N_QUERY]
    n_bases = sum(len(r[1]) for r in reads)
    RESULT["metric"] = (
        "overlap-sampled target reads/s (1 chip, %d targets %.1f Mbp vs "
        "%d sampled reads)" % (N_TARGET, n_bases / 1e6, N_QUERY))

    # ---- reference baseline first: cheap, no TPU involved ----
    ncpu = os.cpu_count() or 1
    RESULT["baseline_cores"] = ncpu
    RESULT["baseline_note"] = (
        "reference ran at -t %d on this box; BASELINE.md north-star "
        "denominator is 16 cores" % ncpu)
    ref_wall = None
    ref_rows = None
    exe = build_reference()
    if exe is not None:
        tmp = "/tmp/longqc_bench"
        os.makedirs(tmp, exist_ok=True)
        tfq = os.path.join(tmp, "target.fq")
        qfq = os.path.join(tmp, "query.fq")
        write_fastq_file(tfq, reads)
        write_fastq_file(qfq, queries)
        t0 = time.time()
        with open(os.path.join(tmp, "ref_out.txt"), "w") as fo:
            subprocess.run(
                [exe, "-Y", "-l", "0", "-q", "160", "-p", "80", "-k", "12",
                 "-w", "5", "-t", str(ncpu), tfq, qfq],
                stdout=fo, stderr=subprocess.DEVNULL, check=True)
        ref_wall = time.time() - t0
        RESULT["ref_wall_s"] = round(ref_wall, 3)
        with open(os.path.join(tmp, "ref_out.txt")) as f:
            ref_rows = [ln.rstrip("\n") for ln in f if ln.strip()]
        log("reference: %.2fs (%.0f reads/s) at -t %d"
            % (ref_wall, N_TARGET / ref_wall, ncpu))

    # ---- engine warm-up (compiles; persistent cache across runs) ----
    cache_before = n_cache_entries()
    log("warm-up pass (cache entries on disk: %d)..." % cache_before)
    t0 = time.time()
    rows, eng = run_engine(reads, queries, cfg)
    warmup_s = time.time() - t0
    cache_after = n_cache_entries()
    RESULT["warmup_s"] = round(warmup_s, 1)
    RESULT["cache_entries_before"] = cache_before
    RESULT["cache_misses"] = cache_after - cache_before
    log("warm-up done in %.1fs (%d new cache entries)"
        % (warmup_s, cache_after - cache_before))

    def record_timed(tpu_wall, eng):
        tpu_rps = N_TARGET / tpu_wall
        if tpu_rps > RESULT["value"]:
            RESULT["value"] = round(tpu_rps, 2)
            RESULT["tpu_wall_s"] = round(tpu_wall, 3)
            RESULT["phase_s"] = {k: round(v, 3) for k, v in
                                 sorted(eng.phase_s.items())}
            if ref_wall:
                RESULT["vs_baseline"] = round(
                    tpu_rps / (N_TARGET / ref_wall), 3)
            RESULT["host_fallback_rows"] = eng.n_host_fallback
            RESULT["host_fallback_frac"] = round(
                eng.n_host_fallback / max(1, len(queries)), 4)
            RESULT["flag_counts"] = {str(k): v for k, v in
                                     sorted(eng.flag_counts.items())}
            RESULT["device_calls"] = eng.n_device_calls

    # a first timed pass right away so a throughput number exists
    t0 = time.time()
    rows, eng = run_engine(reads, queries, cfg)
    record_timed(time.time() - t0, eng)
    log("timed pass 1: %.2fs (%.0f reads/s)"
        % (RESULT["tpu_wall_s"], RESULT["value"]))

    if ref_rows is not None:
        mism = sum(1 for a, b in zip(rows, ref_rows) if a != b)
        mism += abs(len(rows) - len(ref_rows))
        RESULT["rows_identical_to_reference"] = (mism == 0)
        if mism:
            log("WARNING: %d/%d rows differ from reference"
                % (mism, len(rows)))

    if left() > 2.5 * RESULT["tpu_wall_s"] + 30:
        t0 = time.time()
        _, eng2 = run_engine(reads, queries, cfg)
        record_timed(time.time() - t0, eng2)
        log("timed pass 2 best: %.0f reads/s" % RESULT["value"])

    # ---- adversarial fallback probe ----
    try:
        if left() > 120:
            rng2 = np.random.RandomState(77)
            core = make_genome(rng2, 2500)
            adv_genome = core * 8 + "AT" * 3000 + make_genome(rng2, 5000)
            adv_reads = sample_reads(rng2, adv_genome, 300, min_len=600,
                                     max_len=1800, err=0.08, junk_frac=0.05)
            _, adv_eng = run_engine(adv_reads, adv_reads[:64], cfg)
            RESULT["adversarial_fallback_frac"] = round(
                adv_eng.n_host_fallback / 64.0, 4)
            log("adversarial fallback frac: %.3f"
                % RESULT["adversarial_fallback_frac"])
    except Exception as e:
        log("adversarial probe failed: %r" % (e,))

    # ---- extension-kernel (ksw2-class) roofline numbers ----
    try:
        if left() > 90:
            from tests.perf_extend import extension_perf
            RESULT["extension_kernel"] = extension_perf(
                budget_s=min(60.0, left() - 30))
            log("extension kernel: %s" % RESULT["extension_kernel"])
    except Exception as e:
        log("extension perf failed: %r" % (e,))

    # ---- virtual-mesh scaling table (subprocess on CPU devices) ----
    try:
        if left() > 120:
            budget = min(100.0, left() - 15)
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                                " --xla_force_host_platform_device_count=8")
            env["LONGQC_JAX_CACHE"] = "off"
            r = subprocess.run(
                [sys.executable,
                 os.path.join("tests", "bench_mesh_scaling.py")],
                capture_output=True, timeout=budget, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
            for ln in r.stdout.splitlines():
                if ln.startswith("{"):
                    RESULT["mesh_scaling"] = json.loads(ln)
                    log("mesh scaling: %s" % ln)
    except Exception as e:
        log("mesh scaling failed: %r" % (e,))

    emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log("FATAL: %r" % (e,))
        RESULT["error"] = repr(e)
        emit_and_exit(1)
