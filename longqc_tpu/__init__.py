"""longqc_tpu — a TPU-native long-read quality-control engine.

A from-scratch reimplementation of the capabilities of LongQC
(reference: yfukasawa/LongQC) designed for TPU hardware: the
minimap2-coverage overlap pipeline (minimizer sketching, seed chaining,
coverage accounting) runs as batched JAX/Pallas device programs over
packed 2-bit read tiles, scaling data-parallel over a `jax.sharding.Mesh`;
statistics (GC, quality, low-complexity masking, length/coverage
distribution fits) are batched array ops; reports (TSV/JSON/HTML/plots)
match the reference's output contracts.

Layout:
    io/        host I/O: format sniffing, FASTA/FASTQ/BAM/FAST5 chunk
               streaming, 2-bit packing, reservoir subsampling
    ops/       device kernels: quality, GC, sdust, sketch, chaining,
               adapter DP, distribution fitting
    engine/    overlap-coverage engine + sampleqc pipeline orchestration
    parallel/  mesh / shard_map data-parallel execution
    report/    coverage analytics, plots, JSON + HTML report
    platform/  per-instrument run QC (RS-II, Sequel, ONT)
"""

import os as _os

import jax

# The sketch kernel packs (w,k)-minimizer hashes into 64-bit lanes for
# k > 16 (2 bits/base, invertible 56-bit hash, cf. reference sketch.c:76).
# Enable x64 so uint64 is available on all backends.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the attached TPU runtime compiles
# remotely (60-400 s per program), so executables are cached on disk and
# reused across processes/runs. Disable with LONGQC_JAX_CACHE=off.
_cache = _os.environ.get("LONGQC_JAX_CACHE",
                         _os.path.join(_os.path.dirname(__file__),
                                       _os.pardir, ".cache", "jaxcomp"))
if _cache != "off":
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from longqc_tpu._version import __version__  # noqa: E402,F401
