"""Per-op compile-cost probe on the attached TPU backend.

Times .lower().compile() for the individual primitives the step program
leans on, at the canonical shapes. Run with the cache off:
  LONGQC_JAX_CACHE=off python tests/probe_compile_ops.py
"""
import os
import sys
import time

os.environ.setdefault("LONGQC_JAX_CACHE", "off")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import longqc_tpu  # noqa: F401  (x64 config)

i32 = jnp.int32


def sds(shape, dtype=i32):
    return jax.ShapeDtypeStruct(shape, dtype)


def t(name, fn, *args, **kw):
    t0 = time.time()
    lo = jax.jit(fn, **kw).lower(*args)
    t1 = time.time()
    lo.compile()
    t2 = time.time()
    print("%-44s lower %5.1fs compile %7.1fs" % (name, t1 - t0, t2 - t1),
          flush=True)


def main():
    print(jax.devices(), flush=True)
    Q = 128

    for A in (8192, 32768):
        t("sort (%d,%d) 3op 2key stable" % (Q, A),
          lambda a, b, c: jax.lax.sort((a, b, c), dimension=1, num_keys=2,
                                       is_stable=True),
          sds((Q, A)), sds((Q, A)), sds((Q, A)))
    t("sort (128,32768) 1op 1key unstable",
      lambda a: jax.lax.sort((a,), dimension=1, num_keys=1)[0],
      sds((Q, 32768)))
    t("sort (128,32768) 2op 1key stable",
      lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1,
                                is_stable=True),
      sds((Q, 32768)), sds((Q, 32768)))
    t("searchsorted 16M x (128,2048)",
      lambda ih, qh: jnp.searchsorted(ih, qh, side="left"),
      sds((1 << 24,)), sds((Q, 2048)))
    t("row_searchsorted (128,2048)x(128,32768)",
      lambda a, v: jax.vmap(
          lambda ar, vr: jnp.searchsorted(ar, vr, side="right"))(a, v),
      sds((Q, 2048)), sds((Q, 32768)))
    t("assoc_scan max (128,32768)",
      lambda a: jax.lax.associative_scan(jnp.maximum, a, axis=1),
      sds((Q, 32768)))
    t("cumsum (128,32768)",
      lambda a: jnp.cumsum(a, axis=1), sds((Q, 32768)))
    t("scatter-min .at[].min (128,32768)",
      lambda a, i, v: a.at[
          jax.lax.broadcasted_iota(i32, (Q, 32768), 0),
          jnp.clip(i, 0, 32768)].min(v, mode="drop"),
      sds((Q, 32769)), sds((Q, 32768)), sds((Q, 32768)))
    t("take_along_axis (128,32768)",
      lambda a, i: jnp.take_along_axis(a, i, axis=1),
      sds((Q, 32768)), sds((Q, 32768)))
    t("gather 16M by (128,32768)",
      lambda a, i: a[jnp.clip(i, 0, (1 << 24) - 1)],
      sds(((1 << 24),)), sds((Q, 32768)))


if __name__ == "__main__":
    main()
