"""Device-mesh data parallelism for the overlap pipeline.

Scaling model (SURVEY.md §2.3 P8): the sampled-read minimizer index is
replicated per host; the query/target read stream is sharded over the
mesh's data axis; per-read outputs stay shard-local; scalar/histogram
statistics merge with psum over ICI.

The QC workload has no model weights — the only "model-parallel-like"
axis is replicated-index + sharded-reads, i.e. pure data parallelism;
shard_map + psum is the whole collective story.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_sketch_stats(mesh, codes, lengths, *, w, k):
    """Data-parallel sketch: read rows sharded, global minimizer count
    psum-merged. Returns (per-read counts, global total)."""
    from longqc_tpu.ops.sketch import sketch_batch

    @partial(shard_map, mesh=mesh,
             in_specs=(P("data", None), P("data")),
             out_specs=(P("data"), P()))
    def step(codes, lengths):
        res = sketch_batch(codes, lengths, w=w, k=k)
        per_read = jnp.sum(res["emit"], axis=1, dtype=jnp.int64)
        total = jax.lax.psum(jnp.sum(per_read), "data")
        return per_read, total[None]

    return jax.jit(step)(codes, lengths)


def sharded_chain_step(mesh, ax_hi, ax_lo, aq, aspan, n_anchors, pen_tab, *,
                       J=64, max_dist=10000, bw=500, max_skip=25):
    """Data-parallel chain-DP: query rows sharded over the data axis,
    per-row f/p/v shard-local, plus a psum'd global score histogram
    (the cross-shard merge the full pipeline uses for coverage stats).
    """
    from longqc_tpu.ops.chain import chain_dp_batch

    nbins = 16

    from longqc_tpu.ops.chain import make_carry

    @partial(shard_map, mesh=mesh,
             in_specs=(P("data", None), P("data", None), P("data", None),
                       P("data", None), P("data"), P("data", None)),
             out_specs=(P("data", None), P("data", None),
                        P("data", None), P("data"), P()))
    def step(ax_hi, ax_lo, aq, aspan, n_anchors, pen_tab):
        carry = tuple(jnp.asarray(c) + (n_anchors[:1] * 0)[:, None]
                      if c.ndim == 2 else
                      jnp.asarray(c) | ((n_anchors[:1] * 0) > 0)
                      for c in make_carry(ax_hi.shape[0], J))
        f, p, v, flags, _ = chain_dp_batch(ax_hi, ax_lo, aq, aspan,
                                           n_anchors, pen_tab, carry,
                                           jnp.int32(0), J=J,
                                           max_dist=max_dist,
                                           bw=bw, max_skip=max_skip)
        best = jnp.max(f, axis=1)
        hist = jnp.zeros((nbins,), jnp.int32).at[
            jnp.clip(best // 32, 0, nbins - 1)].add(1)
        hist = jax.lax.psum(hist, "data")
        return f, p, v, flags, hist

    return jax.jit(step)(ax_hi, ax_lo, aq, aspan, n_anchors, pen_tab)


def dryrun(n_devices: int) -> None:
    """One full data-parallel step of the overlap compute (sketch +
    chain DP + collective stat merge) on tiny shapes over an
    n_devices mesh."""
    mesh = make_mesh(n_devices)
    rng = np.random.RandomState(0)

    # stage 1: sharded sketch
    n = n_devices * 2
    codes = rng.randint(0, 4, size=(n, 256)).astype(np.uint8)
    lengths = np.full((n,), 256, np.int32)
    per_read, total = sharded_sketch_stats(mesh, codes, lengths, w=5, k=12)
    per_read.block_until_ready()
    assert int(total[0]) == int(np.sum(np.asarray(per_read)))

    # stage 2: sharded chain DP over synthetic diagonal-ish anchors
    Q = n_devices * 2
    A = 64
    bw = 500
    ax_hi = np.zeros((Q, A), np.int32)
    ax_lo = np.zeros((Q, A), np.int32)
    aq = np.zeros((Q, A), np.int32)
    for r in range(Q):
        t = np.cumsum(rng.randint(1, 40, size=A))
        ax_lo[r] = t.astype(np.int32)
        aq[r] = (t + rng.randint(-10, 10, size=A)).astype(np.int32)
    aspan = np.full((Q, A), 12, np.int32)
    n_anchors = np.full((Q,), A, np.int32)
    from longqc_tpu.ops.chain import gap_penalty_table
    pen = np.broadcast_to(gap_penalty_table(np.float32(12.0), bw),
                          (Q, bw + 1)).copy()
    f, p, v, flags, hist = sharded_chain_step(
        mesh, ax_hi, ax_lo, aq, aspan, n_anchors, pen, bw=bw)
    f.block_until_ready()
    assert int(np.asarray(hist).sum()) == Q
