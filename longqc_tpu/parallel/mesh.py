"""Device-mesh data parallelism for the overlap pipeline.

The scaling model (cf. SURVEY.md §2.3 P8): the sampled-read set and its
minimizer index are replicated per host; the query read stream is
sharded over the mesh's data axis; per-read outputs stay shard-local
and scalar/histogram statistics merge with psum over ICI.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_sketch_stats(mesh, codes, lengths, *, w, k):
    """Data-parallel sketch + per-shard stats with a psum'd global count.

    Returns (emit counts per read shard-local, global total minimizers).
    """
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


def dryrun(n_devices: int) -> None:
    """One data-parallel step on tiny shapes over an n-device mesh."""
    mesh = make_mesh(n_devices)
    rng = np.random.RandomState(0)
    n = n_devices * 2
    codes = rng.randint(0, 4, size=(n, 256)).astype(np.uint8)
    lengths = np.full((n,), 256, np.int32)
    per_read, total = sharded_sketch_stats(mesh, codes, lengths, w=5, k=12)
    per_read.block_until_ready()
    assert int(total[0]) == int(np.sum(np.asarray(per_read)))
