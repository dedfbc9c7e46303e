"""Ring-propagation Pallas kernels over the chain-DP parent forest.

The chain kernel (ops/chain_pallas.py) only links anchors to parents
within its J-deep ring, so every parent pointer satisfies
1 <= i - p[i] <= J on unflagged rows. That bound turns the two
pointer-chasing passes of chain extraction into streaming ring passes:

  * peak (forward):   peak[i] = i when f[i] == v[i], else peak[p[i]]
    (the `while f[j] < v[j]: j = p[j]` walk of chain.c:96-99).
  * min-rank (backward): r[i] = min(own_rank[i], min over j in
    (i, i+J] with p[j] == i of r[j]) — the ownership propagation of
    ops/chainsel (the closed form of the greedy backtrack).

Both kernels stream (CA, Q) anchor blocks through a sequential grid
with the J-deep rings in VMEM scratch, mirroring the chain kernel's
layout (queries on lanes, ring ages on sublanes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = np.int32(0x7FFFFFFF)
_CA = 256
_J = 64


def _pallas_call_x32(*pc_args, **pc_kwargs):
    """pallas_call traced with x64 disabled (Mosaic has no i64)."""
    inner = pl.pallas_call(*pc_args, **pc_kwargs)

    def call(*operands):
        with jax.enable_x64(False):
            return inner(*operands)

    return call


def _make_peak_kernel(J, CA):
    def kernel(f_ref, v_ref, p_ref, out_ref, rpk, rvalid):
        b = pl.program_id(0)
        Q = f_ref.shape[1]
        ages = jax.lax.broadcasted_iota(jnp.int32, (J, Q), 0) + 1

        @pl.when(b == 0)
        def _():
            rpk[:] = jnp.full((J, Q), -1, jnp.int32)
            rvalid[:] = jnp.zeros((J, Q), jnp.int32)

        def body(li, tok):
            i = b * CA + li
            f_i = f_ref[pl.ds(li, 1), :]
            v_i = v_ref[pl.ds(li, 1), :]
            p_i = p_ref[pl.ds(li, 1), :]
            tgt_age = i - p_i  # (1, Q)
            sel = jnp.max(jnp.where(ages == tgt_age, rpk[:], -1),
                          axis=0, keepdims=True)
            walk = (v_i > f_i) & (p_i >= 0) & (tgt_age <= J)
            peak_i = jnp.where(walk, sel, i)
            out_ref[pl.ds(li, 1), :] = peak_i
            rpk[:] = jnp.where(ages == 1, peak_i, pltpu.roll(rpk[:], 1, 0))
            return tok

        jax.lax.fori_loop(np.int32(0), np.int32(CA), body, np.int32(0))

    return kernel


def _make_minrank_kernel(J, CA, nblk):
    def kernel(p_ref, own_ref, out_ref, rr, rp):
        b = pl.program_id(0)
        Q = p_ref.shape[1]
        ages = jax.lax.broadcasted_iota(jnp.int32, (J, Q), 0) + 1

        @pl.when(b == 0)
        def _():
            rr[:] = jnp.full((J, Q), INF32, jnp.int32)
            rp[:] = jnp.full((J, Q), -2, jnp.int32)

        def body(li_fwd, tok):
            li = CA - 1 - li_fwd
            i = (nblk - 1 - b) * CA + li
            p_i = p_ref[pl.ds(li, 1), :]
            own_i = own_ref[pl.ds(li, 1), :]
            match = rp[:] == i
            cand = jnp.min(jnp.where(match, rr[:], INF32),
                           axis=0, keepdims=True)
            r_i = jnp.minimum(own_i, cand)
            out_ref[pl.ds(li, 1), :] = r_i
            rr[:] = jnp.where(ages == 1, r_i, pltpu.roll(rr[:], 1, 0))
            rp[:] = jnp.where(ages == 1, p_i, pltpu.roll(rp[:], 1, 0))
            return tok

        jax.lax.fori_loop(np.int32(0), np.int32(CA), body, np.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("J", "interpret"))
def peak_pass(f, v, p, *, J=_J, interpret=False):
    """(A, Q) int32 f/v/p -> (A, Q) int32 peak (absolute indices).

    Rows whose parents escape the J ring produce garbage — such rows
    are already flagged by the chain kernel and replaced by the host
    fallback downstream.
    """
    A, Q = f.shape
    assert A % _CA == 0
    nblk = A // _CA
    vm = pltpu.VMEM
    specA = pl.BlockSpec((_CA, Q), lambda b: (b, 0), memory_space=vm)
    return _pallas_call_x32(
        _make_peak_kernel(J, _CA),
        grid=(nblk,),
        in_specs=[specA, specA, specA],
        out_specs=specA,
        out_shape=jax.ShapeDtypeStruct((A, Q), jnp.int32),
        scratch_shapes=[pltpu.VMEM((J, Q), jnp.int32)] * 2,
        interpret=interpret,
    )(f, v, p)


@functools.partial(jax.jit, static_argnames=("J", "interpret"))
def minrank_pass(p, own_rank, *, J=_J, interpret=False):
    """(A, Q) int32 p/own_rank -> (A, Q) int32 min-rank (INF32 where
    the anchor is on no candidate chain's path)."""
    A, Q = p.shape
    assert A % _CA == 0
    nblk = A // _CA
    vm = pltpu.VMEM
    rev = pl.BlockSpec((_CA, Q), lambda b: (nblk - 1 - b, 0),
                       memory_space=vm)
    return _pallas_call_x32(
        _make_minrank_kernel(J, _CA, nblk),
        grid=(nblk,),
        in_specs=[rev, rev],
        out_specs=rev,
        out_shape=jax.ShapeDtypeStruct((A, Q), jnp.int32),
        scratch_shapes=[pltpu.VMEM((J, Q), jnp.int32)] * 2,
        interpret=interpret,
    )(p, own_rank)
