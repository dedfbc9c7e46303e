"""Fused Pallas TPU kernel for the chain-DP score fill.

Semantics are identical to ops/chain.chain_dp_batch (the validated
reformulation of mm_chain_dp's fill, chain.c:41-80 in the reference):
same ring-buffer window, max_skip two-pass bounding, flags, and
resumable carry. The difference is purely mechanical: the whole
per-anchor body runs inside ONE Pallas kernel with the rings held in
VMEM scratch, instead of ~60 separately dispatched HLO ops per anchor
inside a lax.scan. On the attached runtime each dispatched op costs
~1 us, making the scan overhead-bound (~60 us/anchor); the fused kernel
does the same (J, Q) vector math in a few hundred VPU cycles.

Layout: queries ride the 128-wide lane dimension (Q = 128 per call),
the J = 64 ring slots ride sublanes; anchors stream through an internal
grid of (CA, Q) blocks with the rings persisting in scratch across grid
steps (TPU grid iterations are sequential).

Gap penalty without gathers: the reference cost is
``(int)(dd * .01 * avg_qspan) + (ilog2(dd) >> 1)`` evaluated in f64
(chain.c:67). TPU has no f64 and per-element table gathers are not
vectorizable, so the host finds a 80-bit fixed-point multiplier M with
``floor(dd * M / 2**64) == (int)(dd * .01 * avg_qspan)`` for every
dd <= bw (an interval intersection over exact integer bounds — almost
always non-empty since the f64 values cluster within 2 ulps of
0.01*avg_qspan), and the kernel evaluates the floor with five 16-bit
limb multiplies in int32. Rows with an empty intersection are flagged
for the exact host fallback. ilog2 is the f32 exponent field (exact:
dd < 2**24).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from longqc_tpu.ops.chain import gap_penalty_table

NEG = -(10 ** 9)
_J = 64
_CA = 256  # anchors per grid block


@functools.lru_cache(maxsize=4096)
def penalty_limbs(avg_qspan, bw):
    """(5,) int32 16-bit limbs of M (lsb-first; floor(dd*M >> 64) equals
    the reference linear gap cost for all dd in [0, bw]), or None when
    no single multiplier reproduces the table (host fallback)."""
    if bw >= 32768:
        # int32 limb product ddc*l_j can overflow past 2^31 for
        # bw >= 2^15: punt to the exact host fallback
        return None
    tab = gap_penalty_table(np.float32(avg_qspan), bw).astype(np.int64)
    dd = np.arange(bw + 1)
    log_dd = np.zeros(bw + 1, np.int64)
    log_dd[1:] = np.floor(np.log2(dd[1:])).astype(np.int64)
    lin = tab - (log_dd >> 1)
    m_lo, m_hi = 0, (1 << 80) - 1
    for d in range(1, bw + 1):
        L = int(lin[d])
        lo = ((L << 64) + d - 1) // d
        hi = (((L + 1) << 64) - 1) // d
        if lo > m_lo:
            m_lo = lo
        if hi < m_hi:
            m_hi = hi
    if m_lo > m_hi:
        return None
    M = m_lo
    return np.array([(M >> (16 * j)) & 0xFFFF for j in range(5)], np.int32)


def _iscan(x, op, identity, ages, J):
    """Inclusive scan over the sublane (age) axis, Hillis-Steele."""
    k = 1
    while k < J:
        sh = pltpu.roll(x, k, 0)
        x = op(x, jnp.where(ages > k, sh, identity))
        k *= 2
    return x


def _or_reduce_rows(x):
    """(J, Q) int32 -> (1, Q) bitwise-OR over sublanes."""
    h = x.shape[0]
    while h > 1:
        h //= 2
        x = x[:h, :] | x[h:2 * h, :]
    return x


def _make_kernel(J, CA, max_dist, bw, max_skip):
    NEGj = np.int32(NEG)

    def kernel(i0_ref,
               axh, axl, aq_, asp, nb, limbs, rbad,
               cxh, cxl, cq, cs, cf, cv, cp, cfl,
               of, op_, ov,
               oxh, oxl, oq, os_, of_, ov_, op2, ofl,
               rxh, rxl, rq, rs, rf, rv, rp, rfl):
        b = pl.program_id(0)
        nblk = pl.num_programs(0)
        Q = nb.shape[1]
        ages = jax.lax.broadcasted_iota(jnp.int32, (J, Q), 0) + 1

        @pl.when(b == 0)
        def _():
            rxh[:] = cxh[:]
            rxl[:] = cxl[:]
            rq[:] = cq[:]
            rs[:] = cs[:]
            rf[:] = cf[:]
            rv[:] = cv[:]
            rp[:] = cp[:]
            # rows with no exact penalty multiplier are host-fallback
            rfl[:] = cfl[:] | (rbad[:] & jnp.where(nb[:] > 0, np.int32(1), np.int32(0)))

        n_row = nb[0:1, :]
        l0 = limbs[0:1, :]
        l1 = limbs[1:2, :]
        l2 = limbs[2:3, :]
        l3 = limbs[3:4, :]
        l4 = limbs[4:5, :]

        def body(li, carry_tok):
            i = i0_ref[0, 0] + b * CA + li
            xh_i = axh[pl.ds(li, 1), :]
            xl_i = axl[pl.ds(li, 1), :]
            q_i = aq_[pl.ds(li, 1), :]
            s_i = asp[pl.ds(li, 1), :]
            row_on = i < n_row  # (1, Q)

            exists = (i - ages) >= 0
            dr = xl_i - rxl[:]
            dr_ok = (xh_i == rxh[:]) & (dr >= 0) & (dr <= max_dist)
            dq = q_i - rq[:]
            valid = (exists & dr_ok & (dr != 0) & (dq > 0)
                     & (dq <= max_dist))
            dd = jnp.abs(dr - dq)
            valid = valid & (dd <= bw)

            # exact gap penalty: floor(dd * M / 2^64) + (ilog2(dd) >> 1)
            ddc = jnp.clip(dd, 0, bw)
            t = ddc * l3 + ((ddc * l2 + ((ddc * l1
                 + ((ddc * l0) >> 16)) >> 16)) >> 16)
            lin = ddc * l4 + (t >> 16)
            ex = jax.lax.shift_right_logical(
                pltpu.bitcast(ddc.astype(jnp.float32), jnp.int32),
                np.int32(23)) - 127
            il = jnp.where(ddc > 0, ex, 0)
            pen = lin + (il >> 1)

            sc0 = jnp.minimum(jnp.minimum(dq, dr), s_i)
            sc = jnp.where(valid, sc0 - pen + rf[:], NEGj)

            inc = _iscan(sc, jnp.maximum, NEGj, ages, J)
            run_before = jnp.maximum(
                jnp.where(ages > 1, pltpu.roll(inc, 1, 0), NEGj), s_i)
            newmax = valid & (sc > run_before)

            tgt_age = i - rp[:]
            rp_real = rp[:] > NEG + J + 1

            def marks_from(src_mask):
                # ages-whose-slot-is-someone's-parent, via J/32 32-bit
                # mark words (each word w covers target ages in
                # (32w, 32w+32])
                ok = (src_mask & rp_real
                      & (tgt_age >= 1) & (tgt_age <= J))
                t0 = jnp.clip(tgt_age - 1, 0, J - 1)
                one = np.int32(1)
                sel = jnp.zeros_like(tgt_age)
                for wd in range(J // 32):
                    bit = jnp.where(
                        ok & (t0 >= 32 * wd) & (t0 < 32 * (wd + 1)),
                        jax.lax.shift_left(
                            one, jnp.clip(t0 - 32 * wd, 0, 31)), 0)
                    word = _or_reduce_rows(bit)
                    sel = jnp.where(
                        (ages > 32 * wd) & (ages <= 32 * (wd + 1)),
                        jax.lax.shift_right_logical(
                            word, jnp.clip(ages - 1 - 32 * wd, 0, 31)),
                        sel)
                return (sel & 1) == 1

            def walk_cut(marks):
                skipev = valid & ~newmax & marks
                delta = jnp.where(skipev, np.int32(1),
                                  jnp.where(newmax, np.int32(-1), np.int32(0)))
                S = _iscan(delta, jnp.add, np.int32(0), ages, J)
                minS = _iscan(S, jnp.minimum, np.int32(2 ** 30), ages, J)
                walk = S - jnp.minimum(0, minS)
                brk = skipev & (walk > max_skip)
                return jnp.min(jnp.where(brk, ages, J + 1), axis=0,
                               keepdims=True)

            marks0 = marks_from(valid)
            cut0 = walk_cut(marks0)
            marks1 = marks_from(valid & (ages < cut0))
            cut1 = walk_cut(marks1)
            disagree = cut0 != cut1

            in_cut = ages <= cut1
            nm_in = newmax & in_cut
            p_age = jnp.max(jnp.where(nm_in, ages, 0), axis=0,
                            keepdims=True)
            has_pred = p_age > 0
            f_i = jnp.where(
                has_pred,
                jnp.max(jnp.where(nm_in, sc, NEGj), axis=0, keepdims=True),
                s_i)
            p_abs = jnp.where(has_pred, i - p_age, NEGj)
            v_pred = jnp.max(jnp.where(ages == p_age, rv[:], NEGj),
                             axis=0, keepdims=True)
            v_i = jnp.where(has_pred & (v_pred > f_i), v_pred, f_i)

            oldest_ok = exists[J - 1:J, :] & dr_ok[J - 1:J, :]
            trunc = (cut1 > J) & oldest_ok
            rfl[:] = rfl[:] | jnp.where(row_on & (disagree | trunc),
                                        np.int32(1), np.int32(0))

            def push(ref, val):
                ref[:] = jnp.where(ages == 1, val, pltpu.roll(ref[:], 1, 0))

            push(rxh, xh_i)
            push(rxl, xl_i)
            push(rq, q_i)
            push(rs, s_i)
            push(rf, f_i)
            push(rv, v_i)
            push(rp, p_abs)

            of[pl.ds(li, 1), :] = jnp.where(row_on, f_i, 0)
            op_[pl.ds(li, 1), :] = jnp.where(
                row_on, jnp.maximum(p_abs, -1), -1)
            ov[pl.ds(li, 1), :] = jnp.where(row_on, v_i, 0)
            return carry_tok

        # int32 bounds: with jax_enable_x64 on, python-int bounds would
        # make the loop index int64, which Mosaic cannot lower
        jax.lax.fori_loop(np.int32(0), np.int32(CA), body, np.int32(0))

        @pl.when(b == nblk - 1)
        def _():
            oxh[:] = rxh[:]
            oxl[:] = rxl[:]
            oq[:] = rq[:]
            os_[:] = rs[:]
            of_[:] = rf[:]
            ov_[:] = rv[:]
            op2[:] = rp[:]
            ofl[:] = rfl[:]

    return kernel


def _pallas_call_x32(*pc_args, **pc_kwargs):
    """pallas_call whose kernel traces with x64 disabled: python-int
    literals lift to int32 instead of weak int64 (Mosaic has no i64)."""
    inner = pl.pallas_call(*pc_args, **pc_kwargs)

    def call(*operands):
        with jax.enable_x64(False):
            return inner(*operands)

    return call


@functools.partial(jax.jit, static_argnames=(
    "J", "max_dist", "bw", "max_skip", "interpret"))
def _chain_dp_pallas_t(axh, axl, aq, asp, nb, limbs, rbad, carry_t, i0,
                       *, J, max_dist, bw, max_skip, interpret):
    """Transposed-layout core: all arrays (A, Q) / (J, Q) / (1, Q)."""
    A, Q = axh.shape
    assert A % _CA == 0
    nblk = A // _CA
    kernel = _make_kernel(J, _CA, max_dist, bw, max_skip)

    blkA = lambda b: (b, 0)   # noqa: E731
    fix = lambda b: (0, 0)    # noqa: E731
    vm = pltpu.VMEM
    specA = pl.BlockSpec((_CA, Q), blkA, memory_space=vm)
    specJ = pl.BlockSpec((J, Q), fix, memory_space=vm)
    spec1 = pl.BlockSpec((1, Q), fix, memory_space=vm)
    spec5 = pl.BlockSpec((5, Q), fix, memory_space=vm)

    i32 = jnp.int32
    # The package enables x64 globally (u64 minimizer hashes), which
    # makes every python-int literal a weak int64 — Mosaic cannot lower
    # 64-bit. All kernel I/O is int32, so trace the kernel with x64 off.
    outs = _pallas_call_x32(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, 1), fix, memory_space=pltpu.SMEM),
                  specA, specA, specA, specA, spec1, spec5, spec1,
                  specJ, specJ, specJ, specJ, specJ, specJ, specJ, spec1],
        out_specs=[specA, specA, specA,
                   specJ, specJ, specJ, specJ, specJ, specJ, specJ, spec1],
        out_shape=[jax.ShapeDtypeStruct((A, Q), i32)] * 3
        + [jax.ShapeDtypeStruct((J, Q), i32)] * 7
        + [jax.ShapeDtypeStruct((1, Q), i32)],
        scratch_shapes=[pltpu.VMEM((J, Q), i32)] * 7
        + [pltpu.VMEM((1, Q), i32)],
        interpret=interpret,
    )(i0.reshape(1, 1), axh, axl, aq, asp, nb, limbs, rbad, *carry_t)
    return outs


def make_carry_pallas(Q, J=_J):
    """Fresh transposed ring carry: 7 x (J, Q) int32 + (1, Q) int32."""
    zJ = np.zeros((J, Q), np.int32)
    return (zJ - 1, zJ.copy(), zJ.copy(), zJ.copy(), zJ.copy(),
            zJ.copy(), zJ + NEG, np.zeros((1, Q), np.int32))


def chain_dp_batch_pallas(ax_hi, ax_lo, aq, aspan, n_anchors, limbs,
                          row_bad, carry_t, i0, *, J=_J, max_dist=10000,
                          bw=500, max_skip=25, interpret=False):
    """Drop-in batched resumable chain-DP fill (Pallas path).

    Same contract as ops/chain.chain_dp_batch, except the gap-penalty
    table is replaced by per-row fixed-point limbs (5, Q) + a (1, Q)
    row_bad mask (from penalty_limbs), and the carry is the transposed
    layout from make_carry_pallas. Returns (f, p, v) as (Q, A) int32,
    flags (Q,) bool, carry_t for the next chunk.

    NB rings in the ring-carry differ in layout but hold identical
    values to the scan version's carry; chunked and monolithic calls
    compose identically (differentially tested).
    """
    assert J in (64, 128, 256) and J % 32 == 0, \
        "mark words and _iscan support J = 64 and the 128/256 escalation rungs"
    f, p, v, *rest = _chain_dp_pallas_t(
        ax_hi.T, ax_lo.T, aq.T, aspan.T,
        n_anchors.reshape(1, -1), limbs, row_bad, carry_t,
        jnp.asarray(i0, jnp.int32),
        J=J, max_dist=max_dist, bw=bw, max_skip=max_skip,
        interpret=interpret)
    carry_out = tuple(rest)
    flags = np.asarray(rest[-1]).reshape(-1) != 0
    return (np.asarray(f).T, np.asarray(p).T, np.asarray(v).T,
            flags, carry_out)
