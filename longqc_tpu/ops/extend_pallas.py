"""Fused Pallas TPU kernel for ksw2-class banded extension (extz/extd).

Covers the reference's ksw_extz / ksw_extd semantics (ksw2.h:51-66,
ksw2_extz2_sse.c:1-305, ksw2_extd2_sse.c — compiled into the reference
binary but dormant in the LongQC call path; named in the BASELINE north
star as a speed-of-light kernel target). Same recurrences, band,
boundary and Z-drop conventions as ops/extend.extz_batch (the validated
lax.scan formulation); the difference is mechanical: the whole
per-column body runs inside ONE kernel with the band state in VMEM,
instead of ~60 separately dispatched HLO ops per target column.

Layout: 128 sequence pairs ride the lane dimension, the anti-diagonal
band of width 2W+1 <= 127 rides sublanes. A fori_loop walks target
columns; the query-code window rides along via a one-sublane roll per
column (one dynamic row load replaces per-column gathers). The vertical
(F) recurrence is a 7-step Hillis-Steele max-scan over sublanes — exact
by the standard lazy-F argument, which also holds per gap family in the
dual-gap (extd) case: a vertical run that switches gap type pays both
open costs and is never strictly better than the best single-type run.

Dual-gap boundary convention: the implicit row/column-0 boundaries use
the cheaper of the two gap families, min(q+l*e, q2+l*e2) — the natural
extd generalization of extz's -(q+l*e) boundary.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0x40000000
_KCOL = 4        # target columns fused per fori iteration
_S = 128          # sublanes: band slots (band = 2W+1 <= 127 used)
_LAN = 128        # lanes: sequence pairs per grid block


def _rmax(x):
    """(S, L) -> (1, L) max over sublanes (Mosaic lowers the native
    axis-0 reduce far better than a halving chain of sublane slices —
    each sub-8-sublane slice op pays a relayout)."""
    return jnp.max(x, axis=0, keepdims=True)


def _rmin(x):
    return jnp.min(x, axis=0, keepdims=True)


def _make_kernel(W, Lt, dual, match, mismatch, gapo, gape, gapo2, gape2,
                 zdrop):
    band = 2 * W + 1
    NEGj = np.int32(NEG)
    BIG = np.int32(0x3FFFFFFF)

    def bndcost(l):  # noqa: E741
        b1 = gapo + l * gape
        if dual:
            return jnp.minimum(b1, gapo2 + l * gape2)
        return b1

    def kernel(q_ref, t_ref, ql_ref, tl_ref, out, qwin, H, E, *E2s):
        E2 = E2s[0] if dual else None
        rr = jax.lax.broadcasted_iota(jnp.int32, (_S, _LAN), 0)
        roff = rr - W
        in_band = rr < band
        ql = ql_ref[:]           # (1, LAN)
        tl = tl_ref[:]

        qwin[:] = pltpu.roll(q_ref[0:_S, :], W, 0)
        H[:] = jnp.full((_S, _LAN), NEGj)
        E[:] = jnp.full((_S, _LAN), NEGj)
        if dual:
            E2[:] = jnp.full((_S, _LAN), NEGj)

        def fscan(base, q_ok, go, ge, H_bnd_j, qi):
            """Lazy-F over the band: max_{r'<r}(base[r'] - go - (r-r')*ge)
            plus the boundary-row chain."""
            x = base - go + ge * rr
            for k in (1, 2, 4, 8, 16, 32, 64):
                sh = pltpu.roll(x, k, 0)
                x = jnp.maximum(x, jnp.where(rr >= k, sh, NEGj))
            run_excl = jnp.where(rr >= 1, pltpu.roll(x, 1, 0), NEGj)
            F_band = run_excl - ge * rr
            F_bnd = H_bnd_j - go - (qi + 1) * ge
            return jnp.maximum(F_band, jnp.where(q_ok, F_bnd, NEGj))

        def column(j, carry):
            (best, bq, bt, mqe, mqet, mte, mteq, dropped) = carry
            qi = j + roff
            q_ok = (qi >= 0) & (qi < ql) & in_band
            tj = t_ref[pl.ds(j, 1), :]                   # (1, LAN)
            t_ok = j < tl                                # (1, LAN)
            qb = qwin[:]
            is_match = (qb == tj) & (qb < 4) & (tj < 4)
            sub = jnp.where(is_match, np.int32(match), np.int32(mismatch))

            Hp = H[:]
            H_left = jnp.where(rr < _S - 1, pltpu.roll(Hp, _S - 1, 0),
                               NEGj)
            E_left = jnp.where(rr < _S - 1, pltpu.roll(E[:], _S - 1, 0),
                               NEGj)
            left_bnd = -bndcost(qi + 1)
            H_left = jnp.where(j == 0, left_bnd, H_left)
            H_diag = jnp.where(
                j == 0,
                jnp.where(qi == 0, 0, -bndcost(qi)),
                jnp.where(qi == 0, -bndcost(j), Hp))

            E_j = jnp.maximum(E_left, H_left - gapo) - gape
            base = jnp.maximum(H_diag + sub, E_j)
            if dual:
                E2_left = jnp.where(rr < _S - 1,
                                    pltpu.roll(E2[:], _S - 1, 0), NEGj)
                E2_j = jnp.maximum(E2_left, H_left - gapo2) - gape2
                base = jnp.maximum(base, E2_j)
            base = jnp.where(q_ok, base, NEGj)

            H_bnd_j = -bndcost(j + 1)
            H_j = jnp.maximum(base,
                              fscan(base, q_ok, gapo, gape, H_bnd_j, qi))
            if dual:
                H_j = jnp.maximum(
                    H_j, fscan(base, q_ok, gapo2, gape2, H_bnd_j, qi))
            valid = q_ok & t_ok & (dropped == 0)
            H_j = jnp.where(valid, H_j, NEGj)
            H[:] = H_j
            E[:] = jnp.where(valid, E_j, NEGj)
            if dual:
                E2[:] = jnp.where(valid, E2_j, NEGj)

            col_best = _rmax(H_j)                        # (1, LAN)
            col_r = _rmin(jnp.where(H_j == col_best, rr, BIG))
            col_qi = j + col_r - W
            better = col_best > best
            best_n = jnp.where(better, col_best, best)
            bq = jnp.where(better, col_qi, bq)
            bt = jnp.where(better, j, bt)

            qe_score = _rmax(jnp.where(qi == ql - 1, H_j, NEGj))
            qe_up = qe_score > mqe
            mqe = jnp.where(qe_up, qe_score, mqe)
            mqet = jnp.where(qe_up, j, mqet)

            at_tend = j == (tl - 1)
            te_score = jnp.where(at_tend, col_best, NEGj)
            te_up = te_score > mte
            mte = jnp.where(te_up, te_score, mte)
            mteq = jnp.where(te_up, col_qi, mteq)

            drop_now = (best_n - col_best > zdrop) & t_ok
            dropped = dropped | jnp.where(drop_now, 1, 0)

            # slide the query window to column j+1
            qnew = q_ref[pl.ds(j + (_S - W), 1), :]
            qwin[:] = jnp.where(rr == _S - 1, qnew,
                                pltpu.roll(qb, _S - 1, 0))
            return (best_n, bq, bt, mqe, mqet, mte, mteq, dropped)

        def body(j0, carry):
            # _KCOL columns per fori iteration: the column math is
            # nearly free on the VPU — Mosaic's ~7 us/iteration loop
            # overhead is the measured cost floor, so fusing K columns
            # cuts wall ~K-fold (the recurrence stays sequential
            # INSIDE the body; exactness is untouched)
            j = j0 * np.int32(_KCOL)
            for i in range(_KCOL):
                carry = column(j + np.int32(i), carry)
            return carry

        z = jnp.zeros((1, _LAN), jnp.int32)
        init = (z, z - 1, z - 1, z + NEGj, z - 1, z + NEGj, z - 1, z)
        n_iter = -(-Lt // _KCOL)
        (best, bq, bt, mqe, mqet, mte, mteq,
         dropped) = jax.lax.fori_loop(np.int32(0), np.int32(n_iter),
                                      body, init)
        out[:] = jnp.concatenate(
            [best, bq, bt, mqe, mqet, mte, mteq, dropped], axis=0)

    return kernel


@functools.lru_cache(maxsize=256)
def _build_call(W, Lq_pad, Lt, n_blk, dual, match, mismatch, gapo, gape,
                gapo2, gape2, zdrop, interpret):
    kernel = _make_kernel(W, Lt, dual, match, mismatch, gapo, gape,
                          gapo2, gape2, zdrop)
    vm = pltpu.VMEM
    i32 = jnp.int32
    Lt_pad = -(-Lt // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((Lq_pad, _LAN), lambda b: (0, b),
                         memory_space=vm),
            pl.BlockSpec((Lt_pad, _LAN), lambda b: (0, b),
                         memory_space=vm),
            pl.BlockSpec((1, _LAN), lambda b: (0, b), memory_space=vm),
            pl.BlockSpec((1, _LAN), lambda b: (0, b), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((8, _LAN), lambda b: (0, b),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((8, n_blk * _LAN), i32),
        scratch_shapes=[pltpu.VMEM((_S, _LAN), i32)] * (4 if dual else 3),
        interpret=bool(interpret),
    )
    jitted = jax.jit(fn)

    def call(*operands):
        # x64 must be disabled for LOWERING, not just tracing: Mosaic's
        # lowering re-traces helper mini-functions (lower_fun) under
        # the global x64 setting, and with the package's global x64 a
        # weak int lifts to int64 there, whose Mosaic conversion
        # fallback self-recurses infinitely (the r3 bench's
        # RecursionError on this kernel).
        with jax.enable_x64(False):
            return jitted(*operands)

    return call


def extz_batch_pallas(query, qlens, target, tlens, *, W=63, match=2,
                      mismatch=-4, gapo=4, gape=2,
                      gapo2=None, gape2=None, zdrop=400, interpret=None):
    """Banded extension on (B, L) code arrays; same outputs/semantics as
    ops/extend.extz_batch, plus dual-gap (extd) scoring when gapo2/gape2
    are given. W <= 63 (band <= 127 sublane slots).

    Mosaic's jaxpr lowering recurses per chained op; this kernel's
    column body exceeds CPython's default 1000-frame limit on the TPU
    backend (the r3 bench's RecursionError), so the limit is raised
    around the lowering call and restored afterwards (a permanently
    raised limit would let an unrelated runaway recursion exhaust the
    C stack and segfault instead of raising RecursionError)."""
    import sys as _sys
    assert 0 < W <= 63, "Pallas band layout holds 2W+1 <= 127 slots"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dual = gapo2 is not None
    query = np.asarray(query)
    target = np.asarray(target)
    B, Lq = query.shape
    Lt = target.shape[1]
    Bp = -(-B // _LAN) * _LAN
    Lq_pad = max(Lq, Lt + _S - W + _KCOL, _S)
    Lq_pad = -(-Lq_pad // 8) * 8
    Lt_pad = -(-Lt // 8) * 8

    qT = np.full((Lq_pad, Bp), 4, np.int32)
    qT[:Lq, :B] = query.T
    tT = np.full((Lt_pad, Bp), 4, np.int32)
    tT[:Lt, :B] = target.T
    ql = np.zeros((1, Bp), np.int32)
    ql[0, :B] = np.asarray(qlens, np.int32)
    tl = np.zeros((1, Bp), np.int32)
    tl[0, :B] = np.asarray(tlens, np.int32)

    out = np.asarray(extz_device(jnp.asarray(qT), jnp.asarray(tT),
                                 jnp.asarray(ql), jnp.asarray(tl),
                                 W=W, Lt=Lt, match=match,
                                 mismatch=mismatch, gapo=gapo,
                                 gape=gape, gapo2=gapo2, gape2=gape2,
                                 zdrop=zdrop, interpret=interpret))
    return {"max": out[0, :B], "max_q": out[1, :B], "max_t": out[2, :B],
            "mqe": out[3, :B], "mqe_t": out[4, :B], "mte": out[5, :B],
            "mte_q": out[6, :B], "zdropped": out[7, :B].astype(bool)}


def extz_device(qT, tT, ql, tl, *, W, Lt, match=2, mismatch=-4, gapo=4,
                gape=2, gapo2=None, gape2=None, zdrop=400,
                interpret=False):
    """Device-resident kernel entry: operands already in the (len, B)
    transposed layout on device; returns the (8, B) device result with
    no host round trip. The numpy wrapper above stages + pulls — a
    ~5 MB h2d/d2h per call over the tunnel that dominated the round-4
    perf numbers (the kernel itself is ~4x faster than reported)."""
    import sys as _sys
    dual = gapo2 is not None
    Bp = qT.shape[1]
    fn = _build_call(W, qT.shape[0], Lt, Bp // _LAN, dual, match,
                     mismatch, gapo, gape,
                     gapo2 if dual else 0, gape2 if dual else 0,
                     zdrop, bool(interpret))
    _old_limit = _sys.getrecursionlimit()
    try:
        if _old_limit < 100_000:
            _sys.setrecursionlimit(100_000)
        return fn(qT, tT, ql, tl)
    finally:
        _sys.setrecursionlimit(_old_limit)
