"""ksw2-class banded affine-gap extension as a batched device kernel.

Equivalent of the reference's ksw_extz extension family (ksw2.h:34-55,
ksw2_extz2_sse.c — compiled into the reference binary but dormant in
the LongQC path; named in the BASELINE north star). Semantics:

  H[i][j] = max(H[i-1][j-1] + mat[q_i, t_j], E[i][j], F[i][j])
  E[i][j] = max(E[i][j-1], H[i][j-1] - gapo) - gape     (gap in query)
  F[i][j] = max(F[i-1][j], H[i-1][j] - gapo) - gape     (gap in target)

with band |i - j| <= w, score-only outputs (max score + coordinates,
mqe/mte end scores, Z-drop termination), matching minimap2's defaults
(a=2, b=4, q=4, e=2, zdrop=400).

Kernel layout: anti-diagonal band recurrence — the band of width
2w+1 is the vector lane dimension; a lax.scan walks target columns.
Batched over (B,) sequence pairs with per-pair lengths.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -0x40000000


@functools.partial(jax.jit, static_argnames=("W", "Lq", "Lt", "gapo2",
                                              "gape2"))
def extz_batch(query, qlens, target, tlens, *, W=64, Lq=512, Lt=512,
               match=2, mismatch=-4, gapo=4, gape=2, gapo2=None,
               gape2=None, zdrop=400):
    """Batched banded extension, score-only.

    query:  (B, Lq) int8/int32 base codes (4 = ambiguous: always
            mismatch, as with minimap2's wildcard row/col of the
            scoring matrix)
    target: (B, Lt) codes
    W:      half band width (band = |i - j| <= W)
    gapo2/gape2: optional second affine gap family (ksw_extd dual-gap
            semantics, ksw2_extd2_sse.c); implicit boundaries then use
            the cheaper family, min(q+l*e, q2+l*e2).

    Returns dict of (B,) arrays: max score, max_q, max_t, mqe, mqe_t,
    mte, mte_q, zdropped.
    """
    B = query.shape[0]
    dual = gapo2 is not None
    band = 2 * W + 1
    # band row r represents query index i = j + (r - W) at target col j
    roff = jnp.arange(band, dtype=jnp.int32) - W  # (band,)

    def bndcost(l):  # noqa: E741
        b1 = gapo + l * gape
        return jnp.minimum(b1, gapo2 + l * gape2) if dual else b1

    def step(carry, j):
        H_prev, E_prev, E2_prev, best, best_q, best_t, mqe, mqe_t, mte, \
            mte_q, dropped = carry
        # query indices covered by the band at this column
        qi = j + roff[None, :]  # (B, band)
        q_ok = (qi >= 0) & (qi < qlens[:, None])
        t_ok = j < tlens[:, None]
        tj = jax.lax.dynamic_index_in_dim(target, j, 1, False)  # (B,)

        qbase = jnp.take_along_axis(
            jnp.pad(query, ((0, 0), (0, 1)), constant_values=4),
            jnp.clip(qi, 0, Lq), axis=1)
        is_match = (qbase == tj[:, None]) & (qbase < 4) & (tj[:, None] < 4)
        sub = jnp.where(is_match, match, mismatch)

        # band shifts: moving from column j-1 to j, the same band row r
        # at col j-1 held query index (j-1) + (r - W) = qi - 1, i.e. the
        # DIAGONAL predecessor is the same row; the horizontal (E)
        # predecessor (same qi, col j-1) is row r+1.
        H_left = jnp.concatenate(
            [H_prev[:, 1:], jnp.full((B, 1), NEG_INF, jnp.int32)], axis=1)
        E_left = jnp.concatenate(
            [E_prev[:, 1:], jnp.full((B, 1), NEG_INF, jnp.int32)], axis=1)
        # DP boundaries (H[0][0]=0; H[i][0], H[0][c] = -bndcost(l)):
        # at column 0 the horizontal source is the col-0 boundary; the
        # diagonal source is the boundary column (j==0) or boundary row
        # (qi==0).
        left_bnd = -bndcost(qi + 1)
        H_left = jnp.where(j == 0, left_bnd, H_left)
        H_diag = jnp.where(
            j == 0,
            jnp.where(qi == 0, 0, -bndcost(qi)),
            jnp.where(qi == 0, -bndcost(j), H_prev))

        E_j = jnp.maximum(E_left, H_left - gapo) - gape
        base = jnp.maximum(H_diag + sub, E_j)
        if dual:
            E2_left = jnp.concatenate(
                [E2_prev[:, 1:], jnp.full((B, 1), NEG_INF, jnp.int32)],
                axis=1)
            E2_j = jnp.maximum(E2_left, H_left - gapo2) - gape2
            base = jnp.maximum(base, E2_j)
        else:
            E2_j = E2_prev
        base = jnp.where(q_ok, base, NEG_INF)
        # F runs down the band rows (gap in target). With the standard
        # lazy-F exactness argument, F[r] = max over r' < r of
        # (base[r'] - gapo - (r - r')*gape), plus the chain from the
        # boundary row: H_bnd(col j) - gapo - (qi+1)*gape. The argument
        # holds per gap family in the dual case (a vertical run that
        # switches families pays both open costs and never wins).
        rr = jnp.arange(band, dtype=jnp.int32)[None, :]
        H_bnd_j = -bndcost(j + 1)

        def fscan(go, ge):
            hshift = base - go + ge * rr  # -(r-r')*ge folds in
            run = jax.lax.associative_scan(jnp.maximum, hshift, axis=1)
            run_excl = jnp.concatenate(
                [jnp.full((B, 1), NEG_INF, jnp.int32), run[:, :-1]],
                axis=1)
            F_band = run_excl - ge * rr
            F_bnd = H_bnd_j - go - (qi + 1) * ge
            return jnp.maximum(F_band, jnp.where(q_ok, F_bnd, NEG_INF))

        H_j = jnp.maximum(base, fscan(gapo, gape))
        if dual:
            H_j = jnp.maximum(H_j, fscan(gapo2, gape2))
        valid = q_ok & t_ok & ~dropped[:, None]
        H_j = jnp.where(valid, H_j, NEG_INF)
        E_j = jnp.where(valid, E_j, NEG_INF)
        if dual:
            E2_j = jnp.where(valid, E2_j, NEG_INF)

        # track maxima
        col_best = jnp.max(H_j, axis=1)
        col_arg = jnp.argmax(H_j, axis=1).astype(jnp.int32)
        col_qi = j + col_arg - W
        better = col_best > best
        best_n = jnp.where(better, col_best, best)
        best_q_n = jnp.where(better, col_qi, best_q)
        best_t_n = jnp.where(better, j, best_t)

        # mqe: score at query end (qi == qlen-1)
        at_qend = (qi == (qlens[:, None] - 1)) & valid
        qe_score = jnp.max(jnp.where(at_qend, H_j, NEG_INF), axis=1)
        mqe_n = jnp.where(qe_score > mqe, qe_score, mqe)
        mqe_t_n = jnp.where(qe_score > mqe, j, mqe_t)
        # mte: score at target end (j == tlen-1)
        at_tend = (j == (tlens - 1))
        te_score = jnp.where(at_tend, col_best, NEG_INF)
        mte_n = jnp.where(te_score > mte, te_score, mte)
        mte_q_n = jnp.where(te_score > mte, col_qi, mte_q)

        # Z-drop: stop a pair when the column max drops zdrop below the
        # global max (minimap2's off-diagonal-adjusted test simplified
        # to the on-band test; exactness not required for this dormant
        # path)
        drop_now = (best_n - col_best > zdrop) & t_ok[:, 0]
        dropped_n = dropped | drop_now

        return ((H_j, E_j, E2_j, best_n, best_q_n, best_t_n, mqe_n,
                 mqe_t_n, mte_n, mte_q_n, dropped_n), None)

    H0 = jnp.full((B, band), NEG_INF, jnp.int32)
    E0 = jnp.full((B, band), NEG_INF, jnp.int32)
    # column -1 boundary: H[i][-1] = -(gapo + (i+1)*gape) lives on band
    # rows... encoded implicitly: at j=0, the diagonal boundary for
    # qi==0 is 0 (handled in-step); vertical boundary enters via F.
    init = (H0, E0, E0,
            jnp.zeros((B,), jnp.int32),          # best (extension >= 0)
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), NEG_INF, jnp.int32),  # mqe
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), NEG_INF, jnp.int32),  # mte
            jnp.full((B,), -1, jnp.int32),
            jnp.zeros((B,), bool))
    carry, _ = jax.lax.scan(step, init, jnp.arange(Lt, dtype=jnp.int32))
    (_, _, _, best, best_q, best_t, mqe, mqe_t, mte, mte_q,
     dropped) = carry
    return {"max": best, "max_q": best_q, "max_t": best_t,
            "mqe": mqe, "mqe_t": mqe_t, "mte": mte, "mte_q": mte_q,
            "zdropped": dropped}


def extz_host(query, target, match=2, mismatch=-4, gapo=4, gape=2,
              gapo2=None, gape2=None, w=64, zdrop=400):
    """Reference implementation (full DP, numpy) for validating the
    device kernel; same recurrences, band, and outputs. gapo2/gape2
    enable the dual-gap (extd) recurrence."""
    q = np.asarray(query)
    t = np.asarray(target)
    dual = gapo2 is not None

    def bndcost(l):  # noqa: E741
        b1 = gapo + l * gape
        return min(b1, gapo2 + l * gape2) if dual else b1

    n, m_ = len(q), len(t)
    H = np.full((n + 1, m_ + 1), NEG_INF, np.int64)
    E = np.full((n + 1, m_ + 1), NEG_INF, np.int64)
    F = np.full((n + 1, m_ + 1), NEG_INF, np.int64)
    E2 = np.full((n + 1, m_ + 1), NEG_INF, np.int64)
    F2 = np.full((n + 1, m_ + 1), NEG_INF, np.int64)
    H[0, 0] = 0
    for j in range(1, m_ + 1):
        H[0, j] = -bndcost(j)
    for i in range(1, n + 1):
        H[i, 0] = -bndcost(i)
    best, bq, bt = 0, -1, -1
    mqe, mqe_t = NEG_INF, -1
    mte, mte_q = NEG_INF, -1
    for j in range(1, m_ + 1):
        col_best = NEG_INF
        col_q = -1
        for i in range(1, n + 1):
            if abs((i - 1) - (j - 1)) > w:
                continue
            sub = (match if (q[i - 1] == t[j - 1] and q[i - 1] < 4
                             and t[j - 1] < 4) else mismatch)
            E[i, j] = max(E[i, j - 1], H[i, j - 1] - gapo) - gape
            F[i, j] = max(F[i - 1, j], H[i - 1, j] - gapo) - gape
            H[i, j] = max(H[i - 1, j - 1] + sub, E[i, j], F[i, j])
            if dual:
                E2[i, j] = max(E2[i, j - 1],
                               H[i, j - 1] - gapo2) - gape2
                F2[i, j] = max(F2[i - 1, j],
                               H[i - 1, j] - gapo2) - gape2
                H[i, j] = max(H[i, j], E2[i, j], F2[i, j])
            if H[i, j] > col_best:
                col_best = H[i, j]
                col_q = i - 1
            if H[i, j] > best:
                best, bq, bt = H[i, j], i - 1, j - 1
            if i == n and H[i, j] > mqe:
                mqe, mqe_t = H[i, j], j - 1
        if j == m_ and col_best > mte:
            mte, mte_q = col_best, col_q
        if best - col_best > zdrop:
            break
    return {"max": int(best), "max_q": int(bq), "max_t": int(bt),
            "mqe": int(mqe), "mqe_t": int(mqe_t),
            "mte": int(mte), "mte_q": int(mte_q)}
