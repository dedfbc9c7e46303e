"""Fused Pallas TPU kernel for the (w,k)-minimizer sketch.

Implements the reference's sequential sketch algorithm
(minimap2-coverage/sketch.c:76-142; behavioral spec mirrored by
tests/oracles/sketch_ref.py) directly as a column-streaming kernel:
128 packed rows ride the lane dimension, columns stream through a
fori_loop with the k-mer registers, the w-slot minimizer ring and the
tracked minimum held in VMEM scratch — the same fusion pattern as
ops/chain_pallas. The XLA formulation (ops/sketch._sketch_core) spends
~0.2 s per (256, 8192) tile, almost entirely in row-wise argsorts and
take_along_axis gathers that lower to ~25-45 ms each on the attached
backend; this kernel does the identical work in a few ms because the
per-column state never leaves VMEM. It also resolves each entry's
read id and read-local position in-kernel (tracking the current
read's (gid, start) from the packer's start marks), so the tile
pipeline needs no compaction or segment mapping afterwards at all.

Scope: the plain u32 fast path only (2k <= 30, constant span == k) —
the flagship presets (k = 12, 15). HPC and wide-k runs keep the XLA
path. Output is position-aligned, per column: emission count, entry
hash, read id, local position, strand.

Emission attribution: window-tie emissions accumulate on the w-slot
ring entry they belong to (cheap (w, 128) masks) and migrate to a
128-column output ring when the entry is evicted or when its output
column flushes; tracked-minimum emissions scatter straight to the
output ring. Rows where an attribution reaches past the output ring
(>~120 consecutive symmetric columns, e.g. a long (AT)n microsatellite
— symmetric k-mers do not advance the ring) raise a per-lane flag and
are re-sketched exactly by the caller, the engine's standard
exact-or-flagged pattern.

Sequential-spec notes baked into the kernel (all oracle-verified):
 - symmetric k-mers neither push a ring entry nor advance the ring
   cursor, so ring cursors drift apart across lanes (per-lane cursor);
 - ambiguous bases push UMAX entries and reset l;
 - the first-window rescan (l == w+k-1) scans the ring EXCLUDING the
   just-pushed slot; the eviction rescan includes it, and its min
   tie-break prefers the newest entry (the C loop's scan order);
 - each read's final push (C's post-loop minv emission) fires at the
   read's last column, marked by the packer-supplied end mask, gated
   on the tracked minimum belonging to the current segment — internal
   N runs inside one read must NOT fire it, and the gate also blocks a
   stale previous-segment minimum when a segment had no pushes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LAN = 128
_OR = 128            # output-ring rows (attribution window, columns)
_RPR = 64            # reads per row (device_index.READS_PER_ROW)
SENT = np.int32(0x7FFFFFFF)   # hash sentinel (all hashes < 2^30)

# packed meta layout (out_meta): local_pos<<1|strand in bits 0..14,
# emission count in bits 15..20 (capped 63)
_META_EMIT_SHIFT = 15


def _hash32(key, mask):
    """hash64 on 2k<=30-bit masked values in i32 lanes (wrapping mod
    2^32 matches the u32 fast path of ops/sketch.hash64; every shift
    right operates on a masked, positive value)."""
    sr = jax.lax.shift_right_logical
    key = (~key + (key << 21)) & mask
    key = key ^ sr(key, 24)
    key = ((key + (key << 3)) + (key << 8)) & mask
    key = key ^ sr(key, 14)
    key = ((key + (key << 2)) + (key << 4)) & mask
    key = key ^ sr(key, 28)
    key = (key + (key << 31)) & mask
    return key


def _make_kernel(W, k, w, RP):
    mask = np.int32((1 << (2 * k)) - 1)
    shift1 = np.int32(2 * (k - 1))
    one = np.int32(1)

    def kernel(c2_ref, nm_ref, sb_ref, eb_ref, st_ref, gid_ref,
               oh_ref, om_ref, og_ref, fl_ref,
               # scratch
               k0, k1, lc, bp, seg, segst, curg, curs,
               minh, miny, minc, mins,
               rh, ry, rc, rem, orh, orm, org, flg):
        ri = jax.lax.broadcasted_iota(jnp.int32, (RP, _LAN), 0)
        oi = jax.lax.broadcasted_iota(jnp.int32, (_OR, _LAN), 0)
        gi = jax.lax.broadcasted_iota(jnp.int32, (_RPR, _LAN), 0)

        # init (each invocation is an independent 128-row block)
        k0[:] = jnp.zeros((1, _LAN), jnp.int32)
        k1[:] = jnp.zeros((1, _LAN), jnp.int32)
        lc[:] = jnp.zeros((1, _LAN), jnp.int32)
        bp[:] = jnp.zeros((1, _LAN), jnp.int32)
        seg[:] = jnp.full((1, _LAN), -1, jnp.int32)
        segst[:] = jnp.zeros((1, _LAN), jnp.int32)
        curg[:] = jnp.zeros((1, _LAN), jnp.int32)
        curs[:] = jnp.zeros((1, _LAN), jnp.int32)
        minh[:] = jnp.full((1, _LAN), SENT, jnp.int32)
        miny[:] = jnp.zeros((1, _LAN), jnp.int32)
        minc[:] = jnp.full((1, _LAN), -(1 << 20), jnp.int32)
        mins[:] = jnp.zeros((1, _LAN), jnp.int32)
        rh[:] = jnp.full((RP, _LAN), SENT, jnp.int32)
        ry[:] = jnp.zeros((RP, _LAN), jnp.int32)
        rc[:] = jnp.full((RP, _LAN), -(1 << 20), jnp.int32)
        rem[:] = jnp.zeros((RP, _LAN), jnp.int32)
        orh[:] = jnp.zeros((_OR, _LAN), jnp.int32)
        orm[:] = jnp.zeros((_OR, _LAN), jnp.int32)
        org[:] = jnp.zeros((_OR, _LAN), jnp.int32)
        flg[:] = jnp.zeros((1, _LAN), jnp.int32)

        def outring_add(j, tc, cnt, ev):
            """Add cnt emissions to the output-ring row of per-lane
            target column tc where ev; flag lanes whose target has
            already flushed out of the attribution window."""
            stale = ev & (tc <= j - _OR)
            flg[:] = flg[:] | jnp.where(stale, one, 0)
            hot = (oi == (tc & (_OR - 1))) & (ev & ~stale)
            orm[:] = orm[:] + jnp.where(
                hot, cnt << _META_EMIT_SHIFT, 0)

        def ring_sum(sel, arr):
            return jnp.sum(jnp.where(sel, arr, 0), axis=0,
                           keepdims=True)

        def body(j, carry):
            # --- decode column j
            word = c2_ref[pl.ds(j >> 4, 1), :]
            c = jax.lax.shift_right_logical(word, 2 * (j & 15)) & 3
            nmw = nm_ref[pl.ds(j >> 5, 1), :]
            amb = (jax.lax.shift_right_logical(nmw, j & 31) & 1) == 1
            sbw = sb_ref[pl.ds(j >> 5, 1), :]
            sbit = (jax.lax.shift_right_logical(sbw, j & 31) & 1) == 1
            ebw = eb_ref[pl.ds(j >> 5, 1), :]
            ebit = (jax.lax.shift_right_logical(ebw, j & 31) & 1) == 1

            # --- segment tracking: current read's (gid, start)
            segn = seg[:] + jnp.where(sbit, one, 0)
            seg[:] = segn
            segst[:] = jnp.where(sbit, j, segst[:])
            gsel = gi == segn
            curg[:] = jnp.where(sbit, ring_sum(gsel, gid_ref[:]),
                                curg[:])
            curs[:] = jnp.where(sbit, ring_sum(gsel, st_ref[:]),
                                curs[:])

            valid = ~amb
            k0n = jnp.where(valid, ((k0[:] << 2) | c) & mask, k0[:])
            k1n = jnp.where(
                valid,
                jax.lax.shift_right_logical(k1[:], 2)
                | ((3 ^ c) << shift1), k1[:])
            k0[:] = k0n
            k1[:] = k1n
            sym = valid & (k0n == k1n)
            push = ~sym
            l_new = jnp.where(valid, jnp.where(sym, lc[:], lc[:] + 1), 0)
            lc[:] = l_new
            z = jnp.where(k0n < k1n, 0, one)
            h = _hash32(jnp.minimum(k0n, k1n), mask)
            elig = valid & ~sym & (l_new >= k)
            ih = jnp.where(elig, h, SENT)
            iy = ((j - curs[:]) << 1) | z   # local position in read

            # --- output ring flush of the _OR-old column, merging any
            # tie emissions still parked on a live ring entry of that
            # column
            @pl.when(j >= _OR)
            def _():
                fcol = j - _OR
                row = j & (_OR - 1)
                match = rc[:] == fcol
                cnt_f = ring_sum(match, rem[:])
                rem[:] = jnp.where(match, 0, rem[:])
                oh_ref[pl.ds(fcol, 1), :] = orh[pl.ds(row, 1), :]
                og_ref[pl.ds(fcol, 1), :] = org[pl.ds(row, 1), :]
                om_ref[pl.ds(fcol, 1), :] = \
                    orm[pl.ds(row, 1), :] + (cnt_f << _META_EMIT_SHIFT)

            # --- eviction transfer: the ring slot this push overwrites
            # hands its parked emissions to the output ring
            at_bp = ri == bp[:]
            ev_cnt = ring_sum(at_bp, rem[:])
            ev_col = ring_sum(at_bp, rc[:])
            outring_add(j, ev_col, ev_cnt, push & (ev_cnt > 0))

            # --- stage this column's record (ambiguous pushes store
            # zeros: their iy is meaningless — negative at separator
            # columns — and its high bits would leak into the emit
            # field)
            row = j & (_OR - 1)
            rec_on = push & valid
            orh[pl.ds(row, 1), :] = jnp.where(rec_on, ih, 0)
            orm[pl.ds(row, 1), :] = jnp.where(
                rec_on, iy & np.int32((1 << _META_EMIT_SHIFT) - 1), 0)
            org[pl.ds(row, 1), :] = jnp.where(rec_on, curg[:], 0)

            # --- ring push (per-lane cursor; symmetric columns skip)
            hot = at_bp & push
            rh[:] = jnp.where(hot, ih, rh[:])
            ry[:] = jnp.where(hot, iy, ry[:])
            rc[:] = jnp.where(hot, j, rc[:])
            rem[:] = jnp.where(hot, 0, rem[:])

            def park(tie):
                """Park +1 tie emissions on their ring entries; flag
                lanes whose entry's output column already flushed."""
                stale = tie & (rc[:] <= j - _OR)
                n_stale = jnp.max(jnp.where(stale, one, 0), axis=0,
                                  keepdims=True)
                flg[:] = flg[:] | n_stale
                rem[:] = rem[:] + jnp.where(tie & ~stale, one, 0)

            # --- E1: first-window rescan (excludes the pushed slot)
            cond1 = push & (l_new == w + k - 1) & (minh[:] != SENT)
            park(cond1 & (ri != bp[:]) & (rh[:] == minh[:]) &
                 (ry[:] != miny[:]))

            # --- E2 (replace push) / E3 (min eviction): both emit the
            # OLD tracked min, straight to the output ring
            c2 = push & (ih <= minh[:])
            c3 = push & ~c2 & (bp[:] == mins[:])
            emit_old = (c2 & (l_new >= w + k) & (minh[:] != SENT)) | \
                (c3 & (l_new >= w + k - 1) & (minh[:] != SENT))
            outring_add(j, minc[:], jnp.full((1, _LAN), one),
                        emit_old)

            # --- E3 rescan: min over ring, ties -> newest column
            nmh = jnp.min(rh[:], axis=0, keepdims=True)
            is_min = rh[:] == nmh
            nmc = jnp.max(jnp.where(is_min, rc[:], -(1 << 20)),
                          axis=0, keepdims=True)
            win = is_min & (rc[:] == nmc)
            nms = jnp.max(jnp.where(win, ri, 0), axis=0, keepdims=True)
            nmy = jnp.max(jnp.where(win, ry[:], 0), axis=0,
                          keepdims=True)
            park(c3 & (l_new >= w + k - 1) & (nmh != SENT) &
                 (rh[:] == nmh) & (ry[:] != nmy))

            # --- commit min state
            minh[:] = jnp.where(c2, ih, jnp.where(c3, nmh, minh[:]))
            miny[:] = jnp.where(c2, iy, jnp.where(c3, nmy, miny[:]))
            minc[:] = jnp.where(c2, j, jnp.where(c3, nmc, minc[:]))
            mins[:] = jnp.where(c2, bp[:], jnp.where(c3, nms, mins[:]))

            # --- read end: the standalone final push (post-loop minv
            # emission in C), after this column fully processed
            outring_add(j, minc[:], jnp.full((1, _LAN), one),
                        ebit & (minh[:] != SENT) &
                        (minc[:] >= segst[:]))

            # --- advance per-lane ring cursor
            bpn = bp[:] + jnp.where(push, one, 0)
            bp[:] = jnp.where(bpn == w, 0, bpn)
            return carry

        jax.lax.fori_loop(np.int32(0), np.int32(W), body, np.int32(0),
                          unroll=False)

        def flush(d, carry):
            col = W - _OR + d
            row = col & (_OR - 1)
            match = rc[:] == col
            cnt_f = ring_sum(match, rem[:])
            rem[:] = jnp.where(match, 0, rem[:])
            oh_ref[pl.ds(col, 1), :] = orh[pl.ds(row, 1), :]
            og_ref[pl.ds(col, 1), :] = org[pl.ds(row, 1), :]
            om_ref[pl.ds(col, 1), :] = \
                orm[pl.ds(row, 1), :] + (cnt_f << _META_EMIT_SHIFT)
            return carry

        jax.lax.fori_loop(np.int32(0), np.int32(_OR), flush,
                          np.int32(0), unroll=False)
        fl_ref[:] = flg[:]

    return kernel


def _pallas_call_x32(*a, **kw):
    inner = pl.pallas_call(*a, **kw)

    def call(*operands):
        with jax.enable_x64(False):
            return inner(*operands)

    return call


@functools.partial(jax.jit, static_argnames=("W", "k", "w", "n_blk",
                                             "interpret"))
def _sketch_pallas_t(c2_t, nm_t, sb_t, eb_t, st_t, gid_t, *, W, k, w,
                     n_blk, interpret):
    """Transposed-layout core: inputs (W/16, B) i32-packed codes,
    (W/32, B) bit masks, (64, B) per-read starts/gids; outputs (W, B)
    hash + packed meta + read id, (1, B) flags. One pallas_call per
    128-lane block — a lane-partitioned grid makes XLA stack-allocate
    every block's outputs in scoped VMEM at once, which overflows the
    16 MB budget at W = 8192."""
    RP = 8 if w <= 8 else 16
    # the per-lane ring cursor wraps at w (bpn == w -> 0): w beyond the
    # scratch rows would silently drop pushes, never flagging
    assert w <= RP, "sketch_pallas ring scratch requires w <= %d" % RP
    kernel = _make_kernel(W, k, w, RP)
    vm = pltpu.VMEM
    i32 = jnp.int32
    blk = lambda b: (0, b)   # noqa: E731
    call = _pallas_call_x32(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((W // 16, _LAN), blk, memory_space=vm),
                  pl.BlockSpec((W // 32, _LAN), blk, memory_space=vm),
                  pl.BlockSpec((W // 32, _LAN), blk, memory_space=vm),
                  pl.BlockSpec((W // 32, _LAN), blk, memory_space=vm),
                  pl.BlockSpec((_RPR, _LAN), blk, memory_space=vm),
                  pl.BlockSpec((_RPR, _LAN), blk, memory_space=vm)],
        out_specs=[pl.BlockSpec((W, _LAN), blk, memory_space=vm),
                   pl.BlockSpec((W, _LAN), blk, memory_space=vm),
                   pl.BlockSpec((W, _LAN), blk, memory_space=vm),
                   pl.BlockSpec((1, _LAN), blk, memory_space=vm)],
        out_shape=[jax.ShapeDtypeStruct((W, _LAN), i32),
                   jax.ShapeDtypeStruct((W, _LAN), i32),
                   jax.ShapeDtypeStruct((W, _LAN), i32),
                   jax.ShapeDtypeStruct((1, _LAN), i32)],
        scratch_shapes=[pltpu.VMEM((1, _LAN), i32)] * 12
        + [pltpu.VMEM((RP, _LAN), i32)] * 4
        + [pltpu.VMEM((_OR, _LAN), i32)] * 3
        + [pltpu.VMEM((1, _LAN), i32)],
        interpret=bool(interpret),
    )
    parts = []
    for b in range(n_blk):
        sl = slice(b * _LAN, (b + 1) * _LAN)
        parts.append(call(c2_t[:, sl], nm_t[:, sl], sb_t[:, sl],
                          eb_t[:, sl], st_t[:, sl], gid_t[:, sl]))
    if n_blk == 1:
        return parts[0]
    return [jnp.concatenate([p[i] for p in parts], axis=1)
            for i in range(4)]


def sketch_tiles_pallas(codes2, nmask, startmask, endmask, starts,
                        gids, *, W, k, w, interpret=None):
    """Sketch packed 2-bit rows with the fused kernel.

    codes2 (R, W//16) u32, nmask/startmask/endmask (R, W//32) u32,
    starts/gids (R, 64) i32 (the Tile layout of engine/device_index;
    endmask marks each read's last column). Returns dict(emit, hash,
    rid, pos, strand, flags): (R, W) i32 arrays aligned to column
    positions (hash is the bare u32 minimizer hash in i32 lanes, pos
    the read-local position; flags (R,) nonzero lanes need the exact
    fallback). Requires 2k <= 30, W % 32 == 0, W >= 256."""
    assert 2 * k <= 30 and W % 32 == 0 and W >= 2 * _OR
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = codes2.shape[0]
    Rp = -(-R // _LAN) * _LAN

    def put(a, width):
        buf = np.zeros((width, Rp), np.int32)
        buf[:, :R] = np.asarray(a).astype(np.uint32).view(np.int32).T
        return jnp.asarray(buf)

    def puti(a):
        buf = np.zeros((_RPR, Rp), np.int32)
        buf[:, :R] = np.asarray(a, dtype=np.int32).T
        return jnp.asarray(buf)

    oh, om, og, fl = _sketch_pallas_t(
        put(codes2, W // 16), put(nmask, W // 32),
        put(startmask, W // 32), put(endmask, W // 32),
        puti(starts), puti(gids),
        W=W, k=k, w=w, n_blk=Rp // _LAN, interpret=interpret)
    om = om.T[:R]
    sr = jax.lax.shift_right_logical
    meta = om & np.int32((1 << _META_EMIT_SHIFT) - 1)
    return {
        "emit": sr(om, np.int32(_META_EMIT_SHIFT)) & np.int32(63),
        "hash": oh.T[:R],
        "rid": og.T[:R],
        "pos": sr(meta, np.int32(1)),
        "strand": meta & np.int32(1),
        "flags": fl.T[:R].reshape(-1),
    }
