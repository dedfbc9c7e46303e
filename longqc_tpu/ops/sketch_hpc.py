"""Homopolymer-compressed minimizer sketch.

HPC mode (-H, used by the spike-in-control filter run, longQC.py:255)
compresses each run of identical bases to one entry; the k-mer span is
the total original bases covered by the window's last <= k runs
(sketch.c:92-104). We compress on host (vectorized numpy), compute
spans/positions, and reuse the same device sketch kernel with
per-position overrides.
"""

import numpy as np

from longqc_tpu.io.pack import pack_reads, SEQ_NT4_SKETCH
from longqc_tpu.ops.sketch import sketch_batch, sketch_to_lists


def hpc_compress(seq, k):
    """-> (codes, positions, spans) numpy arrays for one read.

    codes: per-entry base code (4 = ambiguous, one entry per base)
    positions: original read index of the entry's last base
    spans: windowed sum of the last <= k run lengths since the last
           ambiguous reset (0 for ambiguous entries)
    """
    a = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    codes = SEQ_NT4_SKETCH[a].astype(np.int64)
    n = len(codes)
    if n == 0:
        return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    # entry boundaries: position i starts an entry if i==0, code differs
    # from previous, or either is ambiguous (ambiguous bases are single
    # entries; valid runs collapse)
    prev = np.concatenate([[np.int64(-1)], codes[:-1]])
    is_start = (codes != prev) | (codes >= 4) | (prev >= 4)
    is_start[0] = True
    starts = np.nonzero(is_start)[0]
    ends = np.concatenate([starts[1:] - 1, [n - 1]])
    ecodes = codes[starts]
    skips = (ends - starts + 1).astype(np.int64)
    skips[ecodes >= 4] = 0

    # spans: per valid entry, sum of last <= k skips since reset
    m = len(starts)
    cum = np.concatenate([[0], np.cumsum(skips)])
    # segment ids: increment at ambiguous entries; seg start = first
    # valid entry index after the last ambiguous entry (or 0)
    amb = ecodes >= 4
    seg_start = np.zeros(m, np.int64)
    last_amb = -1
    for t in range(m):       # m is small (runs), plain loop acceptable
        if amb[t]:
            last_amb = t
        seg_start[t] = last_amb + 1
    lo = np.maximum(np.arange(m) - k + 1, seg_start)
    spans = cum[np.arange(m) + 1] - cum[lo]
    spans[amb] = 0
    return ecodes.astype(np.uint8), ends.astype(np.int64), spans


def sketch_reads_hpc(reads, k, w, batch_size=128):
    """HPC sketch of [name, seq, qual] reads -> per-read
    (hash, pos, strand, span) arrays (cf. sketch_to_lists)."""
    comp = [hpc_compress(r[1], k) for r in reads]
    out = [None] * len(reads)
    # bucket by compressed length
    buckets = {}
    for i, (c, _p, _s) in enumerate(comp):
        blen = 256
        while blen < max(len(c), 1):
            blen *= 2
        buckets.setdefault(blen, []).append(i)
    for blen, idxs in sorted(buckets.items()):
        for off in range(0, len(idxs), batch_size):
            sel = idxs[off:off + batch_size]
            B = len(sel)
            codes = np.full((B, blen), 4, np.uint8)
            positions = np.zeros((B, blen), np.int64)
            spans = np.zeros((B, blen), np.int64)
            lengths = np.zeros(B, np.int32)
            for slot, i in enumerate(sel):
                c, p, s = comp[i]
                codes[slot, :len(c)] = c
                positions[slot, :len(c)] = p
                spans[slot, :len(c)] = s
                lengths[slot] = len(c)
            res = sketch_batch(codes, lengths, w=w, k=k,
                               positions=positions, spans=spans)
            lists = sketch_to_lists(res)  # HPC path: packed u64
            for slot, i in enumerate(sel):
                out[i] = lists[slot]
    return out
