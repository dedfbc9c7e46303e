"""Test oracle: faithful emulation of the reference minimizer sketch.

This is a slow, literal behavioral model of mm_sketch
(minimap2-coverage/sketch.c:76-142) used only to validate the
vectorized device kernel in longqc_tpu/ops/sketch.py. Emits
(x, y) pairs with x = hash64(kmer)<<8 | span and
y = rid<<32 | last_pos<<1 | strand.
"""

SEQ_NT4 = [4] * 256
for _i, _cs in enumerate(["Aa", "Cc", "Gg", "TtUu"]):
    for _c in _cs:
        SEQ_NT4[ord(_c)] = _i

MASK64 = (1 << 64) - 1
UINT64_MAX = MASK64


def hash64(key, mask):
    key = (~key + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def sketch(seq, w, k, rid=0, is_hpc=False):
    """Return list of (x, y) minimizers in reference emission order."""
    shift1 = 2 * (k - 1)
    mask = (1 << (2 * k)) - 1
    kmer = [0, 0]
    buf = [(UINT64_MAX, UINT64_MAX)] * w
    minv = (UINT64_MAX, UINT64_MAX)
    tq = []  # homopolymer run-length queue (is_hpc)
    out = []
    kmer_span = 0
    l = buf_pos = min_pos = 0

    assert len(seq) > 0 and 0 < w < 256 and 0 < k <= 28

    i = 0
    n = len(seq)
    while i < n:
        c = SEQ_NT4[ord(seq[i])]
        info = (UINT64_MAX, UINT64_MAX)
        if c < 4:
            if is_hpc:
                skip_len = 1
                if i + 1 < n and SEQ_NT4[ord(seq[i + 1])] == c:
                    skip_len = 2
                    while i + skip_len < n and SEQ_NT4[ord(seq[i + skip_len])] == c:
                        skip_len += 1
                    i += skip_len - 1
                tq.append(skip_len)
                kmer_span += skip_len
                if len(tq) > k:
                    kmer_span -= tq.pop(0)
            else:
                kmer_span = l + 1 if l + 1 < k else k
            kmer[0] = ((kmer[0] << 2) | c) & mask
            kmer[1] = (kmer[1] >> 2) | ((3 ^ c) << shift1)
            if kmer[0] == kmer[1]:
                i += 1
                continue  # symmetric k-mer: skipped entirely
            z = 0 if kmer[0] < kmer[1] else 1
            l += 1
            if l >= k and kmer_span < 256:
                info = ((hash64(kmer[z], mask) << 8) | kmer_span,
                        (rid << 32) | (i << 1) | z)
        else:
            l = 0
            tq = []
            kmer_span = 0
        buf[buf_pos] = info
        if l == w + k - 1 and minv[0] != UINT64_MAX:
            for j in range(buf_pos + 1, w):
                if minv[0] == buf[j][0] and buf[j][1] != minv[1]:
                    out.append(buf[j])
            for j in range(0, buf_pos):
                if minv[0] == buf[j][0] and buf[j][1] != minv[1]:
                    out.append(buf[j])
        if info[0] <= minv[0]:
            if l >= w + k and minv[0] != UINT64_MAX:
                out.append(minv)
            minv = info
            min_pos = buf_pos
        elif buf_pos == min_pos:
            if l >= w + k - 1 and minv[0] != UINT64_MAX:
                out.append(minv)
            minv = (UINT64_MAX, UINT64_MAX)
            for j in range(buf_pos + 1, w):
                if minv[0] >= buf[j][0]:
                    minv = buf[j]
                    min_pos = j
            for j in range(0, buf_pos + 1):
                if minv[0] >= buf[j][0]:
                    minv = buf[j]
                    min_pos = j
            if l >= w + k - 1 and minv[0] != UINT64_MAX:
                for j in range(buf_pos + 1, w):
                    if minv[0] == buf[j][0] and minv[1] != buf[j][1]:
                        out.append(buf[j])
                for j in range(0, buf_pos + 1):
                    if minv[0] == buf[j][0] and minv[1] != buf[j][1]:
                        out.append(buf[j])
        buf_pos += 1
        if buf_pos == w:
            buf_pos = 0
        i += 1
    if minv[0] != UINT64_MAX:
        out.append(minv)
    return out
