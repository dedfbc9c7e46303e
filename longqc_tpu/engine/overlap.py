"""Device-path overlap engine: batched chain DP on TPU.

Same pipeline as engine/overlap_host.overlap_run, with chaining done by
the batched device kernel (ops/chain.py): query anchor sets are grouped
and bucketed by anchor count into fixed (Q, A) shapes (bounding jit
recompiles), the DP fill runs on device, flagged rows (ring truncation
or unresolved max_skip fixpoint) fall back to the exact host DP, and
chain extraction/coverage accounting stay on host. Output rows are
bit-identical to the host spec (differentially tested).
"""

from logging import getLogger

import numpy as np

from longqc_tpu.config import OverlapConfig
from longqc_tpu.engine import overlap_host as oh
from longqc_tpu.ops.chain import (backtrack_chains, chain_dp_batch,
                                  gap_penalty_table)

logger = getLogger(__name__)

_GROUP_Q = 16     # device batch rows per DP call
_MIN_A = 512      # smallest padded anchor-count bucket


def _a_bucket(n):
    b = _MIN_A
    while b < n:
        b *= 2
    return b


class DeviceChainer:
    """Batched chain-DP dispatcher with host fallback, usable as the
    `chain_many` hook of overlap_run."""

    def __init__(self, J=64):
        self.J = J
        self.n_host_fallback = 0
        self.n_device = 0

    def __call__(self, anchor_sets, m):
        J = self.J
        results = [None] * len(anchor_sets)
        # bucket by padded anchor count
        buckets = {}
        for i, (ax, ay) in enumerate(anchor_sets):
            n = len(ax)
            if n == 0:
                results[i] = []
                continue
            buckets.setdefault(_a_bucket(n), []).append(i)
        for A, idxs in sorted(buckets.items()):
            for off in range(0, len(idxs), _GROUP_Q):
                sel = idxs[off:off + _GROUP_Q]
                Q = _GROUP_Q
                axh = np.zeros((Q, A), np.int32)
                axl = np.zeros((Q, A), np.int32)
                aqb = np.zeros((Q, A), np.int32)
                asb = np.zeros((Q, A), np.int32)
                nb = np.zeros((Q,), np.int32)
                pen = np.zeros((Q, m.bw + 1), np.int32)
                for r, i in enumerate(sel):
                    ax, ay = anchor_sets[i]
                    n = len(ax)
                    axh[r, :n] = (ax >> np.uint64(32)).astype(np.uint32
                                 ).view(np.int32)
                    axl[r, :n] = (ax & np.uint64(0xFFFFFFFF)
                                  ).astype(np.uint32).view(np.int32)
                    aqb[r, :n] = (ay & np.uint64(0xFFFFFFFF)
                                  ).astype(np.int32)
                    asb[r, :n] = ((ay >> np.uint64(32)) & np.uint64(0xFF)
                                  ).astype(np.int32)
                    nb[r] = n
                    spans = asb[r, :n]
                    pen[r] = gap_penalty_table(
                        np.float32(spans.sum() / n), m.bw)
                f, p, v, flags = chain_dp_batch(
                    axh, axl, aqb, asb, nb, pen, J=J, max_dist=m.max_gap,
                    bw=m.bw, max_skip=m.max_chain_skip)
                f = np.asarray(f)
                p = np.asarray(p)
                v = np.asarray(v)
                flags = np.asarray(flags)
                for r, i in enumerate(sel):
                    ax, ay = anchor_sets[i]
                    n = len(ax)
                    if flags[r]:
                        self.n_host_fallback += 1
                        results[i] = oh.chain_dp(
                            ax, ay, m.max_gap, m.bw, m.max_chain_skip,
                            m.min_cnt, m.min_chain_score)
                    else:
                        self.n_device += 1
                        results[i] = backtrack_chains(
                            f[r], p[r], v[r], n, m.min_cnt,
                            m.min_chain_score)
        return results


def overlap_run_device(target_iter, query_reads, cfg: OverlapConfig,
                       progress=None, J=64):
    """Device-path overlap run -> 9-column TSV rows."""
    chainer = DeviceChainer(J=J)
    rows = oh.overlap_run(target_iter, query_reads, cfg,
                          progress=progress, chain_many=chainer)
    if chainer.n_host_fallback:
        logger.info("chain DP: %d device rows, %d host fallbacks",
                    chainer.n_device, chainer.n_host_fallback)
    return rows
