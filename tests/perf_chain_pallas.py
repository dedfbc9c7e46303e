"""Microbench: fused Pallas chain kernel vs lax.scan version on TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from longqc_tpu.ops.chain import chain_dp_batch, gap_penalty_table, make_carry
from longqc_tpu.ops.chain_pallas import (chain_dp_batch_pallas,
                                         make_carry_pallas, penalty_limbs)
from test_chain_pallas import _rand_rows

import jax
print("devices:", jax.devices(), flush=True)

Q, A, J, bw = 128, 2048, 64, 500
rng = np.random.RandomState(0)
axh, axl, aqb, asb, nb = _rand_rows(rng, Q, A, A, A + 1)
pen = np.zeros((Q, bw + 1), np.int32)
limbs = np.zeros((5, Q), np.int32)
rbad = np.zeros((1, Q), np.int32)
for r in range(Q):
    avg = np.float32(asb[r, :nb[r]].sum() / nb[r])
    pen[r] = gap_penalty_table(avg, bw)
    limbs[:, r] = penalty_limbs(float(avg), bw)

which = sys.argv[1] if len(sys.argv) > 1 else "both"

if which in ("pallas", "both"):
    t0 = time.time()
    out = chain_dp_batch_pallas(axh, axl, aqb, asb, nb, limbs, rbad,
                                make_carry_pallas(Q, J), np.int32(0))
    print("pallas compile+run1: %.1fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    N = 5
    for _ in range(N):
        f, p, v, fl, c = chain_dp_batch_pallas(
            axh, axl, aqb, asb, nb, limbs, rbad, make_carry_pallas(Q, J),
            np.int32(0))
    dt = (time.time() - t0) / N
    print("pallas: %.1f ms/call, %.2f M anchors/s (QxA=%dx%d), flagged %d"
          % (dt * 1e3, Q * A / dt / 1e6, Q, A, fl.sum()), flush=True)
    print("pallas f checksum:", int(np.asarray(f).astype(np.int64).sum()))

if which in ("scan", "both"):
    # scan version runs Q=64 per its engine config; time same shapes
    t0 = time.time()
    chain_dp_batch(axh, axl, aqb, asb, nb, pen, make_carry(Q, J),
                   np.int32(0))
    print("scan compile+run1: %.1fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    f2, p2, v2, fl2, _ = chain_dp_batch(axh, axl, aqb, asb, nb, pen,
                                        make_carry(Q, J), np.int32(0))
    f2 = np.asarray(f2)
    dt = time.time() - t0
    print("scan:   %.1f ms/call, %.2f M anchors/s" % (dt * 1e3,
          Q * A / dt / 1e6), flush=True)
    print("scan f checksum:", int(f2.astype(np.int64).sum()))
    if which == "both":
        print("match:", np.array_equal(np.asarray(f), f2),
              np.array_equal(np.asarray(fl), np.asarray(fl2)))
