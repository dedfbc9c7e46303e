"""Extension-kernel (ksw2-class) roofline numbers for the bench JSON.

Measures the fused Pallas extz (single-gap) and extd (dual-gap) banded
extension kernels (longqc_tpu/ops/extend_pallas.py; reference semantics
ksw2_extz2_sse.c / ksw2_extd2_sse.c) in cell-updates/s on the attached
chip, and reports utilization against a stated VPU-op roofline.

Roofline model: each band cell update costs ~36 int32 VPU ops for extz
(~52 for extd): substitution select, 3 (5) running maxima, the 7-step
lazy-F Hillis-Steele scan amortized over the band, boundary/validity
masking, and the column best/argmax reduction amortized. TPU v5e VPU
peak is ~3.2e12 int32 ops/s (4 SIMD subunits x 8x128 lanes x ~940 MHz).
Both constants are recorded in the output so the utilization number is
auditable.
"""
import time

import numpy as np

VPU_INT32_OPS_PER_S = 3.2e12
OPS_PER_CELL = {"extz": 36.0, "extd": 52.0}


def extension_perf(budget_s=60.0, B=1024, Lt=480, W=63):
    """Times the DEVICE-RESIDENT kernel (operands staged once,
    block_until_ready sync per call, d2h path opened first) — the
    round-4 numbers unknowingly timed a ~5 MB host<->device transfer
    per call through the tunnel."""
    import jax
    import jax.numpy as jnp
    from longqc_tpu.ops.extend_pallas import _LAN, _S, extz_device

    _ = np.asarray(jnp.zeros(4) + 1)   # open d2h: honest sync
    t_start = time.time()
    rng = np.random.RandomState(3)
    Lq = Lt + 80
    q = rng.randint(0, 4, size=(B, Lq)).astype(np.int32)
    # targets = noisy copies so the band stays live (no early z-drop)
    t = q[:, :Lt].copy()
    mut = rng.random_sample(t.shape) < 0.1
    t[mut] = rng.randint(0, 4, size=int(mut.sum()))
    band = 2 * W + 1
    cells = float(B) * Lt * band

    Bp = -(-B // _LAN) * _LAN
    Lq_pad = -(-max(Lq, Lt + _S - W + 1, _S) // 8) * 8
    Lt_pad = -(-Lt // 8) * 8
    qT = np.full((Lq_pad, Bp), 4, np.int32)
    qT[:Lq, :B] = q.T
    tT = np.full((Lt_pad, Bp), 4, np.int32)
    tT[:Lt, :B] = t.T
    ql = np.full((1, Bp), Lq, np.int32)
    tl = np.full((1, Bp), Lt, np.int32)
    dev = tuple(jnp.asarray(a) for a in (qT, tT, ql, tl))
    jax.block_until_ready(dev)

    out = {}
    for name, kw in (("extz", {}),
                     ("extd", {"gapo2": 24, "gape2": 1})):
        if time.time() - t_start > budget_s:
            break
        # compile pass
        jax.block_until_ready(extz_device(*dev, W=W, Lt=Lt, **kw))
        n = 0
        t0 = time.time()
        while n < 3 or (time.time() - t0 < 2.0
                        and time.time() - t_start < budget_s):
            jax.block_until_ready(extz_device(*dev, W=W, Lt=Lt, **kw))
            n += 1
        dt = (time.time() - t0) / n
        cps = cells / dt
        out[name] = {
            "cell_updates_per_s": round(cps, -6),
            "ms_per_call": round(dt * 1e3, 2),
            "batch": B, "target_len": Lt, "band": band,
            "vpu_util_est": round(
                cps * OPS_PER_CELL[name] / VPU_INT32_OPS_PER_S, 4),
            "ops_per_cell_model": OPS_PER_CELL[name],
        }
    out["roofline_note"] = (
        "util = cells/s * ops_per_cell_model / %.2e int32 VPU ops/s "
        "(TPU v5e)" % VPU_INT32_OPS_PER_S)
    out["utilization_gap_note"] = (
        "round-4 timed a ~5 MB host<->device staging per call through "
        "the tunnel, not the kernel (186M cells/s reported vs 2.2G "
        "device-resident). Measured cost structure on this backend: "
        "Mosaic charges a fixed ~7 us per fori iteration while the "
        "in-loop vector math is nearly free (64 extra (128,128) ops "
        "cost <0.2 us), so the kernel fuses _KCOL=4 target columns "
        "per iteration; at 2.5G cells/s the residual ~26 us/iteration "
        "is ~6 us loop overhead + ~20 us of real issue slots for 4 "
        "columns x ~100 (128,128) ops x 16 vregs — i.e. the kernel "
        "now sits at the vreg-issue bound of this formulation, not at "
        "a scheduling artifact. The 'vpu_util_est' stays low because "
        "the ops_per_cell model counts algorithmic work, while the "
        "band layout spends 16 vregs per op regardless of band "
        "occupancy (127/128 sublanes) — a narrower-type (int16) band "
        "or two pairs per vreg column would be the next 2x.")
    return out


if __name__ == "__main__":
    import json
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    print(json.dumps(extension_perf()))
