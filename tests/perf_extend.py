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
    from longqc_tpu.ops.extend_pallas import extz_batch_pallas

    t_start = time.time()
    rng = np.random.RandomState(3)
    Lq = Lt + 80
    q = rng.randint(0, 4, size=(B, Lq)).astype(np.int32)
    # targets = noisy copies so the band stays live (no early z-drop)
    t = q[:, :Lt].copy()
    mut = rng.random_sample(t.shape) < 0.1
    t[mut] = rng.randint(0, 4, size=int(mut.sum()))
    qlens = np.full(B, Lq, np.int32)
    tlens = np.full(B, Lt, np.int32)
    band = 2 * W + 1
    cells = float(B) * Lt * band

    out = {}
    for name, kw in (("extz", {}),
                     ("extd", {"gapo2": 24, "gape2": 1})):
        if time.time() - t_start > budget_s:
            break
        # compile + correctness-shape pass
        extz_batch_pallas(q, qlens, t, tlens, W=W, **kw)
        n = 0
        t0 = time.time()
        while n < 3 or (time.time() - t0 < 2.0
                        and time.time() - t_start < budget_s):
            extz_batch_pallas(q, qlens, t, tlens, W=W, **kw)
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
        "the kernel walks one target column per fori iteration (the "
        "lazy-F recurrence serializes columns), so each step issues "
        "~60 (128,128) vector ops plus 8+ pltpu.roll shifts and "
        "dynamic row loads whose Mosaic lowering dominates issue "
        "slots; closing the gap needs multi-column software "
        "pipelining of the anti-diagonal band, which is out of scope "
        "while the kernel stays dormant in the LongQC live path "
        "(ksw2 is compiled but never called by the reference driver, "
        "lqmap.c:116)")
    return out


if __name__ == "__main__":
    import json
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    print(json.dumps(extension_perf()))
