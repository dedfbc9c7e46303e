"""Round-5 per-program device timing probe (real TPU).

Times each canonical program of the large-scale bench point in
isolation: index subphases, count, step rungs, finalize, and the
engine-init group staging. Prints one line per probe.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def t(tag, fn, n=3):
    import jax
    best = None
    for _ in range(n):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("%-28s %8.1f ms" % (tag, best * 1e3), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from util_synth import make_genome, sample_reads
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import device_index as di
    from longqc_tpu.engine import device_overlap as do

    n_reads = int(os.environ.get("PROBE_N", "10000"))
    rng = np.random.RandomState(4321)
    print("generating...", flush=True)
    genome = make_genome(rng, 20000000)
    reads = sample_reads(rng, genome, n_reads, min_len=800, max_len=2500,
                         err=0.12, junk_frac=0.1)
    queries = reads[:1000]
    cfg = OverlapConfig(index=IndexOpt(k=12, w=5),
                        map=MapOpt(min_score_med=80, min_score_good=160),
                        flt=FltOpt(min_ovlp=0))
    k, w = 12, 5

    t0 = time.time()
    eng = do.DeviceOverlapEngine(cfg, queries)
    for g in eng.groups:
        jax.block_until_ready(g.qps)
    print("%-28s %8.1f ms  (%d groups)" % (
        "engine init (groups)", (time.time() - t0) * 1e3,
        len(eng.groups)), flush=True)

    tiles, jumbo = t("pack (host)",
                     lambda: di.pack_part_tiles(reads, w), n=2)
    tiles = tiles + jumbo
    print("tiles:", [(tt.R, tt.W) for tt in tiles], flush=True)

    def run_tiles():
        return [di._run_tile(tt, k, w) for tt in tiles]
    results = t("tiles (upload+sketch+sort)", run_tiles, n=3)

    cropped = [di._crop_chunk(list(r[:3])) for r in results]

    def merge():
        return di._merge_chunks([c for c, _n in cropped],
                                di.N_IDX_SIZES)[0]
    final = t("merge+canonical sort", merge, n=3)
    print("n_idx:", final[0].shape[0], flush=True)

    mo = t("mid_occ (device)",
           lambda: di._mid_occ_device(final[0], frac=2e-4), n=3)
    print("mid_occ:", int(mo), flush=True)

    pidx = t("PartIndex total", lambda: do._PartIndex(
        reads, k, w, 0, 2e-4, eng.tile_ladder, eng.n_idx_sizes),
        n=1)

    g = eng.groups[0]
    cnt_out = t("count (1 group)", lambda: do._count_expanded(
        pidx.ih, g.qh, g.qcnt, g.n_slots, pidx.mid_occ), n=3)
    nq, left, occ = cnt_out
    nq_np = np.asarray(nq)
    print("nq max:", nq_np[:len(g.qids)].max(), flush=True)

    qrank = np.full(eng.lanes, -1, np.int32)
    for r, qi in enumerate(g.qids):
        qrank[r] = pidx.name_rank.get(queries[qi][0], -1)
    qrank_d = jnp.asarray(qrank)
    qbis_d = jnp.asarray(np.zeros(eng.lanes, np.int32))

    rung = next(a for a in eng.a_ladder
                if a >= int(nq_np[:len(g.qids)].max()))
    for A in {rung, 2 * rung}:
        st = eng._static(g, A)

        def step():
            lam = jnp.zeros((eng.lanes,), jnp.int64)
            lam2 = jnp.zeros((eng.lanes,), jnp.int64)
            avgk = jnp.zeros((eng.lanes,), jnp.int32)
            mc = jnp.zeros((eng.lanes, g.M2), jnp.int32)
            return do._step(
                pidx.irid, pidx.ips, pidx.seq_lens, pidx.rid_rank,
                pidx.mid_occ, left, occ, g.qps, g.qcnt, g.n_slots,
                g.n_exp, g.qlen, qrank_d, qbis_d, g.qvalid,
                lam, lam2, avgk, mc, eng.limbs5, st=st)
        t("step (1 group, A=%d)" % A, step, n=3)

    t("finalize (1 group)", lambda: do._finalize_group(
        g.lam, g.lam2, g.m_cnts, g.n_exp), n=3)

    # pull latency: packed_small transfer
    small, full = eng._step_group(g, pidx, qrank_d, qbis_d, g.qvalid,
                                  rung, left, occ)
    jax.block_until_ready(small)
    t0 = time.time()
    _ = np.asarray(small)
    print("%-28s %8.1f ms  (%d B)" % (
        "pull packed_small", (time.time() - t0) * 1e3,
        small.size * 4), flush=True)


if __name__ == "__main__":
    main()
