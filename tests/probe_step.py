"""Step-program sub-phase timing probe (real TPU): times collect /
chain-DP / post separately at the production rung, plus the count's
search vs tail split. Mirrors probe_r5's setup."""
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
    r = None
    for _ in range(n):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("%-30s %8.1f ms" % (tag, best * 1e3), flush=True)
    return r


def main():
    import jax
    import jax.numpy as jnp
    from util_synth import make_genome, sample_reads
    from longqc_tpu.config import OverlapConfig, IndexOpt, MapOpt, FltOpt
    from longqc_tpu.engine import device_overlap as do

    _ = np.asarray(jnp.zeros(4) + 1)

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

    eng = do.DeviceOverlapEngine(cfg, queries)
    g = eng.groups[0]
    pidx = do._PartIndex(reads, k, w, 0, 2e-4, eng.tile_ladder,
                         eng.n_idx_sizes)

    # count split
    t("count full", lambda: do._count_expanded(
        pidx.ih, g.qh, g.qcnt, g.n_slots, pidx.mid_occ))
    Q, M = g.qh.shape
    slot_on = jnp.arange(M, dtype=jnp.int32)[None, :] < \
        g.n_slots[:, None]
    qs0 = jnp.where(slot_on, g.qh, 0)
    qcat = jnp.concatenate([qs0, qs0 + 1], axis=1)
    ss = jax.jit(do._ss_left_2level)
    t("  searchsorted 2-level", lambda: ss(pidx.ih, qcat))
    ssb = jax.jit(lambda a, q: jnp.searchsorted(a, q, side="left"))
    t("  searchsorted builtin", lambda: ssb(pidx.ih, qcat))

    cnt, left, occ = do._count_expanded(
        pidx.ih, g.qh, g.qcnt, g.n_slots, pidx.mid_occ)
    nq = np.asarray(cnt)
    nq_max = int(nq[:len(g.qids)].max())
    rung = next(a for a in eng.a_ladder if a >= nq_max)
    print("nq max %d rung %d" % (nq_max, rung), flush=True)
    st = eng._static(g, rung)

    qrank = np.full(eng.lanes, -1, np.int32)
    for r_, qi in enumerate(g.qids):
        qrank[r_] = pidx.name_rank.get(queries[qi][0], -1)
    qrank_d = jnp.asarray(qrank)
    qbis_d = jnp.asarray(np.zeros(eng.lanes, np.int32))

    coll = jax.jit(lambda: do._collect_anchors(
        pidx.irid, pidx.ips, pidx.rid_rank, pidx.mid_occ, left, occ,
        g.qps, g.qcnt, g.n_slots, g.qlen, qrank_d, qbis_d, st))
    res = t("collect", coll)
    key1, key2, yq, js_s = res[0], res[1], res[2], res[3]
    n_anch, n_q, n_kept = res[5], res[6], res[7]

    limbs = jnp.broadcast_to(eng.limbs5[:, None], (5, eng.lanes))
    rbad = jnp.zeros((1, eng.lanes), jnp.int32)
    dp = jax.jit(lambda: do._run_dp(key1, key2, yq, None, n_anch,
                                    limbs, rbad, st))
    dres = t("dp (chain+peak)", dp)
    f, p, v, peak, kflag = dres

    lam = jnp.zeros((eng.lanes,), jnp.int64)
    lam2 = jnp.zeros((eng.lanes,), jnp.int64)
    avgk = jnp.zeros((eng.lanes,), jnp.int32)
    mcz = jnp.zeros((eng.lanes, g.M2), jnp.int32)
    post = jax.jit(lambda: do._post_dp(
        key1, key2, yq, js_s, None, f, p, v, peak, kflag,
        n_anch, n_q, n_kept, pidx.seq_lens, g.qlen, g.qvalid,
        g.n_exp, lam, lam2, avgk, mcz, st))
    t("post", post)

    def step():
        lamx = jnp.zeros((eng.lanes,), jnp.int64)
        lam2x = jnp.zeros((eng.lanes,), jnp.int64)
        avgkx = jnp.zeros((eng.lanes,), jnp.int32)
        mcx = jnp.zeros((eng.lanes, g.M2), jnp.int32)
        return do._step(
            pidx.irid, pidx.ips, pidx.seq_lens, pidx.rid_rank,
            pidx.mid_occ, left, occ, g.qps, g.qcnt, g.n_slots,
            g.n_exp, g.qlen, qrank_d, qbis_d, g.qvalid,
            lamx, lam2x, avgkx, mcx, eng.limbs5, st=st)
    t("step fused (A=%d)" % rung, step)


if __name__ == "__main__":
    main()
