"""Count-pass search-width crop (mcrop): exactness vs the uncropped
program, and the engine's rung selection."""
import numpy as np
import jax.numpy as jnp

from longqc_tpu.engine import device_overlap as do


def _mk(rng, Q=8, M=64, N=4096):
    ih = np.sort(rng.randint(0, 1 << 20, N).astype(np.int32))
    # sentinel tail like a canonical index
    ih[-N // 8:] = np.iinfo(np.int32).max
    ih = np.sort(ih)
    qh = rng.randint(0, 1 << 20, (Q, M)).astype(np.int32)
    qcnt = rng.randint(1, 4, (Q, M)).astype(np.int32)
    n_slots = rng.randint(0, M // 2, Q).astype(np.int32)  # <= M/2
    return (jnp.asarray(ih), jnp.asarray(qh), jnp.asarray(qcnt),
            jnp.asarray(n_slots))


def test_count_crop_exact():
    rng = np.random.RandomState(7)
    ih, qh, qcnt, n_slots = _mk(rng)
    mo = jnp.int32(8)
    full = do._count_expanded(ih, qh, qcnt, n_slots, mo)
    for mc in (16, 32, 64):
        if mc < int(np.asarray(n_slots).max()):
            continue
        crop = do._count_expanded(ih, qh, qcnt, n_slots, mo, mcrop=mc)
        # n_q identical
        assert (np.asarray(full[0]) == np.asarray(crop[0])).all()
        # left/occ identical on real slots; shapes padded back to M
        ns = np.asarray(n_slots)
        for a, b in ((full[1], crop[1]), (full[2], crop[2])):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            for r in range(len(ns)):
                assert (a[r, :ns[r]] == b[r, :ns[r]]).all()


def test_count_crop_sharded_exact():
    rng = np.random.RandomState(11)
    S, Ns, kb = 4, 1024, 20
    lgS = S.bit_length() - 1
    keys = np.sort(rng.randint(0, 1 << 20, S * Ns).astype(np.int64))
    # hash-range shard s holds keys with top bits == s, INF-padded
    stack = np.full((S, Ns), np.iinfo(np.int64).max, np.int64)
    for s in range(S):
        ks = keys[(keys >> (kb - lgS)) == s][:Ns]
        stack[s, :len(ks)] = ks
        stack[s] = np.sort(stack[s])
    ihs = jnp.asarray(stack)
    from longqc_tpu.engine.device_index import _bnd_ck
    bnd_ck = _bnd_ck(ihs, S=S, kb=kb)
    Q, M = 4, 32
    qh = rng.randint(0, 1 << 20, (Q, M)).astype(np.int64)
    qcnt = rng.randint(1, 3, (Q, M)).astype(np.int32)
    n_slots = rng.randint(0, M // 2, Q).astype(np.int32)
    mo = jnp.int32(6)
    args = (ihs, bnd_ck, jnp.asarray(qh), jnp.asarray(qcnt),
            jnp.asarray(n_slots), mo)
    full = do._count_expanded_sharded(*args, kb=kb)
    crop = do._count_expanded_sharded(*args, kb=kb, mcrop=M // 2)
    assert (np.asarray(full[0]) == np.asarray(crop[0])).all()
    ns = n_slots
    for a, b in ((full[1], crop[1]), (full[2], crop[2])):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        for r in range(len(ns)):
            assert (a[r, :ns[r]] == b[r, :ns[r]]).all()


def test_group_count_crop_rung():
    class G:
        M = 256
        _ns_max = None
        _ns_max_dev = None
        ns_max = None
    g = G()
    g.count_crop = do._Group.count_crop.__get__(g)
    for nsm, want in ((10, 64), (64, 64), (65, 128), (128, 128),
                      (129, 256), (256, 256), (300, 256)):
        g.ns_max = nsm
        assert g.count_crop() == want, (nsm, g.count_crop())
