"""Distribution fitting: GMM EM, Normal+LogNormal EM, gamma fit.

The reference fits per-read coverage with sklearn's 2-component
GaussianMixture (lq_coverage.py:588) and, for low-coverage/transcript
data, a Normal(noise)+LogNormal(signal) mixture via the vendored mixEM
(lq_coverage.py:561-564, mixEM/mixem/em.py:16-88). sklearn's kmeans
init is unseeded in the reference (nondeterministic run to run); we use
a deterministic quantile init, making our results reproducible while
statistically equivalent.

EM loops are expressed in JAX (jit + lax.while_loop) so the same code
fits batches on device; the handful-of-KB fits in the QC report run
on the CPU backend in f64.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import gamma as scipy_gamma

_LOG2PI = float(np.log(2.0 * np.pi))


@functools.partial(jax.jit, static_argnames=("n_comp", "max_iter"))
def _gmm_em(x, weights0, means0, vars0, n_comp=2, max_iter=100,
            tol=1e-3, reg=1e-6):
    """1-D GMM EM (sklearn-equivalent updates, mean-log-likelihood tol)."""
    n = x.shape[0]

    def log_prob(means, variances):
        return (-0.5 * ((x[:, None] - means[None, :]) ** 2
                        / variances[None, :])
                - 0.5 * jnp.log(variances[None, :]) - 0.5 * _LOG2PI)

    def cond(state):
        it, dll, *_ = state
        return (it < max_iter) & (jnp.abs(dll) > tol)

    def body(state):
        it, _, ll_prev, wgt, mu, var = state
        lp = log_prob(mu, var) + jnp.log(wgt)[None, :]
        norm = jax.scipy.special.logsumexp(lp, axis=1)
        resp = jnp.exp(lp - norm[:, None])
        nk = resp.sum(axis=0) + 10 * jnp.finfo(x.dtype).eps
        mu_n = (resp * x[:, None]).sum(axis=0) / nk
        var_n = ((resp * (x[:, None] - mu_n[None, :]) ** 2).sum(axis=0)
                 / nk + reg)
        wgt_n = nk / n
        ll = norm.mean()
        return (it + 1, ll - ll_prev, ll, wgt_n, mu_n, var_n)

    state = (jnp.int32(0), jnp.asarray(np.inf, x.dtype),
             jnp.asarray(-np.inf, x.dtype), weights0, means0, vars0)
    it, _, ll, wgt, mu, var = jax.lax.while_loop(cond, body, state)
    return wgt, mu, var, ll, it


def fit_gmm(x, n_comp=2):
    """Deterministic 2-component GMM fit -> (weights, means, covariances).

    Init: quantile-split means (balanced), pooled variance.
    """
    x = np.asarray(x, np.float64)
    qs = np.linspace(0, 100, 2 * n_comp + 1)[1::2]
    means0 = np.percentile(x, qs)
    var0 = np.full(n_comp, max(np.var(x), 1e-6) / n_comp)
    w0 = np.full(n_comp, 1.0 / n_comp)
    wgt, mu, var, _, _ = _gmm_em(jnp.asarray(x), jnp.asarray(w0),
                                 jnp.asarray(means0), jnp.asarray(var0),
                                 n_comp=n_comp)
    return np.asarray(wgt), np.asarray(mu), np.asarray(var)


def gmm_score_samples(x, weights, means, variances):
    """log pdf of the mixture at x (for plots)."""
    x = np.asarray(x, np.float64)[:, None]
    lp = (-0.5 * (x - means[None, :]) ** 2 / variances[None, :]
          - 0.5 * np.log(2 * np.pi * variances[None, :])
          + np.log(weights[None, :]))
    m = lp.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(lp - m).sum(axis=1, keepdims=True)))[:, 0]


@functools.partial(jax.jit, static_argnames=("max_iter", "tol_iters"))
def _norm_lognorm_em(x, mu_n0, sd_n0, mu_l0, sd_l0, max_iter=500,
                     tol=1e-15, tol_iters=10):
    """Normal + LogNormal mixture EM with mixEM's convergence rule
    (relative log-likelihood change vs `tol_iters` iterations back,
    em.py:60-88). Weighted-ML M-steps per mixem.distribution."""
    logx = jnp.log(x)

    def log_dens(mu_n, sd_n, mu_l, sd_l):
        ln = (-(x - mu_n) ** 2 / (2 * sd_n ** 2) - jnp.log(sd_n)
              - 0.5 * _LOG2PI)
        ll = (-(logx - mu_l) ** 2 / (2 * sd_l ** 2) - jnp.log(sd_l)
              - 0.5 * _LOG2PI - logx)
        return jnp.stack([ln, ll], axis=1)

    def body(state):
        it, hist, w, mu_n, sd_n, mu_l, sd_l = state
        ld = log_dens(mu_n, sd_n, mu_l, sd_l)
        resp = w[None, :] * jnp.exp(ld)
        resp = resp / resp.sum(axis=1, keepdims=True)
        ll = jnp.sum(resp * ld)
        # M-step
        wsum = resp.sum(axis=0)
        mu_n2 = (resp[:, 0] * x).sum() / wsum[0]
        sd_n2 = jnp.sqrt((resp[:, 0] * (x - mu_n2) ** 2).sum() / wsum[0])
        mu_l2 = (resp[:, 1] * logx).sum() / wsum[1]
        sd_l2 = jnp.sqrt((resp[:, 1] * (logx - mu_l2) ** 2).sum() / wsum[1])
        w2 = resp.mean(axis=0)
        hist2 = jnp.concatenate([ll[None], hist[:-1]])
        return (it + 1, hist2, w2, mu_n2, sd_n2, mu_l2, sd_l2)

    def cond(state):
        it, hist, *_ = state
        ll = hist[0]
        old = hist[tol_iters - 1]
        converged = (it >= tol_iters) & ((old - ll) / old <= tol)
        return (it <= max_iter) & ~converged & ~jnp.isnan(ll)

    hist0 = jnp.full((tol_iters,), -jnp.inf, x.dtype)
    state = (jnp.int32(0), hist0, jnp.array([0.5, 0.5], x.dtype),
             mu_n0, sd_n0, mu_l0, sd_l0)
    it, hist, w, mu_n, sd_n, mu_l, sd_l = jax.lax.while_loop(
        cond, body, state)
    return w, mu_n, sd_n, mu_l, sd_l, hist[0]


def fit_norm_lognorm(x, mu_norm, sd_norm, mu_logn, sd_logn=1.0):
    """mixEM-equivalent fit -> (weights, [mu_n, mu_l], [sd_n, sd_l])."""
    x = np.asarray(x, np.float64)
    w, mu_n, sd_n, mu_l, sd_l, _ = _norm_lognorm_em(
        jnp.asarray(x), jnp.float64(mu_norm), jnp.float64(sd_norm),
        jnp.float64(mu_logn), jnp.float64(sd_logn))
    return (np.asarray(w), [float(mu_n), float(mu_l)],
            [float(sd_n), float(sd_l)])


def estimate_gamma_dist(vals):
    """scipy gamma.fit with floc=0, as the reference
    (lq_gamma.py:47-53)."""
    alpha, _loc, beta = scipy_gamma.fit(np.asarray(vals, np.float64),
                                        floc=0.0)
    return alpha, beta


def estimate_gamma_dist_minka(vals, tol=1e-6):
    """Minka (2002) fixed-point gamma estimation (cf. the reference's
    hand-rolled estimator, lq_gamma.py:21-44; unused by its main path
    but part of the module surface)."""
    from scipy import special
    from scipy.stats import dgamma

    v = np.asarray(vals, np.float64)
    mean_v = np.mean(v)
    mean_log = np.mean(np.log(v))
    a = 0.5 / (np.log(mean_v) - mean_log)
    b = mean_v / a

    def ll(a_, b_):
        return np.sum(np.log(dgamma.pdf(v, a_, loc=0, scale=1 / b_)))

    eps = np.inf
    ll_p = ll(a, b)
    while eps > tol:
        inv = 1 / a + ((mean_log - special.polygamma(0, a)
                        - np.log(mean_v) + np.log(a))
                       / (a ** 2 * (1 / a - special.polygamma(1, a))))
        a = 1 / inv
        b = mean_v / a
        ll_n = ll(a, b)
        eps = abs(ll_n - ll_p)
        ll_p = ll_n
    return a, b
