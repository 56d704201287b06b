"""
Generalized Poisson-gamma mixture likelihood (arXiv:1902.08831, eqs. 91/97).

Rebuild of the reference's C extension + wrapper
(``pisa/utils/llh_defs/poisson_gamma.c:8-45``, ``poisson.py:86-130``,
``pisa/utils/stats.py:792-881``) as pure JAX: the per-bin delta recursion

    delta_0 = 1,   delta_i = (1/i) * sum_{j=1..i} s_j * delta_{i-j},
    s_j = sum_sources alpha_s * q_s^j,   q_s = 1/(1+beta_s),
    P(k) = prod_s (beta_s/(1+beta_s))^alpha_s * delta_k

is evaluated for ALL bins simultaneously with a fixed-shape ``lax.scan`` up
to the maximum data count, so it jit-compiles once and differentiates w.r.t.
the alphas/betas (and hence the MC weights) — the reference's C path is
neither vectorized over bins nor differentiable.

The mixture's generating function is Delta(x) = prod_s (1 - q_s x)^{-alpha_s};
the recursion above is its power-series expansion (what the C code computes).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

SMALL_POS = 1e-10
MIN_PROB = 1e-300

__all__ = [
    "generalized_pg_log_mixture",
    "generalized_pg_llh",
    "approximate_poisson_normal",
]


def generalized_pg_log_mixture(k, alphas, betas, mask=None, k_max=None):
    """log P(k) of the generalized Poisson-gamma mixture, vectorized over
    bins (eq. 91 of 1902.08831; cf. ``poisson_gamma.c:8-45``).

    Parameters
    ----------
    k : (B,) int array — per-bin data counts
    alphas, betas : (B, S) arrays — per-bin per-source mixture parameters
    mask : (B, S) bool, optional — valid sources (invalid entries ignored)
    k_max : static int — recursion length; must be >= max(k). Required when
        `k` is traced; derived from `k` when concrete.
    """
    k = jnp.asarray(k)
    alphas = jnp.asarray(alphas)
    betas = jnp.asarray(betas)
    if mask is None:
        mask = jnp.isfinite(alphas) & jnp.isfinite(betas) & (betas > 0)
    if k_max is None:
        k_max = int(np.max(np.asarray(k))) if k.size else 0
    k_max = max(int(k_max), 1)
    # guard: counts beyond the static recursion length would index past the
    # delta buffer (clamped gather -> silently wrong); clip explicitly
    k = jnp.clip(k, 0, k_max)

    a = jnp.where(mask, alphas, 0.0)
    b_safe = jnp.where(mask, betas, 1.0)
    q = 1.0 / (1.0 + b_safe)  # (B, S)
    q = jnp.where(mask, q, 0.0)
    # log prefactor: sum_s alpha_s * log(beta_s / (1 + beta_s))
    log_prefac = jnp.sum(
        jnp.where(mask, a * (jnp.log(b_safe) - jnp.log1p(b_safe)), 0.0),
        axis=-1,
    )  # (B,)

    B = a.shape[0]

    # s_j = sum_s alpha_s q_s^j for j = 1..k_max  (running product scan)
    def st_body(running, _):
        running = running * q
        return running, jnp.sum(a * running, axis=-1)

    _, st = jax.lax.scan(st_body, jnp.ones_like(q), None, length=k_max)
    st = jnp.swapaxes(st, 0, 1)  # (B, k_max), st[:, j-1] = s_j

    # delta recursion, fixed-shape: delta buffer (B, k_max+1)
    deltas0 = jnp.concatenate(
        [jnp.ones((B, 1), dtype=a.dtype), jnp.zeros((B, k_max), dtype=a.dtype)],
        axis=1,
    )
    jrange = jnp.arange(1, k_max + 1)  # (k_max,)

    def delta_body(deltas, i):
        idx = i - jrange  # (k_max,)
        valid = idx >= 0
        gathered = jnp.take(deltas, jnp.clip(idx, 0, None), axis=1)  # (B,K)
        conv = jnp.sum(jnp.where(valid, st * gathered, 0.0), axis=1) / i
        deltas = jax.lax.dynamic_update_slice(
            deltas, conv[:, None], (0, i)
        )
        return deltas, None

    deltas, _ = jax.lax.scan(
        delta_body, deltas0, jnp.arange(1, k_max + 1)
    )

    p_k = jnp.take_along_axis(deltas, k[:, None], axis=1)[:, 0]
    return log_prefac + jnp.log(jnp.clip(p_k, MIN_PROB, None))


def generalized_pg_llh(
    actual, expected, empty_bins=None, k_max=None, use_c=False
):
    """Per-bin generalized Poisson llh (cf. reference ``stats.py:792``).

    Parameters
    ----------
    actual : (B,) data counts
    expected : mapping with per-source stacked (S, B) arrays under keys
        'weights', 'llh_alphas', 'llh_betas', 'n_mc_events' (as produced by
        the ``likelihood.generalized_llh_params`` stage).
    empty_bins : optional (B,) bool — bins with no MC in any dataset;
        derived from n_mc_events when omitted.
    use_c : bool — evaluate the mixture with the native C library
        (host-side, not jittable/differentiable; cf. the reference's
        ``stats.py:881`` ``use_c=True`` path). The JAX path is the default.

    Returns
    -------
    (B,) per-bin log-likelihood values.
    """
    for key in ("weights", "llh_alphas", "llh_betas", "n_mc_events"):
        if key not in expected:
            raise ValueError(
                f"generalized_poisson_llh needs key {key!r} in expected"
                " (run the likelihood.generalized_llh_params stage)"
            )
    weights = jnp.asarray(expected["weights"])  # (S, B)
    alphas = jnp.swapaxes(jnp.asarray(expected["llh_alphas"]), 0, 1)  # (B,S)
    betas = jnp.swapaxes(jnp.asarray(expected["llh_betas"]), 0, 1)
    n_mc = jnp.asarray(expected["n_mc_events"])  # (S, B)

    k = jnp.asarray(actual)
    k_int = jnp.clip(k, 0, None).astype(jnp.int32)

    if empty_bins is None:
        empty_bins = jnp.sum(n_mc, axis=0) == 0

    # high-statistics branch: plain Poisson against the summed weights,
    # saturated-model subtracted (cf. stats.py:858-861)
    w_sum = jnp.sum(weights, axis=0)  # (B,)
    w_safe = jnp.clip(w_sum, SMALL_POS, None)
    k_safe = jnp.clip(k, 1.0, None)
    log_poisson = (
        k * jnp.log(w_safe) - w_safe - (k * jnp.log(k_safe) - k)
    )
    high_mc = jnp.all(n_mc > 100, axis=0)

    # low-statistics branch: the PG mixture
    if use_c:
        from pisa_tpu.utils.llh_defs.native import pg_log_mixture_c

        log_mix = jnp.asarray(
            pg_log_mixture_c(
                np.asarray(k_int), np.asarray(alphas), np.asarray(betas)
            ),
            dtype=w_sum.dtype,
        )
    else:
        log_mix = generalized_pg_log_mixture(
            k_int, alphas, betas, k_max=k_max
        )

    llh = jnp.where(high_mc, log_poisson, log_mix)
    # empty MC bins: heavily penalized if data present, ignored otherwise
    llh = jnp.where(
        empty_bins, jnp.where(k > 0, jnp.log(SMALL_POS), 0.0), llh
    )
    return llh


def approximate_poisson_normal(k, alphas, betas, mask=None, n_quad=64):
    """Marginalized Poisson-gamma probability approximated by integrating a
    Poisson against a single normal with the summed gamma mean/variance
    (cf. reference ``stats.py:881``'s quad integration), using fixed-order
    Gauss-Legendre quadrature so it is jittable/differentiable.

    k : (B,); alphas/betas : (B, S). Returns (B,) log probabilities.
    """
    from jax.scipy.special import gammaln

    k = jnp.asarray(k, dtype=jnp.result_type(float))
    alphas = jnp.asarray(alphas)
    betas = jnp.asarray(betas)
    if mask is None:
        mask = jnp.isfinite(alphas) & jnp.isfinite(betas) & (betas > 0)
    a = jnp.where(mask, alphas, 0.0)
    b = jnp.where(mask, betas, 1.0)

    mean = jnp.sum(a / b, axis=-1)  # (B,)
    sigma = jnp.sqrt(jnp.clip(jnp.sum(a / b**2, axis=-1), SMALL_POS, None))

    lo = jnp.clip(mean - 5.0 * sigma, SMALL_POS, None)
    hi = mean + 5.0 * sigma
    x_gl, w_gl = np.polynomial.legendre.leggauss(n_quad)
    x_gl = jnp.asarray(x_gl)
    w_gl = jnp.asarray(w_gl)
    # map [-1, 1] -> [lo, hi] per bin
    lam = 0.5 * (hi - lo)[:, None] * x_gl[None, :] + 0.5 * (hi + lo)[:, None]
    jac = 0.5 * (hi - lo)[:, None]

    log_pois = (
        k[:, None] * jnp.log(lam) - lam - gammaln(k[:, None] + 1.0)
    )
    log_norm = (
        -0.5 * ((lam - mean[:, None]) / sigma[:, None]) ** 2
        - jnp.log(sigma[:, None] * jnp.sqrt(2.0 * jnp.pi))
    )
    integrand = jnp.exp(log_pois + log_norm)
    prob = jnp.sum(w_gl[None, :] * integrand * jac, axis=1)
    return jnp.log(jnp.clip(prob, MIN_PROB, None))
