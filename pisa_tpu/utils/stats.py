"""
Binned comparison metrics (llh / chi2 families), rebuilt as pure,
jit/grad-able JAX functions (cf. reference ``pisa/utils/stats.py:43-57``).

Conventions match the reference exactly:

- each metric maps (actual, expected[, variance]) elementwise to per-bin
  values; callers sum for totals
- ``expected`` is clipped to ``SMALL_POS`` to avoid log/0-division blowups
- llh-family metrics are *maximized*, chi2-family *minimized*
- ``sigma**2`` below is the variance attached to the expectation (the
  reference's ``unp.std_devs(expected)**2``), i.e. MC (sumw2) uncertainty

All functions accept numpy or jax arrays and return jax arrays; they are safe
to call inside jit and to differentiate w.r.t. `expected`.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = [
    "SMALL_POS",
    "ALL_METRICS",
    "METRICS_TO_MAXIMIZE",
    "METRICS_TO_MINIMIZE",
    "it_got_better",
    "is_metric_to_maximize",
    "chi2",
    "llh",
    "poisson_llh",
    "log_poisson",
    "mcllh_mean",
    "mcllh_eff",
    "mod_chi2",
    "correct_chi2",
    "weighted_chi2",
    "signed_sqrt_mod_chi2",
    "barlow_llh",
    "barlow_solve_t",
    "conv_llh",
    "generalized_poisson_llh",
]

SMALL_POS = 1e-10

METRICS_TO_MAXIMIZE = [
    "llh",
    "poisson_llh",
    "conv_llh",
    "barlow_llh",
    "mcllh_mean",
    "mcllh_eff",
    "generalized_poisson_llh",
]
METRICS_TO_MINIMIZE = [
    "chi2",
    "mod_chi2",
    "correct_chi2",
    "weighted_chi2",
    "signed_sqrt_mod_chi2",
]
ALL_METRICS = METRICS_TO_MAXIMIZE + METRICS_TO_MINIMIZE


def is_metric_to_maximize(metric):
    if isinstance(metric, str):
        metric = [metric]
    if all(m in METRICS_TO_MAXIMIZE for m in metric):
        return True
    if all(m in METRICS_TO_MINIMIZE for m in metric):
        return False
    raise ValueError(f"Metrics {metric} are not compatible")


def it_got_better(new_metric_val, old_metric_val, metric):
    if is_metric_to_maximize(metric):
        return new_metric_val > old_metric_val
    return new_metric_val < old_metric_val


def _clip(expected):
    return jnp.clip(jnp.asarray(expected), SMALL_POS, None)


# ---------------------------------------------------------------------------
# chi2 family
# ---------------------------------------------------------------------------
def chi2(actual, expected, variance=None):
    """Pearson chi2 = (a - e)^2 / e  (reference ``stats.py:98``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    return jnp.square(a - e) / e


def mod_chi2(actual, expected, variance=0.0):
    """(a - e)^2 / (sigma^2 + e)  (reference ``stats.py:651``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    return jnp.square(a - e) / (jnp.asarray(variance) + e)


def correct_chi2(actual, expected, variance=0.0):
    """mod_chi2 + log(sigma^2 + e): -2x log of normal approximation to
    Poisson incl. variance normalization (reference ``stats.py:697``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    total_var = jnp.asarray(variance) + e
    return jnp.square(a - e) / total_var + jnp.log(total_var)


def weighted_chi2(actual, expected, bin_unc2, variance=0.0):
    """(a - e)^2 / (sigma^2 + bin_unc2)  (reference ``stats.py:732``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    total_var = jnp.asarray(variance) + jnp.clip(
        jnp.asarray(bin_unc2), SMALL_POS, None
    )
    return jnp.square(a - e) / total_var


def signed_sqrt_mod_chi2(actual, expected, variance=0.0):
    """(a - e) / sqrt(sigma^2 + e)  (reference ``stats.py:762``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    return (a - e) / jnp.sqrt(jnp.asarray(variance) + e)


# ---------------------------------------------------------------------------
# llh family
# ---------------------------------------------------------------------------
def llh(actual, expected, variance=None):
    """Poisson llh with Stirling's approximation of ln(k!):
    a ln(e) - e - (a ln(a) - a)  (reference ``stats.py:169``).

    Exact for llh *differences*; NaN when a == 0 only via a*ln(a) -> handled
    as 0*log(0) = 0 (the reference produces NaN there; we use the well-defined
    limit so jit/grad stay finite)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    # Algebraically identical form built for floating point: with
    # x = (e - a)/a,   a ln(e) - e - (a ln(a) - a)  ==  a * (log1p(x) - x).
    # Near the minimum (e ~ a) the naive form computes an O(x^2) result by
    # cancelling O(a)-magnitude terms (fp32 noise ~ a*eps stalls gradient
    # fits); here the cancellation happens at x-magnitude instead, keeping
    # absolute accuracy ~ x*eps.
    safe_a = jnp.where(a > 0, a, 1.0)
    x = (e - safe_a) / safe_a
    per_bin = safe_a * (jnp.log1p(x) - x)
    # a == 0: a ln(e) - e - (a ln a - a) -> -e
    return jnp.where(a > 0, per_bin, -e)


def log_poisson(k, lam):
    """ln Poisson(k | lam) with exact ln(k!) via lgamma."""
    k = jnp.asarray(k)
    lam = jnp.asarray(lam)
    return k * jnp.log(lam) - lam - gammaln(k + 1.0)


def poisson_llh(actual, expected, variance=None):
    """Exact Poisson llh: a ln(e) - e - ln(a!)  (reference ``stats.py:255``)."""
    e = _clip(expected)
    a = jnp.asarray(actual)
    return a * jnp.log(e) - e - gammaln(a + 1.0)


def _poisson_gamma(data, sum_w, sum_w2, a=1.0, b=0.0):
    """Poisson-gamma mixture llh (Arguelles/Schneider/Yuan JHEP06(2019)030;
    reference ``pisa/utils/likelihood_functions.py:poisson_gamma``).

    a=b=0 -> L_Mean; a=1, b=0 -> L_Eff. Vectorized and branch-free for jit:
    - bad bins (w<=0 or w2<0): llh = -inf, except 0 when data==0
    - w2==0: exact Poisson limit
    """
    k = jnp.asarray(data)
    w = jnp.asarray(sum_w)
    w2 = jnp.asarray(sum_w2)

    bad = (w <= 0) | (w2 < 0)
    poisson_lim = (w2 == 0) & ~bad

    w2_safe = jnp.where(w2 > 0, w2, 1.0)
    alpha = jnp.square(w) / w2_safe + a
    beta = w / w2_safe + b
    L = (
        alpha * jnp.log(beta)
        + gammaln(k + alpha)
        - gammaln(k + 1.0)
        - (k + alpha) * jnp.log1p(beta)
        - gammaln(alpha)
    )

    L = jnp.where(poisson_lim, poisson_llh(k, w), L)
    L = jnp.where(bad, jnp.where(k == 0, 0.0, -jnp.inf), L)
    return L


def mcllh_mean(actual, expected, variance=0.0):
    """L_Mean of JHEP06(2019)030 table 2 (reference ``stats.py:328``)."""
    return _poisson_gamma(actual, _clip(expected), jnp.asarray(variance), a=0.0, b=0.0)


def mcllh_eff(actual, expected, variance=0.0):
    """L_Eff, eq. 3.16 of JHEP06(2019)030 (reference ``stats.py:384``)."""
    return _poisson_gamma(actual, _clip(expected), jnp.asarray(variance), a=1.0, b=0.0)


def barlow_llh(actual, expected, variance=0.0):
    """Barlow-Beeston llh (reference ``stats.py:598`` +
    ``pisa/utils/barlow.py:64``, after Barlow & Beeston,
    doi:10.1016/0010-4655(93)90005-W).

    Two input conventions:

    - single source (``expected``/``variance`` shaped like ``actual``):
      with unweighted counts N = e^2/var and weights w = var/e per bin,
      the stationary condition is closed-form (quadratic in the latent
      true MC count A), keeping this jit/grad-able;
    - **multi-source** (``expected``/``variance`` carrying a leading
      source axis, shape ``(n_sources,) + actual.shape``): the per-bin
      profile over the latent per-source counts A_j is solved by a
      vectorized safeguarded-Newton iteration on the Barlow-Beeston
      scalar equation (the reference solves the same objective per bin
      with scipy Powell inside ``Likelihoods.get_llh``).

    Returns the per-bin llh (summed/maximized by callers), 0-referenced by
    subtracting the saturated MC terms like the reference's barlowLLH.
    """
    d = jnp.asarray(actual)
    e_in = jnp.asarray(expected)
    if e_in.ndim == d.ndim + 1:
        return _barlow_llh_multi(d, e_in, variance)
    e = _clip(expected)
    var = jnp.clip(jnp.asarray(variance) + jnp.zeros_like(e), SMALL_POS, None)
    N = jnp.square(e) / var  # unweighted MC count
    w = var / e  # per-event weight
    # Single-source profile: L(A) = d ln(wA) - wA + N ln(A) - A;
    # dL/dA = d/A - w + N/A - 1 = 0  =>  A = (d + N) / (1 + w).
    A = (d + N) / (1.0 + w)
    f = jnp.clip(w * A, SMALL_POS, None)
    A = jnp.clip(A, SMALL_POS, None)
    llh_data = d * jnp.log(f) - f - gammaln(d + 1.0)
    llh_mc = N * jnp.log(A) - A - gammaln(N + 1.0)
    # subtract the saturated MC term so the metric is 0-referenced like the
    # reference's barlowLLH (which returns -llh for minimization; we return
    # the per-bin llh to be summed and maximized)
    llh_mc_sat = N * jnp.log(jnp.clip(N, SMALL_POS, None)) - N - gammaln(N + 1.0)
    return llh_data + llh_mc - llh_mc_sat


def barlow_solve_t(d, w, a, iterations=30):
    """Safeguarded-Newton solution of the Barlow-Beeston per-bin scalar
    equation (Barlow & Beeston 1993, eq. 13-16): find t such that

        g(t) = sum_j w_j a_j / (1 + w_j t) - d / (1 - t) = 0,

    whence the profiled latent counts are A_j = a_j / (1 + w_j t). g is
    strictly decreasing on the bracket (t_min, 1) with t_min =
    -1/max_j(w_j), so the root is unique; Newton steps are clipped into a
    shrinking sign-bracket, giving monotone convergence in fixed iteration
    count (jit/vmap/grad-able; d = 0 gives t = 1 exactly).

    Parameters
    ----------
    d : (...,) data counts
    w : (S, ...) per-event weight of each MC source in each bin
    a : (S, ...) observed unweighted MC counts per source
    """
    d = jnp.asarray(d, dtype=jnp.result_type(float))
    w = jnp.clip(jnp.asarray(w, dtype=d.dtype), SMALL_POS, None)
    a = jnp.asarray(a, dtype=d.dtype)

    # clamp the lower bracket for degenerate (all-empty-MC) bins so the
    # fixed-count bisection stays effective
    w_max = jnp.max(jnp.where(a > 0, w, SMALL_POS), axis=0)
    t_min = jnp.maximum(-1.0 / w_max, -1e6)
    eps = 1e-9

    def g_and_dg(t):
        u = 1.0 + w * t[None]
        u = jnp.where(u <= SMALL_POS, SMALL_POS, u)
        s = jnp.sum(w * a / u, axis=0)
        ds = -jnp.sum(jnp.square(w) * a / jnp.square(u), axis=0)
        one_m_t = jnp.clip(1.0 - t, SMALL_POS, None)
        g = s - d / one_m_t
        dg = ds - d / jnp.square(one_m_t)
        return g, dg

    lo = t_min + eps * jnp.abs(t_min)
    hi = jnp.ones_like(lo) - eps
    t = jnp.zeros_like(lo)

    def body(_, state):
        t, lo, hi = state
        g, dg = g_and_dg(t)
        # maintain the sign bracket: g(lo) > 0 > g(hi)
        lo = jnp.where(g > 0, t, lo)
        hi = jnp.where(g < 0, t, hi)
        t_newton = t - g / jnp.where(dg == 0, -1.0, dg)
        inside = (t_newton > lo) & (t_newton < hi)
        t_next = jnp.where(inside, t_newton, 0.5 * (lo + hi))
        return t_next, lo, hi

    t, lo, hi = jax.lax.fori_loop(0, iterations, body, (t, lo, hi))
    # d == 0: exact stationary point is t = 1 (A_j = a_j / (1 + w_j))
    return jnp.where(d > 0, t, jnp.ones_like(t))


def _barlow_llh_multi(d, e, variance):
    """Multi-source Barlow-Beeston per-bin llh; `e`/`variance` are
    (S, ...) per-source sumw / sumw2 stacks."""
    e = jnp.clip(e, SMALL_POS, None)
    var = jnp.clip(
        jnp.asarray(variance) + jnp.zeros_like(e), SMALL_POS, None
    )
    a = jnp.square(e) / var  # unweighted counts N_j
    w = var / e  # per-event weights w_j

    t = barlow_solve_t(d, w, a)
    A = a / jnp.clip(1.0 + w * t[None], SMALL_POS, None)
    f = jnp.clip(jnp.sum(w * A, axis=0), SMALL_POS, None)
    A = jnp.clip(A, SMALL_POS, None)

    llh_data = d * jnp.log(f) - f - gammaln(d + 1.0)
    llh_mc = jnp.sum(a * jnp.log(A) - A - gammaln(a + 1.0), axis=0)
    llh_mc_sat = jnp.sum(
        a * jnp.log(jnp.clip(a, SMALL_POS, None)) - a - gammaln(a + 1.0),
        axis=0,
    )
    return llh_data + llh_mc - llh_mc_sat


def conv_llh(actual, expected, variance=0.0, nsigma=3, steps=50):
    """Poisson llh convolved with a normal MC uncertainty, normalized to the
    same convolution evaluated at actual==expected
    (reference ``stats.py:558``). Vectorized trapezoid-free sum over a fixed
    grid of `steps` sigma-offsets, jit-able."""
    a = jnp.asarray(actual, dtype=jnp.result_type(float))
    e = jnp.clip(jnp.asarray(expected), SMALL_POS, None)
    s = jnp.clip(
        jnp.sqrt(jnp.asarray(variance) + jnp.zeros_like(e)), SMALL_POS, None
    )

    def norm_conv(k, lam, sig):
        st = 2 * steps + 1
        x = jnp.linspace(-nsigma * sig, nsigma * sig, st)[:-1] + (
            nsigma * sig / (st - 1.0)
        )
        lam_shift = jnp.clip(x + lam, SMALL_POS, None)
        log_pois = k * jnp.log(lam_shift) - lam_shift - gammaln(k + 1.0)
        log_gauss = -0.5 * jnp.square(x / sig) - jnp.log(
            sig * jnp.sqrt(2 * jnp.pi)
        )
        conv = jnp.sum(jnp.exp(log_pois + log_gauss))
        norm = jnp.sum(jnp.exp(log_gauss))
        cp = conv / norm
        # normalize continuous-k Poisson density at k=lam
        n1 = jnp.exp(lam * jnp.log(lam) - lam - gammaln(lam + 1.0))
        n2_x = jnp.clip(x + lam, SMALL_POS, None)
        n2_log_pois = lam * jnp.log(n2_x) - n2_x - gammaln(lam + 1.0)
        n2 = jnp.sum(jnp.exp(n2_log_pois + log_gauss)) / norm
        return cp * n1 / n2

    fn = jax.vmap(norm_conv)
    flat_a, flat_e, flat_s = a.ravel(), e.ravel(), s.ravel()
    num = fn(flat_a, flat_e, flat_s)
    den = fn(flat_a, jnp.clip(flat_a, SMALL_POS, None), flat_s)
    out = jnp.log(jnp.clip(num, SMALL_POS, None)) - jnp.log(
        jnp.clip(den, SMALL_POS, None)
    )
    return out.reshape(a.shape)


def generalized_poisson_llh(
    actual, expected=None, empty_bins=None, k_max=None, use_c=False
):
    """Generalized Poisson-gamma mixture llh (arXiv:1902.08831 eqs. 91/97;
    cf. reference ``stats.py:792`` + ``llh_defs/poisson_gamma.c``).

    See :mod:`pisa_tpu.utils.llh_defs` for the mixture implementation; this
    wrapper expects `expected` to be a mapping with entries computed by the
    ``likelihood.generalized_llh_params`` stage: 'llh_alphas', 'llh_betas',
    'weights', 'n_mc_events' — each an array of shape (n_sources, n_bins).
    `k_max` (static recursion length >= max data count) is required when
    `actual` is traced. ``use_c=True`` evaluates the mixture with the
    native C library (host-side; cf. the reference's ``stats.py:881``).
    """
    from pisa_tpu.utils.llh_defs.poisson import generalized_pg_llh

    return generalized_pg_llh(
        actual, expected, empty_bins=empty_bins, k_max=k_max, use_c=use_c
    )
