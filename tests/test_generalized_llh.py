"""
Generalized Poisson-gamma likelihood tests: closed-form single-source check,
probability normalization, gradient flow, and the stage-level alpha/beta
computation via segment sums.
"""

import numpy as np
import pytest

from pisa_tpu import FTYPE

_FP64 = FTYPE == np.float64
GLLH_RTOL = 1e-8 if _FP64 else 2e-4
GLLH_ATOL = 0.0 if _FP64 else 1e-5
from scipy.special import gammaln

import jax
import jax.numpy as jnp

from pisa_tpu.utils.llh_defs import (
    approximate_poisson_normal,
    generalized_pg_llh,
    generalized_pg_log_mixture,
)


def _single_pg_closed_form(k, alpha, beta):
    """Negative-binomial closed form of a single Poisson-gamma mixture
    (eq. 47 kernel of 1902.08831)."""
    return (
        gammaln(k + alpha)
        - gammaln(k + 1.0)
        - gammaln(alpha)
        + alpha * np.log(beta)
        - (alpha + k) * np.log(1.0 + beta)
    )


def test_single_source_matches_closed_form():
    ks = np.arange(0, 30)
    alpha, beta = 3.7, 0.8
    logp = np.asarray(
        generalized_pg_log_mixture(
            ks, np.full((30, 1), alpha), np.full((30, 1), beta)
        )
    )
    expected = _single_pg_closed_form(ks.astype(float), alpha, beta)
    assert np.allclose(logp, expected, rtol=GLLH_RTOL, atol=GLLH_ATOL)


def test_multi_source_normalization():
    """Probabilities over k must sum to ~1 for a multi-source mixture."""
    rng = np.random.RandomState(0)
    S = 4
    alphas = rng.uniform(0.5, 3.0, S)
    betas = rng.uniform(0.5, 2.0, S)
    K = 200
    ks = np.arange(K)
    logp = np.asarray(
        generalized_pg_log_mixture(
            ks, np.tile(alphas, (K, 1)), np.tile(betas, (K, 1))
        )
    )
    total = np.exp(logp).sum()
    assert abs(total - 1.0) < 1e-6


def test_against_direct_recursion():
    """Independent numpy transcription of the delta recursion (eq. 91)."""
    rng = np.random.RandomState(5)
    S, B = 3, 8
    alphas = rng.uniform(0.2, 5.0, (B, S))
    betas = rng.uniform(0.2, 3.0, (B, S))
    ks = rng.randint(0, 25, B)

    expected = np.empty(B)
    for b in range(B):
        q = 1.0 / (1.0 + betas[b])
        prefac = np.prod((betas[b] / (1.0 + betas[b])) ** alphas[b])
        deltas = [1.0]
        for i in range(1, ks[b] + 1):
            s = 0.0
            for j in range(1, i + 1):
                s += np.sum(alphas[b] * q**j) * deltas[i - j]
            deltas.append(s / i)
        expected[b] = np.log(prefac * deltas[ks[b]])

    got = np.asarray(generalized_pg_log_mixture(ks, alphas, betas))
    assert np.allclose(got, expected, rtol=GLLH_RTOL, atol=GLLH_ATOL)


def test_nan_sources_are_masked():
    ks = np.array([3, 5])
    alphas = np.array([[2.0, np.nan], [2.0, 1.5]])
    betas = np.array([[1.0, np.nan], [1.0, 0.7]])
    logp = np.asarray(generalized_pg_log_mixture(ks, alphas, betas))
    # first bin must equal the single-source closed form
    assert np.isclose(logp[0], _single_pg_closed_form(3.0, 2.0, 1.0))
    assert np.isfinite(logp).all()


def test_llh_differentiable():
    def f(alpha):
        a = jnp.stack([jnp.full((5,), alpha)], axis=1)
        b = jnp.ones((5, 1))
        return jnp.sum(
            generalized_pg_log_mixture(np.arange(5), a, b, k_max=5)
        )

    g = jax.grad(f)(2.0)
    eps = 1e-4
    fd = (f(2.0 + eps) - f(2.0 - eps)) / (2 * eps)
    assert np.isclose(float(g), float(fd), rtol=1e-3 if _FP64 else 5e-2)


def test_generalized_pg_llh_branching():
    B, S = 6, 2
    rng = np.random.RandomState(2)
    weights = rng.uniform(5, 10, (S, B))
    alphas = rng.uniform(1, 3, (S, B))
    betas = rng.uniform(0.5, 1.5, (S, B))
    n_mc = np.full((S, B), 500.0)
    n_mc[:, 0] = 5  # low-stat bin -> mixture branch
    n_mc[:, 1] = 0  # empty bin
    expected = {
        "weights": weights,
        "llh_alphas": alphas,
        "llh_betas": betas,
        "n_mc_events": n_mc,
    }
    actual = np.array([3, 4, 12, 15, 18, 14])
    llh = np.asarray(generalized_pg_llh(actual, expected))
    assert llh.shape == (B,)
    # empty bin with data -> big penalty
    assert llh[1] == pytest.approx(np.log(1e-10))
    # high-stat bins: saturated poisson (<= 0, near 0 when k ~ sum w)
    assert np.all(llh[2:] <= 1e-9)
    assert np.isfinite(llh).all()


def test_approximate_poisson_normal_close_to_mixture():
    """For moderately high alpha the normal approximation should be close
    to the exact mixture."""
    alpha, beta = 60.0, 1.2  # mean = 50
    ks = np.array([40, 50, 60])
    a = np.full((3, 1), alpha)
    b = np.full((3, 1), beta)
    exact = np.asarray(generalized_pg_log_mixture(ks, a, b))
    approx = np.asarray(approximate_poisson_normal(ks, a, b))
    assert np.allclose(exact, approx, atol=0.15)


def test_stage_alpha_beta_computation():
    """generalized_llh_params via a toy container pipeline."""
    from pisa_tpu import ureg
    from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
    from pisa_tpu.core.container import Container, ContainerSet
    from pisa_tpu.stages.likelihood.generalized_llh_params import (
        generalized_llh_params,
    )
    from pisa_tpu.stages.utils.add_indices import add_indices

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "reco_energy", num_bins=4, is_log=True,
                domain=[1, 100] * ureg.GeV,
            )
        ],
        name="b",
    )
    rng = np.random.RandomState(0)
    c = Container("numu_cc", representation="events")
    n = 50
    c["reco_energy"] = 10 ** rng.uniform(0, 1.8, n)  # leaves last bin empty
    c["weights"] = rng.uniform(0.5, 1.5, n)
    cs = ContainerSet("test", [c])

    idx_stage = add_indices(calc_mode=binning, apply_mode="events")
    idx_stage.data = cs
    idx_stage.setup()
    idx_stage.run()

    cs.representation = "events"
    idx = np.asarray(c["bin_indices"])
    w_ev = np.asarray(c["weights"]).copy()

    llh_stage = generalized_llh_params(calc_mode="events", apply_mode=binning)
    llh_stage.data = cs
    llh_stage.setup()
    llh_stage.run()

    cs.representation = binning
    alphas = np.asarray(c["llh_alphas"])
    betas = np.asarray(c["llh_betas"])
    n_mc = np.asarray(c["n_mc_events"])
    w = np.asarray(c["weights"])
    assert alphas.shape == (4,)
    assert np.all(alphas > 0) and np.all(betas > 0)

    # manual check for bin 0
    in0 = idx == 0
    n0 = in0.sum()
    mean_w = w_ev[in0].mean()
    var_w = ((w_ev[in0] - mean_w) ** 2).sum() / n0
    var_z = var_w + mean_w**2
    assert np.isclose(betas[0], mean_w / var_z, rtol=1e-6)
    assert np.isclose(alphas[0], n0 * mean_w**2 / var_z, rtol=1e-6)
    assert n_mc[0] == n0

    # empty bins got the pseudo-weight
    empty = n_mc == 0
    if empty.any():
        assert np.allclose(w[empty], 0.001)


class TestNativeCMixture:
    """The native C library (poisson_gamma.c, use_c=True — the host path
    mirroring the reference's compiled extension) must agree with the JAX
    recursion."""

    def test_c_matches_jax_recursion(self):
        from pisa_tpu.utils.llh_defs.native import available, pg_log_mixture_c
        from pisa_tpu.utils.llh_defs.poisson import (
            generalized_pg_log_mixture,
        )

        if not available():
            pytest.skip("no C compiler / native lib")
        rng = np.random.RandomState(4)
        B, S = 40, 3
        k = rng.randint(0, 30, B)
        alphas = rng.uniform(0.5, 20.0, (B, S))
        betas = rng.uniform(0.2, 5.0, (B, S))
        # some masked sources (non-finite / non-positive beta)
        alphas[3, 1] = np.nan
        betas[7, 2] = 0.0
        got = pg_log_mixture_c(k, alphas, betas)
        want = np.asarray(
            generalized_pg_log_mixture(
                k, jnp.asarray(alphas), jnp.asarray(betas),
                k_max=int(k.max()),
            )
        )
        # C computes in fp64 always; the JAX side runs at FTYPE
        if _FP64:
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        else:
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_use_c_path_through_stats(self):
        from pisa_tpu.utils import stats
        from pisa_tpu.utils.llh_defs.native import available

        if not available():
            pytest.skip("no C compiler / native lib")
        rng = np.random.RandomState(5)
        B, S = 12, 2
        expected = {
            "weights": rng.uniform(1, 5, (S, B)),
            "llh_alphas": rng.uniform(1, 10, (S, B)),
            "llh_betas": rng.uniform(0.5, 2, (S, B)),
            "n_mc_events": np.full((S, B), 50.0),  # low-stat branch
        }
        k = rng.randint(0, 12, B)
        via_c = np.asarray(
            stats.generalized_poisson_llh(k, expected, use_c=True)
        )
        via_jax = np.asarray(
            stats.generalized_poisson_llh(k, expected, k_max=int(k.max()))
        )
        np.testing.assert_allclose(via_c, via_jax, rtol=1e-6, atol=1e-6)
