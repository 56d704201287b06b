"""
KDE tests (port the semantics of the reference ``kde_hist.py:396``
test_kde_histogramdd and ``pisa_tests/test_kde_stage.py``): normalization,
density accuracy, coszen reflection, PID stacking, bootstrap errors, and
stage stash scaling.
"""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning
from pisa_tpu.utils.kde import adaptive_gaussian_kde, kde_histogramdd


@pytest.fixture
def binning():
    e = OneDimBinning("energy", num_bins=10, is_lin=True, domain=[0, 10])
    cz = OneDimBinning("coszen", num_bins=8, is_lin=True, domain=[-1, 1])
    return MultiDimBinning([e, cz], name="kde_b")


def test_kde_density_matches_gaussian():
    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, (1, 4000))
    pts = np.linspace(-3, 3, 25)[None, :]
    dens = np.asarray(
        adaptive_gaussian_kde(x, np.ones(4000), pts, adaptive=True, alpha=0.3)
    )
    truth = np.exp(-0.5 * pts[0] ** 2) / np.sqrt(2 * np.pi)
    assert np.allclose(dens, truth, atol=0.03)


def test_weighted_kde_uses_weights():
    rng = np.random.RandomState(1)
    # two clusters; weights kill the second one
    x = np.concatenate([rng.normal(-2, 0.5, 2000), rng.normal(2, 0.5, 2000)])
    w = np.concatenate([np.ones(2000), np.zeros(2000)])
    pts = np.array([[-2.0, 2.0]])
    dens = np.asarray(adaptive_gaussian_kde(x[None], w, pts))
    assert dens[0] > 20 * dens[1]


def test_kde_histogramdd_normalization(binning):
    rng = np.random.RandomState(2)
    n = 5000
    sample = np.stack(
        [rng.uniform(1, 9, n), rng.uniform(-0.9, 0.9, n)], axis=1
    )
    weights = rng.uniform(0.5, 1.5, n)
    hist = kde_histogramdd(
        sample, binning, weights=weights, stack_pid=False, oversample=2
    )
    assert hist.shape == tuple(binning.shape)
    # normalization close to total weight (bleed-out at edges allowed)
    assert np.isclose(hist.sum(), weights.sum(), rtol=0.1)
    assert np.all(hist >= 0)


def test_coszen_reflection_conserves_events(binning):
    """Without reflection, density bleeds past the +-1 coszen edges; the
    reflection folds it back in."""
    rng = np.random.RandomState(3)
    n = 4000
    sample = np.stack(
        [rng.uniform(3, 7, n), rng.uniform(-1, 1, n)], axis=1
    )
    h_refl = kde_histogramdd(
        sample, binning, stack_pid=False, coszen_reflection=0.25
    )
    h_norefl = kde_histogramdd(
        sample, binning, stack_pid=False, coszen_reflection=0.0
    )
    # reflection recovers the mass lost at the edges
    assert h_refl.sum() > h_norefl.sum()
    assert np.isclose(h_refl.sum(), n, rtol=0.05)


def test_stack_pid():
    e = OneDimBinning("energy", num_bins=6, is_lin=True, domain=[0, 10])
    cz = OneDimBinning("coszen", num_bins=5, is_lin=True, domain=[-1, 1])
    pid = OneDimBinning("pid", bin_edges=[-0.5, 0.5, 1.5])
    binning = MultiDimBinning([e, cz, pid], name="b3")
    rng = np.random.RandomState(4)
    n = 3000
    sample = np.stack(
        [
            rng.uniform(1, 9, n),
            rng.uniform(-0.9, 0.9, n),
            (rng.uniform(size=n) > 0.3).astype(float),
        ],
        axis=1,
    )
    hist = kde_histogramdd(sample, binning, stack_pid=True)
    assert hist.shape == (6, 5, 2)
    # channel totals match the event split
    n1 = (sample[:, 2] == 1).sum()
    assert np.isclose(hist[..., 1].sum(), n1, rtol=0.1)


def test_bootstrap_errors(binning):
    rng = np.random.RandomState(5)
    n = 800
    sample = np.stack(
        [rng.uniform(1, 9, n), rng.uniform(-0.9, 0.9, n)], axis=1
    )
    hist, errors = kde_histogramdd(
        sample, binning, stack_pid=False, bootstrap=True, bootstrap_niter=5,
        bootstrap_seed=9,
    )
    assert errors.shape == hist.shape
    assert np.all(errors >= 0)
    assert errors[hist > 0].mean() > 0
    # relative errors should be roughly Poisson-ish, not crazy
    rel = errors[hist > 1] / hist[hist > 1]
    assert 0.001 < np.median(rel) < 1.0


def test_kde_stage_with_stash():
    from pisa_tpu.core.container import Container, ContainerSet
    from pisa_tpu.stages.utils.kde import kde as kde_stage

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "reco_energy", num_bins=5, is_log=True,
                domain=[1, 100] * ureg.GeV,
            ),
            OneDimBinning(
                "reco_coszen", num_bins=5, is_lin=True, domain=[-1, 1]
            ),
        ],
        name="kde_test",
    )
    rng = np.random.RandomState(0)
    n = 1500
    c = Container("numu_cc", representation="events")
    c["reco_energy"] = 10 ** rng.uniform(0.2, 1.8, n)
    c["reco_coszen"] = rng.uniform(-1, 1, n)
    c["weights"] = np.ones(n)
    cs = ContainerSet("test", [c])

    stage = kde_stage(
        calc_mode="events", apply_mode=binning, stack_pid=False,
        oversample=2, stash_hists=True,
    )
    stage.data = cs
    stage.setup()
    stage.run()
    cs.representation = binning
    h1 = np.asarray(c["weights"]).copy()
    assert np.isclose(h1.sum(), n, rtol=0.1)

    # stashed: rerunning after doubling event weights must NOT change the
    # output (stash ignores upstream) — that's the stash contract
    cs.representation = "events"
    c["weights"] = np.full(n, 2.0)
    stage.run()
    cs.representation = binning
    h2 = np.asarray(c["weights"])
    assert np.allclose(h1, h2)


class TestVbwkde:
    """ISJ/vbwkde tests (cf. reference vbwkde.py:112-380)."""

    def test_isj_bandwidth_on_gaussian(self):
        # for a standard normal, the optimal (AMISE) bandwidth is
        # (4/(3n))^(1/5) * sigma
        from pisa_tpu.utils.vbwkde import fbwkde

        rng = np.random.RandomState(0)
        n = 4000
        data = rng.normal(0, 1, n)
        bw, _, _ = fbwkde(data, n_dct=1024)
        expected = (4.0 / (3 * n)) ** 0.2
        assert 0.5 * expected < bw < 2.0 * expected

    def test_fbwkde_density_normalized_and_accurate(self):
        from pisa_tpu.utils.vbwkde import fbwkde

        rng = np.random.RandomState(1)
        data = rng.normal(0, 1, 4000)
        bw, x, dens = fbwkde(data, n_dct=1024)
        assert np.isclose(np.trapezoid(dens, x), 1.0, rtol=1e-2)
        truth = np.exp(-0.5 * x**2) / np.sqrt(2 * np.pi)
        sel = np.abs(x) < 2
        assert np.allclose(dens[sel], truth[sel], atol=0.03)

    def test_vbwkde_bimodal(self):
        from pisa_tpu.utils.vbwkde import vbwkde

        rng = np.random.RandomState(2)
        data = np.concatenate(
            [rng.normal(-3, 0.5, 2000), rng.normal(3, 1.0, 2000)]
        )
        bws, x, dens = vbwkde(data, n_dct=1024)
        assert bws.shape == data.shape
        assert np.all(bws > 0)
        # density integrates to ~1 and finds both modes
        assert np.isclose(np.trapezoid(dens, x), 1.0, rtol=2e-2)
        mode_lo = x[np.argmax(dens * (x < 0))]
        mode_hi = x[np.argmax(dens * (x > 0))]
        assert abs(mode_lo + 3) < 0.3
        assert abs(mode_hi - 3) < 0.4


# -- ADVICE round-2 regressions ---------------------------------------------


def test_zero_weight_channel_gives_zeros_not_nan():
    """An empty PID channel selected by weight zeroing must produce a zero
    histogram (like the reference's masked path), not NaN — and its NaN
    coordinates must not poison other channels (ADVICE r2: kde.py:377)."""
    rng = np.random.RandomState(3)
    n = 500
    e = rng.uniform(1, 9, n)
    cz = rng.uniform(-0.9, 0.9, n)
    pid = np.zeros(n)  # every event in the first PID channel
    # a NaN coordinate on one (zero-weight-in-channel-2) event
    e[0] = np.nan
    w = np.ones(n)
    w[0] = 0.0
    sample = np.stack([e, cz, pid], axis=1)
    binning = MultiDimBinning(
        [
            OneDimBinning("energy", num_bins=6, is_lin=True, domain=[0, 10]),
            OneDimBinning(
                "coszen", num_bins=4, is_lin=True, domain=[-1, 1]
            ),
            OneDimBinning("pid", bin_edges=[-0.5, 0.5, 1.5]),
        ],
        name="kde_pid",
    )
    h = np.asarray(
        kde_histogramdd(sample, binning, weights=w, stack_pid=True)
    )
    assert h.shape == tuple(binning.shape)
    assert np.all(np.isfinite(h)), "NaN leaked out of an empty PID channel"
    # channel 2 (pid in [0.5, 1.5)) holds no events -> all zeros
    assert np.all(h[:, :, 1] == 0.0)
    # channel 1 carries the weight total (minus KDE mass leaking past the
    # binning domain edges — a property of the KDE, not of the guard)
    assert np.isclose(h[:, :, 0].sum(), w.sum(), rtol=2e-2)


def test_kde_coszen_axis_geq_2_roundtrip():
    """With coszen at axis >= 2 (stack_pid=False) the output axes must be in
    the binning's order — the move-to-front permutation must be inverted
    with moveaxis, not swapaxes (ADVICE r2: kde.py:231)."""
    rng = np.random.RandomState(4)
    n = 800
    cols = {
        "a": rng.uniform(0, 1, n),
        "b": rng.uniform(0, 1, n),
        "coszen": rng.uniform(-1, 1, n),
    }
    w = rng.uniform(0.5, 1.5, n)

    def dim(name, nb, domain):
        return OneDimBinning(name, num_bins=nb, is_lin=True, domain=domain)

    # distinct per-axis bin counts make any axis permutation detectable
    b_last = MultiDimBinning(
        [dim("a", 3, [0, 1]), dim("b", 4, [0, 1]),
         dim("coszen", 5, [-1, 1])],
        name="cz_last",
    )
    b_first = MultiDimBinning(
        [dim("coszen", 5, [-1, 1]), dim("a", 3, [0, 1]),
         dim("b", 4, [0, 1])],
        name="cz_first",
    )
    s_last = np.stack([cols[d.name] for d in b_last], axis=1)
    s_first = np.stack([cols[d.name] for d in b_first], axis=1)
    kw = dict(weights=w, stack_pid=False, coszen_reflection=0.25)
    h_last = np.asarray(kde_histogramdd(s_last, b_last, **kw))
    h_first = np.asarray(kde_histogramdd(s_first, b_first, **kw))
    assert h_last.shape == (3, 4, 5)
    assert h_first.shape == (5, 3, 4)
    # same physics, axes permuted: moving coszen to the front must match
    np.testing.assert_allclose(
        np.moveaxis(h_last, 2, 0), h_first, rtol=1e-5, atol=1e-8
    )


def test_kde_stage_stash_refuses_tracing():
    """stash_hists=True inside a compiled template raises a clear TypeError
    instead of ConcretizationTypeError / silently baking stale constants
    (ADVICE r2: stages/utils/kde.py:181)."""
    import jax

    from pisa_tpu.stages.utils.kde import init_test

    stage = init_test()
    stage.stash_hists = True

    def traced(_):
        stage.apply_function()
        return _

    with pytest.raises(TypeError, match="stash_hists"):
        jax.jit(traced)(0.0)


def test_cached_hist_matrix_element_budget(monkeypatch):
    """The dense one-hot histogram matrix is refused when
    n_events * n_bins exceeds the element budget, not only when
    n_bins > max_bins (ADVICE r2: container.py:351)."""
    from pisa_tpu.core.container import Container

    n = 1000
    rng = np.random.RandomState(5)
    c = Container("t", representation="events")
    c["energy"] = rng.uniform(0, 10, n)
    c["weights"] = np.ones(n)
    binning = MultiDimBinning(
        [OneDimBinning("energy", num_bins=16, is_lin=True, domain=[0, 10])],
        name="budget",
    )
    monkeypatch.setenv("PISA_TPU_HIST_MATMUL_MAX_ELEMS", str(n * 16 - 1))
    assert c.cached_hist_matrix(binning) is None
    monkeypatch.setenv("PISA_TPU_HIST_MATMUL_MAX_ELEMS", str(n * 16))
    m = c.cached_hist_matrix(binning)
    assert m is not None and m.shape == (n, 16)
