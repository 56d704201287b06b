"""
KDE-smoothed histograms.

Rebuild of the reference ``pisa/utils/kde_hist.py`` (``get_hist:35``,
``kde_histogramdd:220``), which delegates the density estimate to the
external CUDA ``kde`` package (``from kde.cudakde import gaussian_kde,
bootstrap_kde``). Here the adaptive weighted Gaussian KDE itself is
implemented natively in JAX:

- diagonal bandwidth matrix, per-dimension Scott/Silverman factors from the
  weighted sample standard deviation and effective sample size;
- Abramson-style adaptive local bandwidths: a fixed-bandwidth pilot density
  is evaluated at the sample points and local scale factors
  ``lambda_i = (pilot_i / g)^(-alpha)`` (g = geometric mean) widen kernels
  in low-density regions;
- evaluation is one jitted einsum-shaped (N_events x N_gridpoints)
  elementwise contraction — the natural TPU layout.

The histogram conveniences mirror the reference exactly: coszen reflection
at the +-1 edges (fraction of bins mirrored and folded back), evaluation at
(oversampled) bin centers scaled by bin volumes, per-PID-bin stacking, and
bootstrap error estimation by multinomial resampling.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pisa_tpu.core.binning import MultiDimBinning

__all__ = ["adaptive_gaussian_kde", "get_hist", "kde_histogramdd"]


@partial(jax.jit, static_argnames=("bw_method", "adaptive"))
def adaptive_gaussian_kde(
    x, weights, points, bw_method="scott", adaptive=True, alpha=0.3
):
    """Weighted (adaptive) Gaussian KDE evaluated at `points`.

    Parameters
    ----------
    x : (D, N) sample
    weights : (N,) weights (need not be normalized)
    points : (D, G) evaluation points
    bw_method : 'scott' or 'silverman'
    adaptive : bool — Abramson local bandwidths
    alpha : float — adaptivity exponent

    Returns
    -------
    (G,) density, normalized to integrate to 1.
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    points = jnp.atleast_2d(jnp.asarray(points))
    d, n = x.shape
    w = jnp.asarray(weights)
    w = w / jnp.sum(w)
    n_eff = 1.0 / jnp.sum(w**2)

    # weighted per-dimension std
    mean = jnp.sum(w[None, :] * x, axis=1)
    var = jnp.sum(w[None, :] * (x - mean[:, None]) ** 2, axis=1)
    sigma = jnp.sqrt(var)

    if bw_method == "scott":
        factor = n_eff ** (-1.0 / (d + 4))
    elif bw_method == "silverman":
        factor = (n_eff * (d + 2.0) / 4.0) ** (-1.0 / (d + 4))
    else:
        raise ValueError(f"unknown bw_method {bw_method!r}")
    h = sigma * factor  # (D,)
    h = jnp.clip(h, 1e-30, None)

    def density_at(pts, lam):
        # pts (D, M); lam (N,) local bandwidth scales
        # z2[i, m] = sum_d ((pts[d,m] - x[d,i]) / (h_d lam_i))^2
        diff = (pts[:, None, :] - x[:, :, None]) / h[:, None, None]
        z2 = jnp.sum(diff**2, axis=0) / lam[:, None] ** 2  # (N, M)
        kern = jnp.exp(-0.5 * z2)
        norm = (2.0 * jnp.pi) ** (d / 2.0) * jnp.prod(h) * lam**d
        return jnp.sum((w / norm)[:, None] * kern, axis=0)

    ones = jnp.ones(n, dtype=x.dtype)
    if adaptive:
        pilot = density_at(x, ones)  # pilot at sample points
        # dtype-aware floor: a 1e-300 literal underflows to 0 in fp32,
        # turning log(pilot) into -inf and 0-weight terms into NaN
        tiny = jnp.finfo(x.dtype).tiny
        log_pilot = jnp.log(jnp.clip(pilot, tiny, None))
        log_g = jnp.sum(w * log_pilot)
        lam = jnp.exp(-alpha * (log_pilot - log_g))
    else:
        lam = ones
    return density_at(points, lam)


def get_hist(
    sample,
    binning,
    weights=None,
    bw_method="scott",
    adaptive=True,
    alpha=0.3,
    use_cuda=False,  # accepted for API compat; ignored (XLA picks devices)
    coszen_reflection=0.25,
    coszen_name="coszen",
    oversample=1,
    bootstrap=False,
    bootstrap_niter=10,
    bootstrap_seed=None,
):
    """KDE histogram with coszen-edge reflection
    (cf. reference ``kde_hist.py:35-218``).

    sample : (N, D) array ordered like `binning`; returns an array of
    `binning.shape` (pre-oversampling), scaled to sum(weights).
    """
    sample = np.asarray(sample)
    if bootstrap and oversample > 1:
        raise ValueError("Bootstrapping cannot be combined with oversampling.")

    n_evts = sample.shape[0]
    if weights is None or len(np.atleast_1d(weights)) == 0:
        weights = np.ones(n_evts)
        norm = n_evts
    else:
        weights = np.nan_to_num(np.asarray(weights, dtype=np.float64))
        norm = np.sum(weights)

    out_shape = binning.shape
    binning = binning.oversample(oversample)
    x = sample.T.copy()  # (D, N)
    if x.shape[0] != len(binning.names):
        raise ValueError("sample dims != binning dims")

    names = list(binning.names)
    cz_bin = names.index(coszen_name) if coszen_name in names else None
    if cz_bin is None:
        raise ValueError(f"binning must contain {coszen_name!r}")

    # move coszen to axis 0
    if cz_bin != 0:
        order = [cz_bin] + [i for i in range(len(names)) if i != cz_bin]
        binning = MultiDimBinning([binning[names[i]] for i in order])
        x = x[order]

    cz_dim = binning[coszen_name]
    n_refl = int(cz_dim.num_bins * float(coszen_reflection))
    reflect_lower = (
        float(cz_dim.bin_edges[0].magnitude) == -1.0 and n_refl > 0
    )
    reflect_upper = (
        float(cz_dim.bin_edges[-1].magnitude) == 1.0 and n_refl > 0
    )

    bin_points = []
    l = 0
    for b in binning:
        c = np.asarray(b.weighted_centers.magnitude)
        if b.name == coszen_name:
            l = int(len(c) * float(coszen_reflection))
            c0 = 2 * c[0] - c[1 : l + 1][::-1] if reflect_lower else []
            c1 = 2 * c[-1] - c[-l - 1 : -1][::-1] if reflect_upper else []
            c = np.concatenate([c0, c, c1])
        bin_points.append(c)

    ext_shape = (
        binning.shape[0] + (int(reflect_lower) + int(reflect_upper)) * l,
    ) + tuple(binning.shape[1:])
    grid = np.meshgrid(*bin_points, indexing="ij")
    points = np.stack([g.ravel() for g in grid])  # (D, G)

    def evaluate(w):
        dens = np.asarray(
            adaptive_gaussian_kde(
                x, w, points,
                bw_method=bw_method, adaptive=adaptive, alpha=alpha,
            )
        )
        return dens.reshape(ext_shape)

    def apply_reflection(h):
        pad = np.zeros((binning.shape[0] - l,) + tuple(binning.shape[1:]))
        if reflect_lower:
            h0 = np.concatenate([pad, h[:l]], axis=0)[::-1]
            h = h[l:]
        else:
            h0 = 0
        if reflect_upper:
            h1 = np.concatenate([h[-l:], pad], axis=0)[::-1]
            h = h[:-l]
        else:
            h1 = 0
        return h + h0 + h1

    volume = binning.bin_volumes(attach_units=False)

    if bootstrap:
        rng = np.random.default_rng(bootstrap_seed)
        hists = []
        for _ in range(bootstrap_niter):
            idx = rng.integers(n_evts, size=n_evts)
            counts = np.bincount(idx, minlength=n_evts)
            hists.append(apply_reflection(evaluate(weights * counts)))
        hists = np.stack(hists)
        hist = hists.mean(axis=0) * volume
        errors = hists.std(axis=0) * volume
    else:
        hist = apply_reflection(evaluate(weights)) * volume

    if oversample != 1:
        for i, b in enumerate(binning):
            hist = np.add.reduceat(
                hist, np.arange(0, len(b.bin_edges) - 1, oversample), axis=i
            )

    if cz_bin != 0:
        hist = np.swapaxes(hist, 0, cz_bin)
        if bootstrap:
            errors = np.swapaxes(errors, 0, cz_bin)

    if bootstrap:
        return hist * norm, errors * norm
    return hist * norm


def kde_histogramdd(
    sample,
    binning,
    weights=None,
    bw_method="scott",
    adaptive=True,
    alpha=0.3,
    use_cuda=False,
    coszen_reflection=0.25,
    coszen_name="coszen",
    oversample=1,
    stack_pid=True,
    bootstrap=False,
    bootstrap_niter=10,
    bootstrap_seed=None,
):
    """N-dim KDE histogram; with `stack_pid` the 'pid' dimension is treated
    as separate channels, each KDE'd in the remaining dimensions
    (cf. reference ``kde_hist.py:220-341``)."""
    sample = np.asarray(sample)
    if weights is not None and len(np.atleast_1d(weights)) not in (
        0, sample.shape[0],
    ):
        raise ValueError("length of sample and weights incompatible")

    kwargs = dict(
        bw_method=bw_method, adaptive=adaptive, alpha=alpha,
        coszen_reflection=coszen_reflection, coszen_name=coszen_name,
        oversample=oversample, bootstrap=bootstrap,
        bootstrap_niter=bootstrap_niter, bootstrap_seed=bootstrap_seed,
    )
    if not stack_pid:
        return get_hist(sample, binning, weights=weights, **kwargs)

    names = list(binning.names)
    pid_bin = names.index("pid")
    pid_dim = binning[names[pid_bin]]
    pid_edges = np.asarray(pid_dim.bin_edges.magnitude)
    other = [i for i in range(len(names)) if i != pid_bin]
    other_binning = MultiDimBinning([binning[names[i]] for i in other])

    hists, errs = [], []
    for k in range(len(pid_edges) - 1):
        mask = (sample[:, pid_bin] >= pid_edges[k]) & (
            sample[:, pid_bin] < pid_edges[k + 1]
        )
        sub = sample[mask][:, other]
        w = None if weights is None else np.asarray(weights)[mask]
        res = get_hist(sub, other_binning, weights=w, **kwargs)
        if bootstrap:
            hists.append(res[0])
            errs.append(res[1])
        else:
            hists.append(res)

    def stack_back(channel_hists):
        stacked = np.stack(channel_hists, axis=0)  # (pid, ...)
        # move pid channel to its original axis position
        return np.moveaxis(stacked, 0, pid_bin)

    if bootstrap:
        return stack_back(hists), stack_back(errs)
    return stack_back(hists)
