"""
Hypersurfaces: per-bin parameterization of discrete detector systematics.

Rebuild of the reference subsystem
(``pisa/utils/hypersurface/hypersurface.py:81-206`` functional forms, ``:208``
Hypersurface, ``:356`` evaluate, ``:477`` fit, ``:1598`` fit_hypersurfaces,
``:2065`` data-release CSV loading).

TPU-first redesign:

- A hypersurface over B bins is stored as stacked arrays — intercept ``(B,)``
  and one ``(B, nargs)`` coefficient block per systematic parameter — not B
  per-bin python objects.
- ``evaluate`` is pure jnp and therefore traceable/differentiable: the
  ``discr_sys.hypersurfaces`` stage's scale factors flow through compiled
  templates, making detector systematics fittable with analytic gradients.
- ``fit`` replaces the reference's per-bin iminuit Migrad loop with a
  vmapped, jitted Gauss-Newton over all bins simultaneously; per-bin
  covariance comes from the (damped) normal matrix at the optimum.
- Serialization (JSON, with covariance) and the official data-release CSV
  format (linear hyperplanes) are both supported.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from pisa_tpu import FTYPE
from pisa_tpu.utils.jsons import from_json, to_json
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = [
    "HYPERSURFACE_FUNCS",
    "Hypersurface",
    "fit_hypersurfaces_from_maps",
    "load_hypersurfaces",
    "prepare_interpolated_fit",
    "run_interpolated_fit",
    "get_incomplete_job_idx",
    "assemble_interpolated_fits",
]


# -- functional forms (cf. reference hypersurface.py:81-206) -----------------
# each: f(p, coeffts[..., nargs]) -> contribution; pure jnp, differentiable

def _linear(p, c):
    return c[..., 0] * p


def _quadratic(p, c):
    return c[..., 0] * p + c[..., 1] * p**2


def _exponential(p, c):
    return jnp.exp(c[..., 0] * p) - 1.0


def _exponential_scaled(p, c):
    return (c[..., 0] + 1.0) * (jnp.exp(c[..., 1] * p) - 1.0)


def _logarithmic(p, c):
    return jnp.log1p(c[..., 0] * p)


HYPERSURFACE_FUNCS = OrderedDict(
    [
        ("linear", (_linear, 1)),
        ("quadratic", (_quadratic, 2)),
        ("exponential", (_exponential, 1)),
        ("exponential_scaled", (_exponential_scaled, 2)),
        ("logarithmic", (_logarithmic, 1)),
    ]
)


#: (func_names, ncoeff, gn_iterations, damping) -> jitted vmapped
#: Gauss-Newton bin fitter; see Hypersurface.fit
_BIN_FITTER_CACHE = {}


def _get_bin_fitter(func_names, ncoeff, gn_iterations, damping):
    """Build (or fetch) the compiled all-bins Gauss-Newton fitter for one
    fit structure. `func_names` is an ordered tuple of
    (param_name, functional_form_name); the shifted parameter values are
    traced arguments so the same executable serves any dataset ensemble
    of the same cardinality (repeated ensemble fits reuse one
    executable instead of re-jitting per Hypersurface instance)."""
    key = (func_names, ncoeff, gn_iterations, damping)
    if key in _BIN_FITTER_CACHE:
        return _BIN_FITTER_CACHE[key]

    # packing order is positional, matching Hypersurface._unpack's
    # param_names order
    forms = [HYPERSURFACE_FUNCS[f][0] for _n, f in func_names]
    sizes = [HYPERSURFACE_FUNCS[f][1] for _n, f in func_names]

    def unpack(theta_row):
        intercept = theta_row[0]
        blocks, ofs = [], 1
        for sz in sizes:
            blocks.append(theta_row[ofs:ofs + sz])
            ofs += sz
        return intercept, blocks

    def surface(theta_row, shifted_tuple):
        intercept, blocks = unpack(theta_row)
        total = intercept
        for fn, sv, blk in zip(forms, shifted_tuple, blocks):
            total = total + fn(sv, blk)
        return total

    def bin_fit(y_b, w_b, theta0, shifted_tuple):
        def predict(theta):
            return surface(theta, shifted_tuple)

        def gn_step(theta, _):
            r = y_b - predict(theta)
            J = jax.jacfwd(predict)(theta)  # (D, ncoeff)
            JW = J * w_b[:, None]
            A = JW.T @ J + damping * jnp.eye(ncoeff, dtype=theta.dtype)
            g = JW.T @ r
            return theta + jnp.linalg.solve(A, g), None

        theta, _ = jax.lax.scan(
            gn_step, theta0, None, length=gn_iterations
        )
        # covariance from the normal matrix at the optimum
        J = jax.jacfwd(predict)(theta)
        JW = J * w_b[:, None]
        A = JW.T @ J + damping * jnp.eye(ncoeff, dtype=theta.dtype)
        cov = jnp.linalg.inv(A)
        return theta, cov

    fitter = jax.jit(
        jax.vmap(bin_fit, in_axes=(1, 1, None, None))
    )
    _BIN_FITTER_CACHE[key] = fitter
    return fitter


class Hypersurface:
    """Stacked per-bin hypersurfaces: ``scale_b = intercept_b +
    sum_k f_k(p_k - nominal_k; coeffts_k[b])`` (optionally in log space).

    Parameters
    ----------
    binning : MultiDimBinning
    param_names : list of str
    func_names : dict name -> functional-form name
    nominal_values : dict name -> float (NaN for legacy data-release files,
        whose evaluation uses raw param values)
    log : bool
        fit/evaluate in log space (scale = exp(surface))
    """

    def __init__(
        self,
        binning,
        param_names,
        func_names,
        nominal_values=None,
        log=False,
        using_legacy_data=False,
    ):
        self.binning = binning
        self.param_names = list(param_names)
        self.func_names = dict(func_names)
        self.nominal_values = dict(nominal_values or {})
        self.log = log
        self.using_legacy_data = using_legacy_data

        n = binning.size
        self.intercept = np.ones(n, dtype=FTYPE)
        self.coeffts = {
            name: np.zeros((n, HYPERSURFACE_FUNCS[self.func_names[name]][1]),
                           dtype=FTYPE)
            for name in self.param_names
        }
        self.fit_cov_mat = None  # (n, ncoeff, ncoeff) incl. intercept first
        self.fit_valid = np.ones(n, dtype=bool)

    # -- layout helpers -------------------------------------------------------
    @property
    def num_coeffts(self):
        return 1 + sum(
            HYPERSURFACE_FUNCS[self.func_names[k]][1] for k in self.param_names
        )

    def _unpack(self, theta):
        """theta (..., ncoeff) -> (intercept, {name: (..., nargs)})."""
        intercept = theta[..., 0]
        out = {}
        i = 1
        for name in self.param_names:
            nargs = HYPERSURFACE_FUNCS[self.func_names[name]][1]
            out[name] = theta[..., i : i + nargs]
            i += nargs
        return intercept, out

    def _packed_theta(self):
        parts = [np.asarray(self.intercept)[:, None]]
        parts += [np.asarray(self.coeffts[k]) for k in self.param_names]
        return np.concatenate(parts, axis=1)  # (B, ncoeff)

    def _shifted(self, param_values):
        out = {}
        for name in self.param_names:
            v = param_values[name]
            if not self.using_legacy_data:
                v = v - self.nominal_values[name]
            out[name] = v
        return out

    def _surface(self, theta, shifted_values):
        """surface for packed coeffs theta (..., ncoeff) at one param point."""
        intercept, blocks = self._unpack(theta)
        total = intercept
        for name in self.param_names:
            fn, _ = HYPERSURFACE_FUNCS[self.func_names[name]]
            total = total + fn(shifted_values[name], blocks[name])
        return total

    # -- evaluation (traceable) -----------------------------------------------
    def evaluate(self, param_values, return_uncertainty=False):
        """Per-bin scale factors, flat ``(binning.size,)``. `param_values`
        may be JAX tracers (the stage evaluates this inside compiled
        templates). Cf. reference ``hypersurface.py:356``."""
        shifted = self._shifted(param_values)
        theta = jnp.asarray(self._packed_theta())
        out = self._surface(theta, shifted)
        scale = jnp.exp(out) if self.log else out

        if not return_uncertainty:
            return scale
        if self.fit_cov_mat is None:
            return scale, jnp.zeros_like(scale)
        # sigma = sqrt(g . cov . g), g = d surface / d coeffs per bin
        g = jax.vmap(
            lambda th: jax.jacfwd(lambda t: self._row_surface(t, shifted))(th)
        )(theta)
        cov = jnp.asarray(self.fit_cov_mat)
        var = jnp.einsum("bi,bij,bj->b", g, cov, g)
        sigma = jnp.sqrt(jnp.clip(var, 0.0, None))
        if self.log:
            sigma = sigma * scale
        return scale, sigma

    def _row_surface(self, theta_row, shifted_values):
        """surface of a single bin's packed coeff row (ncoeff,)."""
        intercept, blocks = self._unpack(theta_row)
        total = intercept
        for name in self.param_names:
            fn, _ = HYPERSURFACE_FUNCS[self.func_names[name]]
            total = total + fn(shifted_values[name], blocks[name])
        return total

    # -- fitting ---------------------------------------------------------------
    def fit(
        self,
        nominal_map,
        nominal_param_values,
        sys_maps,
        sys_param_values,
        norm=True,
        gn_iterations=30,
        damping=1e-9,
    ):
        """Fit all bins at once (vmapped Gauss-Newton; replaces the
        reference's per-bin iminuit loop, ``hypersurface.py:477``).

        Parameters
        ----------
        nominal_map : Map (counts at nominal)
        nominal_param_values : dict name -> float
        sys_maps : list of Map (one per systematic dataset, nominal included)
        sys_param_values : list of dict (param values per dataset)
        norm : bool
            fit maps normalized to the nominal map (reference default)
        """
        prep = self._prepare_fit_arrays(
            nominal_map, nominal_param_values, sys_maps, sys_param_values,
            norm=norm,
        )
        fitter = self._fitter(gn_iterations, damping)
        theta, cov = fitter(
            jnp.asarray(prep["y"]), jnp.asarray(prep["w"]),
            jnp.asarray(prep["theta0"]),
            tuple(jnp.asarray(s) for s in prep["shifted"]),
        )
        self._ingest_fit(
            np.array(theta), np.array(cov), prep, sys_param_values
        )
        return self

    def _fitter(self, gn_iterations=30, damping=1e-9):
        """The module-cached compiled vmapped Gauss-Newton fitter for this
        hypersurface's structure (functional forms, coefficient count,
        iteration schedule). Shifted param values are traced arguments, so
        one executable serves any same-cardinality dataset ensemble —
        repeated ensemble fits (one per map, or whole repeated ensembles)
        reuse it instead of re-jitting per Hypersurface instance."""
        return _get_bin_fitter(
            func_names=tuple(
                (name, self.func_names[name]) for name in self.param_names
            ),
            ncoeff=self.num_coeffts,
            gn_iterations=int(gn_iterations),
            damping=float(damping),
        )

    def _prepare_fit_arrays(
        self, nominal_map, nominal_param_values, sys_maps,
        sys_param_values, norm=True,
    ):
        """Host-side prep shared by `fit` and the batched ensemble path:
        normalized y/sigma stacks, 1/sigma^2 weights, validity mask,
        shifted parameter values and the GN seed."""
        self.nominal_values = dict(nominal_param_values)
        self.using_legacy_data = False

        B = self.binning.size
        y = np.stack(
            [np.asarray(m.hist).reshape(B) for m in sys_maps]
        ).astype(np.float64)  # (D, B)
        sig = np.stack(
            [
                np.asarray(
                    m.error_hist
                    if getattr(m, "error_hist", None) is not None
                    else np.sqrt(np.clip(np.asarray(m.hist), 0, None))
                ).reshape(B)
                for m in sys_maps
            ]
        ).astype(np.float64)
        nom = np.asarray(nominal_map.hist).reshape(B).astype(np.float64)

        if norm:
            with np.errstate(divide="ignore", invalid="ignore"):
                sig = np.where(nom > 0, sig / nom, 0.0)
                y = np.where(nom > 0, y / nom, 0.0)
        valid = (nom > 0) & np.isfinite(y).all(axis=0)
        # weights: 1/sigma^2, unit weight where sigma == 0 (zero-MC-error
        # bins); float64 so the square of a tiny sigma cannot underflow
        w = np.where(sig > 0, 1.0 / np.clip(sig, 1e-150, None) ** 2, 1.0)
        w = np.where(valid[None, :], w, 0.0)

        # shifted param values per dataset, stacked per param: (D,)
        shifted = tuple(
            np.asarray(
                [
                    pv[name] - nominal_param_values[name]
                    for pv in sys_param_values
                ],
                dtype=FTYPE,
            )
            for name in self.param_names
        )
        if self.log:
            y = np.log(np.clip(y, 1e-10, None))

        theta0 = np.zeros(self.num_coeffts, dtype=FTYPE)
        theta0[0] = 0.0 if self.log else 1.0
        return {
            "y": y.astype(FTYPE), "w": w.astype(FTYPE), "sig": sig,
            "valid": valid, "shifted": shifted, "theta0": theta0,
        }

    def _ingest_fit(self, theta, cov, prep, sys_param_values):
        """Unpack fitted (B, ncoeff) coefficients + covariances into this
        instance (NaN for empty bins; stage maps non-finite scale -> 1)."""
        valid = prep["valid"]
        theta = np.array(theta, dtype=np.float64)
        cov = np.array(cov, dtype=np.float64)
        theta[~valid] = np.nan
        cov[~valid] = np.nan
        self.intercept = theta[:, 0].astype(FTYPE)
        _, blocks = self._unpack(theta)
        self.coeffts = {
            k: np.asarray(v, dtype=FTYPE) for k, v in blocks.items()
        }
        self.fit_cov_mat = cov
        self.fit_valid = valid
        # retain the fitted datasets for diagnostics/plotting
        # (cf. reference hypersurface.py fit_param_values/fit_maps usage in
        # hypersurface_plotting.py)
        self.fit_param_values = [dict(pv) for pv in sys_param_values]
        self.fit_maps_norm = np.asarray(prep["y"])  # (D, B); log if self.log
        self.fit_sigma = np.asarray(prep["sig"])  # (D, B) normalized sigmas
        return self

    # -- serialization -----------------------------------------------------------
    @property
    def state(self):
        return {
            "binning": self.binning.state,
            "param_names": self.param_names,
            "func_names": self.func_names,
            "nominal_values": self.nominal_values,
            "log": self.log,
            "using_legacy_data": self.using_legacy_data,
            "intercept": np.asarray(self.intercept),
            "coeffts": {k: np.asarray(v) for k, v in self.coeffts.items()},
            "fit_cov_mat": None
            if self.fit_cov_mat is None
            else np.asarray(self.fit_cov_mat),
            "fit_valid": np.asarray(self.fit_valid),
        }

    @classmethod
    def from_state(cls, state):
        from pisa_tpu.core.binning import MultiDimBinning

        hs = cls(
            binning=MultiDimBinning.from_state(state["binning"]),
            param_names=state["param_names"],
            func_names=state["func_names"],
            nominal_values=state["nominal_values"],
            log=state["log"],
            using_legacy_data=state["using_legacy_data"],
        )
        hs.intercept = np.asarray(state["intercept"], dtype=FTYPE)
        hs.coeffts = {
            k: np.asarray(v, dtype=FTYPE) for k, v in state["coeffts"].items()
        }
        if state.get("fit_cov_mat") is not None:
            hs.fit_cov_mat = np.asarray(state["fit_cov_mat"])
        hs.fit_valid = np.asarray(state["fit_valid"], dtype=bool)
        return hs

    def to_json(self, path):
        to_json(self.state, path)

    @classmethod
    def from_json(cls, path):
        return cls.from_state(from_json(path))


def fit_hypersurfaces_from_maps(
    nominal_mapset,
    nominal_param_values,
    sys_mapsets,
    sys_param_values,
    binning,
    params,
    log=False,
    norm=True,
    include_nominal=True,
):
    """Fit one Hypersurface per map name (cf. reference
    ``fit_hypersurfaces``, ``hypersurface.py:1598``, with datasets given
    directly as MapSets instead of pipeline configs).

    Parameters
    ----------
    nominal_mapset : MapSet
    nominal_param_values : dict
    sys_mapsets : list of MapSet
    sys_param_values : list of dict
    binning : MultiDimBinning
    params : dict name -> functional-form name
    """
    datasets = list(zip(sys_mapsets, sys_param_values))
    if include_nominal:
        datasets = [(nominal_mapset, nominal_param_values)] + datasets
    pv_list = [pv for _, pv in datasets]

    # batched ensemble fit: prep per map on the host, concatenate the bin
    # axis across maps, run ONE compiled vmapped Gauss-Newton program for
    # the whole ensemble, split the results back (vs the reference's
    # per-bin scipy loop, hypersurface.py:477 — and vs one device round
    # trip per map, which dominates wall-clock on remote-attached chips)
    surfaces, preps = [], []
    for m_nom in nominal_mapset:
        hs = Hypersurface(
            binning=binning,
            param_names=list(params.keys()),
            func_names=params,
            log=log,
        )
        preps.append(
            hs._prepare_fit_arrays(
                nominal_map=m_nom,
                nominal_param_values=nominal_param_values,
                sys_maps=[ms[m_nom.name] for ms, _ in datasets],
                sys_param_values=pv_list,
                norm=norm,
            )
        )
        surfaces.append(hs)

    fitter = surfaces[0]._fitter()
    y_all = np.concatenate([p["y"] for p in preps], axis=1)
    w_all = np.concatenate([p["w"] for p in preps], axis=1)
    theta, cov = jax.device_get(  # one host sync for both outputs
        fitter(
            jnp.asarray(y_all), jnp.asarray(w_all),
            jnp.asarray(preps[0]["theta0"]),
            tuple(jnp.asarray(s) for s in preps[0]["shifted"]),
        )
    )

    out = OrderedDict()
    ofs = 0
    for m_nom, hs, prep in zip(nominal_mapset, surfaces, preps):
        B = hs.binning.size
        hs._ingest_fit(
            theta[ofs:ofs + B], cov[ofs:ofs + B], prep, pv_list
        )
        ofs += B
        out[m_nom.name] = hs
    return out


# -- loading -------------------------------------------------------------------
def load_hypersurfaces(input_file, expected_binning=None):
    """Load hypersurfaces from a fitted JSON file or the official
    data-release CSV format (cf. reference ``hypersurface.py:1887-2180``).

    Returns OrderedDict map_name -> Hypersurface.
    """
    if input_file.endswith((".csv", ".csv.bz2")):
        return _load_hypersurfaces_data_release(input_file, expected_binning)

    state = from_json(find_resource(input_file))
    out = OrderedDict(
        (name, Hypersurface.from_state(s)) for name, s in state.items()
    )
    if expected_binning is not None:
        for hs in out.values():
            if tuple(hs.binning.shape) != tuple(expected_binning.shape):
                raise ValueError(
                    "hypersurface binning does not match expected binning"
                )
    return out


def save_hypersurfaces(hypersurfaces, path):
    to_json({k: hs.state for k, hs in hypersurfaces.items()}, path)


_DATA_RELEASE_KEYS = {
    "nue_cc+nuebar_cc": "nue_cc",
    "numu_cc+numubar_cc": "numu_cc",
    "nutau_cc+nutaubar_cc": "nutau_cc",
    "nu_nc+nubar_nc": "all_nc",
}


def _load_hypersurfaces_data_release(prototype, binning):
    """Official data-release linear hyperplanes: CSV per merged category,
    columns = bin centers + offset + one slope per systematic
    (cf. reference ``hypersurface.py:2065``). Evaluation uses *raw* param
    values (legacy semantics)."""
    import pandas as pd

    if binning is None:
        raise ValueError(
            "must provide binning when loading data-release hypersurfaces"
        )

    out = OrderedDict()
    param_names = None
    for map_name, tag in _DATA_RELEASE_KEYS.items():
        df = pd.read_csv(find_resource(prototype.replace("*", tag)))
        for n in binning.names:
            centers_found = np.unique(df.pop(n).values)
            if centers_found.size != binning[n].num_bins:
                raise ValueError(
                    f"binning mismatch in {tag} for dimension {n}"
                )
        offset = df.pop("offset")
        if param_names is None:
            param_names = df.columns.tolist()
        elif param_names != df.columns.tolist():
            raise ValueError("param mismatch between hypersurface files")

        hs = Hypersurface(
            binning=binning,
            param_names=param_names,
            func_names={n: "linear" for n in param_names},
            nominal_values={n: np.nan for n in param_names},
            using_legacy_data=True,
        )
        hs.intercept = offset.values.reshape(-1).astype(FTYPE)
        for name in param_names:
            hs.coeffts[name] = (
                df[name].values.reshape(-1, 1).astype(FTYPE)
            )
        out[map_name] = hs
    return out


# -- interpolated hypersurfaces --------------------------------------------------
class HypersurfaceInterpolator:
    """Interpolate fitted hypersurface coefficients across (oscillation)
    parameters on a rectilinear grid (cf. reference
    ``pisa/utils/hypersurface/hyper_interpolator.py:48``): piecewise-linear
    ``RegularGridInterpolator`` over the packed per-bin coefficient vectors
    (and covariances), producing a :class:`Hypersurface` at any point.

    Parameters
    ----------
    interpolation_param_spec : dict (ordered)
        {name: {"values": [...], "scales_log": bool}}
    hs_fits : list of Hypersurface
        one per grid point, ordered as np.ndindex over the grid shape.
    ignore_nan : bool
        replace non-finite fits by identity (intercept 1, slopes 0).
    """

    def __init__(self, interpolation_param_spec, hs_fits, ignore_nan=True):
        from scipy.interpolate import RegularGridInterpolator

        self.interp_param_spec = OrderedDict(interpolation_param_spec)
        self.grid_values = [
            np.asarray(
                [getattr(v, "magnitude", v) for v in spec["values"]],
                dtype=np.float64,
            )
            for spec in self.interp_param_spec.values()
        ]
        self.scales_log = [
            bool(spec.get("scales_log", False))
            for spec in self.interp_param_spec.values()
        ]
        grid_axes = [
            np.log10(v) if lg else v
            for v, lg in zip(self.grid_values, self.scales_log)
        ]
        interp_shape = tuple(len(v) for v in self.grid_values)
        if int(np.prod(interp_shape)) != len(hs_fits):
            raise ValueError(
                f"need {int(np.prod(interp_shape))} fits for grid"
                f" {interp_shape}; got {len(hs_fits)}"
            )

        self._reference = hs_fits[0]
        thetas = np.stack(
            [hs._packed_theta() for hs in hs_fits]
        ).reshape(interp_shape + hs_fits[0]._packed_theta().shape)
        if ignore_nan:
            bad = ~np.isfinite(thetas)
            # identity surface: intercept 1 (exp(0) in log mode), slopes 0
            fill = np.zeros_like(thetas)
            fill[..., 0] = 0.0 if self._reference.log else 1.0
            thetas = np.where(bad, fill, thetas)
        self._theta_interp = RegularGridInterpolator(
            grid_axes, thetas, bounds_error=False, fill_value=None
        )
        covs = [
            hs.fit_cov_mat
            if hs.fit_cov_mat is not None
            else np.zeros(
                (hs.binning.size, hs.num_coeffts, hs.num_coeffts)
            )
            for hs in hs_fits
        ]
        covs = np.stack(covs).reshape(interp_shape + covs[0].shape)
        covs = np.nan_to_num(covs)
        self._cov_interp = RegularGridInterpolator(
            grid_axes, covs, bounds_error=False, fill_value=None
        )

    @property
    def interpolation_param_names(self):
        return list(self.interp_param_spec.keys())

    @property
    def param_names(self):
        return self._reference.param_names

    @property
    def binning(self):
        return self._reference.binning

    def get_hypersurface(self, **param_kw):
        """Hypersurface at the given interpolation-param point (values may
        be Quantities or plain magnitudes)."""
        point = []
        for name, lg in zip(self.interpolation_param_names, self.scales_log):
            if name not in param_kw:
                raise ValueError(f"missing interpolation param {name!r}")
            v = param_kw[name]
            v = getattr(v, "magnitude", v)
            v = float(np.asarray(v))
            point.append(np.log10(v) if lg else v)
        theta = np.asarray(self._theta_interp([point])[0])
        cov = np.asarray(self._cov_interp([point])[0])

        hs = Hypersurface(
            binning=self._reference.binning,
            param_names=self._reference.param_names,
            func_names=self._reference.func_names,
            nominal_values=self._reference.nominal_values,
            log=self._reference.log,
            using_legacy_data=self._reference.using_legacy_data,
        )
        hs.intercept = theta[:, 0].astype(FTYPE)
        _, blocks = hs._unpack(theta)
        hs.coeffts = {k: np.asarray(v, dtype=FTYPE) for k, v in blocks.items()}
        hs.fit_cov_mat = cov
        hs.fit_valid = np.isfinite(theta).all(axis=1)
        return hs

    # -- serialization ----------------------------------------------------------
    @property
    def state(self):
        spec = OrderedDict(
            (
                name,
                {
                    "values": list(vals),
                    "scales_log": lg,
                },
            )
            for name, vals, lg in zip(
                self.interpolation_param_names, self.grid_values,
                self.scales_log,
            )
        )
        return {"interp_param_spec": spec, "hs_fits": self._hs_fit_states}

    @classmethod
    def from_fits(cls, interpolation_param_spec, hs_fits, **kw):
        obj = cls(interpolation_param_spec, hs_fits, **kw)
        obj._hs_fit_states = [hs.state for hs in hs_fits]
        return obj


def save_interpolated_hypersurfaces(interpolators, path):
    """Serialize {map_name: HypersurfaceInterpolator} (built via
    ``HypersurfaceInterpolator.from_fits``) to JSON."""
    to_json({k: v.state for k, v in interpolators.items()}, path)


def load_interpolated_hypersurfaces(input_file, expected_binning=None):
    """Load interpolated hypersurfaces (cf. reference
    ``hyper_interpolator.py:920``). Returns
    OrderedDict map_name -> HypersurfaceInterpolator."""
    state = from_json(find_resource(input_file))
    out = OrderedDict()
    for name, s in state.items():
        fits = [Hypersurface.from_state(f) for f in s["hs_fits"]]
        interp = HypersurfaceInterpolator.from_fits(
            s["interp_param_spec"], fits
        )
        if expected_binning is not None and tuple(
            interp.binning.shape
        ) != tuple(expected_binning.shape):
            raise ValueError("binning mismatch in interpolated hypersurfaces")
        out[name] = interp
    return out


# -- interpolated-fit job splitting / resume ----------------------------------
# Cluster workflow matching the reference's re-entrant batch fits
# (``hyper_interpolator.py:761`` prepare_interpolated_fit, ``:618``
# run_interpolated_fit incl. skip_successful resume, ``:598``
# get_incomplete_job_idx, ``:549`` assemble_interpolated_fits): one fit
# directory holds a metadata file plus one gridpoint file per interpolation
# grid point; jobs can run anywhere (job arrays), crash-resume by index, and
# the assembled output loads via :func:`load_interpolated_hypersurfaces`.

def _grid_shape(interpolation_param_spec):
    return tuple(
        len(spec["values"]) for spec in interpolation_param_spec.values()
    )


def _gridpoint_path(fit_directory, job_idx):
    import os

    return os.path.join(fit_directory, f"gridpoint_{job_idx:06d}.json.bz2")


def prepare_interpolated_fit(
    fit_directory, interpolation_param_spec, fit_cfg
):
    """Lay out a fit directory for per-gridpoint (cluster) execution.

    Parameters
    ----------
    fit_directory : str
        created if missing; receives ``metadata.json`` and one
        ``gridpoint_NNNNNN.json.bz2`` (``fit_successful=False``) per point.
    interpolation_param_spec : ordered dict
        ``{name: {"values": [...], "scales_log": bool}}`` — pipeline params
        the hypersurfaces are interpolated over (e.g. ``deltam31``).
    fit_cfg : dict
        the single-point fit configuration consumed by
        ``scripts.fit_hypersurfaces`` (pipeline_cfg, params,
        nominal_dataset/sys_datasets param_values, combine_regex, log, norm).

    Returns the number of jobs (grid points).
    """
    import os

    os.makedirs(fit_directory, exist_ok=True)
    spec = OrderedDict(
        (
            name,
            {
                "values": [
                    float(getattr(v, "magnitude", v)) for v in s["values"]
                ],
                "scales_log": bool(s.get("scales_log", False)),
            },
        )
        for name, s in interpolation_param_spec.items()
    )
    grid_shape = _grid_shape(spec)
    metadata = {
        "interpolation_param_spec": spec,
        "interpolation_param_names": list(spec.keys()),
        "grid_shape": list(grid_shape),
        "fit_cfg": fit_cfg,
    }
    to_json(metadata, os.path.join(fit_directory, "metadata.json"))

    names = list(spec.keys())
    n_jobs = 0
    for job_idx, grid_idx in enumerate(np.ndindex(grid_shape)):
        param_values = {
            n: spec[n]["values"][i] for n, i in zip(names, grid_idx)
        }
        to_json(
            {
                "job_idx": job_idx,
                "grid_idx": list(grid_idx),
                "param_values": param_values,
                "fit_successful": False,
                "hs_fit": None,
            },
            _gridpoint_path(fit_directory, job_idx),
        )
        n_jobs += 1
    logging.info(
        "prepared %d interpolated-fit jobs in %s", n_jobs, fit_directory
    )
    return n_jobs


def run_interpolated_fit(fit_directory, job_idx, skip_successful=False):
    """Fit hypersurfaces at one grid point and store the result.

    With ``skip_successful=True`` a completed job is a no-op, so failed job
    arrays can simply be resubmitted over the full index range."""
    import os

    gridpoint_path = _gridpoint_path(fit_directory, job_idx)
    gridpoint = from_json(gridpoint_path)
    if skip_successful and gridpoint.get("fit_successful"):
        logging.info("job %d already successful; skipping", job_idx)
        return

    metadata = from_json(os.path.join(fit_directory, "metadata.json"))
    fit_cfg = metadata["fit_cfg"]
    param_values = gridpoint["param_values"]

    # consistency: stored values must match the grid point's coordinates
    spec = metadata["interpolation_param_spec"]
    grid_idx = tuple(gridpoint["grid_idx"])
    for i, n in enumerate(metadata["interpolation_param_names"]):
        expect = spec[n]["values"][grid_idx[i]]
        if not np.isclose(param_values[n], expect):
            raise ValueError(
                f"inconsistent values at grid point {grid_idx}: "
                f"{param_values[n]} != {expect}"
            )

    from pisa_tpu.scripts.fit_hypersurfaces import (
        fit_hypersurfaces_from_pipeline,
    )

    # interpolation-param values override every dataset's param_values
    nominal = dict(fit_cfg["nominal_dataset"]["param_values"])
    nominal.update(param_values)
    sys_values = []
    for d in fit_cfg["sys_datasets"]:
        pv = dict(d["param_values"])
        pv.update(param_values)
        sys_values.append(pv)

    surfaces = fit_hypersurfaces_from_pipeline(
        pipeline_cfg=fit_cfg["pipeline_cfg"],
        params=fit_cfg["params"],
        nominal_param_values=nominal,
        sys_param_values=sys_values,
        combine_regex=fit_cfg.get("combine_regex"),
        log=fit_cfg.get("log", False),
        norm=fit_cfg.get("norm", True),
    )
    gridpoint["hs_fit"] = {k: hs.state for k, hs in surfaces.items()}
    gridpoint["fit_successful"] = True
    to_json(gridpoint, gridpoint_path)
    logging.info("job %d fit complete", job_idx)


def get_incomplete_job_idx(fit_directory):
    """Indices of grid points not yet flagged fit_successful
    (cf. reference ``hyper_interpolator.py:598``)."""
    import os

    metadata = from_json(os.path.join(fit_directory, "metadata.json"))
    incomplete = []
    for job_idx in range(int(np.prod(metadata["grid_shape"]))):
        try:
            gridpoint = from_json(_gridpoint_path(fit_directory, job_idx))
        except Exception:
            incomplete.append(job_idx)
            continue
        if not gridpoint.get("fit_successful"):
            incomplete.append(job_idx)
    return incomplete


def assemble_interpolated_fits(
    fit_directory, output_file, drop_fit_maps=False
):
    """Combine completed gridpoint fits into one file loadable by
    :func:`load_interpolated_hypersurfaces`
    (cf. reference ``hyper_interpolator.py:549``). ``drop_fit_maps`` is
    accepted for API parity (our states do not embed fit maps)."""
    import os

    metadata = from_json(os.path.join(fit_directory, "metadata.json"))
    spec = metadata["interpolation_param_spec"]
    grid_shape = tuple(metadata["grid_shape"])

    per_map = None
    for job_idx, grid_idx in enumerate(np.ndindex(grid_shape)):
        gridpoint = from_json(_gridpoint_path(fit_directory, job_idx))
        if gridpoint["job_idx"] != job_idx or tuple(
            gridpoint["grid_idx"]
        ) != tuple(grid_idx):
            raise ValueError(f"corrupt gridpoint file for job {job_idx}")
        if not gridpoint.get("fit_successful"):
            raise ValueError(
                f"job {job_idx} not finished; rerun it via"
                " run_interpolated_fit(..., skip_successful=True)"
            )
        if per_map is None:
            per_map = OrderedDict(
                (name, []) for name in gridpoint["hs_fit"]
            )
        for name, hs_state in gridpoint["hs_fit"].items():
            per_map[name].append(hs_state)

    out = OrderedDict(
        (
            name,
            {"interp_param_spec": spec, "hs_fits": states},
        )
        for name, states in per_map.items()
    )
    to_json(out, output_file)
    logging.info(
        "assembled %d gridpoint fits -> %s",
        int(np.prod(grid_shape)),
        output_file,
    )
