"""
Non-standard physics parameter containers feeding the prob3 kernels:
NSI couplings, neutrino decay, long-range interactions, and Earth-tomography
density scalings.

Rebuild of reference ``pisa/stages/osc/{nsi_params,decay_params,lri_params,
scaling_params}.py`` with the same math and conventions. The numpy parameter
classes mirror the reference's API; the ``*_C``/``lri_potential`` builder
functions construct the same matrices from plain scalars with jnp
split-complex arithmetic, so the scalars may be JAX tracers — compiled
templates can take analytic gradients w.r.t. NSI/decay/LRI couplings (the
reference fits these with finite differences only).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu.ops.cplx import C

__all__ = [
    "StdNSIParams",
    "VacuumLikeNSIParams",
    "DecayParams",
    "LRIParams",
    "std_nsi_eps_C",
    "vacuum_nsi_eps_C",
    "decay_matrix_C",
    "lri_potential",
    "Mass_scaling",
    "Core_scaling_w_constrain",
    "Core_scaling_wo_constrain",
    "FIVE_LAYER_RADII_KM",
    "FIVE_LAYER_RHOS",
    "TOMOGRAPHY_ERROR_MSG",
]


# ---------------------------------------------------------------------------
# Trace-safe (differentiable) builders
# ---------------------------------------------------------------------------
def std_nsi_eps_C(
    eps_ee, eps_emu_magn, eps_emu_phase, eps_etau_magn, eps_etau_phase,
    eps_mumu, eps_mutau_magn, eps_mutau_phase, eps_tautau,
):
    """Hermitian standard-parameterization eps matrix as split-complex
    ``C(3, 3)``; diagonal shifted by -eps_mumu (trace is irrelevant) —
    identical to ``StdNSIParams.eps_matrix``."""
    z = jnp.zeros(())
    emu_re = eps_emu_magn * jnp.cos(eps_emu_phase)
    emu_im = eps_emu_magn * jnp.sin(eps_emu_phase)
    etau_re = eps_etau_magn * jnp.cos(eps_etau_phase)
    etau_im = eps_etau_magn * jnp.sin(eps_etau_phase)
    mutau_re = eps_mutau_magn * jnp.cos(eps_mutau_phase)
    mutau_im = eps_mutau_magn * jnp.sin(eps_mutau_phase)
    re = jnp.stack(
        [
            jnp.stack([eps_ee - eps_mumu, emu_re, etau_re]),
            jnp.stack([emu_re, z, mutau_re]),
            jnp.stack([etau_re, mutau_re, eps_tautau - eps_mumu]),
        ]
    )
    im = jnp.stack(
        [
            jnp.stack([z, emu_im, etau_im]),
            jnp.stack([-emu_im, z, mutau_im]),
            jnp.stack([-etau_im, -mutau_im, z]),
        ]
    )
    return C(re, im)


def vacuum_nsi_eps_C(
    eps_scale, eps_prime, phi12, phi13, phi23, alpha1, alpha2, deltansi
):
    """Vacuum-like NSI eps matrix (JHEP08(2018)180) as split-complex
    ``C(3, 3)`` — identical to ``VacuumLikeNSIParams.eps_matrix``
    (diagonal shifted by the mumu entry and the standard CC term)."""
    from pisa_tpu.ops.osc.kernels import mat_conj_T, mat_mul, mat_to_C

    def cnum(re, im=None):
        re = jnp.asarray(re, jnp.result_type(float))
        im = (
            jnp.zeros_like(re)
            if im is None
            else jnp.asarray(im, jnp.result_type(float))
        )
        return C(re, im)

    zero = cnum(0.0)
    one = cnum(1.0)
    qdiag = [
        cnum(jnp.cos(alpha1), jnp.sin(alpha1)),
        cnum(jnp.cos(alpha2), jnp.sin(alpha2)),
        cnum(jnp.cos(alpha1 + alpha2), -jnp.sin(alpha1 + alpha2)),
    ]
    Qrel = [
        [qdiag[0], zero, zero],
        [zero, qdiag[1], zero],
        [zero, zero, qdiag[2]],
    ]
    c12, s12 = jnp.cos(phi12), jnp.sin(phi12)
    c13, s13 = jnp.cos(phi13), jnp.sin(phi13)
    c23, s23 = jnp.cos(phi23), jnp.sin(phi23)
    R12 = [
        [cnum(c12), cnum(s12), zero],
        [cnum(-s12), cnum(c12), zero],
        [zero, zero, one],
    ]
    R13 = [
        [cnum(c13), zero, cnum(s13)],
        [zero, one, zero],
        [cnum(-s13), zero, cnum(c13)],
    ]
    R23 = [
        [one, zero, zero],
        [
            zero,
            cnum(c23),
            cnum(s23 * jnp.cos(deltansi), -s23 * jnp.sin(deltansi)),
        ],
        [
            zero,
            cnum(-s23 * jnp.cos(deltansi), -s23 * jnp.sin(deltansi)),
            cnum(c23),
        ],
    ]
    D = [
        [cnum(eps_scale), zero, zero],
        [zero, cnum(eps_prime), zero],
        [zero, zero, zero],
    ]
    U = mat_mul(mat_mul(R12, R13), R23)
    m = mat_mul(
        mat_mul(mat_mul(mat_mul(Qrel, U), D), mat_conj_T(U)),
        mat_conj_T(Qrel),
    )
    full = mat_to_C(m)
    # subtract the mumu entry from the diagonal, the CC term from ee, and
    # force real diagonals (Hermitian by construction up to roundoff)
    shift = full.re[1, 1]
    eye = jnp.eye(3)
    re = full.re - shift * eye - jnp.zeros((3, 3)).at[0, 0].set(1.0)
    im = full.im * (1.0 - eye)
    return C(re, im)


def decay_matrix_C(decay_alpha3):
    """Invisible-nu3-decay matrix: -i*alpha3 at [2, 2], as ``C(3, 3)``."""
    re = jnp.zeros((3, 3))
    im = jnp.zeros((3, 3)).at[2, 2].set(-jnp.asarray(decay_alpha3))
    return C(re, im)


def lri_potential(v_lri, lri_type):
    """Long-range-interaction flavor potential (real diagonal (3, 3)) for
    the given symmetry; differentiable in ``v_lri``."""
    v = jnp.asarray(v_lri)
    z = jnp.zeros(())
    if lri_type == "emu-symmetry":
        d = jnp.stack([v, -v, z])
    elif lri_type == "etau-symmetry":
        d = jnp.stack([v, z, -v])
    elif lri_type == "mutau-symmetry":
        d = jnp.stack([z, v, -v])
    else:
        raise ValueError(f"unknown lri_type {lri_type!r}")
    return jnp.diag(d)


class StdNSIParams:
    """Standard-parameterization NSI: 3 real diagonal + 3 (magnitude, phase)
    off-diagonal couplings -> Hermitian eps matrix
    (cf. reference ``nsi_params.py`` ``StdNSIParams``)."""

    def __init__(self):
        self._m = np.zeros((3, 3), dtype=np.complex128)

    @staticmethod
    def _polar(value):
        magnitude, phase = value
        return magnitude * (np.cos(phase) + 1j * np.sin(phase))

    @property
    def eps_ee(self):
        return self._m[0, 0].real

    @eps_ee.setter
    def eps_ee(self, value):
        self._m[0, 0] = value

    @property
    def eps_mumu(self):
        return self._m[1, 1].real

    @eps_mumu.setter
    def eps_mumu(self, value):
        self._m[1, 1] = value

    @property
    def eps_tautau(self):
        return self._m[2, 2].real

    @eps_tautau.setter
    def eps_tautau(self, value):
        self._m[2, 2] = value

    @property
    def eps_emu(self):
        return self._m[0, 1]

    @eps_emu.setter
    def eps_emu(self, value):
        self._m[0, 1] = self._polar(value)
        self._m[1, 0] = np.conjugate(self._m[0, 1])

    @property
    def eps_etau(self):
        return self._m[0, 2]

    @eps_etau.setter
    def eps_etau(self, value):
        self._m[0, 2] = self._polar(value)
        self._m[2, 0] = np.conjugate(self._m[0, 2])

    @property
    def eps_mutau(self):
        return self._m[1, 2]

    @eps_mutau.setter
    def eps_mutau(self, value):
        self._m[1, 2] = self._polar(value)
        self._m[2, 1] = np.conjugate(self._m[1, 2])

    @property
    def eps_matrix(self):
        # trace is irrelevant: subtract the mumu entry from the diagonal
        m = self._m - self._m[1, 1] * np.eye(3)
        for i in range(3):
            m[i, i] = m[i, i].real
        return m


class VacuumLikeNSIParams:
    """Vacuum-like NSI parameterization (JHEP08(2018)180): eps matrix built
    from an eigenvalue scale/prime, three rotation angles, two Majorana-like
    phases, and an NSI phase (cf. reference ``nsi_params.py`` vacuum-like)."""

    def __init__(self):
        self.eps_scale = 1.0
        self.eps_prime = 0.0
        self.phi12 = 0.0
        self.phi13 = 0.0
        self.phi23 = 0.0
        self.alpha1 = 0.0
        self.alpha2 = 0.0
        self.deltansi = 0.0

    @property
    def eps_matrix(self):
        qdiag = np.array(
            [
                np.exp(1j * self.alpha1),
                np.exp(1j * self.alpha2),
                np.exp(-1j * (self.alpha1 + self.alpha2)),
            ]
        )
        Qrel = np.diag(qdiag)
        c12, s12 = np.cos(self.phi12), np.sin(self.phi12)
        c13, s13 = np.cos(self.phi13), np.sin(self.phi13)
        c23, s23 = np.cos(self.phi23), np.sin(self.phi23)
        R12 = np.array([[c12, s12, 0], [-s12, c12, 0], [0, 0, 1]])
        R13 = np.array([[c13, 0, s13], [0, 1, 0], [-s13, 0, c13]])
        R23 = np.array(
            [
                [1, 0, 0],
                [0, c23, s23 * np.exp(-1j * self.deltansi)],
                [0, -s23 * np.exp(1j * self.deltansi), c23],
            ]
        )
        Umat = R12 @ R13 @ R23
        Dmat = np.diag([self.eps_scale, self.eps_prime, 0.0])
        mat_pot = Qrel @ Umat @ Dmat @ Umat.conj().T @ Qrel.conj().T
        # trace is physically irrelevant: subtract the mumu entry, then the
        # standard CC matter term from the ee entry
        mat_pot = mat_pot - mat_pot[1, 1] * np.eye(3)
        mat_pot[0, 0] -= 1.0
        for i in range(3):
            mat_pot[i, i] = mat_pot[i, i].real
        return mat_pot


class DecayParams:
    """Invisible nu3 decay: alpha3 = m3/tau3 enters the vacuum Hamiltonian as
    -i*alpha3 in the [2,2] mass-basis entry (cf. reference
    ``decay_params.py``)."""

    def __init__(self):
        self.decay_alpha3 = 0.0

    @property
    def decay_matrix(self):
        m = np.zeros((3, 3), dtype=np.complex128)
        m[2, 2] = -1j * self.decay_alpha3
        return m


class LRIParams:
    """Long-range-interaction flavor potentials for the three anomaly-free
    U(1) symmetries (cf. reference ``lri_params.py``); ``v_lri`` in eV."""

    def __init__(self):
        self.v_lri = 0.0

    @property
    def potential_matrix_emu(self):
        return np.diag([self.v_lri, -self.v_lri, 0.0])

    @property
    def potential_matrix_etau(self):
        return np.diag([self.v_lri, 0.0, -self.v_lri])

    @property
    def potential_matrix_mutau(self):
        return np.diag([0.0, self.v_lri, -self.v_lri])


# ---------------------------------------------------------------------------
# Earth tomography (cf. reference scaling_params.py)
# ---------------------------------------------------------------------------
FIVE_LAYER_RADII_KM = np.array([0.0, 1221.50, 3480.00, 5701.00, 6151.0, 6371.00])
FIVE_LAYER_RHOS = np.array([13.0, 13.0, 10.96, 5.03, 3.7, 2.5])  # g/cm^3

TOMOGRAPHY_ERROR_MSG = (
    "You need to provide the appropriate 5-layer Earth model, with the same"
    f" layer radii ({FIVE_LAYER_RADII_KM} km) and densities"
    f" ({FIVE_LAYER_RHOS} g/cm^3) as the one hard-coded for the chosen type"
    " of tomography."
)


class Mass_scaling:
    """Single overall density scale factor."""

    def __init__(self):
        self._density_scale = 0.0

    @property
    def density_scale(self):
        return self._density_scale

    @density_scale.setter
    def density_scale(self, value):
        assert value >= 0.0
        self._density_scale = value


def _mass_and_inertia_coeffs():
    """Per-shell mass (4pi/3 rho (r_o^3 - r_i^3)) and moment-like
    (8pi/15 rho (r_o^5 - r_i^5)) coefficients of the 5-layer model."""
    r = FIVE_LAYER_RADII_KM
    rho = FIVE_LAYER_RHOS
    m = []
    i_ = []
    for k in range(1, 6):
        m.append(4 * np.pi / 3 * rho[k] * (r[k] ** 3 - r[k - 1] ** 3))
        i_.append(8 * np.pi / 15 * rho[k] * (r[k] ** 5 - r[k - 1] ** 5))
    return np.asarray(m), np.asarray(i_)


class Core_scaling_w_constrain:
    """Scale the core density by ``core_density_scale`` while conserving the
    Earth's total mass and moment of inertia by solving for the inner/middle
    mantle factors (outer mantle unscaled). Returned array is surface-first
    (index 0 = outermost shell), as consumed by ``Layers.scaling``."""

    def __init__(self):
        self._core_density_scale = 0.0

    @property
    def core_density_scale(self):
        return self._core_density_scale

    @core_density_scale.setter
    def core_density_scale(self, value):
        self._core_density_scale = value

    @property
    def scaling_array(self):
        (a1, b1, c1, d1, e1), (a2, b2, c2, d2, e2) = _mass_and_inertia_coeffs()
        M = a1 + b1 + c1 + d1 + e1
        I = a2 + b2 + c2 + d2 + e2  # noqa: E741 - physics notation
        alpha = self.core_density_scale
        gamma = (
            (I * c1 - M * c2)
            - alpha * (c1 * a2 - c2 * a1)
            - alpha * (c1 * b2 - b1 * c2)
            - (c1 * e2 - e1 * c2)
        ) / (c1 * d2 - d1 * c2)
        beta = (I - alpha * a2 - alpha * b2 - gamma * d2 - e2) / c2
        factors = np.asarray([alpha, beta, gamma])
        assert np.all(factors >= 0), "density scaling factors must be >= 0"
        # surface-first: [outer mantle(=1), middle mantle, inner mantle, cores]
        return np.array([1.0, gamma, beta, alpha, alpha, alpha])


class Core_scaling_wo_constrain:
    """Independent core / inner-mantle / middle-mantle scale factors."""

    def __init__(self):
        self.core_density_scale = 0.0
        self.innermantle_density_scale = 0.0
        self.middlemantle_density_scale = 0.0

    @property
    def scaling_factor_array(self):
        a = self.core_density_scale
        return np.array(
            [
                1.0,
                self.middlemantle_density_scale,
                self.innermantle_density_scale,
                a,
                a,
                a,
            ]
        )
