"""
3+1 sterile-neutrino oscillograms with the NATIVE ``osc.nusquids`` engine
(cf. reference nusquids usage in ``pisa/stages/osc/nusquids.py``; here no
external package is needed).

Computes P(numu -> numu) over an (E, cos zen) grid for a 1 eV^2 sterile
state, shows the effect of the theta24 mixing, the matter-NC sterile
resonance for antineutrinos, and the low-pass filtering of fast
oscillations — the machinery the reference delegates to nuSQuIDS node-mode.
"""

import numpy as np

from pisa_tpu import ureg
from pisa_tpu.ops.osc.sterile import osc_probs_layers_4nu, pmns4_matrix
from pisa_tpu.ops.osc.layers import Layers
from pisa_tpu.utils.resources import find_resource


def main(plot=True, n_grid=80):
    # (E, cz) grid
    energies = np.logspace(0, 3, n_grid)
    coszens = np.linspace(-1, 0.0, n_grid)  # upgoing
    ee, cc = np.meshgrid(energies, coszens, indexing="ij")

    layers = Layers(
        find_resource("osc/PREM_12layer.dat"),
        detector_depth=2.0, prop_height=20.0,
    )
    layers.setElecFrac(0.4656, 0.4656, 0.4957)
    layers.calcLayers(cc.ravel())
    shape = (cc.size, layers.max_layers)
    dens_e = layers.density.reshape(shape)
    dens_n = layers.density_neutron_weighted.reshape(shape)
    dist = layers.distance.reshape(shape)

    U = pmns4_matrix(
        theta12=0.5839, theta13=0.1496, theta23=0.7854,
        theta14=0.0, theta24=np.deg2rad(8.0), theta34=0.0,
    )
    dms = np.array([0.0, 7.42e-5, 2.514e-3, 1.0])

    print("propagating nu and nubar 3+1 chains "
          f"({cc.size} points x {layers.max_layers} layers)...")
    p_nu = np.asarray(
        osc_probs_layers_4nu(dms, U, 1, ee.ravel(), dens_e, dens_n, dist)
    ).reshape(n_grid, n_grid, 4, 4)
    p_nubar = np.asarray(
        osc_probs_layers_4nu(dms, U, -1, ee.ravel(), dens_e, dens_n, dist)
    ).reshape(n_grid, n_grid, 4, 4)

    # the matter-NC resonance makes nubar disappearance much stronger at
    # TeV energies for eV^2 steriles
    i_tev = np.searchsorted(energies, 500.0)
    print(
        "P(numu->numu) at ~500 GeV, cz=-1: nu %.3f vs nubar %.3f"
        % (p_nu[i_tev, 0, 1, 1], p_nubar[i_tev, 0, 1, 1])
    )

    # low-pass filtering: averages the fast eV^2 wiggles at low energy
    p_lp = np.asarray(
        osc_probs_layers_4nu(
            dms, U, 1, ee.ravel(), dens_e, dens_n, dist,
            lowpass_cutoff=0.05,
        )
    ).reshape(n_grid, n_grid, 4, 4)
    lo = slice(0, n_grid // 4)  # E < ~5 GeV: fast sterile phases
    print(
        "low-E P(numu->numu) std over E: raw %.4f -> low-pass %.4f"
        % (p_nu[lo, 0, 1, 1].std(), p_lp[lo, 0, 1, 1].std())
    )

    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 3, figsize=(15, 4))
            for ax, pp, title in (
                (axes[0], p_nu, r"$\nu_\mu$ survival"),
                (axes[1], p_nubar, r"$\bar\nu_\mu$ survival"),
                (axes[2], p_lp, r"$\nu_\mu$ survival (low-pass)"),
            ):
                pc = ax.pcolormesh(
                    energies, coszens, pp[:, :, 1, 1].T,
                    vmin=0, vmax=1, shading="auto",
                )
                ax.set_xscale("log")
                ax.set_xlabel("E [GeV]")
                ax.set_ylabel(r"$\cos\theta_z$")
                ax.set_title(title)
                fig.colorbar(pc, ax=ax)
            fig.savefig("sterile_oscillograms.png", bbox_inches="tight")
            print("wrote sterile_oscillograms.png")
        except Exception as exc:
            print(f"(plot skipped: {exc})")
    return p_nu, p_nubar


if __name__ == "__main__":
    main()
