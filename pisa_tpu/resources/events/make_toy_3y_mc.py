"""
Generate a synthetic neutrino MC set in the IceCube 3-year data-release CSV
schema (the real ``neutrino_mc.csv.bz2`` from
https://icecube.wisc.edu/science/data/highstats_nuosc_3y is not vendored
here; this toy stands in so the flagship ``IceCube_3y_neutrinos.cfg``
pipeline runs end-to-end — swap in the real file for physics results).

Schema (columns used by ``data.csv_loader``): pdg, type (0=NC, 1=CC),
true_energy, true_coszen, reco_energy, reco_coszen, pid (0=cascade,
1=track), weight (per-event effective area, m^2 — OneWeight-style such that
sum(weight * flux) * livetime gives event counts).

Deterministic (seeded). Regenerate with:
    python pisa_tpu/resources/events/make_toy_3y_mc.py
"""

import os

import numpy as np
import pandas as pd

SEED = 20260816
N_PER_CATEGORY = 20000

# (pdg, type) per category; pdg = nubar*(12 + 2*flav)
CATEGORIES = []
for flav, base in (("e", 12), ("mu", 14), ("tau", 16)):
    for nubar in (1, -1):
        for current in (1, 0):  # CC, NC
            CATEGORIES.append((nubar * base, current, flav))


def make(path):
    rng = np.random.RandomState(SEED)
    frames = []
    for pdg, current, flav in CATEGORIES:
        n = N_PER_CATEGORY
        # E^-1 sampling between 1.5 and 500 GeV (log-uniform)
        true_e = np.exp(rng.uniform(np.log(1.5), np.log(500.0), n))
        true_cz = rng.uniform(-1, 1, n)

        # effective area grows ~E^1.7 below ~100 GeV and saturates; taus
        # suppressed near threshold; NC "visible" area lower
        aeff = 2e-10 * true_e**1.7 / (1 + (true_e / 100.0) ** 1.7)
        if flav == "tau" and current == 1:
            aeff = aeff * np.clip((true_e - 3.5) / 30.0, 0, 1)
        if current == 0:
            aeff = aeff * 0.4
        # importance weight: sampled log-uniform => weight *= E to recover
        # an E-integrated effective area
        weight = aeff * true_e

        # reco smearing: NC events lose the outgoing neutrino energy
        visible_e = true_e * (0.4 if current == 0 else 1.0)
        reco_e = visible_e * rng.lognormal(0.0, 0.25, n)
        cz_sigma = 0.15 + 0.4 / np.sqrt(visible_e)
        reco_cz = np.clip(true_cz + rng.normal(0, cz_sigma, n), -1, 1)

        # PID: tracks from numu CC mostly; some tau CC; cascades otherwise
        if flav == "mu" and current == 1:
            p_track = np.clip(0.45 + 0.1 * np.log10(true_e), 0.3, 0.95)
        elif flav == "tau" and current == 1:
            p_track = 0.15 * np.ones(n)
        else:
            p_track = 0.05 * np.ones(n)
        pid = (rng.uniform(size=n) < p_track).astype(float)

        frames.append(
            pd.DataFrame(
                {
                    "pdg": np.full(n, pdg, dtype=int),
                    "type": np.full(n, current, dtype=int),
                    "true_energy": true_e,
                    "true_coszen": true_cz,
                    "reco_energy": reco_e,
                    "reco_coszen": reco_cz,
                    "pid": pid,
                    "weight": weight,
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)
    df.to_csv(path, index=False, compression="bz2")
    print(f"wrote {len(df)} events -> {path}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    make(os.path.join(here, "IceCube_3y_oscillations", "neutrino_mc.csv.bz2"))
