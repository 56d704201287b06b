"""
Build and EXECUTE the walkthrough notebooks (committed with outputs), the
counterpart of the reference's executed ``pisa_examples/*.ipynb``
(``IceCube_3y_oscillations_example.ipynb``, ``README.ipynb``).

Writes examples/notebooks/{oscillograms,icecube_3y_fit}.ipynb, executed
in-process order with nbclient on the CPU backend so the committed outputs
are reproducible anywhere.

Usage: python docs/make_notebooks.py [outdir]
"""

from __future__ import annotations

import nbformat
from nbclient import NotebookClient


def _nb(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    nb.cells = [
        (
            nbformat.v4.new_markdown_cell(src)
            if kind == "md"
            else nbformat.v4.new_code_cell(src)
        )
        for kind, src in cells
    ]
    return nb


OSC = [
    ("md", """\
# Oscillograms quick-start

The TPU-native counterpart of the reference's `pisa_examples/README.ipynb`:
build the oscillogram pipeline (`osc_example.cfg`: a grid of toy "events"
→ Barr-parameterized atmospheric flux → full 3-flavor matter oscillations
through the PREM Earth model), run it, and look at the resulting
P(νμ→νμ) survival map over (energy, cos zenith).

Everything below a `Pipeline` is one differentiable JAX program; the same
config drives the eager per-stage path used here and the compiled
single-dispatch template used by fits."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")  # deterministic CPU outputs
import numpy as np
import matplotlib
matplotlib.use("Agg")
%matplotlib inline

from pisa_tpu.core.pipeline import Pipeline

pipeline = Pipeline("settings/pipeline/osc_example.cfg")
maps = pipeline.get_outputs()
print(f"{len(maps)} maps:", [m.name for m in maps])"""),
    ("md", """\
Each `Map` holds the binned, oscillation-weighted template for one
flavor/interaction category. For the grid pipeline the "weights" are the
oscillation probabilities themselves, so the `numu_cc` map is the νμ
survival oscillogram."""),
    ("code", """\
import matplotlib.pyplot as plt

numu = maps["numu_cc"]
e = numu.binning["true_energy"].bin_edges.magnitude
cz = numu.binning["true_coszen"].bin_edges.magnitude
fig, ax = plt.subplots(figsize=(7, 4.2))
pc = ax.pcolormesh(cz, e, numu.hist.T, cmap="viridis", vmin=0, vmax=1)
ax.set_yscale("log")
ax.set_xlabel(r"$\\cos\\theta_z$ (true)")
ax.set_ylabel("energy (true) [GeV]")
ax.set_title(r"P($\\nu_\\mu\\to\\nu_\\mu$) oscillogram")
fig.colorbar(pc, label="survival probability")
fig.tight_layout()
print(f"map shape {numu.hist.shape}, total {numu.hist.sum():.5g}")"""),
    ("md", """\
## Compiled templates

`pipeline.compile()` traces the whole stage chain into ONE jitted
`rescaled_params -> template` function — a minimizer iteration is a single
device dispatch, and `jax.grad` flows through the full physics chain
(oscillations included)."""),
    ("code", """\
import time

ct = pipeline.compile()
v0 = ct.current_rescaled_values()
ms = ct.get_outputs(v0)          # first call compiles
t0 = time.time()
reps = 5
totals = np.asarray(ct.scan_totals(np.tile(v0, (reps, 1))))
dt = (time.time() - t0) / reps
print(f"{len(v0)} free params: {ct.free_names}")
print(f"compiled in-device template: {dt*1e3:.1f} ms/template (CPU backend)")
print("per-template summed bin counts:", totals.round(3))"""),
]


ICECUBE = [
    ("md", """\
# IceCube 3-year oscillation analysis

The TPU-native counterpart of the reference's
`pisa_examples/IceCube_3y_oscillations_example.ipynb`: the
neutrino pipeline (`csv_loader → honda_ip → barr_simple → prob3 → aeff →
hist → hypersurfaces`, 240k MC events) plus the atmospheric-muon
background pipeline, combined by a `DistributionMaker`, then an Asimov
θ₂₃ fit with ANALYTIC gradients through the compiled template.

> The vendored `neutrino_mc.csv.bz2` is a synthetic stand-in with the
> data-release schema; swap in the real release file for physics
> results."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")  # deterministic CPU outputs
import numpy as np

from pisa_tpu import ureg
from pisa_tpu.core.distribution_maker import DistributionMaker

dm = DistributionMaker(
    [
        "settings/pipeline/IceCube_3y_neutrinos.cfg",
        "settings/pipeline/IceCube_3y_muons.cfg",
    ],
    label="IceCube 3y",
)
print(f"{len(dm.params.free)} free params:")
for p in dm.params.free:
    print(f"  {p.name:24s} = {p.value}")"""),
    ("md", """\
## Asimov dataset

The "data" is the model's own prediction at the truth parameters — the
fit should recover the truth exactly, which is the standard closure test
(and the sensitivity workhorse)."""),
    ("code", """\
truth_t23 = dm.params["theta23"].value
data = dm.get_outputs(return_sum=True)
print("Asimov data:", [f"{m.name}: {m.hist.sum():.1f} events" for m in data])"""),
    ("md", """\
## Gradient fit

Perturb θ₂₃ by 3° and fit it back. The `gradient` method runs bounded
L-BFGS on the compiled template with `jax.value_and_grad` — one analytic
gradient costs ~2 templates, where the reference's finite-difference
L-BFGS-B burns ~2·N templates per gradient step
(reference `analysis.py:1561`)."""),
    ("code", """\
import time

from pisa_tpu.analysis.analysis import Analysis

dm.params["theta23"].value = truth_t23 + 3.0 * ureg.degree
ana = Analysis()
t0 = time.time()
result = ana.fit_recursively(data, dm, "mod_chi2", None, "gradient", {}, None)
print(f"fit wall-clock {time.time()-t0:.1f}s (CPU backend)")
print(f"metric_val {result.metric_val:.4g}")
print(f"theta23 fit = {result.params['theta23'].value}")
print(f"theta23 truth = {truth_t23}")"""),
    ("code", """\
import matplotlib
matplotlib.use("Agg")
%matplotlib inline
import matplotlib.pyplot as plt

total = sum(np.asarray(m.hist) for m in data)
fig, axes = plt.subplots(1, 2, figsize=(9, 3.6))
for k, ax in enumerate(axes):
    im = ax.imshow(total[:, :, k].T, origin="lower", aspect="auto",
                   cmap="viridis")
    ax.set_title(f"Asimov counts, PID bin {k}")
    ax.set_xlabel("energy bin")
    ax.set_ylabel("coszen bin")
    fig.colorbar(im, ax=ax)
fig.tight_layout()"""),
]


MCMC = [
    ("md", """\
# Bayesian posterior sampling (MCMC)

The TPU-native counterpart of the reference's
`pisa_examples/MCMC_example.ipynb`. The reference farms a serial `emcee`
sampler out to a fork-server of llh processes over TCP sockets
(`pisa/utils/llh_server.py`); here the affine-invariant stretch-move
ensemble is NATIVE and vmapped — every walker's template is one row of a
single batched device program, so one MCMC step costs one dispatch."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")  # deterministic CPU outputs
import numpy as np

from pisa_tpu import ureg
from pisa_tpu.analysis.bayesian import mcmc_sampling
from pisa_tpu.analysis.gradient import CompiledDistribution
from pisa_tpu.core.distribution_maker import DistributionMaker

dm = DistributionMaker(["settings/pipeline/toy_fit_example.cfg"],
                       label="toy")
dm.params["theta23"].value = 42.0 * ureg.degree
data = dm.get_outputs(return_sum=True)   # Asimov "data" at the truth
dm.reset_free()
print("free params:", dm.params.free.names)"""),
    ("md", """\
## Sample

`mcmc_sampling` runs the whole ensemble inside one `lax.scan` — the chain
below (16 walkers x 150 steps after burn-in) is a single compiled device
program, not 2400 Python-loop likelihood calls."""),
    ("code", """\
ct = CompiledDistribution(dm)
chain, logp, acceptance = mcmc_sampling(
    ct, data, metric="llh", n_walkers=16, n_steps=150, n_burnin=50,
    seed=7,
)  # CPU-sized; raise walkers/steps on TPU
print(f"chain shape {chain.shape} (steps, walkers, params)")
print(f"acceptance fraction: {acceptance:.2f}")"""),
    ("code", """\
import matplotlib
matplotlib.use("Agg")
%matplotlib inline
import matplotlib.pyplot as plt

names = dm.params.free.names
flat = np.asarray(chain).reshape(-1, chain.shape[-1])
fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 3.2))
for i, (ax, name) in enumerate(zip(np.atleast_1d(axes), names)):
    ax.hist(flat[:, i], bins=40, color="#3a7ca5")
    ax.set_xlabel(f"{name} (rescaled [0,1])")
    mean, std = flat[:, i].mean(), flat[:, i].std()
    ax.set_title(f"{mean:.3f} ± {std:.3f}")
fig.suptitle("marginal posteriors")
fig.tight_layout()
for i, name in enumerate(names):
    print(f"  {name}: {flat[:, i].mean():.4f} ± {flat[:, i].std():.4f}")"""),
]


MULTIDET = [
    ("md", """\
# Multi-detector joint fit

The TPU-native counterpart of the reference's
`pisa_examples/Multi_detector_test.ipynb`: two detectors observe the same
oscillation physics — `theta23`/`deltam31` are SHARED `Param` objects
across both pipelines, while detector systematics stay independent (the
`Detectors` container suffixes them `_detA`/`_detB`; cf. reference
`pisa/core/detectors.py:224-234`)."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")  # deterministic CPU outputs
import tempfile
from pathlib import Path

from pisa_tpu import ureg
from pisa_tpu.core.detectors import Detectors
from pisa_tpu.utils.resources import find_resource

tmpdir = tempfile.mkdtemp()

def detector_config(det_name):
    text = open(
        find_resource("settings/pipeline/toy_fit_example.cfg")).read()
    text = text.replace(
        "name = neutrinos",
        f"name = neutrinos\\ndetector_name = {det_name}")
    path = Path(tmpdir) / f"{det_name}.cfg"
    path.write_text(text)
    return str(path)

detectors = Detectors(
    [detector_config("detA"), detector_config("detB")],
    shared_params=["theta23", "deltam31", "theta13", "delta_index"],
)
print("joint free params:")
for p in detectors.params.free:
    print(f"  {p.name}")"""),
    ("md", """\
## Joint Asimov fit

Fit the shared angle plus ONE per-detector systematic (`aeff_scale_detB`)
against Asimov data generated at the truth. The gradient method
differentiates through both compiled detector templates at once."""),
    ("code", """\
from pisa_tpu.analysis.analysis import Analysis

for p in detectors.params.free:
    if p.name not in ("theta23", "aeff_scale_detB"):
        p.is_fixed = True

detectors.params["theta23"].value = 42.0 * ureg.degree
data = detectors.get_outputs(return_sum=True)
detectors.params["theta23"].value = 44.0 * ureg.degree  # perturb

result = Analysis().fit_recursively(
    data, detectors, "mod_chi2", None, "gradient", {}, None)
print(f"joint fit metric: {result.metric_val:.3g}")
print(f"theta23 fit  = {result.params['theta23'].value}")
print("theta23 truth = 42 degree")
print(f"aeff_scale_detB fit = {result.params['aeff_scale_detB'].value}")"""),
]


VARBIN = [
    ("md", """\
# Variable binning

The TPU-native counterpart of the reference's
`pisa_examples/Variable_binning_example.ipynb`: a `VarBinning` output
splits the events into mutually-exclusive selections (here two PID
bands), each histogrammed under its OWN `MultiDimBinning` — e.g. a
fine binning where the detector resolves well and a coarse one where it
does not. `get_outputs()` returns one MapSet per selection."""),
    ("code", """\
import jax
jax.config.update("jax_platforms", "cpu")  # deterministic CPU outputs
import numpy as np

from pisa_tpu.core.pipeline import Pipeline

pipeline = Pipeline("settings/pipeline/varbin_example.cfg")
outputs = pipeline.get_outputs()
for i, mapset in enumerate(outputs):
    shape = next(iter(mapset)).hist.shape
    total = sum(float(np.asarray(m.hist).sum()) for m in mapset)
    print(f"selection {i} ({mapset.name}): shape {shape},"
          f" total {total:.5g}")"""),
    ("code", """\
import matplotlib
matplotlib.use("Agg")
%matplotlib inline
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, len(outputs), figsize=(9, 3.4))
for ax, mapset in zip(np.atleast_1d(axes), outputs):
    total = sum(np.asarray(m.hist) for m in mapset)
    im = ax.imshow(total.T, origin="lower", aspect="auto", cmap="viridis")
    ax.set_title(f"{mapset.name}: {total.shape}")
    ax.set_xlabel("energy bin")
    ax.set_ylabel("coszen bin")
    fig.colorbar(im, ax=ax)
fig.tight_layout()"""),
    ("md", """\
The two selections are mutually exclusive by construction — the pipeline
validates the selection cuts at init (cf. reference
`pipeline.py:685,714`) — so the same event can never be double-counted
across MapSets."""),
]


ALL_NOTEBOOKS = (
    ("oscillograms", OSC),
    ("icecube_3y_fit", ICECUBE),
    ("mcmc", MCMC),
    ("multi_detector", MULTIDET),
    ("variable_binning", VARBIN),
)


def main():
    import argparse
    import os
    import pathlib

    known = [name for name, _ in ALL_NOTEBOOKS]
    ap = argparse.ArgumentParser(
        description="Execute and write the example notebooks."
    )
    ap.add_argument(
        "notebooks", nargs="*", metavar="NOTEBOOK",
        help=f"subset to build (default: all). Choices: {', '.join(known)}",
    )
    ap.add_argument(
        "--outdir", default="examples/notebooks",
        help="output directory (default: %(default)s)",
    )
    args = ap.parse_args()
    unknown = sorted(set(args.notebooks) - set(known))
    if unknown:
        ap.error(f"unknown notebook name(s) {unknown};"
                 f" choices: {', '.join(known)}")
    only = set(args.notebooks)
    outdir = pathlib.Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    todo = [
        (name, cells)
        for name, cells in ALL_NOTEBOOKS
        if not only or name in only
    ]
    for name, cells in todo:
        nb = _nb(cells)
        print(f"executing {name}.ipynb ...", flush=True)
        client = NotebookClient(
            nb, timeout=1800, kernel_name="python3",
            resources={"metadata": {"path": "."}},
        )
        client.execute()
        path = outdir / f"{name}.ipynb"
        nbformat.write(nb, path)
        n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
        print(f"wrote {path} ({n_out} outputs)")


if __name__ == "__main__":
    main()
