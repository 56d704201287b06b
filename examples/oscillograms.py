"""
Quick-start: oscillograms (cf. reference ``pisa_examples/README.ipynb``).

Builds the oscillogram pipeline (toy grid "events" -> Barr flux -> prob3),
runs it, and plots the P(numu -> numu) survival map over (E, cos zen).
"""

import numpy as np

from pisa_tpu.core.pipeline import Pipeline


def main(plot=True):
    pipeline = Pipeline("settings/pipeline/osc_example.cfg")
    maps = pipeline.get_outputs()
    print(f"{len(maps)} maps; names: {[m.name for m in maps][:6]} ...")

    numu = maps["numu_cc"]
    print(
        "numu_cc survival-weighted map: shape %s, total %.5g"
        % (numu.hist.shape, numu.hist.sum())
    )

    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            numu.plot(outdir=".", fname="oscillogram_numu_cc")
            print("wrote oscillogram_numu_cc.png")
        except Exception as exc:  # plotting optional
            print(f"(plot skipped: {exc})")
    return maps


if __name__ == "__main__":
    main()
