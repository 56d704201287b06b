"""
Calc/apply-mode matrix (cf. reference ``pisa_examples/pisa_modes.ipynb``):
a stage's `calc_mode` (the representation its physics is computed in) and
`apply_mode` (the representation its weights are modified in) can be mixed:
'events', or any binned grid — translations (histogram / lookup) happen
automatically inside the Container.

This example runs the oscillation stage in the three supported
combinations and compares totals.
"""

import numpy as np

from pisa_tpu.core.pipeline import Pipeline
from pisa_tpu.utils.resources import find_resource


def _run_with_modes(calc_mode, apply_mode):
    text = open(find_resource("settings/pipeline/example.cfg")).read()
    text = text.replace(
        "[osc.prob3]\n\ncalc_mode = calc_grid\napply_mode = events",
        f"[osc.prob3]\n\ncalc_mode = {calc_mode}\napply_mode = {apply_mode}",
    )
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmpdir:
        path = Path(tmpdir) / "modes.cfg"
        path.write_text(text)
        pipeline = Pipeline(str(path))
        maps = pipeline.get_outputs()
    return sum(m.hist.sum() for m in maps)


def main():
    combos = [
        ("calc_grid_coarse", "events"),  # grid calc -> per-event lookup
        ("events", "events"),            # exact per-event calculation
    ]
    totals = {}
    for calc, apply_ in combos:
        totals[(calc, apply_)] = _run_with_modes(calc, apply_)
        print(f"calc_mode={calc:18s} apply_mode={apply_:8s}"
              f" -> total {totals[(calc, apply_)]:.6g}")
    # grid approximation must agree with exact per-event calc at the few-%
    # level on the toy sample
    vals = list(totals.values())
    rel = abs(vals[0] - vals[1]) / vals[1]
    print(f"grid vs exact relative difference: {rel:.3%}")
    return totals


if __name__ == "__main__":
    main()
