"""
Multi-detector joint fit (cf. reference
``pisa_examples/Multi_detector_test.ipynb``): two detectors observing the
same oscillation physics (shared theta23/deltam31) with independent
detector-systematic params (suffixed with the detector name), fit jointly
with the Detectors container.
"""

import tempfile
from pathlib import Path

from pisa_tpu import ureg
from pisa_tpu.analysis.analysis import Analysis
from pisa_tpu.core.detectors import Detectors
from pisa_tpu.utils.resources import find_resource


def _detector_config(tmpdir, det_name):
    """A copy of the toy pipeline tagged with a detector name."""
    text = open(find_resource("settings/pipeline/toy_fit_example.cfg")).read()
    text = text.replace(
        "name = neutrinos", f"name = neutrinos\ndetector_name = {det_name}"
    )
    path = Path(tmpdir) / f"{det_name}.cfg"
    path.write_text(text)
    return str(path)


def main():
    with tempfile.TemporaryDirectory() as tmpdir:
        detectors = Detectors(
            [
                _detector_config(tmpdir, "detA"),
                _detector_config(tmpdir, "detB"),
            ],
            shared_params=["theta23", "deltam31", "theta13", "delta_index"],
        )
        print("joint free params:", detectors.params.free.names)

        # fit the shared angle plus the second detector's own efficiency
        # (a per-detector systematic); fix the rest for a crisp demo
        for p in detectors.params.free:
            if p.name not in ("theta23", "aeff_scale_detB"):
                p.is_fixed = True

        # Asimov truth
        detectors.params["theta23"].value = 42.0 * ureg.degree
        data = detectors.get_outputs(return_sum=True)
        detectors.params["theta23"].value = 44.0 * ureg.degree

        ana = Analysis()
        result = ana.fit_recursively(
            data, detectors, "mod_chi2", None, "gradient", {}, None
        )
        print(
            "joint fit: metric %.3g, theta23 = %s"
            % (result.metric_val, result.params["theta23"].value)
        )
        return result


if __name__ == "__main__":
    main()
