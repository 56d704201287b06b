"""
VarBinning output (cf. reference
``pisa_examples/Variable_binning_example.ipynb``): one pipeline, events
split into mutually-exclusive selections (here: two PID bands), each
histogrammed under its own MultiDimBinning. The pipeline returns a list of
MapSets, one per selection.
"""

from pisa_tpu.core.pipeline import Pipeline


def main():
    pipeline = Pipeline("settings/pipeline/varbin_example.cfg")
    outputs = pipeline.get_outputs()
    for i, mapset in enumerate(outputs):
        shapes = {m.name: m.hist.shape for m in mapset}
        total = sum(m.hist.sum() for m in mapset)
        print(
            f"selection {i} ({mapset.name}): binning"
            f" {next(iter(shapes.values()))}, total {total:.5g}"
        )
    return outputs


if __name__ == "__main__":
    main()
