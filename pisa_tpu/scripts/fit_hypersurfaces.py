"""
Fit hypersurfaces from a nominal + systematic pipeline datasets definition
(cf. reference ``pisa/scripts/fit_hypersurfaces.py`` +
``hypersurface.py:1598``).

The fit config is a JSON file:

    {
      "pipeline_cfg": "settings/pipeline/....cfg",
      "combine_regex": ["nue.*_cc", ...],           # optional
      "params": {"opt_eff_overall": "linear", ...},
      "nominal_dataset": {"param_values": {...}},
      "sys_datasets": [{"param_values": {...}}, ...],
      "log": false, "norm": true
    }

Each dataset's `param_values` are applied to the pipeline before computing
its MapSet. Output: one JSON with all fitted hypersurfaces (incl.
covariance), loadable by the discr_sys.hypersurfaces stage.
"""

from __future__ import annotations

import argparse


def fit_hypersurfaces_from_pipeline(
    pipeline_cfg, params, nominal_param_values, sys_param_values,
    combine_regex=None, log=False, norm=True,
):
    """Drive a pipeline over nominal+systematic parameter points and fit
    hypersurfaces per map (helper usable from python)."""
    from pisa_tpu.core.pipeline import Pipeline
    from pisa_tpu.utils.hypersurface import fit_hypersurfaces_from_maps

    pipeline = Pipeline(pipeline_cfg)

    def make_mapset(param_values):
        for name, value in param_values.items():
            prm = pipeline.params[name]
            if not hasattr(value, "units"):
                value = value * prm.value.units  # magnitudes in param units
            prm.value = value
        out = pipeline.get_outputs()
        if combine_regex:
            out = out.combine_re(combine_regex)
        return out

    nominal_mapset = make_mapset(nominal_param_values)
    sys_mapsets = [make_mapset(pv) for pv in sys_param_values]
    binning = pipeline.output_binning

    return fit_hypersurfaces_from_maps(
        nominal_mapset=nominal_mapset,
        nominal_param_values=nominal_param_values,
        sys_mapsets=sys_mapsets,
        sys_param_values=sys_param_values,
        binning=binning,
        params=params,
        log=log,
        norm=norm,
        include_nominal=False,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("fit_cfg", help="JSON fit configuration (see docstring)")
    parser.add_argument("-o", "--outfile", required=True)
    parser.add_argument("-v", "--verbose", action="count", default=0)
    args = parser.parse_args(argv)

    from pisa_tpu.utils.fileio import from_file
    from pisa_tpu.utils.hypersurface import save_hypersurfaces
    from pisa_tpu.utils.log import set_verbosity

    set_verbosity(args.verbose)
    cfg = from_file(args.fit_cfg)
    surfaces = fit_hypersurfaces_from_pipeline(
        pipeline_cfg=cfg["pipeline_cfg"],
        params=cfg["params"],
        nominal_param_values=cfg["nominal_dataset"]["param_values"],
        sys_param_values=[d["param_values"] for d in cfg["sys_datasets"]],
        combine_regex=cfg.get("combine_regex"),
        log=cfg.get("log", False),
        norm=cfg.get("norm", True),
    )
    save_hypersurfaces(surfaces, args.outfile)
    print(f"wrote {len(surfaces)} hypersurfaces -> {args.outfile}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
