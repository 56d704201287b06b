"""
Pipeline config parser (cf. reference ``pisa/utils/config_parser.py``).

Supports the full reference cfg dialect:

- ``#include path [as name]`` preprocessing (``as name`` wraps the included
  file's keys in a ``[name]`` section, enabling ``${name:key}`` references)
- ini format with ExtendedInterpolation
- ``[binning]`` section: ``<name>.order`` + per-dimension eval'd dicts
  (namespace restricted to ``units``/``np``), VarBinning via ``<name>.split``
- ``[pipeline]`` section: order, name, detector_name, output_binning,
  output_key, param_selections
- ``[<stage>.<service>]`` sections with calc_mode/apply_mode/error_method/
  debug_mode/profile + service kwargs + ``param.*`` definitions:
  ``value +/- stddev * units.u`` Gaussian shorthand, ``.fixed``, ``.range``
  (incl. ``nominal``/``sigma`` references), ``.prior`` (uniform/jeffreys/
  spline w/ ``.prior.data``), ``.tex``, ``.scales_as_log``, selector-scoped
  ``param.<selector>.<name>``, derived params via ``.depends_names``
- params already defined by an earlier stage are shared by object identity
"""

from __future__ import annotations

import configparser
import os
import re
from collections import OrderedDict

import numpy as np

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning, VarBinning
from pisa_tpu.core.param import DerivedParam, Param, ParamSelector
from pisa_tpu.core.prior import Prior
from pisa_tpu.units import Quantity
from pisa_tpu.utils.fileio import from_file
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = [
    "PISAConfigParser",
    "parse_pipeline_config",
    "parse_quantity",
    "parse_string_literal",
]

STAGE_SEP = "."
PARAM_RE = re.compile(r"^param\.(?P<subfields>.*)$", re.IGNORECASE)
PARAM_ATTRS = [
    "range",
    "prior",
    "fixed",
    "tex",
    "scales_as_log",
    "unique_id",
    "depends_names",
    "function_file",
]

_INCLUDE_RE = re.compile(
    r"^#include\s+(?P<path>\S+)(?:\s+as\s+(?P<name>\S+))?\s*$"
)


def split(string, sep=","):
    """Split a comma (or `sep`) separated string into stripped pieces."""
    return [x.strip() for x in str(string).split(sep) if x.strip() != ""]


def _preprocess(path, seen=None):
    """Expand #include directives recursively into a single text."""
    seen = seen or set()
    path = find_resource(path)
    if path in seen:
        raise ValueError(f"Circular #include of {path}")
    seen = seen | {path}
    lines = []
    with open(path) as f:
        for line in f:
            m = _INCLUDE_RE.match(line.strip())
            if m:
                inc_text = _preprocess(m.group("path"), seen)
                name = m.group("name")
                if name:
                    lines.append(f"[{name}]")
                lines.append(inc_text)
            else:
                lines.append(line.rstrip("\n"))
    return "\n".join(lines)


class PISAConfigParser(configparser.ConfigParser):
    """ConfigParser preconfigured for the PISA dialect."""

    def __init__(self):
        super().__init__(
            interpolation=configparser.ExtendedInterpolation(),
            inline_comment_prefixes=("#",),
        )
        self.optionxform = str  # preserve case

    def read(self, filenames, encoding=None):
        if isinstance(filenames, str):
            filenames = [filenames]
        for fname in filenames:
            self.read_string(_preprocess(fname))


class _UQuant:
    """A parsed quantity with optional gaussian uncertainty (stand-in for
    pint+uncertainties; exposes .nominal_value/.std_dev/.units/.n/.s)."""

    def __init__(self, nominal, std_dev, units):
        self.nominal_value = self.n = nominal
        self.std_dev = self.s = std_dev
        self.units = units

    @property
    def quantity(self):
        return Quantity(self.nominal_value, self.units)


def parse_quantity(string):
    """Parse strings like ``'1.2 +/- 0.7 * units.meter'`` (spaces and the
    ``*`` optional; cf. reference ``config_parser.py:303``)."""
    value = str(string).replace(" ", "")
    if "units." in value:
        value, unit = value.split("units.")
        unit = ureg.parse_units(unit)
    else:
        unit = ureg.dimensionless
    value = value.rstrip("*")
    if "+/-" in value:
        nom_s, std_s = value.split("+/-")
        nominal, std = float(nom_s), float(std_s.rstrip("*"))
    else:
        nominal, std = float(value), None
    return _UQuant(nominal, std, unit)


def parse_string_literal(string):
    s = str(string).strip().lower()
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "none":
        return None
    return string


def interpret_param_subfields(subfields, selector=None, pname=None, attr=None):
    """Decompose ``param.[selector.]name[.attr...]`` subfields
    (cf. reference ``config_parser.py:395``)."""
    infodict = dict(subfields=list(subfields), selector=selector, pname=pname, attr=attr)
    if not infodict["subfields"]:
        return infodict
    if len(infodict["subfields"]) == 1:
        infodict["pname"] = infodict["subfields"].pop()
        return interpret_param_subfields(**infodict)
    attr_indices = [
        n for n, field in enumerate(infodict["subfields"]) if field in PARAM_ATTRS
    ]
    if len(attr_indices) == 1:
        attr_idx = attr_indices[0]
        infodict["attr"] = [
            infodict["subfields"].pop(attr_idx)
            for _ in range(attr_idx, len(infodict["subfields"]))
        ]
        return interpret_param_subfields(**infodict)
    if len(attr_indices) > 1:
        raise ValueError(f"Multiple attrs in param spec {subfields}")
    if len(infodict["subfields"]) == 2:
        infodict["pname"] = infodict["subfields"].pop()
        infodict["selector"] = infodict["subfields"].pop()
        return interpret_param_subfields(**infodict)
    raise ValueError(f"Cannot parse param subfields {subfields}")


class _EvalNS(dict):
    """Restricted-eval namespace for binning dicts / ranges."""

    def __init__(self, extra=None):
        super().__init__()
        self["np"] = np
        self["units"] = ureg
        self["FTYPE"] = FTYPE
        self["inf"] = np.inf
        if extra:
            self.update(extra)

    def __missing__(self, name):
        raise NameError(f"Name {name!r} not allowed in config expression")


def _safe_eval(expr, extra=None):
    return eval(expr, {"__builtins__": {}}, _EvalNS(extra))  # noqa: S307


def parse_param(config, section, selector, fullname, pname, value):
    """Build a Param from a config option + its attr options
    (cf. reference ``config_parser.py:454``)."""
    kwargs = dict(name=pname, is_fixed=True, prior=None, range=None)
    uq = None
    try:
        uq = parse_quantity(value)
        kwargs["value"] = Quantity(uq.nominal_value, uq.units)
    except ValueError:
        kwargs["value"] = parse_string_literal(value)

    def opt(attr):
        key = f"{fullname}.{attr}"
        return config.get(section, key) if config.has_option(section, key) else None

    if opt("fixed") is not None:
        kwargs["is_fixed"] = config.getboolean(section, f"{fullname}.fixed")
    if opt("scales_as_log") is not None:
        kwargs["scales_as_log"] = config.getboolean(
            section, f"{fullname}.scales_as_log"
        )
    if opt("unique_id") is not None:
        kwargs["unique_id"] = opt("unique_id")
    if opt("tex") is not None:
        kwargs["tex"] = opt("tex")

    range_spec = opt("range")
    if range_spec is not None:
        extra = {}
        if "nominal" in range_spec:
            extra["nominal"] = Quantity(uq.nominal_value, uq.units)
        if "sigma" in range_spec:
            extra["sigma"] = Quantity(uq.std_dev, uq.units)
        range_spec = range_spec.replace("[", "np.array([").replace(
            "]", "], dtype=FTYPE)"
        )
        rng = _safe_eval(range_spec, extra)
        if not isinstance(rng, Quantity):
            rng = Quantity(np.asarray(rng), ureg.dimensionless)
        rng = rng.to(uq.units)
        kwargs["range"] = (rng[0], rng[1])

    if opt("function_file") is not None:
        kwargs["function_file"] = opt("function_file")
    if opt("depends_names") is not None:
        del kwargs["is_fixed"]
        del kwargs["prior"]
        kwargs.pop("range", None)
        kwargs["depends_names"] = opt("depends_names").split(" ")

    prior_spec = opt("prior")
    if prior_spec is not None:
        prior = str(prior_spec).strip().lower()
        if prior == "uniform":
            kwargs["prior"] = Prior(kind="uniform")
        elif prior == "jeffreys":
            kwargs["prior"] = Prior(
                kind="jeffreys", A=kwargs["range"][0], B=kwargs["range"][1]
            )
        elif prior == "spline":
            priorname = pname + (f"_{selector}" if selector else "")
            data = from_file(opt("prior.data"))
            data = data[priorname]
            knots = Quantity(
                np.asarray(data["knots"]), ureg.parse_units(data["units"])
            ).to(uq.units)
            kwargs["prior"] = Prior(
                kind="spline",
                knots=knots,
                coeffs=np.asarray(data["coeffs"]),
                deg=int(np.asarray(data["deg"])),
            )
        elif prior == "none":
            kwargs["prior"] = None
        elif "gauss" in prior:
            raise ValueError(
                "Use the +/- notation for gaussian priors in configs"
            )
        else:
            raise ValueError(f"Unknown prior type {prior_spec!r}")
    elif uq is not None and uq.std_dev is not None:
        kwargs["prior"] = Prior(
            kind="gaussian",
            mean=Quantity(uq.nominal_value, uq.units),
            stddev=Quantity(uq.std_dev, uq.units),
        )

    if "depends_names" in kwargs:
        return DerivedParam(**kwargs)
    return Param(**kwargs)


def _parse_multidimbinning(config, binning, order):
    bins = []
    for bin_name in order:
        def_raw = config.get("binning", f"{binning}.{bin_name}")
        bin_kwargs = _safe_eval(def_raw)
        bins.append(OneDimBinning(name=bin_name, **bin_kwargs))
    mask = config["binning"].get(f"{binning}.mask", None)
    if mask is not None:
        mask = _safe_eval(mask)
    return MultiDimBinning(dimensions=bins, name=binning, mask=mask)


def _parse_varbinning(config, binning, order, bin_split):
    try:
        parsed_split = _safe_eval(bin_split)
    except Exception:
        selections = split(bin_split)
        nsel = len(selections)
    else:
        if isinstance(parsed_split, dict):
            selections = OneDimBinning(**parsed_split)
            nsel = selections.num_bins
        else:
            selections = split(bin_split)
            nsel = len(selections)

    bins = [[] for _ in range(nsel)]
    for bin_name in order:
        def_raw = config.get("binning", f"{binning}.{bin_name}")
        bin_kwargs = _safe_eval(def_raw)
        if isinstance(bin_kwargs, (list, tuple)):
            if len(bin_kwargs) != nsel:
                raise ValueError(
                    f"{binning}.{bin_name}: got {len(bin_kwargs)} binning"
                    f" defs for {nsel} selections"
                )
            kw_list = list(bin_kwargs)
        else:
            kw_list = [bin_kwargs] * nsel
        for i, kw in enumerate(kw_list):
            bins[i].append(OneDimBinning(name=bin_name, **kw))

    multibins = [
        MultiDimBinning(dimensions=bins[i], name=f"{binning}_{i}")
        for i in range(nsel)
    ]
    return VarBinning(binnings=multibins, selections=selections)


def parse_pipeline_config(config):
    """Parse a pipeline config into an OrderedDict: key 'pipeline' holds
    pipeline-level settings; (stage, service) tuples hold service kwargs
    (cf. reference ``config_parser.py:700``)."""
    if isinstance(config, str):
        parser = PISAConfigParser()
        parser.read(config)
        config = parser
    elif not isinstance(config, configparser.ConfigParser):
        raise TypeError(f"Cannot interpret config {type(config)}")

    if not config.has_section("binning"):
        raise configparser.NoSectionError("binning")

    binning_dict = {}
    for name in config["binning"]:
        if name.endswith(".order"):
            order = split(config.get("binning", name))
            binning = name.rsplit(".", 1)[0]
            bin_split = config["binning"].get(f"{binning}.split", None)
            if bin_split is not None:
                binning_dict[binning] = _parse_varbinning(
                    config, binning, order, bin_split
                )
            else:
                binning_dict[binning] = _parse_multidimbinning(
                    config, binning, order
                )

    stage_dicts = OrderedDict()
    section = "pipeline"
    stage_dicts[section] = {}
    order = [split(x, STAGE_SEP) for x in split(config.get(section, "order"))]
    stage_dicts[section]["name"] = (
        config.get(section, "name") if config.has_option(section, "name") else "none"
    )
    if config.has_option(section, "output_binning"):
        stage_dicts[section]["output_binning"] = binning_dict[
            config.get(section, "output_binning")
        ]
        output_key = split(config.get(section, "output_key"))
        stage_dicts[section]["output_key"] = (
            output_key[0] if len(output_key) == 1 else tuple(output_key)
        )
    else:
        stage_dicts[section]["output_binning"] = None
        stage_dicts[section]["output_key"] = None

    param_selections = []
    if config.has_option(section, "param_selections"):
        param_selections = split(config.get(section, "param_selections"))
    stage_dicts[section]["param_selections"] = param_selections

    stage_dicts[section]["detector_name"] = (
        config.get(section, "detector_name")
        if config.has_option(section, "detector_name")
        else None
    )

    for stage, service in order:
        sec = f"{stage}{STAGE_SEP}{service}"
        if not config.has_section(sec):
            raise IOError(f"Missing config section [{sec}]")

        service_kwargs = OrderedDict()
        param_selector = ParamSelector(selections=param_selections)
        service_kwargs["params"] = param_selector
        n_params = 0

        for fullname in config.options(sec):
            value = config.get(sec, fullname)
            param_match = PARAM_RE.match(fullname)
            if param_match is not None:
                n_params += 1
                subfields = param_match.groupdict()["subfields"].split(".")
                infodict = interpret_param_subfields(subfields=subfields)
                if infodict["attr"] is not None:
                    continue

                # shared param from an earlier stage?
                param = None
                for kw in stage_dicts.values():
                    if "params" not in kw:
                        continue
                    try:
                        param = kw["params"].get(
                            name=infodict["pname"],
                            selector=infodict["selector"],
                        )
                    except KeyError:
                        continue
                    for a in PARAM_ATTRS:
                        if config.has_option(sec, f"{fullname}.{a}"):
                            raise ValueError(
                                f"Param {fullname!r} in [{sec}] redefines"
                                f" attr {a!r} of a param from an earlier"
                                " stage"
                            )
                    break
                if param is None:
                    param = parse_param(
                        config=config,
                        section=sec,
                        selector=infodict["selector"],
                        fullname=fullname,
                        pname=infodict["pname"],
                        value=value,
                    )
                param_selector.update_param(
                    param, selector=infodict["selector"]
                )
            elif value in binning_dict:
                service_kwargs[fullname] = binning_dict[value]
            elif "binning" in fullname:
                service_kwargs[fullname] = binning_dict[value]
            elif fullname in ("calc_mode", "apply_mode", "output_format"):
                parsed = parse_string_literal(value)
                if parsed is None:
                    service_kwargs[fullname] = None
                elif parsed in binning_dict:
                    service_kwargs[fullname] = binning_dict[parsed]
                else:
                    service_kwargs[fullname] = parsed
            elif fullname.endswith("_names"):
                service_kwargs[fullname] = split(value)
            else:
                if re.search(r"units\.[a-z]+", value, flags=re.IGNORECASE):
                    try:
                        uq = parse_quantity(value)
                        service_kwargs[fullname] = Quantity(
                            uq.nominal_value, uq.units
                        )
                    except ValueError:
                        service_kwargs[fullname] = parse_string_literal(value)
                else:
                    service_kwargs[fullname] = parse_string_literal(value)

        if n_params == 0:
            service_kwargs.pop("params")
        stage_dicts[(stage, service)] = service_kwargs

    return stage_dicts
