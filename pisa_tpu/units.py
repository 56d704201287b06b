"""
Minimal unit system with a pint-compatible API surface.

The reference framework (``pisa/__init__.py:76-82``) uses the ``pint`` package
for unit-tagged parameter values (``ureg``, ``Q_``). pint is not available in
this environment, and only a small, fixed vocabulary of units is actually
exercised by analysis configs (lengths, times, energies, angles, mass
densities, dimensionless). This module implements exactly that surface:

- ``ureg.<name>`` returns a :class:`Unit`
- ``value * unit`` / ``unit * value`` returns a :class:`Quantity`
- ``Quantity`` supports ``+ - * / **``, comparisons, ``.m``, ``.magnitude``,
  ``.units``, ``.m_as(...)``, ``.to(...)``, ``.dimensionality``, ``.compatible``
- angles (rad/deg) and steradian are dimensionless for conversion purposes
  (as in pint), but unit *identity* distinguishes them, so code can enforce
  "angle parameters must carry rad/deg" (cf. reference ``prob3.py:480-482``).

Units stay at the host boundary: magnitudes are stripped (``m_as``) before
anything enters a jitted function.
"""

from __future__ import annotations

import math
import numbers

import numpy as np

__all__ = ["Unit", "Quantity", "UnitRegistry", "ureg", "DimensionalityError"]


class DimensionalityError(ValueError):
    """Raised when converting between incompatible dimensionalities."""


def _norm_parts(parts):
    """Merge duplicate symbols, drop zero exponents, and sort."""
    acc = {}
    for sym, exp in parts:
        acc[sym] = acc.get(sym, 0) + exp
    return tuple(sorted((s, e) for s, e in acc.items() if e != 0))


def _norm_dims(dims):
    return tuple(sorted((d, e) for d, e in dims.items() if e != 0))


class Unit:
    """A (possibly compound) unit: scale & base dimensions, plus symbolic parts
    retained for display and identity (so that e.g. ``deg != rad`` even though
    both are dimensionless for conversion purposes)."""

    __slots__ = ("scale", "dims", "parts")
    __array_priority__ = 100  # make ndarray * Unit defer to Unit.__rmul__

    def __init__(self, scale, dims, parts):
        self.scale = float(scale)
        self.dims = _norm_dims(dict(dims)) if isinstance(dims, dict) else tuple(dims)
        self.parts = _norm_parts(parts)

    # -- algebra ------------------------------------------------------------
    def _combine(self, other, sign):
        dims = dict(self.dims)
        for d, e in other.dims:
            dims[d] = dims.get(d, 0) + sign * e
        scale = self.scale * (other.scale if sign > 0 else 1.0 / other.scale)
        parts = list(self.parts) + [(s, sign * e) for s, e in other.parts]
        return Unit(scale, dims, parts)

    def __mul__(self, other):
        if isinstance(other, Unit):
            return self._combine(other, +1)
        return Quantity(other, self)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Unit):
            return self._combine(other, -1)
        return Quantity(1.0 / other, self)

    def __rtruediv__(self, other):
        return Quantity(other, self**-1)

    def __pow__(self, n):
        if not isinstance(n, numbers.Real):
            return NotImplemented
        dims = {d: e * n for d, e in self.dims}
        parts = [(s, e * n) for s, e in self.parts]
        return Unit(self.scale**n, dims, parts)

    # -- identity -----------------------------------------------------------
    def __eq__(self, other):
        if not isinstance(other, Unit):
            return NotImplemented
        return self.parts == other.parts

    def __hash__(self):
        return hash(self.parts)

    @property
    def dimensionality(self):
        return dict(self.dims)

    @property
    def dimensionless(self):
        return not self.dims

    def compatible(self, other):
        return self.dims == other.dims

    def __str__(self):
        if not self.parts:
            return "dimensionless"

        def fmt(sym, exp):
            if exp == 1:
                return sym
            iexp = int(exp)
            return f"{sym} ** {iexp if iexp == exp else exp}"

        num = [fmt(s, e) for s, e in self.parts if e > 0]
        den = [fmt(s, -e) for s, e in self.parts if e < 0]
        out = " * ".join(num) if num else "1"
        if den:
            out += " / " + " / ".join(den)
        return out

    def __repr__(self):
        return f"<Unit('{self}')>"

    def __format__(self, spec):
        return format(str(self), spec.lstrip("~P"))


class Quantity:
    """A magnitude (scalar or ndarray) tagged with a :class:`Unit`."""

    __slots__ = ("_m", "_u")
    __array_priority__ = 100

    def __init__(self, magnitude, units=None):
        if isinstance(magnitude, Quantity):
            if units is not None:
                magnitude = magnitude.to(units)
            self._m, self._u = magnitude._m, magnitude._u
            return
        if units is None:
            units = DIMENSIONLESS
        elif isinstance(units, str):
            units = ureg.parse_units(units)
        self._m = magnitude
        self._u = units

    # -- accessors ----------------------------------------------------------
    @property
    def magnitude(self):
        return self._m

    m = magnitude

    @property
    def units(self):
        return self._u

    u = units

    @property
    def dimensionality(self):
        return self._u.dimensionality

    @property
    def dimensionless(self):
        return self._u.dimensionless

    def m_as(self, units):
        """Magnitude converted to `units` (str or Unit)."""
        if isinstance(units, str):
            units = ureg.parse_units(units)
        if self._u.dims != units.dims:
            raise DimensionalityError(
                f"Cannot convert from '{self._u}' {self._u.dims} to "
                f"'{units}' {units.dims}"
            )
        factor = self._u.scale / units.scale
        if factor == 1.0:
            return self._m
        return self._m * factor

    def to(self, units):
        if isinstance(units, str):
            units = ureg.parse_units(units)
        return Quantity(self.m_as(units), units)

    def to_base_units(self):
        base = Unit(1.0, dict(self._u.dims), [(d, e) for d, e in self._u.dims])
        return Quantity(self.m_as(base), base)

    # -- arithmetic ---------------------------------------------------------
    @staticmethod
    def _coerce(other):
        if isinstance(other, Quantity):
            return other
        if isinstance(other, Unit):
            return Quantity(1.0, other)
        return Quantity(other, DIMENSIONLESS)

    def __add__(self, other):
        other = self._coerce(other)
        return Quantity(self._m + other.m_as(self._u), self._u)

    __radd__ = __add__

    def __sub__(self, other):
        other = self._coerce(other)
        return Quantity(self._m - other.m_as(self._u), self._u)

    def __rsub__(self, other):
        other = self._coerce(other)
        return Quantity(other.m_as(self._u) - self._m, self._u)

    def __mul__(self, other):
        if isinstance(other, Unit):
            other = Quantity(1.0, other)
        if isinstance(other, Quantity):
            return Quantity(self._m * other._m, self._u * other._u)
        return Quantity(self._m * other, self._u)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Unit):
            other = Quantity(1.0, other)
        if isinstance(other, Quantity):
            return Quantity(self._m / other._m, self._u / other._u)
        return Quantity(self._m / other, self._u)

    def __rtruediv__(self, other):
        if isinstance(other, Unit):
            other = Quantity(1.0, other)
        if isinstance(other, Quantity):
            return other / self
        return Quantity(other / self._m, self._u**-1)

    def __pow__(self, n):
        return Quantity(self._m**n, self._u**n)

    def __neg__(self):
        return Quantity(-self._m, self._u)

    def __pos__(self):
        return Quantity(+self._m, self._u)

    def __abs__(self):
        return Quantity(abs(self._m), self._u)

    # -- comparisons --------------------------------------------------------
    def _cmp_val(self, other):
        return self._coerce(other).m_as(self._u)

    def __eq__(self, other):
        try:
            return self._m == self._cmp_val(other)
        except DimensionalityError:
            return False

    def __ne__(self, other):
        result = self.__eq__(other)
        if isinstance(result, np.ndarray):
            return ~result
        return not result

    def __lt__(self, other):
        return self._m < self._cmp_val(other)

    def __le__(self, other):
        return self._m <= self._cmp_val(other)

    def __gt__(self, other):
        return self._m > self._cmp_val(other)

    def __ge__(self, other):
        return self._m >= self._cmp_val(other)

    def __hash__(self):
        base = self.to_base_units()
        m = base.magnitude
        if isinstance(m, np.ndarray):
            m = m.tobytes()
        return hash((m, base.units))

    # -- sequence / misc ----------------------------------------------------
    def __len__(self):
        return len(self._m)

    def __iter__(self):
        return (Quantity(v, self._u) for v in self._m)

    def __getitem__(self, idx):
        return Quantity(self._m[idx], self._u)

    def __float__(self):
        return float(self.m_as(DIMENSIONLESS))

    def __bool__(self):
        return bool(self._m)

    @property
    def shape(self):
        return np.shape(self._m)

    @property
    def size(self):
        return np.size(self._m)

    def astype(self, dtype):
        return Quantity(np.asarray(self._m).astype(dtype), self._u)

    def __str__(self):
        return f"{self._m} {self._u}"

    def __repr__(self):
        return f"<Quantity({self._m!r}, '{self._u}')>"

    def __format__(self, spec):
        spec = spec.replace("~", "").replace("P", "")
        if spec:
            try:
                return f"{format(self._m, spec)} {self._u}"
            except (TypeError, ValueError):
                pass
        return str(self)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
def _u(scale, dims, sym):
    return Unit(scale, dims, [(sym, 1)] if sym else [])


_DAY_S = 86400.0

_CANONICAL = {
    # dimensionless & angles (angles are dimensionless for conversions)
    "dimensionless": _u(1.0, {}, ""),
    "radian": _u(1.0, {}, "rad"),
    "degree": _u(math.pi / 180.0, {}, "deg"),
    "steradian": _u(1.0, {}, "sr"),
    "percent": _u(0.01, {}, "%"),
    # length
    "meter": _u(1.0, {"m": 1}, "m"),
    "centimeter": _u(1e-2, {"m": 1}, "cm"),
    "millimeter": _u(1e-3, {"m": 1}, "mm"),
    "kilometer": _u(1e3, {"m": 1}, "km"),
    # time
    "second": _u(1.0, {"s": 1}, "s"),
    "millisecond": _u(1e-3, {"s": 1}, "ms"),
    "minute": _u(60.0, {"s": 1}, "min"),
    "hour": _u(3600.0, {"s": 1}, "h"),
    "day": _u(_DAY_S, {"s": 1}, "d"),
    "common_year": _u(365.0 * _DAY_S, {"s": 1}, "common_year"),
    "julian_year": _u(365.25 * _DAY_S, {"s": 1}, "a"),
    # energy (eV is the base)
    "electron_volt": _u(1.0, {"eV": 1}, "eV"),
    "kiloelectron_volt": _u(1e3, {"eV": 1}, "keV"),
    "megaelectron_volt": _u(1e6, {"eV": 1}, "MeV"),
    "gigaelectron_volt": _u(1e9, {"eV": 1}, "GeV"),
    "teraelectron_volt": _u(1e12, {"eV": 1}, "TeV"),
    "petaelectron_volt": _u(1e15, {"eV": 1}, "PeV"),
    # mass
    "gram": _u(1.0, {"g": 1}, "g"),
    "kilogram": _u(1e3, {"g": 1}, "kg"),
}

_ALIASES = {
    "": "dimensionless",
    "rad": "radian",
    "radians": "radian",
    "deg": "degree",
    "degrees": "degree",
    "sr": "steradian",
    "m": "meter",
    "metre": "meter",
    "meters": "meter",
    "cm": "centimeter",
    "mm": "millimeter",
    "km": "kilometer",
    "kilometers": "kilometer",
    "s": "second",
    "sec": "second",
    "secs": "second",
    "seconds": "second",
    "ms": "millisecond",
    "min": "minute",
    "minutes": "minute",
    "h": "hour",
    "hours": "hour",
    "d": "day",
    "days": "day",
    "year": "julian_year",
    "years": "julian_year",
    "yr": "julian_year",
    "a": "julian_year",
    "eV": "electron_volt",
    "keV": "kiloelectron_volt",
    "MeV": "megaelectron_volt",
    "GeV": "gigaelectron_volt",
    "TeV": "teraelectron_volt",
    "PeV": "petaelectron_volt",
    "g": "gram",
    "kg": "kilogram",
}


class UnitRegistry:
    """pint-style unit registry: ``ureg.GeV``, ``ureg('2.5 km')``,
    ``ureg.parse_units('eV ** 2')``."""

    def __init__(self):
        self._units = dict(_CANONICAL)
        for alias, canon in _ALIASES.items():
            if alias:
                self._units[alias] = self._units[canon]

    def __getattr__(self, name):
        try:
            return self._units[name]
        except KeyError:
            raise AttributeError(f"Unknown unit: {name!r}") from None

    def __getitem__(self, name):
        return self.parse_units(name)

    def parse_units(self, text) -> Unit:
        """Parse a unit expression like ``'eV ** 2'`` or ``'km'``."""
        if isinstance(text, Unit):
            return text
        text = text.strip()
        if text in ("", "dimensionless"):
            return DIMENSIONLESS
        if text in self._units:
            return self._units[text]
        try:
            result = eval(  # noqa: S307 - namespace restricted to units
                text.replace("^", "**"), {"__builtins__": {}}, _EvalNS(self)
            )
        except Exception as exc:
            raise ValueError(f"Cannot parse units from {text!r}: {exc}") from exc
        if isinstance(result, Quantity):
            if result.magnitude != 1:
                raise ValueError(f"Unit expression {text!r} has a magnitude")
            return result.units
        if not isinstance(result, Unit):
            raise ValueError(f"{text!r} did not evaluate to a unit")
        return result

    def parse_expression(self, text) -> Quantity:
        """Parse a quantity expression like ``'2.5 * km'`` or ``'3 GeV'``."""
        text = text.strip()
        tokens = text.split(None, 1)
        # Allow "<number> <units>" without explicit '*'
        if len(tokens) == 2:
            try:
                mag = float(tokens[0])
            except ValueError:
                pass
            else:
                try:
                    return Quantity(mag, self.parse_units(tokens[1]))
                except ValueError:
                    pass
        try:
            result = eval(  # noqa: S307 - namespace restricted to units
                text.replace("^", "**"), {"__builtins__": {}}, _EvalNS(self)
            )
        except Exception:
            return Quantity(float(text), DIMENSIONLESS)
        if isinstance(result, Unit):
            return Quantity(1.0, result)
        if not isinstance(result, Quantity):
            return Quantity(result, DIMENSIONLESS)
        return result

    __call__ = parse_expression

    @property
    def Quantity(self):
        return Quantity


class _EvalNS(dict):
    """Namespace for restricted eval of unit expressions: resolves unit names
    and exposes ``units`` (self-reference) and ``np`` for config dicts."""

    def __init__(self, registry):
        super().__init__()
        self._registry = registry

    def __missing__(self, name):
        if name in ("units", "ureg", "u"):
            return self._registry
        if name in ("np", "numpy"):
            return np
        try:
            return self._registry._units[name]
        except KeyError:
            raise NameError(f"Unknown unit {name!r}") from None


ureg = UnitRegistry()
DIMENSIONLESS = _CANONICAL["dimensionless"]
