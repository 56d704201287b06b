"""
Neutrino flavor / interaction-type taxonomy (cf. reference
``pisa/utils/flavInt.py``: ``NuFlav:157``, ``IntType:374``,
``NuFlavInt:509``, ``NuFlavIntGroup:700``, ``FlavIntData:1148``,
``flavintGroupsFromString:1622``).

Compact original implementation of the string algebra used throughout the
framework: parse specs like ``"numu_cc + numubar_cc"``, group/ungroup
flavints, and hold per-flavint data with flexible keying.
"""

from __future__ import annotations

import re
from collections.abc import Iterable
from copy import deepcopy

import numpy as np

__all__ = [
    "NuFlav",
    "IntType",
    "NuFlavInt",
    "NuFlavIntGroup",
    "FlavIntData",
    "FlavIntDataGroup",
    "ALL_NUFLAVS",
    "ALL_NUFLAVINTS",
    "flavint_groups_from_string",
    "flavintGroupsFromString",
]

_FLAV_CODES = {
    "nue": 12, "numu": 14, "nutau": 16,
    "nuebar": -12, "numubar": -14, "nutaubar": -16,
}
_CODE_FLAVS = {v: k for k, v in _FLAV_CODES.items()}
_FLAV_TEX = {
    12: r"{\nu_e}", 14: r"{\nu_\mu}", 16: r"{\nu_\tau}",
    -12: r"{\bar\nu_e}", -14: r"{\bar\nu_\mu}", -16: r"{\bar\nu_\tau}",
}
_INT_CODES = {"cc": 1, "nc": 2}
_CODE_INTS = {v: k for k, v in _INT_CODES.items()}

_CLEAN = re.compile(r"[^a-z0-9]+")


def _sanitize(s):
    return _CLEAN.sub("", str(s).lower())


class NuFlav:
    """A neutrino flavor (possibly anti-): 'nue' ... 'nutaubar'."""

    def __init__(self, val):
        if isinstance(val, NuFlav):
            self.code = val.code
        elif isinstance(val, int):
            if val not in _CODE_FLAVS:
                raise ValueError(f"invalid flavor code {val}")
            self.code = val
        else:
            s = _sanitize(val)
            if s not in _FLAV_CODES:
                raise ValueError(f"invalid NuFlav spec {val!r}")
            self.code = _FLAV_CODES[s]

    @property
    def name(self):
        return _CODE_FLAVS[self.code]

    @property
    def bar_code(self):
        """+1 for particle, -1 for antiparticle."""
        return 1 if self.code > 0 else -1

    @property
    def is_antiparticle(self):
        return self.code < 0

    @property
    def particle(self):
        """True for particle, False for antiparticle (reference API)."""
        return self.code > 0

    def bar(self):
        """The conjugate flavor."""
        return NuFlav(-self.code)

    @property
    def tex(self):
        return _FLAV_TEX[self.code]

    @property
    def flav_index(self):
        """0=e, 1=mu, 2=tau (the convention used in containers)."""
        return (abs(self.code) - 12) // 2

    def __str__(self):
        return self.name

    __repr__ = __str__

    def __eq__(self, other):
        try:
            return NuFlav(other).code == self.code
        except (ValueError, TypeError):
            return NotImplemented

    def __hash__(self):
        return hash(("NuFlav", self.code))

    def __lt__(self, other):
        return _SORT_FLAVS.index(self.code) < _SORT_FLAVS.index(
            NuFlav(other).code
        )


_SORT_FLAVS = [12, -12, 14, -14, 16, -16]


class IntType:
    """Interaction type: 'cc' (1) or 'nc' (2)."""

    def __init__(self, val):
        if isinstance(val, IntType):
            self.code = val.code
        elif isinstance(val, int):
            if val not in _CODE_INTS:
                raise ValueError(f"invalid int-type code {val}")
            self.code = val
        else:
            s = _sanitize(val)
            if s not in _INT_CODES:
                raise ValueError(f"invalid IntType spec {val!r}")
            self.code = _INT_CODES[s]

    @property
    def name(self):
        return _CODE_INTS[self.code]

    @property
    def tex(self):
        return r"{\rm %s}" % self.name.upper()

    def __str__(self):
        return self.name

    __repr__ = __str__

    def __eq__(self, other):
        try:
            return IntType(other).code == self.code
        except (ValueError, TypeError):
            return NotImplemented

    def __hash__(self):
        return hash(("IntType", self.code))


_FLAVINT_RE = re.compile(
    r"^(?P<flav>nue|numu|nutau)(?P<bar>bar)?(?P<int>cc|nc)$"
)


class NuFlavInt:
    """A flavor + interaction type, e.g. 'numu_cc'."""

    def __init__(self, *args):
        if len(args) == 1:
            val = args[0]
            if isinstance(val, NuFlavInt):
                self.flav, self.int_type = val.flav, val.int_type
                return
            if isinstance(val, (tuple, list)) and len(val) == 2:
                self.flav, self.int_type = NuFlav(val[0]), IntType(val[1])
                return
            m = _FLAVINT_RE.match(_sanitize(val))
            if not m:
                raise ValueError(f"invalid NuFlavInt spec {val!r}")
            self.flav = NuFlav(m.group("flav") + (m.group("bar") or ""))
            self.int_type = IntType(m.group("int"))
        elif len(args) == 2:
            self.flav = NuFlav(args[0])
            self.int_type = IntType(args[1])
        else:
            raise ValueError("NuFlavInt takes 1 or 2 args")

    @property
    def name(self):
        return f"{self.flav.name}_{self.int_type.name}"

    @property
    def cc(self):
        return self.int_type == "cc"

    @property
    def nc(self):
        return self.int_type == "nc"

    @property
    def particle(self):
        """True for particle, False for antiparticle (reference API)."""
        return self.flav.particle

    @property
    def tex(self):
        return rf"{self.flav.tex}\,{self.int_type.tex}"

    def __str__(self):
        return self.name

    __repr__ = __str__

    def __eq__(self, other):
        try:
            o = NuFlavInt(other)
        except (ValueError, TypeError):
            return NotImplemented
        return o.flav == self.flav and o.int_type == self.int_type

    def __hash__(self):
        return hash(("NuFlavInt", self.flav.code, self.int_type.code))

    def _sort_key(self):
        return (_SORT_FLAVS.index(self.flav.code), self.int_type.code)

    def __lt__(self, other):
        return self._sort_key() < NuFlavInt(other)._sort_key()


ALL_NUFLAVS = tuple(NuFlav(c) for c in _SORT_FLAVS)
ALL_NUFLAVINTS_LIST = tuple(
    NuFlavInt(f, i) for f in ALL_NUFLAVS for i in ("cc", "nc")
)


class NuFlavIntGroup:
    """An ordered set of NuFlavInts with +/- algebra and string parsing
    (cf. reference ``flavInt.py:700``).

    Accepts specs like ``"numu_cc + numubar_cc"``, ``"nuall_nc"``,
    ``"nue"`` (both interactions), iterables of flavints/groups.
    """

    TOKEN_EXPANSIONS = {
        "nuall": [f.name for f in ALL_NUFLAVS if not f.is_antiparticle],
        "nuallbar": [f.name for f in ALL_NUFLAVS if f.is_antiparticle],
        "allnu": [f.name for f in ALL_NUFLAVS],
    }

    def __init__(self, *args):
        self._flavints = []
        for arg in args:
            self._add(arg)

    # -- parsing -----------------------------------------------------------
    def _add(self, val):
        if val is None:
            return
        if isinstance(val, NuFlavInt):
            self._insert(val)
        elif isinstance(val, NuFlav):
            for it in ("cc", "nc"):
                self._insert(NuFlavInt(val, it))
        elif isinstance(val, NuFlavIntGroup):
            for fi in val:
                self._insert(fi)
        elif isinstance(val, str):
            for token in re.split(r"[+,;]", val):
                token = token.strip()
                if token:
                    self._add_token(token)
        elif isinstance(val, Iterable):
            for v in val:
                self._add(v)
        else:
            raise ValueError(f"cannot interpret {val!r} as flavints")

    def _add_token(self, token):
        s = _sanitize(token)
        # expansion tokens ('nuall_cc', 'nuallbar', 'allnu_nc')
        for key, flavs in self.TOKEN_EXPANSIONS.items():
            if s.startswith(key):
                rest = s[len(key):]
                for flav in flavs:
                    self._add_token(flav + rest)
                return
        m = _FLAVINT_RE.match(s)
        if m:
            self._insert(NuFlavInt(s))
            return
        # compact multi-flavor token as produced by __str__,
        # e.g. 'numu_numubar_cc' or 'nue_numu_nutau'
        parts = [p for p in token.strip().lower().split("_") if p]
        if parts and parts[-1] in ("cc", "nc"):
            it, flav_parts = parts[-1], parts[:-1]
        else:
            it, flav_parts = None, parts
        if len(flav_parts) > 1 and all(
            _sanitize(p) in _FLAV_CODES
            or any(_sanitize(p).startswith(k) for k in self.TOKEN_EXPANSIONS)
            for p in flav_parts
        ):
            for p in flav_parts:
                self._add_token(p + (f"_{it}" if it else ""))
            return
        # bare flavor: both interaction types
        self._add(NuFlav(s))

    def _insert(self, flavint):
        if flavint not in self._flavints:
            self._flavints.append(flavint)
            self._flavints.sort()

    # -- set algebra --------------------------------------------------------
    def __add__(self, other):
        return NuFlavIntGroup(self, other)

    def __sub__(self, other):
        other = NuFlavIntGroup(other)
        out = NuFlavIntGroup()
        for fi in self:
            if fi not in other:
                out._insert(fi)
        return out

    def __contains__(self, val):
        try:
            group = NuFlavIntGroup(val)
        except (ValueError, TypeError):
            return False
        return all(fi in self._flavints for fi in group)

    def __iter__(self):
        return iter(self._flavints)

    def __len__(self):
        return len(self._flavints)

    def __getitem__(self, i):
        return self._flavints[i]

    def __eq__(self, other):
        try:
            return list(NuFlavIntGroup(other)) == self._flavints
        except (ValueError, TypeError):
            return NotImplemented

    def __hash__(self):
        return hash(tuple(self._flavints))

    @property
    def flavs(self):
        out = []
        for fi in self:
            if fi.flav not in out:
                out.append(fi.flav)
        return tuple(out)

    # reference-API method forms (``flavInt.py``)
    def get_flavints(self):
        return tuple(self._flavints)

    def get_flavs(self):
        return self.flavs

    @property
    def cc_flavints(self):
        return tuple(fi for fi in self if fi.cc)

    @property
    def nc_flavints(self):
        return tuple(fi for fi in self if fi.nc)

    def group_flavs_by_int_type(self):
        return {
            "cc_flavs": tuple(fi.flav for fi in self.cc_flavints),
            "nc_flavs": tuple(fi.flav for fi in self.nc_flavints),
        }

    def __str__(self):
        # compact naming: merge flavors sharing an int type,
        # e.g. numu_cc+numubar_cc -> 'numu_numubar_cc'
        parts = []
        for it, flavints in (
            ("cc", self.cc_flavints), ("nc", self.nc_flavints),
        ):
            if flavints:
                parts.append(
                    "_".join(fi.flav.name for fi in flavints) + f"_{it}"
                )
        return "+".join(parts) if parts else "(empty)"

    __repr__ = __str__


ALL_NUFLAVINTS = NuFlavIntGroup(ALL_NUFLAVINTS_LIST)


class FlavIntData(dict):
    """Mapping keyed by the 12 flavints with flexible key access
    (cf. reference ``flavInt.py:1148``)."""

    def __init__(self, val=None):
        super().__init__()
        for fi in ALL_NUFLAVINTS_LIST:
            super().__setitem__(fi.name, None)
        if val is not None:
            for k, v in dict(val).items():
                self[k] = v

    @staticmethod
    def _key(key):
        return NuFlavInt(key).name

    def __getitem__(self, key):
        return super().__getitem__(self._key(key))

    def __setitem__(self, key, val):
        super().__setitem__(self._key(key), val)

    @property
    def flavints(self):
        return tuple(NuFlavInt(k) for k in self.keys())


class FlavIntDataGroup(dict):
    """Mapping keyed by user-defined NuFlavIntGroups (cf. reference
    ``flavInt.py:1380``): one datum per *group* of flavints, with key access
    by any contained flavint/group spec and regrouping via
    :meth:`transform_groups`."""

    def __init__(self, val=None, flavint_groups=None):
        super().__init__()
        if val is None and flavint_groups is None:
            raise ValueError(
                "must provide at least one of `val` or `flavint_groups`"
            )
        if flavint_groups is not None:
            groups = self._parse_groups(flavint_groups)
        else:
            groups = [NuFlavIntGroup(k) for k in dict(val).keys()]
        self._flavint_groups = groups
        for g in groups:
            super().__setitem__(str(g), None)
        if val is not None:
            for k, v in dict(val).items():
                self[k] = v

    @staticmethod
    def _parse_groups(flavint_groups):
        if isinstance(flavint_groups, str):
            return flavint_groups_from_string(flavint_groups)
        if isinstance(flavint_groups, NuFlavIntGroup):
            return [flavint_groups]
        return [NuFlavIntGroup(g) for g in flavint_groups]

    @property
    def flavint_groups(self):
        return list(self._flavint_groups)

    def _key(self, key):
        """Resolve `key` to the name of the (unique) group containing it."""
        target = NuFlavIntGroup(key)
        for g in self._flavint_groups:
            if str(g) == str(target):
                return str(g)
        # accept any key fully contained in exactly one group
        matches = [
            g for g in self._flavint_groups
            if all(fi in g for fi in target)
        ]
        if len(matches) == 1:
            return str(matches[0])
        raise KeyError(
            f"{key!r} does not identify a unique flavint group among"
            f" {[str(g) for g in self._flavint_groups]}"
        )

    def __getitem__(self, key):
        return super().__getitem__(self._key(key))

    def __setitem__(self, key, val):
        super().__setitem__(self._key(key), val)

    def __contains__(self, key):
        try:
            self._key(key)
            return True
        except (KeyError, ValueError):
            return False

    def transform_groups(self, flavint_groups):
        """Regroup into `flavint_groups`: each new group must be a union of
        whole current groups; their per-field arrays are concatenated
        (cf. reference ``flavInt.py:1425``)."""
        new_groups = self._parse_groups(flavint_groups)
        out = {}
        for ng in new_groups:
            sources = [
                g for g in self._flavint_groups
                if any(fi in ng for fi in g)
            ]
            for g in sources:
                if not all(fi in ng for fi in g):
                    raise ValueError(
                        f"new group {ng} splits existing group {g}"
                    )
            covered = {fi for g in sources for fi in g}
            if set(ng) - covered:
                raise ValueError(
                    f"new group {ng} not covered by existing groups"
                )
            if not sources:
                continue
            if len(sources) == 1:
                out[str(ng)] = deepcopy(self[str(sources[0])])
            else:
                merged = {}
                fields = set(self[str(sources[0])].keys())
                for g in sources[1:]:
                    fields &= set(self[str(g)].keys())
                for f in fields:
                    merged[f] = np.concatenate(
                        [np.asarray(self[str(g)][f]) for g in sources]
                    )
                out[str(ng)] = merged
        return FlavIntDataGroup(val=out)


def flavint_groups_from_string(groups):
    """Parse a spec like ``'nuall_nc; numu_cc+numubar_cc; nue_cc'`` into a
    list of NuFlavIntGroups covering ALL flavints exactly once; flavints not
    mentioned become singleton... no — the reference requires mutually
    exclusive groups and adds an 'othersnu' catch-all when incomplete
    (cf. reference ``flavIntGroupsFromString:1622``). Here: mutually
    exclusive groups; remaining flavints are appended as one group."""
    if groups is None or (isinstance(groups, str) and not groups.strip()):
        return [NuFlavIntGroup(ALL_NUFLAVINTS_LIST)]
    if isinstance(groups, str):
        specs = [s for s in re.split(r"[;]", groups) if s.strip()]
    else:
        specs = list(groups)
    parsed = [NuFlavIntGroup(s) for s in specs]

    seen = set()
    for g in parsed:
        for fi in g:
            if fi in seen:
                raise ValueError(
                    f"flavint {fi} appears in more than one group"
                )
            seen.add(fi)
    leftovers = [fi for fi in ALL_NUFLAVINTS_LIST if fi not in seen]
    if leftovers:
        parsed.append(NuFlavIntGroup(leftovers))
    return parsed


# reference-compatible alias
flavintGroupsFromString = flavint_groups_from_string
