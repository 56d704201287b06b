"""
Number / string / TeX / list formatting utilities
(cf. reference ``pisa/utils/format.py``): the human-readable list dialect
(``list2hrlist``/``hrlist2list``/``hrlol2lol``), number formatting
(``format_num``, ``engfmt``, ``sep_three_tens``), TeX helpers, timing
reports (``format_times``, ``timediff``, ``timestamp``) and small argument
normalizers used across configs and CLIs.
"""

from __future__ import annotations

import math
import numbers
import re
import time as _time

import numpy as np

__all__ = [
    "split",
    "arg_str_seq_none",
    "arg_to_tuple",
    "hr_range_formatter",
    "list2hrlist",
    "hrlist2list",
    "hrlol2lol",
    "hrbool2bool",
    "engfmt",
    "text2tex",
    "tex_join",
    "tex_dollars",
    "is_tex",
    "strip_outer_dollars",
    "strip_outer_parens",
    "make_valid_python_name",
    "sep_three_tens",
    "format_num",
    "format_times",
    "timediff",
    "timestamp",
    "int2hex",
    "hash2hex",
]

SI_PREFIXES = {
    -24: "y", -21: "z", -18: "a", -15: "f", -12: "p", -9: "n", -6: "u",
    -3: "m", 0: "", 3: "k", 6: "M", 9: "G", 12: "T", 15: "P", 18: "E",
    21: "Z", 24: "Y",
}
BIN_PREFIXES = {0: "", 1: "Ki", 2: "Mi", 3: "Gi", 4: "Ti", 5: "Pi", 6: "Ei"}

_WHITESPACE_RE = re.compile(r"\s")
_HRGROUP_RE = re.compile(
    r"^([+-]?[0-9.e+-]+?)(?:-([+-]?[0-9.e+-]+?))?(?::([+-]?[0-9.e+-]+))?$"
)


def split(string, sep=",", force_case=None, parse_func=None):
    """Split a string on `sep`, stripping whitespace from the pieces;
    optionally lower/upper-case them and/or parse each with `parse_func`
    (reference ``format.py:169``)."""
    if isinstance(string, (list, tuple)):
        pieces = [str(x) for x in string]
    else:
        pieces = str(string).split(sep)
    pieces = [p.strip() for p in pieces]
    if force_case == "lower":
        pieces = [p.lower() for p in pieces]
    elif force_case == "upper":
        pieces = [p.upper() for p in pieces]
    if parse_func is not None:
        pieces = [parse_func(p) for p in pieces]
    return pieces


def arg_str_seq_none(inputs, name):
    """Normalize an argument to a list of strings, passing None through
    (reference ``format.py:248``)."""
    if inputs is None:
        return None
    if isinstance(inputs, str):
        return [inputs]
    try:
        return [str(x) for x in inputs]
    except TypeError:
        raise TypeError(
            f"Argument '{name}' must be a string, a sequence of strings,"
            f" or None; got {type(inputs)}"
        )


def arg_to_tuple(arg):
    """Normalize to a tuple: None -> (), scalar -> (scalar,), sequence ->
    tuple(sequence) (reference ``format.py:277``)."""
    if arg is None:
        return tuple()
    if isinstance(arg, str) or not hasattr(arg, "__iter__"):
        return (arg,)
    return tuple(arg)


def _intify(x):
    """Render float-valued integers as ints for compact display."""
    return int(x) if float(x) == int(x) else x


def hr_range_formatter(start, end, step):
    """'start-end[:step]' inclusive-range notation (reference
    ``format.py:303``); ':step' omitted for integer ranges with step 1."""
    start, end, step = _intify(start), _intify(end), _intify(step)
    if isinstance(start, int) and isinstance(end, int) and step == 1:
        return f"{start}-{end}"
    return f"{start}-{end}:{step}"


def list2hrlist(lst):
    """Compact human-readable string for a list of numbers: arithmetic runs
    of >= 3 elements collapse to 'start-end[:step]'
    (reference ``format.py:357``). E.g. [0,1,2,4,5,6,20] -> '0-2,4-6,20'."""
    if isinstance(lst, numbers.Number):
        lst = [lst]
    lst = sorted(lst)
    n = len(lst)
    out = []
    i = 0
    while n - i > 2:
        step = lst[i + 1] - lst[i]
        if not np.isclose(lst[i + 2] - lst[i + 1], step):
            out.append(str(_intify(lst[i])))
            i += 1
            continue
        j = i + 2
        while j + 1 < n and np.isclose(lst[j + 1] - lst[j], step):
            j += 1
        out.append(hr_range_formatter(lst[i], lst[j], step))
        i = j + 1
    out.extend(str(_intify(x)) for x in lst[i:])
    return ",".join(out)


def _hrgroup2list(group):
    group = re.sub(r"[\[\](){}\s]", "", group)
    if not group:
        return []
    m = _HRGROUP_RE.match(group)
    if m is None:
        raise ValueError(f"cannot parse hr group {group!r}")
    s0, s1, s2 = m.groups()

    def num(s):
        f = float(s)
        return int(f) if f == int(f) else f

    start = num(s0)
    if s1 is None:
        return [start]
    stop = num(s1)
    step = num(s2) if s2 is not None else (1 if stop >= start else -1)
    n_steps = max(int(math.floor(round((stop - start) / step, 12))), 0)
    vals = np.linspace(start, start + n_steps * step, n_steps + 1)
    if isinstance(start, int) and isinstance(step, int):
        vals = vals.astype(int)
    return vals.tolist()


def hrlist2list(hrlst):
    """Parse a human-readable number-list string ('0-2,4-6:2,20') into a
    Python list (reference ``format.py:476``)."""
    groups = re.split(r"[,; _]+", _WHITESPACE_RE.sub("", hrlst))
    out = []
    for g in groups:
        out.extend(_hrgroup2list(g))
    return out


def hrlol2lol(hrlol):
    """Parse a semicolon-separated sequence of hr-lists into a
    list-of-lists (reference ``format.py:498``)."""
    return [hrlist2list(part) for part in hrlol.split(";") if part.strip()]


def hrbool2bool(s):
    """Parse a human-readable boolean string (reference ``format.py:554``)."""
    s = str(s).strip().lower().strip("\"'")
    if s in ("t", "true", "1", "yes", "one"):
        return True
    if s in ("f", "false", "0", "no", "zero"):
        return False
    raise ValueError(f"Could not parse {s!r} as bool")


def engfmt(n, sigfigs=3, decimals=None, sign_always=False):
    """Engineering notation with SI prefix (reference ``format.py:579``):
    ``engfmt(1.2e-7)`` -> '120 n'."""
    return format_num(
        n, sigfigs=sigfigs, precision=(
            None if decimals is None else 10.0 ** -decimals
        ),
        fmt="sipre", always_show_sign=sign_always,
    )


def text2tex(txt):
    """Escape plain text for TeX (reference ``format.py:656``)."""
    if txt is None:
        return ""
    if is_tex(txt):
        return strip_outer_dollars(txt)
    for c in "_#%":
        txt = txt.replace(c, rf"\{c}")
    return rf"{{\rm {txt}}}"


def tex_join(sep, *args):
    """Join TeX-or-text snippets with a separator, TeX-escaping the plain
    ones; empty args are skipped (reference ``format.py:683``)."""
    parts = [text2tex(a) for a in args if a not in (None, "")]
    return sep.join(p for p in parts if p)


def tex_dollars(s):
    """Ensure a TeX string is wrapped in single dollars
    (reference ``format.py:693``)."""
    return f"${strip_outer_dollars(s)}$"


def is_tex(s):
    """Heuristic: does the string contain TeX markup?
    (reference ``format.py:705``)"""
    if not isinstance(s, str):
        return False
    return bool(re.search(r"(\$|\\[a-zA-Z]+|[_^]\{)", s))


def strip_outer_dollars(value):
    """Remove one pair of surrounding $...$ if present
    (reference ``format.py:784``)."""
    value = value.strip()
    if len(value) >= 2 and value[0] == "$" and value[-1] == "$":
        return value[1:-1]
    return value


def strip_outer_parens(value):
    """Remove one pair of surrounding (...) or {...} if present
    (reference ``format.py:796``)."""
    value = value.strip()
    for o, c in (("(", ")"), ("{", "}"), (r"\left(", r"\right)")):
        if value.startswith(o) and value.endswith(c):
            return value[len(o):-len(c)]
    return value


def make_valid_python_name(name):
    """Mangle a string into a valid Python identifier
    (reference ``format.py:815``)."""
    name = re.sub(r"[^0-9a-zA-Z_]", "_", str(name))
    name = re.sub(r"^[^a-zA-Z_]+", "", name)
    return name


def sep_three_tens(strval, direction, sep=None):
    """Insert `sep` every three digits; `direction` is 'left' (integer part,
    group from the right) or 'right' (fractional part, group from the left)
    (reference ``format.py:828``)."""
    if sep is None or len(strval) <= 3:
        return strval
    if direction == "left":
        first = len(strval) % 3 or 3
        groups = [strval[:first]] + [
            strval[i:i + 3] for i in range(first, len(strval), 3)
        ]
    elif direction == "right":
        groups = [strval[i:i + 3] for i in range(0, len(strval), 3)]
    else:
        raise ValueError(f"direction must be 'left' or 'right', not {direction!r}")
    return sep.join(groups)


def _round_sigfigs(value, sigfigs):
    if value == 0 or not math.isfinite(value):
        return value
    return round(value, -int(math.floor(math.log10(abs(value)))) + sigfigs - 1)


def format_num(
    value,
    sigfigs=None,
    precision=None,
    fmt=None,
    sci_thresh=(6, -4),
    exponent=None,
    inf_thresh=np.inf,
    trailing_zeros=False,
    always_show_sign=False,
    decstr=".",
    thousands_sep=None,
    thousandths_sep=None,
    left_delimiter=None,
    right_delimiter=None,
    expprefix=None,
    exppostfix=None,
    nanstr="nan",
    infstr="inf",
):
    """Fine-grained number-to-string formatting (reference
    ``format.py:875``). `fmt` in {None, 'sci', 'eng', 'sipre', 'binpre',
    'full'}; `sigfigs` xor `precision` (default sigfigs=8); `sci_thresh`
    gives the (high, low) decimal orders beyond which plain notation
    switches to scientific."""
    if sigfigs is not None and precision is not None:
        raise ValueError("use either `sigfigs` or `precision`, not both")
    if sigfigs is None and precision is None:
        sigfigs = 8

    def wrap(s):
        return (left_delimiter or "") + s + (right_delimiter or "")

    value = float(value)
    if math.isnan(value):
        return wrap(nanstr)
    if abs(value) >= inf_thresh:
        return wrap(("-" if value < 0 else "+" if always_show_sign else "") + infstr)

    if precision is not None:
        decimals = -int(math.floor(math.log10(abs(precision))))
        value = round(value, decimals)
        sig_digits = None
    else:
        sig_digits = sigfigs

    # choose exponent
    prefix_mode = None
    if fmt == "binpre":
        exp = 0
        if exponent is not None:
            exp = int(exponent)
        elif value != 0:
            exp = min(max(int(math.log(abs(value), 1024)), 0), max(BIN_PREFIXES))
        scaled = value / (1024.0 ** exp)
        prefix_mode = BIN_PREFIXES[exp]
    else:
        if exponent is not None:
            if isinstance(exponent, str):
                inv = {v: k for k, v in SI_PREFIXES.items()}
                exponent = inv["u" if exponent == "μ" else exponent]
                prefix_mode = SI_PREFIXES[exponent]
            exp = int(exponent)
        elif fmt in ("eng", "sipre"):
            exp = 0 if value == 0 else int(math.floor(math.log10(abs(value)) / 3.0)) * 3
        elif fmt == "sci":
            exp = 0 if value == 0 else int(math.floor(math.log10(abs(value))))
        elif fmt == "full":
            exp = 0
        else:  # auto by sci_thresh
            order = 0 if value == 0 else math.floor(math.log10(abs(value)))
            exp = int(order) if (order >= sci_thresh[0] or order <= sci_thresh[1]) else 0
        scaled = value / (10.0 ** exp)
        if fmt == "sipre" and prefix_mode is None:
            prefix_mode = SI_PREFIXES.get(exp)

    # digits string
    if sig_digits is not None:
        scaled = _round_sigfigs(scaled, sig_digits)
        if trailing_zeros:
            dec = max(sig_digits - 1 - (0 if scaled == 0 else int(math.floor(math.log10(abs(scaled))))), 0)
            s = f"{scaled:.{dec}f}"
        else:
            s = repr(_intify(round(scaled, 15)))
    else:
        dec = max(decimals + exp, 0)
        s = f"{scaled:.{dec}f}"
        if not trailing_zeros and "." in s:
            s = s.rstrip("0").rstrip(".")

    neg = s.startswith("-")
    if neg:
        s = s[1:]
    int_part, _, frac_part = s.partition(".")
    int_part = sep_three_tens(int_part, "left", thousands_sep)
    frac_part = sep_three_tens(frac_part, "right", thousandths_sep)
    s = int_part + (decstr + frac_part if frac_part else "")
    sign = "-" if neg else ("+" if always_show_sign else "")
    s = sign + s

    if prefix_mode is not None:
        s = s + " " + prefix_mode if prefix_mode else s
    elif exp != 0:
        s = s + (expprefix if expprefix is not None else "e") + str(exp) + (exppostfix or "")
    return wrap(s)


def format_times(times, nindent_detailed=0, detailed=False, **format_num_kwargs):
    """Statistics line for a sample of run times (reference
    ``format.py:1274``): total, n calls, mean/max/min per call."""
    times = list(times)
    n = len(times)
    if n == 0:
        return "n calls: 0"
    format_num_kwargs.setdefault("sigfigs", 4)
    tot = float(np.sum(times))
    out = (
        f"Total time (s): {format_num(tot, **format_num_kwargs)},"
        f" n calls: {n}"
    )
    if n > 1:
        out += (
            f", time/call (s): mean {format_num(tot / n, **format_num_kwargs)},"
            f" max. {format_num(max(times), **format_num_kwargs)},"
            f" min. {format_num(min(times), **format_num_kwargs)}"
        )
        if detailed:
            out += "\n" + " " * nindent_detailed + "Individual runs: "
            out += ", ".join(
                f"{i}: {format_num(t, **format_num_kwargs)} s"
                for i, t in enumerate(times)
            )
    return out


def timediff(dt_sec, hms_always=False, sec_decimals=3):
    """Smallest-unit-aware duration string (reference ``format.py:1510``):
    seconds only below one minute (unless `hms_always`), else [D days ]HH:MM:SS."""
    sign = "-" if dt_sec < 0 else ""
    dt_sec = abs(float(dt_sec))
    if dt_sec < 60 and not hms_always:
        return f"{sign}{dt_sec:.{sec_decimals}f} s"
    days, rem = divmod(dt_sec, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, secs = divmod(rem, 60)
    out = f"{sign}"
    if days:
        out += f"{int(days)} days, "
    out += f"{int(hours):02d}:{int(minutes):02d}:{secs:0{3 + sec_decimals}.{sec_decimals}f}"
    return out


def timestamp(d=True, t=True, tz=True, utc=False, winsafe=False):
    """Date/time stamp string (reference ``format.py:1609``):
    '<date>T<time><tzoffset>'."""
    struct = _time.gmtime() if utc else _time.localtime()
    out = ""
    if d:
        out += _time.strftime("%Y-%m-%d", struct)
    if t:
        if d:
            out += "T"
        out += _time.strftime("%H.%M.%S" if winsafe else "%H:%M:%S", struct)
    if t and tz:
        if utc:
            out += "+0000" if winsafe else "+00:00"
        else:
            off = _time.strftime("%z", struct)
            if not winsafe and len(off) == 5:
                off = off[:3] + ":" + off[3:]
            out += off
    return out


def int2hex(i, bits, signed):
    """Fixed-width hex of an integer (reference ``format.py:728``)."""
    if signed:
        i = i & ((1 << bits) - 1)
    h = f"{i:x}"
    return h.zfill(bits // 4)


def hash2hex(hash, bits=64):  # noqa: A002 - reference API name
    """Hash (int or hex str) to fixed-width hex string
    (reference ``format.py:761``)."""
    if isinstance(hash, str):
        int(hash, 16)  # validate
        return hash.zfill(bits // 4)
    return int2hex(hash, bits=bits, signed=True)
