"""
Compare two MapSets / pipelines (cf. reference ``pisa/scripts/compare.py``):
prints per-map max |diff|, max |fractional diff| and totals; nonzero exit
code if outside tolerance.
"""

from __future__ import annotations

import argparse


def _load(spec):
    import numpy as np

    from pisa_tpu.core.map import MapSet
    from pisa_tpu.core.pipeline import Pipeline

    if spec.endswith((".json", ".json.bz2")):
        return MapSet.from_json(spec)
    # otherwise interpret as a pipeline config
    return Pipeline(spec).get_outputs()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ref", help="MapSet json or pipeline cfg")
    parser.add_argument("test", help="MapSet json or pipeline cfg")
    parser.add_argument("--rtol", type=float, default=1e-5)
    parser.add_argument("--atol", type=float, default=0.0)
    args = parser.parse_args(argv)

    import numpy as np

    ref = _load(args.ref)
    test = _load(args.test)

    ok = True
    for m_ref in ref:
        if m_ref.name not in test.names:
            print(f"  {m_ref.name}: MISSING in test")
            ok = False
            continue
        a = np.asarray(m_ref.hist)
        b = np.asarray(test[m_ref.name].hist)
        diff = np.abs(b - a)
        with np.errstate(divide="ignore", invalid="ignore"):
            fdiff = np.where(a != 0, diff / np.abs(a), np.where(diff == 0, 0, np.inf))
        close = np.allclose(b, a, rtol=args.rtol, atol=args.atol)
        ok &= close
        print(
            f"  {m_ref.name}: max|diff|={diff.max():.4g}"
            f" max|fdiff|={np.nanmax(fdiff):.4g}"
            f" totals {a.sum():.6g} vs {b.sum():.6g}"
            f" {'OK' if close else 'MISMATCH'}"
        )
    extra = set(test.names) - set(ref.names)
    if extra:
        print(f"  extra maps in test: {sorted(extra)}")
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
