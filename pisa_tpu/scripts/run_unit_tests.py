"""
Unit-test driver (cf. reference ``pisa-run_unit_tests``, entry of
``pisa_tests/run_unit_tests.py:110``): runs the test suite under the
requested precision(s). Where the reference crawls modules for embedded
``test_*`` functions, pisa-tpu keeps a conventional pytest tree; this driver
locates it (repo checkout or ``PISA_TPU_TESTS``) and adds the reference's
dual-precision CI behavior (fp64 and fp32 legs) plus named sub-suites for
the reference's specialized test entry points (``pisa-test_kde_stage``,
``pisa-test_covariance``, ``pisa-test_example_pipelines``).
"""

from __future__ import annotations

import os
import subprocess
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

# reference specialized harnesses -> pytest selections in this tree
SUITES = {
    "all": ["tests"],
    "kde": ["tests/test_kde.py"],
    "covariance": ["tests/test_param.py", "-k", "covariance"],
    "examples": ["tests/test_pipeline_e2e.py", "tests/test_icecube_3y.py"],
    "services": ["tests/test_services.py"],
    "osc-golden": ["tests/test_osc_golden.py", "tests/test_pallas_chain.py"],
}


def _tests_dir():
    env = os.environ.get("PISA_TPU_TESTS")
    if env:
        return env
    # repo checkout: tests/ next to the package's parent
    import pisa_tpu

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pisa_tpu.__file__)))
    cand = os.path.join(repo, "tests")
    if os.path.isdir(cand):
        return repo
    raise SystemExit(
        "cannot locate the test tree; set PISA_TPU_TESTS to the repo root"
    )


def main(argv=None):
    parser = ArgumentParser(
        description=__doc__, formatter_class=ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "--suite", choices=sorted(SUITES), default="all",
        help="named sub-suite (reference specialized harnesses)",
    )
    parser.add_argument(
        "--ftype", choices=["fp64", "fp32", "both"], default="fp64",
        help="precision leg(s); 'both' mirrors the reference CI matrix",
    )
    parser.add_argument("-k", default=None, help="pytest -k expression")
    parser.add_argument("-x", action="store_true", help="stop on first fail")
    args = parser.parse_args(argv)

    repo = _tests_dir()
    ftypes = ["fp64", "fp32"] if args.ftype == "both" else [args.ftype]
    rc = 0
    for ftype in ftypes:
        cmd = [sys.executable, "-m", "pytest", "-q", *SUITES[args.suite]]
        if args.k:
            cmd += ["-k", args.k]
        if args.x:
            cmd.append("-x")
        env = dict(os.environ, PISA_TPU_FTYPE=ftype)
        print(f"== pytest leg: PISA_TPU_FTYPE={ftype} ==", flush=True)
        rc |= subprocess.call(cmd, cwd=repo, env=env)
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
