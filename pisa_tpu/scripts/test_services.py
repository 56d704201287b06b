"""
Service support-matrix CLI (cf. reference ``pisa-test_services``, entry of
``pisa_tests/test_services.py:201``): discover every service, run each in
the events and (where supported) binned calc modes against synthetic
containers, and print/write the markdown support matrix.
"""

from __future__ import annotations


def main():
    from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

    parser = ArgumentParser(
        description=__doc__, formatter_class=ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "--outfile", default=None,
        help="also write the markdown matrix to this path",
    )
    parser.add_argument("-v", action="store_true", help="per-service output")
    args = parser.parse_args()

    from pisa_tpu.testing.service_matrix import (
        format_markdown_matrix,
        generate_matrix,
    )

    rows = generate_matrix(verbose=args.v)
    md = format_markdown_matrix(rows)
    print(md)
    n_ok = sum(r[2] == "ok" for r in rows)
    n_fail = sum(r[2].startswith("FAIL") or r[3].startswith("FAIL") for r in rows)
    print(
        f"\n{len(rows)} services: {n_ok} ok (events mode), {n_fail} failing"
    )
    if args.outfile:
        with open(args.outfile, "w") as f:
            f.write(md + "\n")
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
