"""CLI: execute a Cubert script (.cmr) or a JSON physical plan.

    python -m cubert_spark.script script.cmr [-D var=value ...] [--show REL]
    python -m cubert_spark.script plan.json  [--show REL]

The Spark analog of ``$CUBERT_HOME/bin/cubert script.cmr``
(reference: src/ScriptExecutor.java:94); ``-D`` mirrors the
preprocessor's $var substitution (CmrExecutor.java:117-240).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cubert_spark.script")
    ap.add_argument("plan", help="path to a .cmr script or JSON plan file")
    ap.add_argument(
        "-D", action="append", default=[], metavar="VAR=VALUE",
        help="script $var substitution (repeatable)",
    )
    ap.add_argument("--show", help="print this relation (20 rows) after execution")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    for d in args.D:  # fail before the (slow) session starts
        if "=" not in d:
            ap.error(f"-D expects VAR=VALUE, got {d!r}")

    from cubert_spark import get_session
    from cubert_spark.script import run_plan_file, run_script_file

    spark = get_session("cubert-script", master=args.master)
    if args.plan.endswith(".json"):
        env = run_plan_file(spark, args.plan)
    else:
        params = dict(d.split("=", 1) for d in args.D)
        env = run_script_file(spark, args.plan, params)
    if args.show:
        env[args.show].show(20, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
