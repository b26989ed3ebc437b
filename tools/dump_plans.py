"""Dump .explain("formatted") output per query to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] q1 q2 ...

Plan-only (no execution of the final frame), but query BUILDERS may run
their own small actions (centroid collects etc.) — so run on an idle
machine. The files are the optimization round's evidence artifacts.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    outdir = Path(__file__).resolve().parents[1] / "plans" / tag
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    registry = Q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
