"""CLI front-end (reference A20: cloud2sql/__main__.py:24-66 — flags
--config, --show, --debug, --version, --create-config; env prefix
CLOUD2SQL_ -> here CLOUD2SQL_SPARK_).

Usage:
    python -m cloud2sql_spark.cli --create-config > config.yaml
    python -m cloud2sql_spark.cli --config config.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

__version__ = "0.1.0"


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        "cloud2sql_spark", description="Collect resource graphs into SQL/files via Spark"
    )
    p.add_argument(
        "--config",
        default=os.environ.get("CLOUD2SQL_SPARK_CONFIG"),
        help="path to YAML config (sources + destinations)",
    )
    p.add_argument(
        "--show",
        choices=["progress", "log", "none"],
        default="progress",
        help="progress rendering mode",
    )
    p.add_argument("--debug", action="store_true")
    # Flag parity with the reference CLI (__main__.py:38-43): accepted so
    # reference-shaped invocations parse. Usage analytics itself is out of
    # scope (SURVEY A18) — there is no sender, so the flag is a no-op and
    # opted-out is the only behavior either way.
    p.add_argument(
        "--analytics-opt-out",
        action="store_true",
        help="Do not send anonymized analytics data (always off here; "
        "accepted for reference CLI parity)",
    )
    p.add_argument("--version", action="store_true")
    p.add_argument(
        "--create-config",
        action="store_true",
        help="print a config template and exit",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    from cloud2sql_spark.etl.config import (
        default_config,
        destination_from_config,
        parse_config,
    )

    args = parse_args(argv)
    if args.version:
        print(__version__)
        return 0
    if args.create_config:
        print(default_config())
        return 0
    if not args.config:
        print("--config required (or --create-config)", file=sys.stderr)
        return 2

    from cloud2sql_spark.etl.pipeline import collect
    from cloud2sql_spark.etl.progress import (
        NullReporter,
        ProgressReporter,
        StageProgressPoller,
    )
    from cloud2sql_spark.session import get_spark

    from pyspark.sql import SparkSession

    with open(args.config) as fh:
        cfg = parse_config(fh.read())
    dest = destination_from_config(cfg)
    # only stop a session this CLI created — embedding callers (and the
    # test harness) keep theirs
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("cloud2sql_spark-etl")
    # reference log-level mapping (__main__.py:65): --show log surfaces
    # engine logs (DEBUG with --debug, else INFO); any other mode keeps
    # the engine quiet and uses the progress channel instead
    raised_log_level = args.show == "log"
    if raised_log_level:
        spark.sparkContext.setLogLevel("DEBUG" if args.debug else "INFO")
    # A17: --show progress streams per-source/per-table lines plus Spark
    # stage-level task progress to stderr (reference collect.py:165-179)
    reporter = (
        ProgressReporter() if args.show == "progress" else NullReporter()
    )
    try:
        with StageProgressPoller(spark.sparkContext, reporter):
            counts = collect(spark, cfg, dest, feedback=reporter)
        if args.show != "none":
            for table in sorted(counts):
                print(f"{table}: {counts[table]} rows")
            print(f"done: {len(counts)} tables, {sum(counts.values())} rows")
        return 0
    except Exception as exc:  # fail-fast, no partial promote (A19)
        print(f"collect failed, snapshot NOT promoted: {exc}", file=sys.stderr)
        if args.debug:
            raise
        return 1
    finally:
        if owns_session:
            spark.stop()
        elif raised_log_level:
            # embedded caller keeps its session: restore the quiet level
            spark.sparkContext.setLogLevel("WARN")


if __name__ == "__main__":
    raise SystemExit(main())
