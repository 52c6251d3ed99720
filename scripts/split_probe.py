"""Multi-split audit: does every oracle contract survive multi-partition
input, where per-partition combination order is nondeterministic?

Every fixture table ships as a SINGLE parquet row group, so both engines
stream it in one task in identical row order — which makes the existing
gates structurally blind to order-dependence across input splits: a
first()/collect_list() without a total ordering, a window ORDER that is
not total over duplicate keys, or a floating-point fold whose result
depends on partial-combine order would all pass every single-split gate
and only break on a real cluster, where a 100 TB table is thousands of
splits combined in task-completion order (a different order every run).

This audit makes the graded fixtures multi-split and re-runs the FULL
Spark-vs-DuckDB contract on them:

1. each sf0.01 table is rewritten VALUE-IDENTICAL but with many small
   parquet row groups (DuckDB ``COPY ... (ROW_GROUP_SIZE n)``); and
2. the vanilla verify_contract session is forced to actually split the
   files into many input partitions via ``PYSPARK_SUBMIT_ARGS``
   (``spark.sql.files.maxPartitionBytes`` + ``openCostInBytes=0`` —
   public Spark conf, applied before the JVM launches, so the session
   stays exactly the driver's vanilla ``getOrCreate()`` shape).

DuckDB reads the same multi-row-group files, so the comparison is
engine-vs-engine on identical DATA with deliberately different (and
run-to-run nondeterministic) Spark partitioning. A key that fails here
but passes verify_contract depends on single-split row order — a real
at-scale bug even though every existing gate is green. Like the sf0.1
sweep, running it twice probes different task interleavings.

Usage: python scripts/split_probe.py [--row-group-size N]
           [--max-partition-bytes N] [key-prefix ...]
Env: SPLIT_SRC (source fixture dir, default /root/testdata/sf0.01),
SPLIT_OUT (multi-split table dir, default pid-unique tmpfs). Exit code
is verify_contract's (1 on any FAIL).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

SRC = os.environ.get("SPLIT_SRC", "/root/testdata/sf0.01")
# pid-unique by default so two overlapping probe runs can't rmtree each
# other's tables mid-verify (the perturb_audit convention)
OUT = os.environ.get("SPLIT_OUT", f"/dev/shm/split_probe.{os.getpid()}")


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (the r10 argparse-first convention:
    ``--help`` exits 0 with no Spark and no writes; unknown options
    exit 2 before any fixture generation)."""
    import argparse

    parser = argparse.ArgumentParser(
        description=(
            "Rewrite the fixtures as many-row-group parquet and re-run "
            "the Spark-vs-DuckDB contract with multi-split input "
            "partitioning (order-dependence probe)."
        ),
        epilog=(
            "Env: SPLIT_SRC (source fixture dir, default "
            "/root/testdata/sf0.01), SPLIT_OUT (multi-split table dir, "
            "default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "--row-group-size",
        type=int,
        default=2048,
        help="rows per parquet row group in the rewritten tables "
        "(default 2048 — ~30 groups for sf0.01 lineitem)",
    )
    parser.add_argument(
        "--max-partition-bytes",
        type=int,
        default=131072,
        help="spark.sql.files.maxPartitionBytes for the probe session "
        "(default 128KB — splits every non-trivial table)",
    )
    parser.add_argument(
        "keys",
        nargs="*",
        metavar="KEY",
        help="key filters forwarded to verify_contract (exact or prefix)",
    )
    return parser.parse_args(argv)


def rewrite_multisplit(src: str, out: str, row_group_size: int) -> None:
    """Rewrite every catalog table value-identical with small row groups.

    Row order is preserved (a single-threaded DuckDB scan-and-copy), so
    the DuckDB oracle sees the same stream as before; only Spark's
    SPLITTABILITY changes. Separated from main() so the rewrite
    mechanics are testable without a Spark session
    (tests/test_split_probe.py pins the row-group fan-out — the probe
    is vacuous if a DuckDB upgrade ever ignores ROW_GROUP_SIZE)."""
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from cloud2sql_spark.catalog import TABLES

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{name}.parquet')) "
            f"TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group_size})"
        )
    con.close()


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drive_py = os.path.join(repo, "scripts", "verify_contract.py")

    rewrite_multisplit(SRC, OUT, ns.row_group_size)
    print(f"multi-split tables written to {OUT}", flush=True)

    # Vanilla-session confs must be set BEFORE the JVM launches;
    # PYSPARK_SUBMIT_ARGS is the public mechanism getOrCreate() honors.
    submit = (
        f"--conf spark.sql.files.maxPartitionBytes={ns.max_partition_bytes} "
        "--conf spark.sql.files.openCostInBytes=0 "
        "pyspark-shell"
    )
    env = dict(os.environ, VERIFY_SF_DIR=OUT, PYSPARK_SUBMIT_ARGS=submit)
    try:
        return subprocess.call(
            [sys.executable, drive_py, *ns.keys], env=env, cwd=repo
        )
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
