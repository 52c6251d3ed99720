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


# Marker file written into every probe-created output dir: the rmtree
# guards below refuse to delete a directory that does not carry it, so a
# misconfigured SPLIT_OUT pointing at a real data dir (or the source
# fixtures themselves) can never be destroyed (ADVICE r11).
MARKER = ".split_probe_out"


def _guard_out_dir(src: str, out: str) -> None:
    """Refuse to (re)use ``out`` unless it is safe to rmtree."""
    if os.path.realpath(out) == os.path.realpath(src):
        raise SystemExit(
            f"split_probe: SPLIT_OUT ({out}) resolves to the source "
            f"fixture dir ({src}); refusing to delete it"
        )
    if os.path.exists(out) and not os.path.exists(
        os.path.join(out, MARKER)
    ):
        raise SystemExit(
            f"split_probe: SPLIT_OUT ({out}) already exists and was not "
            f"created by this probe (no {MARKER} marker); refusing to "
            "delete it — pick an empty/non-existent SPLIT_OUT"
        )


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

    _guard_out_dir(src, out)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    with open(os.path.join(out, MARKER), "w") as f:
        f.write("created by scripts/split_probe.py — safe to delete\n")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{name}.parquet')) "
            f"TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group_size})"
        )
    con.close()


def _merge_submit_args(existing: str, max_partition_bytes: int) -> str:
    """Build the probe session's PYSPARK_SUBMIT_ARGS.

    PREPENDS the probe's --conf flags to any pre-existing value
    (stripping its trailing 'pyspark-shell' launcher token) instead of
    replacing it wholesale, so driver confs the caller's environment
    already carries — e.g. memory settings other gates run under —
    survive the probe session (ADVICE r11). Caller flags come AFTER the
    probe's, so an explicit caller maxPartitionBytes still wins
    (last --conf occurrence takes precedence in spark-submit)."""
    existing = existing.strip()
    if existing.endswith("pyspark-shell"):
        existing = existing[: -len("pyspark-shell")].strip()
    return " ".join(
        part
        for part in (
            f"--conf spark.sql.files.maxPartitionBytes={max_partition_bytes}",
            "--conf spark.sql.files.openCostInBytes=0",
            existing,
            "pyspark-shell",
        )
        if part
    )


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drive_py = os.path.join(repo, "scripts", "verify_contract.py")

    rewrite_multisplit(SRC, OUT, ns.row_group_size)
    print(f"multi-split tables written to {OUT}", flush=True)

    # Vanilla-session confs must be set BEFORE the JVM launches;
    # PYSPARK_SUBMIT_ARGS is the public mechanism getOrCreate() honors.
    submit = _merge_submit_args(
        os.environ.get("PYSPARK_SUBMIT_ARGS", ""), ns.max_partition_bytes
    )
    env = dict(os.environ, VERIFY_SF_DIR=OUT, PYSPARK_SUBMIT_ARGS=submit)
    try:
        return subprocess.call(
            [sys.executable, drive_py, *ns.keys], env=env, cwd=repo
        )
    finally:
        # only ever delete a dir the probe itself marked (belt to the
        # _guard_out_dir suspenders — OUT may predate the guard's check
        # if rewrite_multisplit raised before writing the marker)
        if os.path.exists(os.path.join(OUT, MARKER)):
            shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
