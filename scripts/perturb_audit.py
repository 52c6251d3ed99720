"""Fixture-perturbation audit: does every oracle contract survive a data
regeneration?

The driver regenerates the test fixtures with a fresh seed every round, so
any key whose correctness silently depends on a quirk of the CURRENT data
(a literal value range, every URL param starting 'utm_', Σx³ fitting
int64, a -0.0 that today happens not to occur) is a latent red row. This
audit rewrites sf0.001 with structure-preserving but value-shifting
transformations — id offsets, money scaled by an odd integer (stays exact
2-decimal), timestamps shifted, embedding signs flipped, text lightly
edited — and re-runs the FULL Spark-vs-DuckDB contract on the perturbed
copy. The invariants the oracle conventions legitimately rely on (exact
2-decimal money, word-per-space text, 64-dim embeddings, the event_type
vocabulary) are preserved on purpose: the round-4 finding was that
breaking THOSE fails ~18 keys by design, while everything else must pass.

Usage: python scripts/perturb_audit.py
           [--drive={verify_contract,flag_matrix}] [key-prefix ...]
Writes the perturbed tables to /dev/shm/perturb_audit, then drives
verify_contract (default) against them; ``--drive=flag_matrix`` runs the
scale-switch gate on the perturbed copy instead (VERDICT r08 item 4 —
the flagged plans previously had no perturbation coverage; use
PERTURB_SRC=/root/testdata/sf0.01 for that so the gate's tolerance
checkers run at the scale they were derived for). Exit code 1 on any
FAIL.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

SRC = os.environ.get("PERTURB_SRC", "/root/testdata/sf0.001")
# pid-unique by default so two overlapping audit runs can't rmtree each
# other's tables mid-verify; override for a stable path if needed
OUT = os.environ.get("PERTURB_OUT", f"/dev/shm/perturb_audit.{os.getpid()}")

# Structure-preserving rewrites. Money scales by an odd integer (exact in
# 2 decimals), ids shift, time shifts by a non-round interval, embeddings
# negate (cosine/IP structure preserved up to sign), text gets a prefix
# token (shifts every shingle/hash while keeping word-per-space shape).
TRANSFORMS = {
    "region": "SELECT * FROM t",
    "nation": "SELECT * FROM t",
    "customer": """
        SELECT c_custkey + 90000 AS c_custkey, c_name, c_nationkey,
               round(c_acctbal * 3, 2) AS c_acctbal, c_mktsegment
        FROM t""",
    "supplier": """
        SELECT s_suppkey + 7000 AS s_suppkey, s_name, s_nationkey,
               round(s_acctbal * 3, 2) AS s_acctbal
        FROM t""",
    "part": """
        SELECT p_partkey + 40000 AS p_partkey, p_name, p_brand,
               p_type, p_size,
               round(p_retailprice * 3, 2) AS p_retailprice
        FROM t""",
    "orders": """
        SELECT o_orderkey + 600000 AS o_orderkey,
               o_custkey + 90000 AS o_custkey, o_orderstatus,
               round(o_totalprice * 3, 2) AS o_totalprice,
               o_orderdate + INTERVAL 11 DAY AS o_orderdate,
               o_orderpriority
        FROM t""",
    "lineitem": """
        SELECT l_orderkey + 600000 AS l_orderkey,
               l_partkey + 40000 AS l_partkey,
               l_suppkey + 7000 AS l_suppkey, l_linenumber,
               l_quantity + 1 AS l_quantity,
               round(l_extendedprice * 3, 2) AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + INTERVAL 11 DAY AS l_shipdate
        FROM t""",
    "events": """
        SELECT event_id + 100000 AS event_id,
               ts + INTERVAL 11 DAY AS ts,
               user_id + 555 AS user_id, event_type,
               round(value * 23, 2) AS value, props
        FROM t""",
    "documents": """
        SELECT doc_id + 100000 AS doc_id,
               'zq' || CAST(doc_id % 7 AS VARCHAR) || ' ' || text AS text,
               lang, source,
               n_chars + 4 AS n_chars
        FROM t""",
    "embeddings": """
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding, x -> -x) AS embedding, label
        FROM t""",
}


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (the r10 argparse-first convention:
    ``--help`` exits 0 with no Spark and no writes; unknown options and
    bad --drive values exit 2). ``--drive`` is validated against an
    explicit allowlist via argparse ``choices`` — NOT file existence, so
    scripts/*.py that happen to exist (scale_probe, perturb_audit
    itself) are rejected (ADVICE r10). Validation runs BEFORE the
    expensive fixture generation: a typo'd --drive= used to surface
    only as the interpreter's "can't open file" AFTER the perturbed
    tables were written (ADVICE r09), and a misordered `dedup
    --drive=flag_matrix` must not fall through as a never-matching key
    prefix and report a false PASS of the default driver (review r09).
    """
    import argparse

    parser = argparse.ArgumentParser(
        description=(
            "Rewrite sf0.001 with structure-preserving value shifts and "
            "re-run the Spark-vs-DuckDB contract on the perturbed copy."
        ),
        epilog=(
            "Env: PERTURB_SRC (source fixture dir, default "
            "/root/testdata/sf0.001; use sf0.01 with --drive=flag_matrix), "
            "PERTURB_OUT (perturbed-table dir, default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "--drive",
        choices=("verify_contract", "flag_matrix"),
        default="verify_contract",
        help="which gate to run against the perturbed tables",
    )
    parser.add_argument(
        "keys",
        nargs="*",
        metavar="KEY",
        help="key filters forwarded to the drive script (exact or prefix)",
    )
    return parser.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    drive, args = ns.drive, ns.keys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    drive_py = os.path.join(repo, "scripts", f"{drive}.py")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    con = duckdb.connect()
    for name, sql in TRANSFORMS.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
        )
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    print(f"perturbed tables written to {OUT}", flush=True)
    env = dict(os.environ, VERIFY_SF_DIR=OUT)
    try:
        return subprocess.call(
            [sys.executable, drive_py, *args], env=env, cwd=repo
        )
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
