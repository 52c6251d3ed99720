"""Pre/post output-hash harness for value-preserving template swaps.

The rounding-template conversions (queries/rounding.py) are supposed to
be VALUE-PRESERVING on the live fixtures: swapping round(sum(money),2)
for the DECIMAL(18,2)-sum template, or a float round for the exact
integer ratio_round template, must not move a single output cell at the
graded scale — only close the cross-engine half-boundary hole. This
harness records, per key, a stable hash of BOTH engines' result
multisets (the driver's column-name-sorted, _norm-normalized shape) so
a conversion can be proven bit-stable: run it before the edit with
--save, run it after with --check, and any moved cell fails loudly.

Usage:
  python scripts/prepost_hash.py --save /tmp/pre.json key [key ...]
  python scripts/prepost_hash.py --check /tmp/pre.json key [key ...]
Env: PREPOST_SF_DIRS — comma-separated fixture dirs
     (default /root/testdata/sf0.001,/root/testdata/sf0.01).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys


def _parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Record or check per-key output hashes (both engines)."
    )
    mode = parser.add_mutually_exclusive_group(required=True)
    mode.add_argument("--save", metavar="FILE", help="write hashes to FILE")
    mode.add_argument(
        "--check", metavar="FILE", help="compare hashes against FILE"
    )
    parser.add_argument("keys", nargs="+", metavar="KEY")
    return parser.parse_args(argv)


def _hash_rows(cols, rows) -> str:
    from tests.oracle import _norm

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(
        (tuple(repr(_norm(row[i])) for i in order) for row in rows),
        key=repr,
    )
    payload = json.dumps(
        {"cols": sorted(cols), "rows": norm}, separators=(",", ":")
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    oracles = mod.oracle_sql()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla
    spark.sparkContext.setLogLevel("ERROR")

    sf_dirs = os.environ.get(
        "PREPOST_SF_DIRS", "/root/testdata/sf0.001,/root/testdata/sf0.01"
    ).split(",")

    out: dict[str, dict[str, str]] = {}
    for key in ns.keys:
        if key not in queries:
            print(f"[{key}] UNKNOWN key", flush=True)
            return 2
        for sf_dir in sf_dirs:
            df = queries[key](spark, sf_dir)
            rows = df.collect()
            cols = list(df.columns)
            rec = out.setdefault(key, {})
            rec[f"spark@{sf_dir}"] = _hash_rows(
                cols, [[r[c] for c in cols] for r in rows]
            )
            if key in oracles:
                con = duckdb.connect()
                from cloud2sql_spark.catalog import TABLES

                for name in TABLES:
                    con.execute(
                        f"CREATE VIEW {name} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{name}.parquet')"
                    )
                res = con.execute(oracles[key])
                dcols = [d[0] for d in res.description]
                rec[f"duck@{sf_dir}"] = _hash_rows(dcols, res.fetchall())
                con.close()
            print(f"[{key}] hashed @ {sf_dir}", flush=True)

    if ns.save:
        with open(ns.save, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"saved {len(out)} keys -> {ns.save}")
        return 0

    with open(ns.check) as f:
        ref = json.load(f)
    bad = 0
    for key, rec in out.items():
        for tag, h in rec.items():
            old = ref.get(key, {}).get(tag)
            status = "MATCH" if old == h else "MOVED"
            if old is None:
                status = "NEW"
            if status != "MATCH":
                bad += 1
            print(f"[{key}] {tag}: {status}")
    print(f"{'ALL STABLE' if not bad else f'{bad} HASH(ES) MOVED'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
