"""Audit every oracle pair for cross-engine column-type mismatches.

The driver's value-hash canonicalizes through pandas: integer WIDTH
differences (Spark INT vs DuckDB BIGINT/UINTEGER) hash identically and
were driver-green in rounds 1-3 (win_row_number, agg_corr_regr), but
types that pandas represents as OBJECT dtype on one side only — DuckDB
HUGEINT (int128), nested ARRAY cells — flip the hash even when every
value matches (round-3 red rows embed_quantize / text_histogram; fixed
by CAST ... AS BIGINT in the oracles).

This script compares Spark's result schema against DuckDB's DESCRIBE for
all registered keys and reports two classes:

- SEVERE: a type pairing known to break the driver hash (HUGEINT,
  UINTEGER128, or a scalar-vs-nested disagreement) — fix before shipping.
- width: benign integer-width differences, listed for completeness.

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from cloud2sql_spark.catalog import TABLES
from cloud2sql_spark.registry import oracle_sql, queries
from cloud2sql_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# DuckDB type names that pandas materializes as object dtype (or that
# otherwise change the driver's typed value-hash) when Spark's side is a
# plain numeric column.
SEVERE_DUCK = {"HUGEINT", "UHUGEINT", "UBIGINT"}

COMPAT = {
    "int": {"INTEGER", "BIGINT", "SMALLINT", "TINYINT", "UINTEGER",
            "USMALLINT", "UTINYINT"},
    "bigint": {"BIGINT", "INTEGER", "UINTEGER", "SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "timestamp": {"TIMESTAMP WITH TIME ZONE", "TIMESTAMP"},
    "binary": {"BLOB"},
}


def _elem_class(t: str) -> str:
    """Normalize a scalar element type name (either engine's spelling)
    to a hash-equivalence class: within a class the driver's pandas
    canonicalization hashes identically; across classes it does not."""
    t = t.strip().lower().split("(")[0]
    if t in ("varchar", "string", "text", "char"):
        return "str"
    if t in (
        "tinyint", "smallint", "int", "integer", "bigint", "long",
        "utinyint", "usmallint", "uinteger", "ubigint",
    ):
        return "int"
    if t in ("float", "double", "real", "decimal"):
        return "float"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    return t


def main() -> int:
    spark = get_spark("oracle-type-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    qs, osql = queries(), oracle_sql()
    severe, width, errors = [], [], []
    for key in sorted(qs):
        if key not in osql:
            continue
        try:
            sdf = qs[key](spark, SF_DIR)
            s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            d_types = {
                r[0]: r[1]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM ({osql[key]}) q"
                ).fetchall()
            }
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errors.append((key, str(e)[:120]))
            continue
        for col in d_types:
            if col not in s_types:
                severe.append((key, col, f"duck={d_types[col]} missing in spark"))
        for col, st in s_types.items():
            dt = d_types.get(col)
            if dt is None:
                severe.append((key, col, f"spark={st} missing in oracle"))
                continue
            base = dt.split("(")[0].strip()
            duck_nested = dt.endswith("[]") or base in ("STRUCT", "MAP")
            spark_nested = st.startswith(("array", "struct", "map"))
            if base in SEVERE_DUCK:
                severe.append((key, col, f"spark={st} duck={dt}"))
            elif spark_nested != duck_nested:
                # scalar on one side, nested on the other — object dtype on
                # exactly one side of the driver's pandas canonicalization
                severe.append((key, col, f"spark={st} duck={dt}"))
            elif spark_nested:
                # both nested: element-type drift (e.g. array<string> vs
                # BIGINT[]) flips the driver's pandas value-hash just like
                # a scalar mismatch — compare normalized element classes
                s_elem = st.split("<", 1)[-1].rstrip(">")
                d_elem = dt[:-2].strip() if dt.endswith("[]") else dt
                if ("HUGEINT" in dt) or ("UHUGEINT" in dt):
                    severe.append((key, col, f"spark={st} duck={dt}"))
                elif "<" in s_elem or base in ("STRUCT", "MAP"):
                    # deeply nested (struct/map/array-of-array): no cheap
                    # class compare; keep the double-drift width signal
                    if s_elem.startswith("double") != dt.startswith("DOUBLE"):
                        width.append((key, col, f"spark={st} duck={dt}"))
                else:
                    sc, dc = _elem_class(s_elem), _elem_class(d_elem)
                    if sc != dc:
                        severe.append((key, col, f"spark={st} duck={dt}"))
                    elif sc in ("int", "float") and s_elem.lower() != d_elem.lower():
                        width.append((key, col, f"spark={st} duck={dt}"))
            elif st.startswith("decimal"):
                if not base.startswith("DECIMAL"):
                    severe.append((key, col, f"spark={st} duck={dt}"))
            elif st in COMPAT:
                if dt not in COMPAT[st] and base not in COMPAT[st]:
                    severe.append((key, col, f"spark={st} duck={dt}"))
                elif (st, base) not in (
                    ("int", "INTEGER"),
                    ("bigint", "BIGINT"),
                ) and base in ("BIGINT", "INTEGER", "UINTEGER", "SMALLINT"):
                    width.append((key, col, f"spark={st} duck={dt}"))
    for key, col, msg in severe:
        print(f"SEVERE {key}.{col}: {msg}")
    for key, col, msg in width:
        print(f"width  {key}.{col}: {msg}")
    for key, msg in errors:
        print(f"ERROR  {key}: {msg}")
    print(
        f"\n{len(severe)} severe, {len(width)} width-only, "
        f"{len(errors)} errors over {len(osql)} oracles"
    )
    return 1 if severe or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
