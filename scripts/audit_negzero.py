"""Flag oracle result cells that are IEEE -0.0.

The grading driver's value-hash does NOT canonicalize signed zero (r02
multimodal_resize, r05 text_pmi_bigrams precedents): a -0.0 cell can hash
differently between the Spark and DuckDB paths even when both engines agree
bit-for-bit locally. Any hash-checked key whose output can contain -0.0 is
therefore a latent red row. This audit runs every registered DuckDB oracle
at sf0.01 (fast, no Spark needed — green keys match the oracle bit-exactly,
so an oracle-side -0.0 implies a Spark-side one) and reports offending
key/column pairs. Fix = append ``+ 0.0`` after the final round() on BOTH
engines (IEEE: -0.0 + 0.0 == +0.0 under round-to-nearest).

Usage: python scripts/audit_negzero.py [key-prefix ...]
Exit code 1 if any -0.0 cell is found.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

from cloud2sql_spark.catalog import TABLES
from cloud2sql_spark.registry import oracle_sql

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

con = duckdb.connect()
for name in TABLES:
    path = os.path.join(SF_DIR, f"{name}.parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

only = sys.argv[1:]
oracles = oracle_sql()
if only:
    oracles = {
        k: v
        for k, v in oracles.items()
        if any(k == o or k.startswith(o) for o in only)
    }

bad: list[tuple[str, str, int]] = []
for key in sorted(oracles):
    try:
        df = con.execute(oracles[key]).fetchdf()
    except Exception as exc:  # pragma: no cover - oracle bug surfaces here
        print(f"ERROR {key}: {exc}")
        bad.append((key, "<oracle error>", 0))
        continue
    for col in df.columns:
        s = df[col]
        if s.dtype.kind != "f":
            continue
        vals = s.to_numpy()
        n = int(np.sum((vals == 0.0) & np.signbit(vals) & ~np.isnan(vals)))
        if n:
            bad.append((key, col, n))
            print(f"NEGZERO {key}.{col}: {n} cell(s)")

print(f"checked {len(oracles)} oracles; {len(bad)} offending columns")
sys.exit(1 if bad else 0)
