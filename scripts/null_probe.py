"""NULL-injection probe — the standing gate born from ADVICE r12's
dedup_prefix_norm NULL-pfx finding (round 13, first run; generalized to
multiple nullable columns in round 14 per VERDICT r13 item 2).

The driver's fixtures have never carried a NULL in any payload column,
so every other gate is structurally blind to cross-engine NULL-semantics
divergence AND to plain NULL-crashes in the Python (mapInPandas / driver
fixture-writer) paths — yet nothing in the fixture contract forbids a
future corpus with NULLs, and at 100 TB a real lake ALWAYS has them.
The first (text-only) run found an 11-key class: 10 hard crashes
(np.frombuffer(None) in seven multimodal UDFs and the lang-id scorer,
.encode() on None in scan_binaryfile's fixture writer, ANSI 0/0 in
dedup_sorted_neighborhood when two NULL-key docs become window
neighbors) and one silent value divergence (text_fingerprint emitting
''/0 where the oracle NULL-propagates).

Mechanics: for each AXIS (table.column), copy the source fixtures with
that one column NULLed on a deterministic ~2% id stripe (every other
table byte-identical), then run the full contract
(scripts/verify_contract.py) against the copy. Oracle comparison runs
as usual — the point is that BOTH engines must agree on NULL semantics,
whatever those are per key (drop vs NULL-propagate is each key's
documented contract).

Axes (one probe run per axis; `--axis` restricts):
  documents.text       — the r13 original (Python text paths, shingles)
  events.props         — JSON parsing (fn_json/scan_json_props/udtf_*)
  events.value         — money aggregates, DECIMAL casts, thresholds
  embeddings.embedding — NULL vector into numpy/LSH/IVF/PQ/kNN paths

Usage: python scripts/null_probe.py [--axis AXIS ...] [key-prefix ...]
Env: NULLPROBE_SRC (source fixture dir, default /root/testdata/sf0.01),
NULLPROBE_OUT (NULLed-table dir root, default pid-unique tmpfs). Exit
code is 1 if any axis's verify_contract fails, else 0.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

SRC = os.environ.get("NULLPROBE_SRC", "/root/testdata/sf0.01")
# pid-unique by default so overlapping runs can't rmtree each other's
# tables mid-verify (the perturb_audit/split_probe convention)
OUT = os.environ.get("NULLPROBE_OUT", f"/dev/shm/null_probe.{os.getpid()}")

# axis name -> (table, nulled column, id column). The stripe is
# id % 50 == 7 (~2%, deterministic) for every axis — one shared rule
# keeps the probe's "did it actually null rows" assertion uniform.
AXES: dict[str, tuple[str, str, str]] = {
    "documents.text": ("documents", "text", "doc_id"),
    "events.props": ("events", "props", "event_id"),
    "events.value": ("events", "value", "event_id"),
    "embeddings.embedding": ("embeddings", "embedding", "vec_id"),
}


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (argparse-first: --help exits 0 with
    no Spark and no writes; unknown options exit 2 before any fixture
    generation)."""
    import argparse

    # NOTE: only per-argument help strings undergo %-interpolation;
    # description/epilog are printed verbatim, so single '%' here.
    parser = argparse.ArgumentParser(
        description=(
            "NULL ~2% of one fixture column per axis (id % 50 == 7), "
            "then run the full Spark-vs-DuckDB contract over the copy — "
            "catches NULL crashes in Python paths and cross-engine "
            "NULL-semantics divergence. Default: every axis, "
            "sequentially."
        ),
        epilog=(
            "Axes: " + " ".join(sorted(AXES)) + ". "
            "Env: NULLPROBE_SRC (source fixture dir, default "
            "/root/testdata/sf0.01), NULLPROBE_OUT (NULLed-table dir "
            "root, default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "--axis",
        action="append",
        choices=sorted(AXES),
        metavar="AXIS",
        help="probe only this table.column axis (repeatable); "
        "default: all axes",
    )
    parser.add_argument(
        "keys",
        nargs="*",
        metavar="KEY",
        help="key filters forwarded to verify_contract",
    )
    return parser.parse_args(argv)


def write_nulled(src: str, out: str, axis: str) -> int:
    """Copy the corpus with AXES[axis]'s column NULLed on the
    deterministic ~2% id stripe; every other table is byte-identical.
    Returns the number of NULLed rows (the caller asserts it is
    nonzero — a probe that nulls nothing silently degenerates to a
    plain contract run)."""
    import duckdb

    table, column, id_col = AXES[axis]
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # Derive the copy list from the source dir (ADVICE r13: a hardcoded
    # list silently lags new fixture tables) — everything except the
    # axis's own table is a byte-identical copy.
    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        if os.path.basename(path) != f"{table}.parquet":
            shutil.copy(path, out)
    con = duckdb.connect()
    # * REPLACE keeps column order and every non-target column's type
    # byte-identical to the source footer.
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
                  CASE WHEN {id_col} % 50 = 7 THEN NULL
                       ELSE {column} END AS {column})
              FROM read_parquet('{src}/{table}.parquet'))
        TO '{out}/{table}.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet') "
        f"WHERE {column} IS NULL"
    ).fetchone()[0]
    con.close()
    return n


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    axes = ns.axis or sorted(AXES)

    rc_by_axis: dict[str, int] = {}
    for axis in axes:
        out = os.path.join(OUT, axis.replace(".", "_"))
        n_null = write_nulled(SRC, out, axis)
        assert n_null > 0, (
            f"null probe degenerate: 0 NULLed rows for axis {axis} "
            f"from {SRC} — the id stripe matched nothing; probe would "
            "silently re-run the plain contract"
        )
        print(
            f"null probe [{axis}]: {n_null} NULLed rows written to {out}",
            flush=True,
        )
        env = dict(os.environ, VERIFY_SF_DIR=out)
        try:
            rc_by_axis[axis] = subprocess.call(
                [
                    sys.executable,
                    os.path.join(repo, "scripts", "verify_contract.py"),
                    *ns.keys,
                ],
                env=env,
                cwd=repo,
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    shutil.rmtree(OUT, ignore_errors=True)
    for axis, rc in rc_by_axis.items():
        print(f"null probe [{axis}]: {'PASS' if rc == 0 else 'FAIL'}")
    return 1 if any(rc_by_axis.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
