"""NULL-injection probe — the standing gate born from ADVICE r12's
dedup_prefix_norm NULL-pfx finding (round 13, first run).

The driver's fixtures have never carried a NULL documents.text, so every
other gate is structurally blind to cross-engine NULL-semantics
divergence AND to plain NULL-crashes in the Python (mapInPandas / driver
fixture-writer) paths — yet nothing in the fixture contract forbids a
future corpus with NULLs, and at 100 TB a real lake ALWAYS has them. The
first run found an 11-key class: 10 hard crashes (np.frombuffer(None) in
seven multimodal UDFs and the lang-id scorer, .encode() on None in
scan_binaryfile's fixture writer, ANSI 0/0 in dedup_sorted_neighborhood
when two NULL-key docs become window neighbors) and one silent value
divergence (text_fingerprint emitting ''/0 where the oracle NULL-
propagates).

Mechanics: copy the source fixtures with documents.text NULLed for
doc_id % 50 == 7 (~2%, deterministic), then run the full contract
(scripts/verify_contract.py) against the copy. Oracle comparison runs
as usual — the point is that BOTH engines must agree on NULL semantics,
whatever those are per key (drop vs NULL-propagate is each key's
documented contract).

Usage: python scripts/null_probe.py [key-prefix ...]
Env: NULLPROBE_SRC (source fixture dir, default /root/testdata/sf0.01),
NULLPROBE_OUT (NULLed-table dir, default pid-unique tmpfs). Exit code is
verify_contract's (1 on any FAIL).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

SRC = os.environ.get("NULLPROBE_SRC", "/root/testdata/sf0.01")
# pid-unique by default so overlapping runs can't rmtree each other's
# tables mid-verify (the perturb_audit/split_probe convention)
OUT = os.environ.get("NULLPROBE_OUT", f"/dev/shm/null_probe.{os.getpid()}")


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (argparse-first: --help exits 0 with
    no Spark and no writes; unknown options exit 2 before any fixture
    generation)."""
    import argparse

    parser = argparse.ArgumentParser(
        description=(
            "NULL ~2%% of documents.text (doc_id %% 50 == 7), then run "
            "the full Spark-vs-DuckDB contract over the copy — catches "
            "NULL crashes in Python paths and cross-engine NULL-"
            "semantics divergence."
        ),
        epilog=(
            "Env: NULLPROBE_SRC (source fixture dir, default "
            "/root/testdata/sf0.01), NULLPROBE_OUT (NULLed-table dir, "
            "default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "keys",
        nargs="*",
        metavar="KEY",
        help="key filters forwarded to verify_contract",
    )
    return parser.parse_args(argv)


def write_nulled(src: str, out: str) -> int:
    """Copy the corpus with documents.text NULLed on the deterministic
    ~2%% stripe; every other table is byte-identical. Returns the number
    of NULLed rows (the caller asserts it is nonzero — a probe that
    nulls nothing silently degenerates to a plain contract run)."""
    import duckdb

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    tables = (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split()
    for name in tables:
        shutil.copy(os.path.join(src, f"{name}.parquet"), out)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT doc_id,
                     CASE WHEN doc_id % 50 = 7 THEN NULL ELSE text END
                         AS text,
                     lang, source, n_chars
              FROM read_parquet('{src}/documents.parquet'))
        TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE text IS NULL"
    ).fetchone()[0]
    con.close()
    return n


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    n_null = write_nulled(SRC, OUT)
    assert n_null > 0, (
        f"null probe degenerate: 0 NULLed rows from {SRC} — the doc_id "
        "stripe matched nothing; probe would silently re-run the plain "
        "contract"
    )
    print(f"null probe: {n_null} NULL-text docs written to {OUT}", flush=True)

    env = dict(os.environ, VERIFY_SF_DIR=OUT)
    try:
        return subprocess.call(
            [
                sys.executable,
                os.path.join(repo, "scripts", "verify_contract.py"),
                *ns.keys,
            ],
            env=env,
            cwd=repo,
        )
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
