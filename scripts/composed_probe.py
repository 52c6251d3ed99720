"""Composed perturbation x multi-split probe — the standing gate that
found join_theta_range's half-boundary bug (round 11, first run).

Each fixture probe covers one failure axis: the perturbation audit
shifts VALUES (does any contract depend on a quirk of the current
corpus?), the multi-split probe shifts PARTITIONING (does any contract
depend on single-split row order?). Composing them — running the full
multi-split contract over a PERTURBED corpus — re-rolls both dice at
once and is strictly more discriminating: the r11 falsification
(Spark 8063.82 vs DuckDB 8063.81 on the money-x3 corpus) appeared only
in this configuration's input, invisible to either probe's default
source. VERDICT r11 item 3 made it a per-round line.

Mechanics: rewrite the source fixtures with perturb_audit's
structure-preserving TRANSFORMS (ids shifted, money x3 exact-2-decimal,
timestamps shifted, embeddings negated, text prefixed), then drive
scripts/split_probe.py with SPLIT_SRC pointing at the perturbed copy —
split_probe re-rewrites it many-row-group and runs the full
Spark-vs-DuckDB contract under forced multi-partition input.

Usage: python scripts/composed_probe.py [key-prefix ...]
Env: COMPOSED_SRC (source fixture dir, default /root/testdata/sf0.01),
COMPOSED_OUT (perturbed-table dir, default pid-unique tmpfs). Exit code
is split_probe's (1 on any FAIL).
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess
import sys

SRC = os.environ.get("COMPOSED_SRC", "/root/testdata/sf0.01")
# pid-unique by default so overlapping runs can't rmtree each other's
# tables mid-verify (the perturb_audit/split_probe convention)
OUT = os.environ.get("COMPOSED_OUT", f"/dev/shm/composed_probe.{os.getpid()}")


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (argparse-first: --help exits 0 with
    no Spark and no writes; unknown options exit 2 before any fixture
    generation)."""
    import argparse

    parser = argparse.ArgumentParser(
        description=(
            "Perturb the fixtures (perturb_audit's TRANSFORMS), then run "
            "the multi-split probe over the perturbed copy — both "
            "failure axes re-rolled at once."
        ),
        epilog=(
            "Env: COMPOSED_SRC (source fixture dir, default "
            "/root/testdata/sf0.01), COMPOSED_OUT (perturbed-table dir, "
            "default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "keys",
        nargs="*",
        metavar="KEY",
        help="key filters forwarded to split_probe/verify_contract",
    )
    return parser.parse_args(argv)


def _load_transforms(repo: str) -> dict[str, str]:
    spec = importlib.util.spec_from_file_location(
        "perturb_audit", os.path.join(repo, "scripts", "perturb_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.TRANSFORMS


def write_perturbed(src: str, out: str, transforms: dict[str, str]) -> None:
    """Materialize the perturbed corpus (single-row-group; split_probe
    handles the many-row-group rewrite downstream)."""
    import duckdb

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    for name, sql in transforms.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{src}/{name}.parquet')"
        )
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    con.close()


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    write_perturbed(SRC, OUT, _load_transforms(repo))
    print(f"composed probe: perturbed tables written to {OUT}", flush=True)

    env = dict(os.environ, SPLIT_SRC=OUT)
    try:
        return subprocess.call(
            [
                sys.executable,
                os.path.join(repo, "scripts", "split_probe.py"),
                *ns.keys,
            ],
            env=env,
            cwd=repo,
        )
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
