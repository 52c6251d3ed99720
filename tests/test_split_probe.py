"""Pin the multi-split probe's rewrite mechanics (no Spark needed).

scripts/split_probe.py only probes anything if the rewritten fixtures
really carry MANY row groups (Spark splits parquet at row-group
boundaries inside a byte-range split) and really carry the SAME values
in the SAME row order (the DuckDB oracle must see an unchanged
stream). Both premises live in DuckDB's COPY options — a library
upgrade that started ignoring ROW_GROUP_SIZE, or a parallel scan that
reordered rows, would silently turn the probe into a no-op re-run of
verify_contract. This pins them on the tiny sf0.001 fixtures.
"""

from __future__ import annotations

import importlib.util
import os
import shutil

import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF = os.environ.get("SPLIT_TEST_SRC", "/root/testdata/sf0.001")


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "split_probe", os.path.join(_REPO, "scripts", "split_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rewrite_fans_out_row_groups_and_preserves_rows(tmp_path):
    mod = _load_module()
    out = str(tmp_path / "multisplit")
    try:
        # the probe's default size; DuckDB clamps smaller requests up to
        # its ~2048-row internal minimum, so sf0.001 lineitem (~6k rows)
        # yields 3 groups — still a real multi-split fan-out
        mod.rewrite_multisplit(_SF, out, row_group_size=2048)

        li = pq.ParquetFile(os.path.join(out, "lineitem.parquet"))
        src = pq.ParquetFile(os.path.join(_SF, "lineitem.parquet"))
        assert li.num_row_groups >= 2, li.num_row_groups
        assert li.metadata.num_rows == src.metadata.num_rows

        # every catalog table was rewritten
        from cloud2sql_spark.catalog import TABLES

        for name in TABLES:
            assert os.path.exists(os.path.join(out, f"{name}.parquet")), name

        # value-identical IN ROW ORDER: the oracle's stream is unchanged.
        # Compare the FULL table column-wise via pyarrow (order-sensitive)
        # — a prefix-only check would miss a parallel-scan reorder
        # confined to later row groups, the plausible failure mode
        # (ADVICE r11); sf0.001 lineitem is only ~6k rows, so this is
        # cheap.
        a = pq.read_table(os.path.join(out, "lineitem.parquet"))
        b = pq.read_table(os.path.join(_SF, "lineitem.parquet"))
        assert a.schema.names == b.schema.names
        assert a.num_rows == b.num_rows
        assert a.to_pydict() == b.to_pydict()

        # probe-created dirs carry the rmtree-safety marker
        assert os.path.exists(os.path.join(out, mod.MARKER))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rewrite_refuses_to_delete_source_or_foreign_dirs(tmp_path):
    """The rmtree guards (ADVICE r11): a misconfigured SPLIT_OUT must
    never destroy the source fixtures or any dir the probe didn't
    create."""
    import pytest

    mod = _load_module()

    # OUT resolving to SRC (even via a symlink) is refused outright
    link = tmp_path / "src_link"
    os.symlink(_SF, link)
    with pytest.raises(SystemExit, match="source fixture dir"):
        mod.rewrite_multisplit(_SF, str(link), row_group_size=2048)
    assert os.path.exists(os.path.join(_SF, "lineitem.parquet"))

    # an existing dir WITHOUT the probe marker is refused and untouched
    foreign = tmp_path / "precious"
    foreign.mkdir()
    (foreign / "data.txt").write_text("do not delete")
    with pytest.raises(SystemExit, match="refusing to delete"):
        mod.rewrite_multisplit(_SF, str(foreign), row_group_size=2048)
    assert (foreign / "data.txt").read_text() == "do not delete"

    # a dir WITH the marker (a prior probe run's leftover) is reusable
    stale = tmp_path / "stale_out"
    stale.mkdir()
    (stale / mod.MARKER).write_text("x")
    mod.rewrite_multisplit(_SF, str(stale), row_group_size=2048)
    assert os.path.exists(os.path.join(stale, "lineitem.parquet"))


def test_merge_submit_args_preserves_caller_confs():
    """The probe must prepend its confs to a pre-existing
    PYSPARK_SUBMIT_ARGS, not replace it (ADVICE r11)."""
    mod = _load_module()

    # empty environment: just the probe flags + launcher token
    got = mod._merge_submit_args("", 131072)
    assert got == (
        "--conf spark.sql.files.maxPartitionBytes=131072 "
        "--conf spark.sql.files.openCostInBytes=0 pyspark-shell"
    )

    # caller confs survive, trailing launcher token is not duplicated,
    # and caller flags come after the probe's (so they win on conflict)
    got = mod._merge_submit_args(
        "--conf spark.driver.memory=4g pyspark-shell", 65536
    )
    assert got == (
        "--conf spark.sql.files.maxPartitionBytes=65536 "
        "--conf spark.sql.files.openCostInBytes=0 "
        "--conf spark.driver.memory=4g pyspark-shell"
    )
    assert got.count("pyspark-shell") == 1


def test_composed_probe_perturbs_before_splitting(tmp_path):
    """The composed probe must feed split_probe a REAL perturbed corpus:
    every catalog table present, and the values actually shifted by
    perturb_audit's TRANSFORMS (money x3, ids offset) — otherwise the
    composition degenerates to a plain multi-split run."""
    import duckdb

    spec = importlib.util.spec_from_file_location(
        "composed_probe", os.path.join(_REPO, "scripts", "composed_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "perturbed")
    mod.write_perturbed(_SF, out, mod._load_transforms(_REPO))

    from cloud2sql_spark.catalog import TABLES

    for name in TABLES:
        assert os.path.exists(os.path.join(out, f"{name}.parquet")), name

    con = duckdb.connect()
    (min_src,) = con.execute(
        f"SELECT min(c_custkey) FROM read_parquet('{_SF}/customer.parquet')"
    ).fetchone()
    (min_out,) = con.execute(
        f"SELECT min(c_custkey) FROM read_parquet('{out}/customer.parquet')"
    ).fetchone()
    assert min_out == min_src + 90000  # the id-offset transform applied
    (bad_money,) = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/customer.parquet') "
        "WHERE abs(c_acctbal*100 - round(c_acctbal*100)) > 1e-9"
    ).fetchone()
    assert bad_money == 0  # money x3 stays exact 2-decimal
    con.close()
