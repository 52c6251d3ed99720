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
        # Compare a prefix column-wise via pyarrow (order-sensitive).
        a = pq.read_table(os.path.join(out, "lineitem.parquet"))
        b = pq.read_table(os.path.join(_SF, "lineitem.parquet"))
        assert a.schema.names == b.schema.names
        assert a.slice(0, 2048).to_pydict() == b.slice(0, 2048).to_pydict()
    finally:
        shutil.rmtree(out, ignore_errors=True)
