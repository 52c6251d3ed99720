"""Supersession-clock reaping of superseded rowgroup fixtures.

scan_rowgroup_stats keys its fixture by the source's (mtime_ns, size);
when the driver regenerates the sf dataset, the old-generation fixture
must not be deleted the instant the new one is built — a still-running
previous-round session may hold a lazy DataFrame over it, and the
fixture's own mtime records CREATION, not supersession, so age alone
cannot gate the delete. The protocol under test: the first build that
encounters an old fixture writes a `.superseded` sidecar marker
(starting the clock at supersession); only a build finding a marker
older than _STALE_FIXTURE_SECONDS reaps the fixture+marker pair.
"""

from __future__ import annotations

import os
import time

from cloud2sql_spark.queries import scans
from cloud2sql_spark.queries.scans import _STALE_FIXTURE_SECONDS, _tmp


def _run(spark, sf_dir):
    scans.scan_rowgroup_stats(spark, sf_dir).count()


def _force_rebuild(sf_dir):
    """Remove the CURRENT-generation fixture so the next call rebuilds
    (and therefore runs the reaper)."""
    fix_dir = _tmp(f"scan_rowgroup/{os.path.basename(sf_dir)}_fixture")
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    fix = os.path.join(
        fix_dir, f"orders_rg_{st.st_mtime_ns}_{st.st_size}.parquet"
    )
    if os.path.exists(fix):
        os.remove(fix)
    return fix_dir


def test_old_created_fixture_survives_first_encounter(spark, sf_dir):
    fix_dir = _force_rebuild(sf_dir)
    os.makedirs(fix_dir, exist_ok=True)
    old = os.path.join(fix_dir, "orders_rg_1_1.parquet")
    with open(old, "w"):
        pass
    # created "3 days ago" — the r06 bug deleted this immediately
    past = time.time() - 3 * 24 * 3600
    os.utime(old, (past, past))
    _run(spark, sf_dir)
    try:
        assert os.path.exists(old), "freshly-superseded fixture reaped"
        assert os.path.exists(
            old + ".superseded"
        ), "supersession marker missing"
        # marker clock started NOW, not at the fixture's creation
        assert time.time() - os.path.getmtime(old + ".superseded") < 3600
    finally:
        # the fixture dir is shared on-disk state — leave it clean
        for p in (old, old + ".superseded"):
            if os.path.exists(p):
                os.remove(p)


def test_marked_fixture_reaped_after_margin(spark, sf_dir):
    fix_dir = _force_rebuild(sf_dir)
    os.makedirs(fix_dir, exist_ok=True)
    old = os.path.join(fix_dir, "orders_rg_2_2.parquet")
    marker = old + ".superseded"
    for p in (old, marker):
        with open(p, "w"):
            pass
    past = time.time() - _STALE_FIXTURE_SECONDS - 60
    os.utime(marker, (past, past))
    _run(spark, sf_dir)
    assert not os.path.exists(old), "marker-expired fixture not reaped"
    assert not os.path.exists(marker), "expired marker not reaped"


def test_young_marker_defers_reaping(spark, sf_dir):
    fix_dir = _force_rebuild(sf_dir)
    os.makedirs(fix_dir, exist_ok=True)
    old = os.path.join(fix_dir, "orders_rg_3_3.parquet")
    marker = old + ".superseded"
    for p in (old, marker):
        with open(p, "w"):
            pass
    _run(spark, sf_dir)
    assert os.path.exists(old), "fixture reaped inside the grace window"
    assert os.path.exists(marker)
    os.remove(old)
    os.remove(marker)


def test_crashed_build_tmp_reaped_after_margin(spark, sf_dir):
    """Staging files from crashed builds (never os.replace'd) must not
    leak forever: a .tmp older than the margin is reaped (its mtime IS
    the crash time — no marker needed), a fresh one is left for the
    crashed builder's os.replace."""
    fix_dir = _force_rebuild(sf_dir)
    os.makedirs(fix_dir, exist_ok=True)
    stale = os.path.join(fix_dir, "orders_rg_5_5.parquet.99999.tmp")
    fresh = os.path.join(fix_dir, "orders_rg_6_6.parquet.99998.tmp")
    for p in (stale, fresh):
        with open(p, "w"):
            pass
    past = time.time() - _STALE_FIXTURE_SECONDS - 60
    os.utime(stale, (past, past))
    _run(spark, sf_dir)
    try:
        assert not os.path.exists(stale), "crashed-build tmp leaked"
        assert os.path.exists(fresh), "in-flight staging file reaped"
        assert not os.path.exists(stale + ".superseded"), "marker on tmp"
    finally:
        for p in (stale, fresh):
            if os.path.exists(p):
                os.remove(p)


def test_current_fixture_marker_cleared(spark, sf_dir):
    """A restored source generation makes an old fixture current again;
    its leftover supersession marker must be cleared on use, or the
    NEXT supersession would reap the live fixture with no grace."""
    fix_dir = _force_rebuild(sf_dir)
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    fix = os.path.join(
        fix_dir, f"orders_rg_{st.st_mtime_ns}_{st.st_size}.parquet"
    )
    os.makedirs(fix_dir, exist_ok=True)
    with open(fix + ".superseded", "w"):
        pass
    _run(spark, sf_dir)
    assert not os.path.exists(fix + ".superseded"), "stale marker kept"


def test_orphaned_marker_swept(spark, sf_dir):
    fix_dir = _force_rebuild(sf_dir)
    os.makedirs(fix_dir, exist_ok=True)
    marker = os.path.join(fix_dir, "orders_rg_4_4.parquet.superseded")
    with open(marker, "w"):
        pass
    _run(spark, sf_dir)
    assert not os.path.exists(marker), "orphaned marker not swept"
