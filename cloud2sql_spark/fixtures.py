"""On-disk fixture lifecycle — ONE module, one documented protocol.

Several operators stage a derived on-disk fixture (a re-sorted parquet
file, a Delta-less time-travel table, a CSV round-trip dir) under a
shared /tmp root so repeat invocations and sibling operators can reuse
it. Three rounds of review findings in a row were lifecycle bugs in
per-family copies of this machinery (supersession clocks, tmp leaks,
marker orphans, eviction ordering — VERDICT r07 item 7), so the whole
lifecycle now lives here and the families only call in.

The lifecycle, in order:

1. **create** — fixtures are built to a pid-unique ``*.tmp`` staging
   name and published with an atomic ``os.replace`` (concurrent
   sessions never observe a half-written fixture; last rename wins
   harmlessly because builds are deterministic).
2. **mark** — when a build encounters a fixture from a SUPERSEDED
   source generation (identity-keyed names no longer matching the
   current source), it must not delete it immediately: a still-running
   previous-round session may hold a lazy DataFrame over it, and the
   fixture's own mtime records CREATION, not supersession. The first
   encounter writes a ``.superseded`` sidecar marker — that marker's
   mtime IS the supersession clock.
3. **age-gate** — nothing is reaped until its clock (marker mtime for
   superseded fixtures, content mtime for whole per-application dirs
   and crashed ``*.tmp`` staging files) is older than
   ``STALE_FIXTURE_SECONDS``, which is deliberately ABOVE the longest
   observed session so an in-flight scan can never lose its file.
4. **reap** — a build that finds an expired clock removes the
   fixture+marker pair (or the stale dir); orphaned markers whose
   fixture is already gone are swept, and a marker on the CURRENT
   fixture (a restored source generation — tar -x/rsync -a preserve
   the identity key) is removed so a later real supersession gets a
   fresh grace window.

Every stat/remove sits inside try/except OSError: a concurrent
session's reaper may win any individual race, and that must stay
harmless. tests/test_fixture_reaper.py pins the marker protocol;
tests/test_fixture_contracts.py pins the identity-keying behavior.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Callable

TMP_ROOT = os.path.join(tempfile.gettempdir(), "cloud2sql_spark")

# Age gate for every reap decision. Margin is deliberately ABOVE the
# longest observed session (~6h driver round): a still-running session
# can hold a lazy DataFrame over a fixture it built hours ago, and reads
# do not bump any mtime (ADVICE r05).
STALE_FIXTURE_SECONDS = 8 * 3600


def tmp_path(name: str) -> str:
    """Path under the shared fixture root; parent dirs created."""
    path = os.path.join(TMP_ROOT, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def fixture_age(path: str, now: float) -> float:
    """Age of a fixture dir = now minus the NEWEST mtime among the dir
    and its direct children. Directory mtime alone only reflects entry
    create/delete; a rebuild that rewrites files in place would look
    stale by dir mtime while its contents are fresh."""
    newest = os.path.getmtime(path)
    try:
        for f in os.listdir(path):
            newest = max(newest, os.path.getmtime(os.path.join(path, f)))
    except OSError:
        pass
    return now - newest


def app_fixture_dir(op: str, leaf: str) -> str:
    """Per-(sf, applicationId) fixture dir under TMP_ROOT/<op>/.

    The appId in ``leaf`` prevents concurrent sessions clobbering each
    other's fixtures mid-read; without a sweep, though, every PAST
    application leaks a full table copy in /tmp. Age-gated cleanup
    (newest content mtime older than the margin) removes those
    leftovers while staying safe for any session that could actually
    still be running."""
    parent = os.path.join(TMP_ROOT, op)
    os.makedirs(parent, exist_ok=True)
    now = time.time()
    for d in os.listdir(parent):
        if d == leaf:
            continue
        p = os.path.join(parent, d)
        try:
            if fixture_age(p, now) > STALE_FIXTURE_SECONDS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    path = os.path.join(parent, leaf)
    shutil.rmtree(path, ignore_errors=True)
    return path


def session_fixture_dir(spark, op: str, sf_dir: str) -> str:
    """Per-(sf, applicationId) dir for IN-PLACE stateful fixtures —
    Derby databases, streaming checkpoints/state, sink round-trip dirs —
    that are rebuilt rmtree-then-write on every invocation and can never
    be atomically published (multi-file, order-dependent content).

    These were the last fixture paths keyed by neither sf_dir nor
    session: two concurrent gate runs sharing a TMPDIR that overlapped
    on such a key rmtree'd each other's live checkpoint/database
    mid-stream (round 12: a pytest sweep at sf0.001 deleted a contract
    run's stream_foreach_jdbc checkpoint state at sf0.01 —
    CANNOT_WRITE_STATE_STORE — and a second overlap made the perturb
    audit read back a Derby rollup POPULATED FROM THE WRONG CORPUS,
    i.e. the class can also produce wrong VALUES, not just crashes).
    Same fix as round 11's CWD-keyed-warehouse hole (sink_bucketed_join):
    ride app_fixture_dir's per-application keying + age-gated reaping,
    with the sf in the leaf so different scale factors never share
    state even within one session."""
    path = session_fixture_path(spark, op, sf_dir)
    return app_fixture_dir(op, os.path.basename(path))


def session_fixture_path(spark, op: str, sf_dir: str) -> str:
    """The path session_fixture_dir would return, WITHOUT the reset
    (no rmtree, no sibling reaping) — for tests and readers that need
    to inspect a fixture another call just built."""
    leaf = f"{os.path.basename(os.path.normpath(sf_dir))}_" + (
        spark.sparkContext.applicationId
    )
    return os.path.join(TMP_ROOT, op, leaf)


def publish_keyed_fixture(
    fix_dir: str,
    family_prefix: str,
    leaf: str,
    build: Callable[[str], None],
) -> str:
    """Create→mark→age-gate→reap for identity-keyed fixture FILES.

    ``leaf`` is the current-generation filename (embed the source's
    (mtime_ns, size) identity in it — a changed source then resolves to
    a different fixture, immune to preserved/backdated mtimes);
    ``family_prefix`` identifies sibling generations of the same family
    inside ``fix_dir``; ``build(tmp_name)`` writes the fixture to the
    given staging path (published here with an atomic rename).

    Returns the absolute fixture path, guaranteed to exist."""
    fix = os.path.join(fix_dir, leaf)
    if not os.path.exists(fix):
        os.makedirs(fix_dir, exist_ok=True)
        tmp_name = f"{fix}.{os.getpid()}.tmp"
        build(tmp_name)
        os.replace(tmp_name, fix)
        now = time.time()
        for old_f in os.listdir(fix_dir):
            full = os.path.join(fix_dir, old_f)
            if (
                full == fix
                or not old_f.startswith(family_prefix)
                or old_f.endswith(".superseded")
            ):
                continue
            # stat/open/remove inside the try: a concurrent session's
            # reaper can remove files between listdir and stat, and
            # that race must stay harmless, not crash the build
            try:
                if old_f.endswith(".tmp"):
                    # crashed-build staging file: its mtime IS the
                    # crash time (no marker needed)
                    if now - os.path.getmtime(full) > STALE_FIXTURE_SECONDS:
                        os.remove(full)
                    continue
                marker = full + ".superseded"
                if not os.path.exists(marker):
                    with open(marker, "w"):
                        pass
                elif now - os.path.getmtime(marker) > STALE_FIXTURE_SECONDS:
                    os.remove(full)
                    os.remove(marker)
            except OSError:
                pass
        # orphaned markers (fixture already reaped, marker removal
        # raced): sweep any marker whose fixture is gone
        for old_f in os.listdir(fix_dir):
            if not old_f.endswith(".superseded"):
                continue
            full = os.path.join(fix_dir, old_f)
            try:
                if not os.path.exists(full[: -len(".superseded")]):
                    os.remove(full)
            except OSError:
                pass

    # a restored source generation can make a previously-superseded
    # fixture CURRENT again; its stale marker must go, or the next real
    # supersession would reap the live fixture with no grace window
    try:
        os.remove(fix + ".superseded")
    except OSError:
        pass
    return fix
