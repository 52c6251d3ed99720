"""Pin the CLI argument contracts of bench.py, scripts/verify_contract.py
and scripts/perturb_audit.py (VERDICT r09 item 4 / ADVICE r09).

Before round 10, ANY invocation of bench.py or verify_contract.py —
including ``--help`` — launched a multi-minute Spark run (the judge
tripped it live), and bench reruns also rewrote bench_full_latest.json /
bench_history.jsonl. ``--help`` must now print usage and exit 0 with no
Spark session and no file writes; unknown options must error out before
any expensive work. Subprocess-level tests so the real entry points are
pinned, not a refactoring of them.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Generous vs the observed ~2s, but far below the multi-minute runs the
# old behavior launched — a regression to "run everything" times out.
_FAST = 60


def _run(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, *argv],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=_FAST,
    )


def _mtimes() -> dict[str, float]:
    out = {}
    for fn in os.listdir(_REPO):
        if fn.startswith(("bench_full_", "bench_history", "BENCH_r")):
            out[fn] = os.path.getmtime(os.path.join(_REPO, fn))
    return out


def test_bench_help_exits_zero_without_writes():
    before = _mtimes()
    t0 = time.time()
    r = _run("bench.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "SPARK_GRAFT_SF_DIR" in r.stdout
    assert _mtimes() == before  # no bench artifact touched
    assert time.time() - t0 < _FAST


def test_bench_rejects_unknown_arguments():
    before = _mtimes()
    for bad in (["--bogus"], ["stray"], ["--only=agg_groupby"]):
        r = _run("bench.py", *bad)
        assert r.returncode == 2, (bad, r.stderr)
        assert "unrecognized arguments" in r.stderr
    assert _mtimes() == before


def test_verify_contract_help_exits_zero_fast():
    t0 = time.time()
    r = _run("scripts/verify_contract.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "VERIFY_SF_DIR" in r.stdout
    assert time.time() - t0 < _FAST


def test_verify_contract_rejects_unknown_options():
    r = _run("scripts/verify_contract.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr


def test_perturb_audit_rejects_unknown_drive_before_generation():
    """A typo'd --drive= must fail BEFORE the perturbed-fixture
    generation, naming the known drives (ADVICE r09)."""
    r = _run("scripts/perturb_audit.py", "--drive=flagmatrix")
    assert r.returncode == 2
    assert "verify_contract" in r.stderr and "flag_matrix" in r.stderr
    # generation never started — the audit prints this line first thing
    # after writing tables
    assert "perturbed tables written" not in r.stdout


def test_perturb_audit_drive_is_allowlisted_not_file_existence():
    """scripts/*.py that exist but are not gates (scale_probe,
    perturb_audit itself) are rejected as --drive targets (ADVICE r10:
    the old check accepted any existing scripts/*.py)."""
    for bad in ("scale_probe", "perturb_audit"):
        r = _run("scripts/perturb_audit.py", f"--drive={bad}")
        assert r.returncode == 2, bad
        assert "perturbed tables written" not in r.stdout


def test_perturb_audit_rejects_unknown_option():
    r = _run("scripts/perturb_audit.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized" in r.stderr or "unknown option" in r.stderr


def test_perturb_audit_help_exits_zero_fast():
    r = _run("scripts/perturb_audit.py", "--help")
    assert r.returncode == 0
    assert "--drive" in r.stdout
    assert "perturbed tables written" not in r.stdout


def test_flag_matrix_help_exits_zero_fast():
    t0 = time.time()
    r = _run("scripts/flag_matrix.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "VERIFY_SF_DIR" in r.stdout
    assert time.time() - t0 < _FAST


def test_flag_matrix_rejects_unknown_options():
    r = _run("scripts/flag_matrix.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr


def test_split_probe_help_exits_zero_without_writes():
    t0 = time.time()
    r = _run("scripts/split_probe.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "SPLIT_SRC" in r.stdout
    assert "multi-split tables written" not in r.stdout
    assert time.time() - t0 < _FAST


def test_split_probe_rejects_unknown_and_bad_options():
    r = _run("scripts/split_probe.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr
    r = _run("scripts/split_probe.py", "--row-group-size=abc")
    assert r.returncode == 2
    assert "invalid int value" in r.stderr
    # the bad option fails BEFORE any fixture rewrite
    assert "multi-split tables written" not in r.stdout


def test_scale_probe_help_and_bad_replication():
    r = _run("scripts/scale_probe.py", "--help")
    assert r.returncode == 0 and "usage" in r.stdout.lower()
    r = _run("scripts/scale_probe.py", "abc")
    assert r.returncode == 2
    assert "invalid int value" in r.stderr


def test_composed_probe_help_exits_zero_without_writes():
    t0 = time.time()
    r = _run("scripts/composed_probe.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "COMPOSED_SRC" in r.stdout
    assert "perturbed tables written" not in r.stdout
    assert time.time() - t0 < _FAST


def test_composed_probe_rejects_unknown_options():
    r = _run("scripts/composed_probe.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr
    # the bad option fails BEFORE any fixture generation
    assert "perturbed tables written" not in r.stdout


def test_null_probe_help_exits_zero_without_writes():
    t0 = time.time()
    r = _run("scripts/null_probe.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "NULLPROBE_SRC" in r.stdout
    # every axis is discoverable from --help
    assert "documents.text" in r.stdout
    assert "embeddings.embedding" in r.stdout
    assert "NULLed rows written" not in r.stdout
    assert time.time() - t0 < _FAST


def test_null_probe_rejects_unknown_options():
    r = _run("scripts/null_probe.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr
    # the bad option fails BEFORE any fixture generation
    assert "NULLed rows written" not in r.stdout


def test_null_probe_rejects_unknown_axis():
    r = _run("scripts/null_probe.py", "--axis", "documents.bogus")
    assert r.returncode == 2
    assert "invalid choice" in r.stderr
    assert "NULLed rows written" not in r.stdout


def test_stream_state_probe_help_exits_zero_without_writes():
    t0 = time.time()
    r = _run("scripts/stream_state_probe.py", "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()
    assert "STREAMPROBE_SRC" in r.stdout
    assert "stream state probe:" not in r.stdout
    assert time.time() - t0 < _FAST


def test_stream_state_probe_rejects_unknown_options():
    r = _run("scripts/stream_state_probe.py", "--bogus")
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr
    # the bad option fails BEFORE any fixture generation or Spark work
    assert "stream state probe:" not in r.stdout
