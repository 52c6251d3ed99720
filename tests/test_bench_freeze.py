"""Unit tests for bench.py's write-once per-round snapshot freeze.

VERDICT r08 item 2: the driver's post-commit bench run rewrote the
committed best-of-3 bench_full_r08.json with a noisy single pass. The
freeze must be write-once per round, and a non-numeric
SPARK_GRAFT_BENCH_ROUND must error instead of silently mislabeling
(ADVICE r08). No SparkSession needed — pure filesystem logic.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import freeze_round_snapshot  # noqa: E402


@pytest.fixture
def repo(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REFREEZE", raising=False)
    return str(tmp_path)


def test_infers_round_from_newest_bench_file(repo):
    for r in (7, 8):
        with open(os.path.join(repo, f"BENCH_r{r:02d}.json"), "w") as f:
            f.write("{}")
    path = freeze_round_snapshot(repo, {"value": 1.0})
    assert path is not None and path.endswith("bench_full_r09.json")
    assert json.load(open(path)) == {"value": 1.0}


def test_no_bench_files_means_round_one(repo):
    path = freeze_round_snapshot(repo, {"value": 1.0})
    assert path is not None and path.endswith("bench_full_r01.json")


def test_existing_freeze_is_never_overwritten(repo, capsys):
    frozen = os.path.join(repo, "bench_full_r01.json")
    with open(frozen, "w") as f:
        json.dump({"value": 109.2}, f)
    before = open(frozen, "rb").read()
    assert freeze_round_snapshot(repo, {"value": 128.8}) is None
    assert open(frozen, "rb").read() == before
    assert "already frozen" in capsys.readouterr().err


def test_env_round_override(repo, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "8")
    path = freeze_round_snapshot(repo, {"value": 2.0})
    assert path is not None and path.endswith("bench_full_r08.json")


def test_explicit_refreeze_overwrites(repo, monkeypatch):
    frozen = os.path.join(repo, "bench_full_r01.json")
    with open(frozen, "w") as f:
        json.dump({"value": 119.9}, f)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REFREEZE", "1")
    assert freeze_round_snapshot(repo, {"value": 109.2}) == frozen
    assert json.load(open(frozen)) == {"value": 109.2}


def test_non_numeric_env_round_errors(repo, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "r09")
    with pytest.raises(SystemExit, match="not an integer"):
        freeze_round_snapshot(repo, {"value": 2.0})
    assert not [
        fn for fn in os.listdir(repo) if fn.startswith("bench_full_")
    ]


def _git(repo: str, *args: str) -> None:
    import subprocess

    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
        cwd=repo,
        check=True,
        capture_output=True,
    )


def test_inferred_round_with_uncommitted_basis_skips_freeze(repo, capsys):
    """ADVICE r09: a rerun after the driver wrote BENCH_r{N}.json but
    before the round-boundary commit infers N+1 — the mislabel window.
    The tell is the basis file being uncommitted; refuse to freeze."""
    _git(repo, "init", "-q")
    with open(os.path.join(repo, "BENCH_r09.json"), "w") as f:
        f.write("{}")
    assert freeze_round_snapshot(repo, {"value": 1.0}) is None
    assert "NOT freezing" in capsys.readouterr().err
    assert not [
        fn for fn in os.listdir(repo) if fn.startswith("bench_full_")
    ]


def test_inferred_round_with_committed_basis_freezes(repo):
    """The genuine next-round first run sees the driver's artifact commit
    already landed — inference stays trusted there."""
    _git(repo, "init", "-q")
    with open(os.path.join(repo, "BENCH_r09.json"), "w") as f:
        f.write("{}")
    _git(repo, "add", "BENCH_r09.json")
    _git(repo, "commit", "-qm", "round 9 artifacts")
    path = freeze_round_snapshot(repo, {"value": 1.0})
    assert path is not None and path.endswith("bench_full_r10.json")


def test_explicit_round_bypasses_basis_guard(repo, monkeypatch):
    """SPARK_GRAFT_BENCH_ROUND is exactly the escape hatch the guard's
    stderr message prescribes for the mislabel window."""
    _git(repo, "init", "-q")
    with open(os.path.join(repo, "BENCH_r09.json"), "w") as f:
        f.write("{}")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "9")
    path = freeze_round_snapshot(repo, {"value": 1.0})
    assert path is not None and path.endswith("bench_full_r09.json")


def test_no_git_checkout_still_freezes(repo):
    """A bare (non-git) working dir must not lose the freeze — the guard
    fails open when git is unavailable (read-only checkout posture)."""
    with open(os.path.join(repo, "BENCH_r09.json"), "w") as f:
        f.write("{}")
    path = freeze_round_snapshot(repo, {"value": 1.0})
    assert path is not None and path.endswith("bench_full_r10.json")
