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
