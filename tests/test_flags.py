"""The flag matrix must cover every scale-switch flag the package
consults — a new flag_enabled() call site without a FLAG_MATRIX row means
a 100 TB plan with no standing gate (VERDICT r07 item 1), and a matrix
row for a flag nothing consults means a stale gate. Key lists must also
resolve against the live registry, and the gate's tolerance checkers
must exist for every tolerance-mode key."""

from __future__ import annotations

import os
import re

import cloud2sql_spark
from cloud2sql_spark.flags import FLAG_MATRIX

_PKG_DIR = os.path.dirname(cloud2sql_spark.__file__)
_CALL = re.compile(r"flag_enabled\(\s*['\"](SPARK_GRAFT_[A-Z_]+)['\"]")


def _consulted_flags() -> set[str]:
    found = set()
    for root, _dirs, files in os.walk(_PKG_DIR):
        for fn in files:
            if fn.endswith(".py"):
                with open(os.path.join(root, fn)) as f:
                    found.update(_CALL.findall(f.read()))
    return found


def test_matrix_covers_every_consulted_flag():
    consulted = _consulted_flags()
    assert consulted, "grep found no flag_enabled call sites — regex rot?"
    assert consulted == set(FLAG_MATRIX), (
        sorted(consulted),
        sorted(FLAG_MATRIX),
    )


# Env vars that are NOT boolean scale switches: value-typed configuration
# (paths, counts) a matrix row could not gate. Anything else matching
# SPARK_GRAFT_* in the package must be a FLAG_MATRIX flag.
_NON_SWITCH_ENV = {
    "SPARK_GRAFT_SF_DIR",  # dataset location (catalog.py)
    "SPARK_GRAFT_CPUS",  # local[] parallelism (session.py)
    "SPARK_GRAFT_CHECKPOINT_DIR",  # reliable-checkpoint target dir
}

_BARE = re.compile(r"SPARK_GRAFT_[A-Z_]+")


def test_no_ungated_flag_literals():
    """flag_enabled() is how the matrix DISCOVERS switches, so a switch
    consulted through an aliased import, a wrapper, or a raw
    os.environ.get would land ungated without failing the call-site test
    above (ADVICE r08 — SPARK_GRAFT_RELIABLE_CHECKPOINT did exactly
    this). Belt and suspenders: every SPARK_GRAFT_* literal anywhere in
    the package (code, docstrings, comments) must be a FLAG_MATRIX flag
    or a declared non-switch env var."""
    allowed = set(FLAG_MATRIX) | _NON_SWITCH_ENV
    offenders = {}
    for root, _dirs, files in os.walk(_PKG_DIR):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                unknown = set(_BARE.findall(f.read())) - allowed
            if unknown:
                offenders[os.path.relpath(path, _PKG_DIR)] = sorted(unknown)
    assert not offenders, offenders


def test_matrix_keys_are_registered_with_oracles():
    from cloud2sql_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    for flag, spec in FLAG_MATRIX.items():
        assert spec["check"] in ("exact", "tolerance"), flag
        assert spec["keys"], flag
        for key in spec["keys"]:
            assert key in qs, (flag, key)
            assert key in oracles, (flag, key)


def test_tolerance_checkers_exist():
    import importlib.util
    import sys

    repo = os.path.dirname(_PKG_DIR)
    spec = importlib.util.spec_from_file_location(
        "flag_matrix_script", os.path.join(repo, "scripts", "flag_matrix.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("flag_matrix_script", mod)
    spec.loader.exec_module(mod)
    for flag, mspec in FLAG_MATRIX.items():
        if mspec["check"] == "tolerance":
            for key in mspec["keys"]:
                assert key in mod.TOLERANCE_CHECKERS, (flag, key)
