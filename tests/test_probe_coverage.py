"""Scale-probe coverage pin (VERDICT r12 item 2).

Every registry key must carry either an empirical 10x linearity ratio
(scripts/scale_probe.py PROBE_KEYS) or a one-line exclusion rationale
(EXCLUDED). Without this pin, a new registration silently ships with no
scale signal — the gap that hid dedup_prefix_norm's 12.8x plan for four
rounds. No Spark session needed: the lists and the registry are plain
imports.
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud2sql_spark.registry import queries


def _probe_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "scale_probe.py",
    )
    spec = importlib.util.spec_from_file_location("scale_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_registry_key_probed_or_excluded():
    mod = _probe_module()
    reg = set(queries())
    probed = set(mod.PROBE_KEYS)
    excluded = set(mod.EXCLUDED)
    state_probed = set(mod.STATE_PROBED)
    assert len(mod.PROBE_KEYS) == len(probed), "duplicate PROBE_KEYS entries"
    assert not (probed & excluded), sorted(probed & excluded)
    assert not (probed & state_probed), sorted(probed & state_probed)
    assert not (excluded & state_probed), sorted(excluded & state_probed)
    assert reg - probed - excluded - state_probed == set(), (
        "registry keys with neither a probe ratio, a state-size "
        "invariant, nor an exclusion rationale: "
        f"{sorted(reg - probed - excluded - state_probed)}"
    )
    # the coverage dicts must not carry stale names after a key
    # rename/removal
    assert excluded - reg == set(), sorted(excluded - reg)
    assert state_probed - reg == set(), sorted(state_probed - reg)
    # probing a nonexistent key would crash the sweep at runtime
    assert probed - reg == set(), sorted(probed - reg)


def test_exclusions_carry_rationales():
    mod = _probe_module()
    for key, why in mod.EXCLUDED.items():
        assert isinstance(why, str) and len(why) >= 20, (key, why)
    for key, why in mod.STATE_PROBED.items():
        assert isinstance(why, str) and len(why) >= 20, (key, why)
        assert "stream_state_probe" in why, (key, why)


def test_quadratic_annotations_are_probed_keys():
    """The QUADRATIC_* annotation sets only make sense for keys the sweep
    actually times."""
    mod = _probe_module()
    probed = set(mod.PROBE_KEYS)
    assert mod.QUADRATIC_BY_CONTRACT <= probed
    assert mod.QUADRATIC_ON_REPLICA <= probed
