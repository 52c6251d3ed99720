"""Pin the streaming state-size invariants (VERDICT r13 item 4).

The wall-time scale probe excludes the file-replay streaming keys, but
three of them claim bounded state (topk O(k), cdc O(live keys),
exactly-once O(types) per batch). scripts/stream_state_probe.py asserts
those claims on a grown replay; this test pins the same invariants at
sf0.001 x 3 so a state-growth regression fails fast in pytest, not only
in the per-round probe run.
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR

from cloud2sql_spark.fixtures import session_fixture_dir


def _probe_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "stream_state_probe.py",
    )
    spec = importlib.util.spec_from_file_location("stream_state_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_streaming_state_stays_bounded_as_replay_grows(spark):
    mod = _probe_module()
    reps = 3
    root = session_fixture_dir(spark, "stream_state_probe", SF_DIR)
    base_dir = mod.replicate_events(spark, SF_DIR, f"{root}/base", 1)
    grown_dir = mod.replicate_events(spark, SF_DIR, f"{root}/grown", reps)
    base = mod.measure_state_sizes(spark, base_dir, f"{root}/wb", n_files=4)
    grown = mod.measure_state_sizes(
        spark, grown_dir, f"{root}/wg", n_files=4 * reps
    )
    violations = mod.check_invariants(base, grown, reps)
    assert violations == [], violations
    # the probe is only meaningful if the grown replay actually replays
    # more batches — assert the growth applied
    assert grown["eos_batch_dirs"] == reps * base["eos_batch_dirs"]
