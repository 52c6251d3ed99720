"""Streaming STATE-size probe (VERDICT r13 item 4, round 14).

The wall-time scale probe rightly excludes the file-replay streaming
keys — their seconds measure micro-batch scheduler rounds, not the
plan. But three of them make an explicit state claim the time probe
can't see:

  stream_incremental_topk  — state is O(k), never O(stream)
  stream_cdc_upsert        — state is O(live keys), never O(stream)
  stream_exactly_once_sink — each batch dir is O(event types), not
                             O(events); only the BATCH COUNT grows
                             with input

This probe asserts those claims empirically: replay the events fixture
at 1x and at Rx (same user universe, same event-type set, fresh
event_ids — so a correct state stays CONSTANT while the stream grows
Rx), drive each key's actual foreachBatch machinery over both, and
measure state rows instead of seconds. A state that grows with the
replay factor fails the probe; wall time is never compared.

Usage: python scripts/stream_state_probe.py [replication]
Env: STREAMPROBE_SRC (source fixture dir, default /root/testdata/sf0.01),
STREAMPROBE_OUT (work dir, default pid-unique tmpfs).
Exit 1 on any violated invariant. The coverage story is pinned in
scripts/scale_probe.py (STATE_PROBED) + tests/test_probe_coverage.py;
the invariants themselves are pinned in tests/test_stream_state.py,
which drives measure_state_sizes at sf0.001.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("STREAMPROBE_SRC", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "STREAMPROBE_OUT", f"/dev/shm/stream_state_probe.{os.getpid()}"
)


def _parse_args(argv: list[str] | None = None):
    """Zero-side-effect CLI parse (argparse-first convention)."""
    import argparse

    parser = argparse.ArgumentParser(
        description=(
            "Replay events at 1x and Rx through the three stateful "
            "streaming sinks and compare STATE sizes (rows), not "
            "seconds: topk state must stay O(k), cdc state O(live "
            "keys), exactly-once batch dirs O(event types) — all "
            "constant while the stream grows Rx."
        ),
        epilog=(
            "Env: STREAMPROBE_SRC (source fixture dir, default "
            "/root/testdata/sf0.01), STREAMPROBE_OUT (work dir, "
            "default pid-unique tmpfs)."
        ),
    )
    parser.add_argument(
        "replication",
        nargs="?",
        type=int,
        default=10,
        help="replay-size factor R for the grown stream (default 10)",
    )
    return parser.parse_args(argv)


def replicate_events(spark, src: str, out_dir: str, reps: int) -> str:
    """Write an events-only fixture dir with the stream replicated
    ``reps``x: fresh event_ids per replica (offset), but the SAME
    user_id universe and event_type set — so O(live keys)/O(types)
    state must not move while O(stream) state would grow ``reps``x."""
    from pyspark.sql import functions as F

    from cloud2sql_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    ev = load_table(spark, src, "events")
    if reps == 1:
        ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
        return out_dir
    off = ev.agg(F.max("event_id")).first()[0] + 1
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * off))
        for i in range(reps)
    ]
    grown = parts[0]
    for p in parts[1:]:
        grown = grown.unionByName(p)
    grown.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    return out_dir


def measure_state_sizes(
    spark, sf_dir: str, work: str, n_files: int = 4
) -> dict[str, int]:
    """Drive the three stateful sinks' real machinery over ``sf_dir``'s
    events and return the observed state sizes:

      topk_state_rows    — rows in the top-k state after drain
      cdc_state_rows     — rows (incl. tombstones) in the CDC snapshot
      eos_max_batch_rows — max rows in any exactly-once batch dir
      eos_batch_dirs     — number of batch dirs (grows with input: the
                           sink's OUTPUT is linear, its per-batch state
                           is not)
    """
    from cloud2sql_spark.streaming import replay, transforms

    shutil.rmtree(work, ignore_errors=True)
    replay_dir = replay.stage_replay_dir(
        spark, sf_dir, f"{work}/replay", n_files=n_files
    )
    out: dict[str, int] = {}

    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=1)
    replay.run_incremental_topk(stream, f"{work}/topk", f"{work}/topk_ckpt", k=10)
    out["topk_state_rows"] = (
        spark.read.parquet(f"{work}/topk/cur").count()
    )

    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=1)
    replay.run_cdc_upsert(stream, f"{work}/cdc", f"{work}/cdc_ckpt")
    out["cdc_state_rows"] = spark.read.parquet(f"{work}/cdc/cur").count()

    stream = replay.read_event_stream(spark, replay_dir, files_per_trigger=1)
    replay.run_exactly_once_append(
        stream,
        f"{work}/eos",
        f"{work}/eos_ckpt",
        batch_transform=transforms.counts_by_type,
    )
    batch_dirs = sorted(glob.glob(f"{work}/eos/batch=*"))
    out["eos_batch_dirs"] = len(batch_dirs)
    out["eos_max_batch_rows"] = max(
        spark.read.parquet(d).count() for d in batch_dirs
    )
    return out


def check_invariants(
    base: dict[str, int], grown: dict[str, int], reps: int, k: int = 10
) -> list[str]:
    """Return violation messages (empty == probe passes).

    The O(k)/O(keys)/O(types) claims demand the grown stream's state
    EQUAL the base stream's (the replica adds events, not keys/types);
    only the exactly-once batch COUNT may grow, and it must grow
    ~linearly (it is ceil(files/trigger) — input-proportional output,
    not state)."""
    bad: list[str] = []
    if grown["topk_state_rows"] != k or base["topk_state_rows"] != k:
        bad.append(
            f"topk state must be exactly k={k} rows at any replay size; "
            f"got base={base['topk_state_rows']} "
            f"grown={grown['topk_state_rows']}"
        )
    if grown["cdc_state_rows"] != base["cdc_state_rows"]:
        bad.append(
            "cdc state must be O(live keys) — constant when replicas "
            "add events over the same user universe; got "
            f"base={base['cdc_state_rows']} grown={grown['cdc_state_rows']}"
        )
    if grown["eos_max_batch_rows"] != base["eos_max_batch_rows"]:
        bad.append(
            "exactly-once per-batch rows must be O(event types); got "
            f"base={base['eos_max_batch_rows']} "
            f"grown={grown['eos_max_batch_rows']}"
        )
    if grown["eos_batch_dirs"] != reps * base["eos_batch_dirs"]:
        bad.append(
            "exactly-once batch count must track input exactly (one "
            "committed dir per replayed file-trigger); got "
            f"base={base['eos_batch_dirs']} "
            f"grown={grown['eos_batch_dirs']} reps={reps}"
        )
    return bad


def main(argv: list[str] | None = None) -> int:
    ns = _parse_args(argv)
    reps = ns.replication

    from cloud2sql_spark.session import get_spark

    spark = get_spark()
    try:
        base_dir = replicate_events(spark, SRC, f"{OUT}/base", 1)
        grown_dir = replicate_events(spark, SRC, f"{OUT}/grown", reps)
        n_base = spark.read.parquet(f"{base_dir}/events.parquet").count()
        n_grown = spark.read.parquet(f"{grown_dir}/events.parquet").count()
        assert n_grown == reps * n_base, (n_base, n_grown, reps)
        print(
            f"stream state probe: events {n_base} -> {n_grown} ({reps}x)",
            flush=True,
        )
        # the grown replay uses reps x the files so PER-BATCH input stays
        # comparable — the honest "longer stream", not "bigger batches"
        base = measure_state_sizes(spark, base_dir, f"{OUT}/wb", n_files=4)
        grown = measure_state_sizes(
            spark, grown_dir, f"{OUT}/wg", n_files=4 * reps
        )
        print(f"base  (1x): {base}")
        print(f"grown ({reps}x): {grown}")
        bad = check_invariants(base, grown, reps)
        for msg in bad:
            print(f"VIOLATION: {msg}")
        print(
            f"stream state probe: {'PASS' if not bad else 'FAIL'} "
            f"({4 - len(bad)}/4 invariants)"
        )
        return 1 if bad else 0
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
