"""Lineage truncation for iterative (Pregel-style) DataFrame loops.

Every superstep of an iterative op (BFS, k-core peel, PageRank, connected
components) grows the logical plan by a few shuffles; without truncation
the optimizer replans the whole nested union each round (observed as
400 -> 600 -> 800 task stages and an eventual driver OOM). Two truncation
modes, same semantics, different fault-tolerance:

- ``localCheckpoint`` (default): blocks are persisted on the executors and
  lineage is DROPPED. Fastest — no distributed-FS round trip — but NOT
  fault-tolerant: if an executor is lost mid-loop, its blocks are gone and
  the job fails (there is no lineage left to recompute them). The right
  trade on a single-node ``local[*]`` session, where executor loss means
  process death anyway.
- reliable ``checkpoint``: blocks are written to
  ``SparkContext.setCheckpointDir`` (HDFS/S3 on a cluster). Survives
  executor loss — the 1000-executor posture for long loops, where the
  probability of losing at least one executor across N supersteps is
  material. Costs one distributed-FS write+read per superstep, and the
  checkpoint files are NOT auto-deleted when the job ends: set
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` at session
  build (cleans each superstep's files once its DataFrame is GC'd) or
  sweep the checkpoint dir per run — otherwise every superstep leaks a
  materialized copy of its frame to durable storage.

Select reliable mode per call (``reliable=True``) or globally via
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1``; the checkpoint directory comes from
``SPARK_GRAFT_CHECKPOINT_DIR`` (defaults to a session-scoped tmp dir,
which is only sensible on local mode — point it at durable shared storage
on a real cluster).

Usage keeps the fluent chain: ``df.transform(truncate_lineage)``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_ENV_RELIABLE = "SPARK_GRAFT_RELIABLE_CHECKPOINT"
_ENV_DIR = "SPARK_GRAFT_CHECKPOINT_DIR"


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    env_dir = os.environ.get(_ENV_DIR)
    current = sc.getCheckpointDir()
    if env_dir:
        # Always honor an explicit durable dir, even when some earlier
        # call already registered a default: first-call-wins here would
        # silently keep writing checkpoints to driver-local tmp on a
        # cluster, defeating the fault tolerance reliable mode is for.
        # (Re-setting only redirects FUTURE checkpoints — already-written
        # ones stay readable at their original location.)
        # getCheckpointDir() reports the registered dir PLUS a per-set
        # random UUID subdir, so "already pointing at env_dir" means the
        # env path is a proper prefix of the current one.
        want = env_dir.removeprefix("file:").rstrip("/")
        have = (current or "").removeprefix("file:").rstrip("/")
        if not (have == want or have.startswith(want + "/")):
            sc.setCheckpointDir(env_dir)
    elif current is None:
        sc.setCheckpointDir(
            os.path.join(
                tempfile.gettempdir(),
                f"spark-graft-ckpt-{sc.applicationId}",
            )
        )


def truncate_lineage(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Eagerly materialize ``df`` and drop its lineage.

    ``reliable=None`` (default) reads ``SPARK_GRAFT_RELIABLE_CHECKPOINT``;
    ``reliable=True`` forces the cluster-safe ``checkpoint()`` path,
    ``reliable=False`` forces executor-local blocks.
    """
    if reliable is None:
        reliable = os.environ.get(_ENV_RELIABLE, "") == "1"
    if reliable:
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
