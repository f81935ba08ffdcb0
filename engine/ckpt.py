"""Round-state materialization for iterative operators (r5; VERDICT-r4
"What's wrong" #4).

Every iterative operator (pagerank, kcore, SSSP, connected components,
kNN retry rounds, flow accumulation, basin labeling) must materialize
its per-round state so the logical plan stays flat across rounds.  Two
strategies, selected per call site by `checkpoint_dir`:

* `checkpoint_dir=None` (default): `DataFrame.localCheckpoint` — blocks
  live in EXECUTOR storage.  Fast (no external write), but the blocks
  die with the executor: on a multi-executor cluster, losing one
  executor mid-iteration fails the job with nothing to recover from
  (lineage is truncated).  Fine in local mode, where executor == driver
  == the job itself.

* `checkpoint_dir="hdfs://.../ckpt"` (or any Hadoop-FS path): RELIABLE
  checkpointing — `SparkContext.setCheckpointDir` + `DataFrame
  .checkpoint`.  Round state is written to the fault-tolerant
  filesystem and survives executor loss, at the cost of one write+read
  per round.  The cluster-mode choice for long iterations on churny
  fleets (spot instances, autoscaling).

The option is threaded through operator signatures as
`checkpoint_dir: str | None = None` so callers choose per job, not per
cluster restart.  `setCheckpointDir` is process-global in Spark; this
helper sets it idempotently on first reliable use and raises if a later
call asks for a DIFFERENT directory (silently retargeting mid-job would
scatter one job's round state across directories).
"""
from __future__ import annotations

from pyspark.sql import DataFrame

_ckpt_dir_set: list[str] = []  # remembers the dir this process pinned


def materialize(df: DataFrame, eager: bool = True,
                checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize `df` (truncate lineage): localCheckpoint by default,
    reliable `checkpoint()` under `checkpoint_dir`.  See module doc."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    if _ckpt_dir_set:
        if _ckpt_dir_set[0] != checkpoint_dir:
            raise ValueError(
                "materialize: checkpoint dir already pinned to "
                f"{_ckpt_dir_set[0]!r}; SparkContext.setCheckpointDir is "
                "process-global — use one dir per application")
    else:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt_dir_set.append(checkpoint_dir)
    return df.checkpoint(eager=eager)
