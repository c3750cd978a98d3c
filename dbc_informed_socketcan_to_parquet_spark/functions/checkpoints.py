"""Lineage-cutting materialization with a fault-tolerance ladder.

Several operators materialize an intermediate exactly once and embed the
result in the plan they return (measured hot sets, LSH truth-pair sets,
per-round CC labels).  ``persist`` is the wrong tool there — the cache
entry has no release path once the frame is handed back (the caller
cannot unpersist a plan fragment), so repeated calls in a long-lived
session leak corpus-scale caches.  ``localCheckpoint`` fixes the leak
(blocks are RDD-owned, ContextCleaner-released) but stores UNREPLICATED
executor-local blocks with truncated lineage: under dynamic allocation
or spot-node loss, every downstream job on the returned frame becomes
unrecoverable (r12 advisory).

:func:`durable_checkpoint` is the ladder: when the session has a
RELIABLE checkpoint directory configured
(``sparkContext.setCheckpointDir`` — HDFS/S3-backed, survives executor
loss), use a true ``checkpoint``; otherwise fall back to
``localCheckpoint``, which is exactly right on a single-JVM ``local[*]``
session where executor loss means the whole app is gone anyway.  A 100
TB deployment on preemptible nodes should set a checkpoint dir; the
operators then upgrade automatically, no call-site changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def durable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` with cut lineage: reliable ``checkpoint`` when a
    checkpoint dir is configured, else ``localCheckpoint``.

    Spark Connect exposes no ``sparkContext``; there the probe fails and
    we use ``localCheckpoint`` (Connect-supported since 4.0), matching
    the pre-r13 behavior.
    """
    try:
        has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
