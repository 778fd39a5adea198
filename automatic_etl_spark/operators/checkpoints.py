"""Best-effort storage release for superseded ``localCheckpoint``
frames — the ONE place that reaches through non-public PySpark
internals (r14 ADVICE: the helper was private to operators/graph.py
and imported cross-module, spreading the fragility without a shared
contract; it is promoted here with the caveat documented once).

Iterative plans (connected components, PageRank) checkpoint a fresh
frame per round; without an explicit release, every round's blocks
stay persisted until the JVM happens to GC the unreferenced RDD and
the ContextCleaner gets to it — up to max_iter full copies of the
per-round table alive at once, exactly in the long-chain regime where
many rounds run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's storage blocks NOW.

    ``df`` must be the checkpoint FRAME itself (a projection over it
    would not expose the LogicalRDD). There is no public PySpark API
    for this (the blocks belong to the checkpointed internal RDD, not
    a cache entry), so this reaches through the analyzed LogicalRDD;
    if the internals ever shift, failing soft falls back to the
    GC-driven cleanup path, which is correct but unbounded.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort storage release
        pass
