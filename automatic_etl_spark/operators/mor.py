"""Merge-on-read part layout with explicit compaction (W4 extension).

The reference gets this behavior from ClickHouse ReplacingMergeTree:
ingest appends row versions as immutable parts, readers that need
merged state query ``FINAL``, and background merges eventually rewrite
parts so plain reads become cheap (SURVEY.md §2.5 W4; reference
tools/ingest_runner.py dedup semantics around :1576-1588). This module
re-expresses the same lifecycle on a parquet directory layout:

- ``write_base`` / ``write_delta``: immutable part directories, each
  row stamped with its commit version (``_commit``) — append-only
  writes, never in-place edits.
- ``merge_on_read``: the FINAL-equivalent view — union of all live
  parts, one row per key at the highest ``(_commit, version_cols)``,
  tombstones (``__deleted``) dropped. Costs one hash shuffle by key
  per read.
- ``compact``: rewrites merged state as the new base and retires the
  delta parts (write-new-then-swap, so a failed compaction leaves the
  old parts readable). After compaction a plain scan IS merged state —
  the read-optimized path.

At 100 TB the merge window shuffle is the whole cost of a MOR read,
which is why compaction exists: it pays that shuffle once and every
subsequent reader skips it. Parts partitioned by a key prefix can be
compacted per-partition (only partitions with deltas rewrite), which
bounds compaction I/O by delta volume, not table size.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators.dedup import latest_version

_COMMIT = "_commit"
DELETED = "__deleted"


def _part_dirs(path: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
        and (d == "base" or d.startswith("delta-"))
    )


def write_base(df: DataFrame, path: str) -> None:
    """Initial snapshot as part ``base`` at commit version 0."""
    df.withColumn(_COMMIT, F.lit(0).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "base"))


def write_delta(df: DataFrame, path: str, commit: int) -> None:
    """One immutable delta part (upserts and/or tombstones) at a
    monotonically increasing commit version ≥ 1."""
    if commit < 1:
        raise ValueError("delta commits start at 1 (0 is the base)")
    df.withColumn(_COMMIT, F.lit(commit).cast("long")).write.mode(
        "errorifexists"
    ).parquet(os.path.join(path, f"delta-{commit:05d}"))


def merge_on_read(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version_cols: Sequence[str] = (),
) -> DataFrame:
    """FINAL-on-read: merged state across every live part.

    Highest ``(_commit, *version_cols)`` wins per key; a winning
    tombstone deletes the key. The union is a metadata operation —
    Spark reads all part files in one scan — so the only data movement
    is the single window shuffle by ``keys``.
    """
    parts = [os.path.join(path, d) for d in _part_dirs(path)]
    if not parts:
        raise ValueError(f"no parts under {path}")
    # mergeSchema: the tombstone column typically exists ONLY in delta
    # parts — a default read takes one part's schema (base sorts
    # first), __deleted vanishes from df.columns, the tombstone filter
    # below is silently skipped, and deleted keys RESURFACE.
    df = spark.read.option("mergeSchema", "true").parquet(*parts)
    # tiebreaker=keys is deliberately NOT passed: keys are constant
    # within each window partition, so they can never break a tie.
    # Ties on identical (_commit, *version_cols) within one delta are
    # resolved arbitrarily — callers that need exact determinism must
    # provide a distinguishing version/sequence column, same contract
    # as ReplacingMergeTree's unspecified tie behavior.
    merged = latest_version(df, keys, [_COMMIT, *version_cols])
    if DELETED in df.columns:
        merged = merged.filter(
            ~F.coalesce(F.col(DELETED), F.lit(False))
        ).drop(DELETED)
    return merged.drop(_COMMIT)


def compact(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version_cols: Sequence[str] = (),
) -> dict:
    """Rewrite merged state as the new base part and retire deltas.

    Write-new-then-swap, in crash-safe order: merged state lands in
    ``base.compacting``, the OLD base is renamed aside, the new base
    renames in (the install point), and only then are old parts
    removed. A crash before the install leaves every old part intact
    and readable; a crash after it leaves the new base authoritative
    with at worst stale-but-superseded deltas alongside (idempotent to
    re-compact). Deleting old parts BEFORE installing would leave a
    window where readers see delta-only state — every base-only key
    silently gone.
    Returns observable stats (parts/rows before and after), mirroring
    the reference's audit-first posture.
    """
    before_parts = _part_dirs(path)
    merged = merge_on_read(spark, path, keys, version_cols)
    tmp = os.path.join(path, "base.compacting")
    merged.withColumn(_COMMIT, F.lit(0).cast("long")).write.mode(
        "overwrite"
    ).parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    base = os.path.join(path, "base")
    retired = os.path.join(path, "base.retired")
    shutil.rmtree(retired, ignore_errors=True)  # residue of a crash
    if os.path.isdir(base):
        os.rename(base, retired)
    os.rename(tmp, base)  # the install point
    shutil.rmtree(retired, ignore_errors=True)
    for d in before_parts:
        if d != "base":
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return {
        "parts_before": len(before_parts),
        "parts_after": 1,
        "rows_after": rows,
    }
