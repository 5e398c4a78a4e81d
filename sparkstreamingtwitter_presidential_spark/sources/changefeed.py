"""Shared keyed change-row derivation for the Delta / Iceberg / Hudi
row_changes trilogy.

The naive emit — four filtered projections of the full-outer diff
unioned together — re-executes the JOIN (and both input scans) once
per change type: 4x the touched-file read cost, which at 100 TB is
the whole cost of a change read. This helper derives all four change
types in ONE pass: each joined row emits a conditional array of
(change_type, image) structs, nulls compacted, exploded — one scan of
each side, one join, one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keyed_change_rows(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    cols: list[str],
    stamp_name: str,
    stamp: Column,
) -> DataFrame:
    """insert / delete / update_preimage / update_postimage rows from
    a keyed full-outer diff of ``old`` vs ``new`` (both carrying
    exactly ``cols``), each stamped with ``stamp`` as ``stamp_name``.
    Rows equal on both sides (copy-overs) emit nothing. Callers
    validate key uniqueness per side beforehand (an ambiguous diff
    must raise there, with the caller's contract language)."""
    non_keys = [c for c in cols if c not in keys]
    if non_keys:
        payload = F.struct(*[F.col(c).alias(c) for c in non_keys])
    else:
        # all columns are keys: presence IS the payload; updates are
        # impossible (nothing non-key to change)
        payload = F.lit(True)
    o = old.select(*keys, payload.alias("__o"))
    n = new.select(*keys, payload.alias("__n"))
    # shuffle_hash hint: a full outer can never broadcast, and both
    # sides here are stats-free frames (persisted reads of a commit's
    # touched files), so the static planner would fall back to
    # sort-merge — two full sorts the hash join skips. A commit's
    # touched-file rows partition evenly by primary key, and per-task
    # build maps stay bounded by the post-shuffle partition size
    # (AQE skew split still applies first), so the hint is the right
    # call at any scale for THIS shape (guide §3.1: pick the strategy
    # deliberately when you know what the optimizer cannot; r15).
    j = o.join(n.hint("shuffle_hash"), on=keys, how="full_outer")
    has_old = F.col("__o").isNotNull()
    has_new = F.col("__n").isNotNull()
    differs = (
        has_old & has_new & ~F.col("__o").eqNullSafe(F.col("__n"))
        if non_keys
        else F.lit(False)
    )

    def _ent(cond: Column, ctype: str, img: str) -> Column:
        return F.when(
            cond,
            F.struct(
                F.lit(ctype).alias("t"), F.col(img).alias("img")
            ),
        )

    pairs = F.array(
        _ent(has_new & ~has_old, "insert", "__n"),
        _ent(has_old & ~has_new, "delete", "__o"),
        _ent(differs, "update_preimage", "__o"),
        _ent(differs, "update_postimage", "__n"),
    )
    return (
        j.select(*keys, F.explode(F.array_compact(pairs)).alias("__c"))
        .select(
            *keys,
            *[F.col(f"__c.img.{c}").alias(c) for c in non_keys],
            F.col("__c.t").alias("_change_type"),
            stamp.alias(stamp_name),
        )
        .select(*cols, "_change_type", stamp_name)
    )
