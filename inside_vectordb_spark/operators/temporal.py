"""Temporal join operators: as-of join and banded interval self-join.

Beyond-reference extensions (the reference has no time-series
operators; these are the standard event-analytics primitives a
training-data/event pipeline needs). Both are implemented as
compositions of existing DataFrame ops — no UDFs — so Catalyst
optimizes them end to end.

Scale design:

- ``asof_join`` is the union+window formulation: tag both sides,
  union, one window pass partitioned by the join key. Exactly ONE
  shuffle (on the key) regardless of table sizes — the naive
  formulation (inequality join + argmax) is a theta join that
  degenerates to a broadcast-nested-loop at scale. State per
  partition is one row (the running "last right row"), so executor
  memory is O(1) per key group.
- ``banded_pairs`` buckets timestamps into band-width bins and
  equi-joins on (key, bin) ∪ (key, bin+1): every qualifying pair
  shares a bin or sits in adjacent bins, so the quadratic
  time-range self-join becomes two hash joins whose fan-out is
  bounded by per-bin row counts. A hot (key, bin) cell is an AQE
  skew-join target, same as any skewed equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _q(name: str) -> Column:
    """Backtick-quoted column reference: names with dashes/spaces/dots
    (the BEIR files keep 'corpus-id' verbatim) would otherwise be
    mis-parsed as nested refs (review r7; hoisted to module scope and
    applied to BOTH temporal operators in review r8 — banded_pairs
    previously had the same gap asof_join fixed)."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for every left row, attach ``right_cols`` (and the
    right timestamp) from the LATEST right row with the same key and
    ``right.ts <= left.ts`` (inclusive, matching DuckDB/kdb ASOF
    semantics). Left rows with no prior right row keep NULLs — an
    as-of LEFT join.

    Determinism: callers must ensure (key, ts) is unique on the right
    side (true for the events table); with duplicates the surviving
    row among equal timestamps is tie-broken by union order, which is
    not stable across partitionings.

    Implementation: union both sides with a side tag (right=0 sorts
    before left=1 at equal ts, making the boundary inclusive), pack
    the right payload into ONE struct so all its fields travel
    together, and take ``last(struct, ignorenulls)`` over a running
    window — one shuffle on the key, no inequality join anywhere.
    """
    from pyspark.sql.types import StructType

    payload = [ts_col] + [c for c in right_cols if c != ts_col]
    # cast against StructType OBJECTS, not a concatenated DDL string
    # (unparseable for such names; schema[] also cannot collapse
    # duplicate names the way dict(df.dtypes) silently does)
    r_struct = F.struct(*[_q(c).alias(c) for c in payload])
    null_r = F.lit(None).cast(StructType([right.schema[c] for c in payload]))

    lcols = list(left.columns)
    l_tagged = left.select(
        _q(key_col).alias("__key"),
        _q(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[_q(c).alias(c) for c in lcols]).alias("__l"),
        null_r.alias("__r"),
    )
    # NULL-timestamp right rows can never satisfy r.ts <= l.ts under
    # DuckDB/kdb ASOF semantics, but the window's ASC-NULLS-FIRST
    # order would place them at the head of every key partition and
    # make their payload the running match for EVERY left row —
    # filter them out (review r8). Left rows with NULL ts then only
    # ever see other null-ts left rows (whose __r is null) before
    # them, so they correctly keep a NULL match.
    r_tagged = right.filter(_q(ts_col).isNotNull()).select(
        _q(key_col).alias("__key"),
        _q(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(StructType([left.schema[c] for c in lcols]))
        .alias("__l"),
        r_struct.alias("__r"),
    )

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tagged.unionByName(r_tagged).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out_cols = [F.col("__l")[c].alias(c) for c in lcols] + [
        F.col("__match")[c].alias(f"{prefix}{c}") for c in payload
    ]
    return u.filter(F.col("__side") == 1).select(*out_cols)


def banded_pairs(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    band_sec: int,
) -> DataFrame:
    """Ordered event pairs (earlier, later) from the same key whose
    gap is in ``(0, band_sec]`` seconds — temporal co-occurrence.

    Returns (key, ``{id}_a``, ``{id}_b``, gap_sec) where ``_a`` is
    strictly earlier. Gap exactly equal to the band is INCLUDED;
    equal timestamps are excluded (strictly-later semantics keeps
    each unordered pair emitted exactly once when (key, ts) is
    unique).

    Two equi-join branches instead of one theta join: same-bin pairs
    (gap < band by construction, no residual filter needed beyond
    strict ordering) plus adjacent-bin pairs (residual ``gap <=
    band``). Each qualifying pair lands in exactly one branch, so no
    dedup pass is needed.
    """
    band_us = band_sec * 1_000_000
    base = events.select(
        _q(key_col).alias("__key"),
        _q(id_col).alias("__id"),
        F.unix_micros(_q(ts_col)).alias("__us"),
    ).withColumn("__bin", F.floor(F.col("__us") / band_us))
    # Distinct column names per side: self-join column ambiguity is
    # resolved structurally, not via alias resolution.
    other = base.select(
        F.col("__key").alias("__key2"),
        F.col("__id").alias("__id2"),
        F.col("__us").alias("__us2"),
        F.col("__bin").alias("__bin2"),
    )

    same_bin = base.join(
        other,
        (F.col("__key") == F.col("__key2"))
        & (F.col("__bin") == F.col("__bin2"))
        & (F.col("__us2") > F.col("__us")),
    )
    adjacent = base.join(
        other,
        (F.col("__key") == F.col("__key2"))
        & (F.col("__bin2") == F.col("__bin") + 1)
        & (F.col("__us2") > F.col("__us"))
        & (F.col("__us2") - F.col("__us") <= band_us),
    )
    pairs = same_bin.unionByName(adjacent)
    return pairs.select(
        F.col("__key").alias(key_col),
        F.col("__id").alias(f"{id_col}_a"),
        F.col("__id2").alias(f"{id_col}_b"),
        F.round((F.col("__us2") - F.col("__us")) / 1e6, 6).alias("gap_sec"),
    )
