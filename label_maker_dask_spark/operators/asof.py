"""As-of join (point-in-time join): for each left row, the latest right row
whose time key is <= the left row's time key, within an equi-key group.

Spark has no native as-of join; the scalable composition is equi-join on the
group key with the range predicate, then one window ``row_number`` over the
left row's unique key to keep the most recent match.  The shuffle key is the
equi key, so skew behaves like any keyed join (salt if a key dominates); the
window partitions by left primary key and is thus bounded.  (DuckDB's native
``ASOF JOIN`` replays the same semantics for the oracle.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    left_key: Sequence[str],
    tie_break: str,
    how: str = "inner",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Latest right row with ``right_time <= left_time`` per left row
    (``direction="backward"``, the default), the EARLIEST right row
    with ``right_time >= left_time`` (``direction="forward"`` — "next
    event after", e.g. first fill after an order, first quote after a
    trade), or the closest row on EITHER side within the tolerance band
    (``direction="nearest"`` — exact-distance ties prefer the backward
    candidate, pandas semantics; tolerance is mandatory since the band
    is what bounds the two-sided fan-out).

    ``left_key`` is the left side's unique key (window partition);
    ``tie_break`` a unique right-side column so equal right timestamps
    resolve deterministically (largest wins backward, smallest wins
    forward).  ``tolerance`` (an INTERVAL expression string, e.g.
    ``"INTERVAL 30 DAY"``) bounds the lookback/lookahead: matches
    beyond ``left_time ∓ tolerance`` are ignored — pandas
    ``merge_asof(tolerance=..., direction=...)`` semantics.  Bounding
    it also bounds the join fan-out at scale: without it, one left row
    can pair with the key's entire right-side history before the
    window cut.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction={direction!r} "
            "(backward|forward|nearest)"
        )
    lt = F.col(f"__l.{left_time}")
    rt = F.col(f"__r.{right_time}")
    if direction == "backward":
        cond = rt <= lt
        if tolerance is not None:
            cond = cond & (rt >= lt - F.expr(tolerance))
    elif direction == "forward":
        cond = rt >= lt
        if tolerance is not None:
            cond = cond & (rt <= lt + F.expr(tolerance))
    else:
        # nearest: candidates on BOTH sides; an unbounded lookaround
        # would pair every left row with the key's whole right history,
        # so the tolerance band is mandatory here
        if tolerance is None:
            raise ValueError(
                "asof_join: direction='nearest' requires a tolerance "
                "(the band is what bounds the two-sided join fan-out)"
            )
        cond = (rt >= lt - F.expr(tolerance)) & (
            rt <= lt + F.expr(tolerance)
        )
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    joined = left.alias("__l").join(right.alias("__r"), cond, how)
    left_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    right_cols = [
        F.col(f"__r.{c}").alias(c) for c in right.columns if c not in set(on)
    ]
    if direction == "backward":
        order = [rt.desc(), F.col(f"__r.{tie_break}").desc()]
    elif direction == "forward":
        order = [rt.asc(), F.col(f"__r.{tie_break}").asc()]
    else:
        # smallest |Δt| wins; an exact-distance tie prefers the
        # backward candidate (pandas merge_asof(direction='nearest')
        # semantics), then the unique tie_break.  Temporal time columns
        # difference as integer epoch micros (TIMESTAMP_NTZ cannot cast
        # to double, DATE cannot either, and integer micros keep the
        # ordering exact); DATE casts losslessly to timestamp first.
        # Only genuinely numeric time columns take the raw double cast.
        from label_maker_dask_spark.functions.timeutil import epoch_micros

        def _as_micros(col, typ):
            if typ == "date":
                return epoch_micros(col.cast("timestamp"))
            return epoch_micros(col)

        r_type = right.schema[right_time].dataType.simpleString()
        l_type = left.schema[left_time].dataType.simpleString()
        temporal = ("timestamp", "date")
        if r_type.startswith(temporal) and l_type.startswith(temporal):
            dist = F.abs(_as_micros(rt, r_type) - _as_micros(lt, l_type))
        else:
            dist = F.abs(rt.cast("double") - lt.cast("double"))
        order = [
            dist.asc(),
            (rt > lt).cast("int").asc(),
            F.col(f"__r.{tie_break}").desc(),
        ]
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in left_key]).orderBy(
        *order
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*left_cols, *right_cols)
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    tie_break: str,
    tolerance: str | None = None,
    chunk_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Merge-style as-of join: identical semantics to :func:`asof_join`
    in every ``direction`` (inner; backward = latest right row with
    ``right_time <= left_time``, ties to the largest ``tie_break``;
    forward = earliest right row at-or-after, ties to the smallest;
    nearest = closest on either side within the mandatory tolerance
    band, exact-distance ties preferring backward then the largest
    tie), built as union + ordered carry instead of a range join.

    Why it exists: the range-join formulation pairs every left row with
    the key's whole eligible right history (or tolerance band) before
    the window cut — a hot key with L left rows and R right rows in
    band materializes L x R joined rows, so doubling data density
    QUADRUPLES the join (the round-9 scaling probe measured 12x time
    over the top 10x decade on the 150-key nearest catalog entry).
    Here both sides union into one stream per key, ordered carries
    attach the adjacent right payload, and each left row reads the
    carry: O(L + R) rows per key at any density.  Backward uses one
    ascending carry; forward one descending carry; nearest BOTH carries
    over the same unioned frame (two sorts, one shuffle, no self-join —
    the per-left-row winner is a scalar comparison of the two carried
    timestamps).

    ``chunk_seconds`` arms the same skew mitigation as the chunked
    lag/sessionize builders: carry within ``(key, slice)``, then a
    per-key window over ONE summary row per occupied slice computes each
    slice's carry-in (the latest right payload of any earlier slice), so
    no task's size depends on how hot a key is.  Output is identical
    either way (tested, and the catalog twin shares the range-join
    query's oracle).  Chunking currently applies to ``backward`` only
    (forward/nearest raise: their mirrored slice summaries need a
    direction-aware argmin the catalog has no call site for yet).

    ``tolerance`` bounds the lookback/lookahead as in :func:`asof_join`
    — with a carry the check is a post-filter on the carried row's
    time; for ``nearest`` it is mandatory and out-of-band carries are
    nulled before the two-sided comparison."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join_merge: direction={direction!r} "
            "(backward|forward|nearest)"
        )
    if direction == "nearest" and tolerance is None:
        raise ValueError(
            "asof_join_merge: direction='nearest' requires a tolerance "
            "(the band is what bounds the two-sided lookaround)"
        )
    if direction != "backward" and chunk_seconds is not None:
        raise NotImplementedError(
            "asof_join_merge: chunk_seconds is implemented for "
            "direction='backward' only"
        )
    reserved = {"_t", "_side", "_tie", "_rp", "_slice", "_local", "_cin",
                "_carry", "_cb", "_cf"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash or any(c.startswith("_l_") for c in right.columns):
        raise ValueError(
            f"asof_join_merge reserves column names {sorted(reserved)} and "
            "the '_l_' prefix; rename the clashing input columns "
            f"({sorted(clash)})"
        )
    # NULL time values can never satisfy a range-join inequality, so the
    # range form drops them on both sides; the union+carry must filter
    # them explicitly or a null-_t row would sort to one end of the key
    # scan and either donate a spurious carry (right side) or inherit
    # one (left side under the descending forward order, where NULLS
    # sort last).
    left = left.where(F.col(left_time).isNotNull())
    right = right.where(F.col(right_time).isNotNull())
    rp_fields = [c for c in right.columns if c not in set(on)]
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tie_break).alias("_tie"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_break].dataType).alias("_tie"),
        F.lit(None).cast(
            r.schema["_rp"].dataType
        ).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    rows = r.unionByName(l)
    # ascending carry: among equal _t, right rows (side 0) precede the
    # left row (inclusive rt == lt) and tie-ASC puts the LARGEST tie
    # last — carry = last, so the largest tie wins (backward contract)
    order = [F.col("_t"), F.col("_side"), F.col("_tie").asc_nulls_last()]
    # descending carry: iterates from the latest time down, so the last
    # right row seen is the closest at-or-after.  Standalone forward
    # wants the SMALLEST tie at equal _t (tie-DESC puts it last);
    # nearest's forward pass wants the LARGEST (its final ordering uses
    # tie DESC regardless of side, matching asof_join's nearest).
    fwd_tie = (
        F.col("_tie").desc_nulls_last()
        if direction == "forward"
        else F.col("_tie").asc_nulls_last()
    )
    order_f = [F.col("_t").desc(), F.col("_side"), fwd_tie]

    if direction == "forward":
        wf = Window.partitionBy(*on).orderBy(*order_f).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = rows.withColumn(
            "_carry", F.last("_rp", ignorenulls=True).over(wf)
        ).where((F.col("_side") == 1) & F.col("_carry").isNotNull())
        if tolerance is not None:
            out = out.where(
                F.col(f"_carry.{right_time}")
                <= F.col("_t") + F.expr(tolerance)
            )
        return out.select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            *[F.col(f"_carry.{c}").alias(c) for c in rp_fields],
        )

    if direction == "nearest":
        from label_maker_dask_spark.functions.timeutil import epoch_micros

        t_type = left.schema[left_time].dataType.simpleString()

        def num(c):
            if t_type == "date":
                return epoch_micros(c.cast("timestamp"))
            if t_type.startswith("timestamp"):
                return epoch_micros(c)
            return c.cast("double")

        wb = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        wf = Window.partitionBy(*on).orderBy(*order_f).rowsBetween(
            Window.unboundedPreceding, 0
        )
        carried = rows.withColumn(
            "_cb", F.last("_rp", ignorenulls=True).over(wb)
        ).withColumn("_cf", F.last("_rp", ignorenulls=True).over(wf))
        lt = F.col("_t")
        tol = F.expr(tolerance)
        cb_rt = F.col(f"_cb.{right_time}")
        cf_rt = F.col(f"_cf.{right_time}")
        cb_ok = F.col("_cb").isNotNull() & (cb_rt >= lt - tol)
        cf_ok = F.col("_cf").isNotNull() & (cf_rt <= lt + tol)
        db = num(lt) - num(cb_rt)
        df_ = num(cf_rt) - num(lt)
        chosen = (
            F.when(cb_ok & (~cf_ok | (db <= df_)), F.col("_cb"))
            .when(cf_ok, F.col("_cf"))
        )
        out = carried.where(F.col("_side") == 1).withColumn(
            "_carry", chosen
        ).where(F.col("_carry").isNotNull())
        return out.select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            *[F.col(f"_carry.{c}").alias(c) for c in rp_fields],
        )

    if chunk_seconds is None:
        w = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        carried = rows.withColumn(
            "_carry", F.last("_rp", ignorenulls=True).over(w)
        )
    else:
        from label_maker_dask_spark.functions.timeutil import epoch_micros

        chunk_us = int(chunk_seconds) * 1_000_000
        rows = rows.withColumn(
            "_slice", F.floor(epoch_micros("_t") / F.lit(chunk_us))
        )
        w1 = (
            Window.partitionBy(*on, "_slice")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = rows.withColumn(
            "_local", F.last("_rp", ignorenulls=True).over(w1)
        )
        # one summary row per occupied (key, slice): the slice's LAST
        # right payload (if any); then the carry-in of a slice is the
        # latest summary of any STRICTLY earlier slice
        summaries = (
            rows.groupBy(*on, "_slice")
            .agg(
                F.max_by(
                    F.when(F.col("_side") == 0, F.col("_rp")),
                    F.when(F.col("_side") == 0, F.struct("_t", "_tie")),
                ).alias("_slast")
            )
        )
        w2 = (
            Window.partitionBy(*on)
            .orderBy("_slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = summaries.withColumn(
            "_cin", F.last("_slast", ignorenulls=True).over(w2)
        ).select(*on, "_slice", "_cin")
        carried = local.join(carry_in, [*on, "_slice"]).withColumn(
            "_carry", F.coalesce(F.col("_local"), F.col("_cin"))
        )

    out = carried.where(
        (F.col("_side") == 1) & F.col("_carry").isNotNull()
    )
    if tolerance is not None:
        out = out.where(
            F.col(f"_carry.{right_time}") >= F.col("_t") - F.expr(tolerance)
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_carry.{c}").alias(c) for c in rp_fields],
    )
