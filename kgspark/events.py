"""Event-stream batch operators: sessionization, JSON props, per-group top-k.

The reference has no event analytics at all (SURVEY.md §2.10 — its closest
analog is a 10s scheduler tick); these are the standard large-scale log
operators a training-data pipeline runs next to the KG build.  All are pure
Catalyst window/aggregate plans with exact DuckDB restatements.

Scale notes: sessionization shuffles once on user_id (uniform key), then two
window passes over the same partitioning — Spark reuses the sort.  JSON
extraction is ``get_json_object`` (codegen, no UDF).  Top-k per group is the
classic rank-window + filter, shuffling on the (low-cardinality but bounded)
group key — for truly hot groups the mitigation is pre-aggregating a per-
partition top-k before the final window (not needed at these cardinalities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_minutes``.

    Output: one row per session with bounds, event count, and value sum.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        # Compare the gap as a day-time INTERVAL, never via epoch seconds:
        # Spark's unix_timestamp() truncates to whole seconds while DuckDB's
        # epoch() keeps fractional-second DOUBLEs, and the events data has a
        # real 1800-1801s boundary gap — epoch arithmetic flips is_new under
        # engine/version drift.  Timestamp subtraction is microsecond-exact
        # and timezone-free on both engines.
        F.when(
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL {int(gap_minutes)} MINUTES"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    with_sid = gapped.withColumn(
        "session_idx", F.sum("is_new").over(w).cast("long")
    )
    return (
        with_sid.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            # Sum exactly: doubles accumulate in partition/arrival order, so a
            # float sum is not partition-invariant (and hash-diverged from the
            # DuckDB oracle near round-6 ties in round 1).  decimal(38,9)
            # addition is exact and associative — the rounded total is
            # order-independent on any engine.
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 6)
            .cast("double")
            .alias("total_value"),
        )
    )


def session_windows(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions via the NATIVE ``F.session_window`` operator — the
    Structured-Streaming-capable form of :func:`sessionize` (the same plan
    runs under ``readStream`` with a watermark; the lag/cumsum formulation
    cannot).  Spark merges events whose gap is < ``gap_minutes`` into one
    session per user; window end = last event + gap, so ``session_last`` is
    reported as ``window.end - gap`` to stay oracle-comparable.

    One shuffle on (user_id); the session merge happens inside the
    aggregation — no window-function sort pass at all, which also makes
    this the cheaper batch plan at scale.
    """
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy("user_id", w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 6)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end") - gap, "yyyy-MM-dd HH:mm:ss").alias(
                "session_last"
            ),
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time windows via native ``F.window`` — each event lands
    in window/slide overlapping windows (epoch-aligned, exactly the
    semantics a watermarked stream would compute); counts per
    (window, event_type).  One shuffle on the (window, type) key.
    """
    w = F.window("ts", window, slide)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


ANOMALY_WINDOW_S = 24 * 3600
ANOMALY_FACTOR = 3


def anomaly_hours(
    events: DataFrame,
    window_s: int = ANOMALY_WINDOW_S,
    factor: int = ANOMALY_FACTOR,
) -> DataFrame:
    """Count-spike detection per (event_type, hour), in pure INTEGER
    arithmetic: an hour is a spike when its count exceeds ``factor`` times
    the mean of the trailing window's PRESENT hourly counts —
    cross-multiplied (``n * trailing_hours > factor * trailing_sum``) so no
    division/float enters and the flag is engine-portable bit-exact.  The
    trailing frame is a RANGE window on the hour epoch (previous
    ``window_s`` seconds, current hour excluded), so calendar gaps don't
    slide the frame the way a ROWS frame would; normalizing by present
    hours keeps sparse types comparable.  Hours with an empty trailing
    frame are never spikes (no baseline).

    Scale shape: one hash aggregate to hourly counts (map-side partials
    collapse the raw event volume), then one window over the tiny
    (type, hour) rollup — the window input is |types| x |hours| rows, not
    the event count, so the sort is negligible at any corpus size.
    """
    if window_s < 3600 or window_s % 3600:
        # the frame's upper bound is one hour bucket back; a sub-hour or
        # non-hour-multiple window would invert the RANGE frame / shear
        # the hourly grid
        raise ValueError(
            f"window_s must be a positive multiple of 3600, got {window_s}"
        )
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("h").cast("long"))
        .rangeBetween(-window_s, -3600)
    )
    trailing_n = F.coalesce(
        F.count(F.lit(1)).over(w).cast("long"), F.lit(0)
    )
    trailing_sum = F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long")
    return hourly.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        trailing_n.alias("trailing_hours"),
        trailing_sum.alias("trailing_sum"),
        (
            (trailing_n > 0)
            & (F.col("n_events") * trailing_n > factor * trailing_sum)
        ).alias("spike"),
    )


TRANSITION_MICRO = 10**6


def transitions(events: DataFrame) -> DataFrame:
    """First-order event-type Markov rollup: for each (from_type, to_type)
    pair of CONSECUTIVE events within a user's stream (ordered by ts, ties
    by event_id — the sessionize total order), the transition count and
    the scaled-integer conditional probability
    ``p_micro = n * 1e6 div n_from`` (row-normalized transition matrix in
    micro units — integer-exact, no float division).

    Scale shape: one user_id shuffle for the lead() window (the same
    single-shuffle discipline as sessionize), one hash aggregate on the
    tiny (from, to) type-pair key, and a broadcast join of the per-from
    totals (|types| rows).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        F.expr(f"CAST(n_transitions * {TRANSITION_MICRO} DIV n_from AS BIGINT)")
        .alias("p_micro"),
    )


STICKINESS_MICRO = 10**6


def rolling_active(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Per-day active-user rollup: DAU (distinct users that day), WAU
    (distinct users active in the ``window_days``-day window ENDING that
    day), and the integer stickiness ratio
    ``stickiness_micro = dau * 1e6 div wau`` — the DAU/WAU engagement
    dashboard every growth analysis runs over the event log.  Days are the
    calendar days PRESENT in the data (no gap fill).

    Scale shape: the naive WAU is an inequality join (day BETWEEN d-6 AND
    d) — quadratic in busy ranges and unshuffleable as an equi-join.
    Instead each distinct (user, day) activity row explodes to the
    ``window_days`` rollup days it covers (bounded 7x fan-out of the
    ALREADY-DEDUPED pair set, not the raw log), distincts once more, and
    WAU becomes one hash aggregate on the day key.  The day dimension is
    broadcast (|days| rows) to prune cover days past the data's horizon.
    The ORACLE states the spec with exactly the naive inequality join
    (single-node DuckDB is fine with it) — the parity compare proves the
    explode decomposition reproduces it bit-exact.
    """
    ud = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("day"),
    ).distinct()
    wau = (
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr(f"CAST(dau * {STICKINESS_MICRO} DIV wau AS BIGINT)").alias(
                "stickiness_micro"
            ),
        )
    )


def user_lifetime(events: DataFrame) -> DataFrame:
    """Per-user engagement rollup: first/last event timestamps (UTC-pinned
    strings), lifetime span in whole days, distinct active days, and total
    event count — the user-level profile every retention/LTV analysis
    starts from (the per-user sibling of the cohort retention rollup).

    Scale shape: ONE hash aggregate on user_id with map-side partials
    (min/max/count fold; the distinct-days term is a datediff-free
    count_distinct over the date projection).  No windows, no joins.
    """
    return events.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        F.datediff(F.max("ts"), F.min("ts")).cast("long").alias("lifetime_days"),
        F.countDistinct(F.to_date("ts")).alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """F13 analog (pipeline.rs:253-256 JSON path access): typed extraction
    from the free-form ``props`` JSON column — codegen, no UDF."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def topk_by_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value within each event_type (deterministic ties)."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "event_type", "event_id", "value", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-step conversion funnel per user: the earliest step-1 event,
    then the earliest step-2 event STRICTLY after it, then the earliest
    step-3 event strictly after that — one row per user who reached step 1,
    with per-step timestamps, steps_completed, and a converted flag.

    Timestamps compare as native timestamps (microsecond-exact, timezone-
    free — the sessionize lesson: never via epoch seconds) and render as
    'yyyy-MM-dd HH:mm:ss' strings in the output.

    Scale shape: three (groupBy user_id + join user_id) rounds — after the
    first shuffle everything is co-partitioned on the user key, so steps 2
    and 3 are local joins under AQE; no windows over whole user histories,
    no driver collects.
    """
    s1, s2, s3 = steps
    v = (
        events.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    c = (
        v.join(
            events.filter(F.col("event_type") == s2).select(
                "user_id", F.col("ts").alias("_t")
            ),
            "user_id",
        )
        .filter(F.col("_t") > F.col("ts1"))
        .groupBy("user_id", "ts1")
        .agg(F.min("_t").alias("ts2"))
    )
    f2 = v.join(c, ["user_id", "ts1"], "left")
    p = (
        f2.filter(F.col("ts2").isNotNull())
        .join(
            events.filter(F.col("event_type") == s3).select(
                "user_id", F.col("ts").alias("_t")
            ),
            "user_id",
        )
        .filter(F.col("_t") > F.col("ts2"))
        .groupBy("user_id", "ts1", "ts2")
        .agg(F.min("_t").alias("ts3"))
    )
    f3 = f2.join(p, ["user_id", "ts1", "ts2"], "left")
    return f3.select(
        "user_id",
        F.date_format("ts1", "yyyy-MM-dd HH:mm:ss").alias("step1_ts"),
        F.date_format("ts2", "yyyy-MM-dd HH:mm:ss").alias("step2_ts"),
        F.date_format("ts3", "yyyy-MM-dd HH:mm:ss").alias("step3_ts"),
        (
            F.lit(1)
            + F.col("ts2").isNotNull().cast("int")
            + F.col("ts3").isNotNull().cast("int")
        )
        .cast("long")
        .alias("steps_completed"),
        F.col("ts3").isNotNull().alias("converted"),
    )


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact interpolated value percentiles (p50/p90/p99) + extrema per
    event type — the metric-distribution rollup an event pipeline reports.

    Uses EXACT ``percentile`` (both engines implement the standard
    (n-1)*p linear interpolation on the sorted values, so the arithmetic
    is formula-identical); at 100 TB the drop-in scale path is
    ``approx_percentile`` with a documented error bound — exact
    percentiles need a per-group sort, approx is a t-digest merge.
    """
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def retention_cohorts(events: DataFrame, max_offset: int = 7) -> DataFrame:
    """Cohort retention: users cohorted by first-seen DATE, then per
    (cohort, day-offset) distinct-active-user counts and retention rate —
    the standard activation/retention rollup an event pipeline reports.

    Scale shape: one user_id shuffle for the first-seen fold, one distinct
    over (user, date) (bounded at users x days), one cohort join, one hash
    aggregate on the (cohort, offset) key.  Dates derive from the NTZ
    timestamps directly (timezone-free on both engines).

    Output: (cohort_date, day_offset, n_active, n_users, retention).
    """
    d = F.to_date("ts")
    first = events.groupBy("user_id").agg(F.min(d).alias("cohort_date"))
    acts = events.select("user_id", d.alias("day")).distinct()
    hits = (
        acts.join(first, "user_id")
        .select(
            "cohort_date",
            F.datediff("day", "cohort_date").cast("int").alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset") <= max_offset)
    )
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return (
        hits.groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .join(sizes, "cohort_date")
        .select(
            "cohort_date",
            "day_offset",
            "n_active",
            "n_users",
            F.round(F.col("n_active") / F.col("n_users"), 6).alias("retention"),
        )
    )


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """As-of join: for every ``left_type`` event, the MOST RECENT
    ``right_type`` event by the same user at or before its timestamp
    (DuckDB spells this natively as ``ASOF LEFT JOIN``; Spark has no such
    operator, so this is the composition the task calls for).

    Spark formulation is join-free: filter to the two types, ONE shuffle on
    user_id, and a carry-forward window — ``last(right struct, ignorenulls)``
    over (ts, is_left, event_id) ordering.  Right rows sort before left rows
    at equal ts (the at-or-before contract) and among equal-ts right rows
    the latest event_id wins — the same deterministic tie-break the oracle
    gets by collapsing the right side to max(event_id) per (user, ts).

    At cluster scale this beats a sort-merge as-of join: the window reuses
    the single user_id exchange, state per user is one struct, and there is
    no unbounded probe-side buffering.

    Output: (user_id, left_id, right_id, gap_us) — right_id/gap_us NULL for
    left events with no prior right event.
    """
    ev = events.filter(F.col("event_type").isin(left_type, right_type))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            (F.col("event_type") == left_type).cast("int"),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("event_type") == right_type,
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("_r", carried)
        .filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            F.col("_r.event_id").alias("right_id"),
            # session tz is pinned UTC (kgspark.session), so the NTZ ->
            # TIMESTAMP cast is deterministic and unix_micros matches
            # DuckDB's epoch_us on the same NTZ values
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("_r.ts").cast("timestamp"))
            )
            .cast("long")
            .alias("gap_us"),
        )
    )


def range_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "error",
    window_s: int = 3600,
) -> DataFrame:
    """Range (interval) join: every (``left_type``, ``right_type``) event
    pair for the same user within ±``window_s`` seconds — Spark's optimizer
    would execute the naive time-inequality join as a per-user cross
    product, so this is the bucketed composition: bin timestamps to
    ``window_s``-wide buckets, explode ONLY the left side to its three
    covering buckets, equi-join on (user_id, bucket), then apply the exact
    |Δt| predicate.  Each qualifying pair is found exactly once (the right
    row's bucket is unique), so no distinct pass is needed; candidate
    volume is bounded by true-match density, never n².

    Output: (user_id, left_id, right_id, delta_us) with
    delta_us = right ts − left ts (signed).
    """
    us = window_s * 1_000_000
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        F.col("event_id").alias("left_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_lts"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id",
        F.col("event_id").alias("right_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_rts"),
        # integer DIV, not float division: micro timestamps are ~1.7e15 and
        # a double quotient truncation can misbucket at bin boundaries
        F.expr(f"unix_micros(cast(ts as timestamp)) DIV {us}").alias("_bucket"),
    )
    lbucket = F.expr(f"_lts DIV {us}")
    left = left.withColumn(
        "_bucket", F.explode(F.array(lbucket - 1, lbucket, lbucket + 1))
    )
    return (
        left.join(right, ["user_id", "_bucket"])
        .filter(F.abs(F.col("_rts") - F.col("_lts")) <= us)
        .select(
            "user_id",
            "left_id",
            "right_id",
            (F.col("_rts") - F.col("_lts")).cast("long").alias("delta_us"),
        )
    )
