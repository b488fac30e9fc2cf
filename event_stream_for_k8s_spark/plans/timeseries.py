"""Time-series operators over the event stream — gap filling,
forward fill, gap-based sessionization, fixed-bin histograms.

The reference emits a raw event stream (`tasks.rs:105`) whose obvious
downstream consumers are exactly these shapes: "events per hour per
type including silent hours" (dashboards), "last known value carried
forward" (state reconstruction), "activity sessions per object"
(incident grouping). Batch forms here are oracle-checked; the
streaming analogs live in `plans/streaming_queries.py`
(stream_tumbling / stream_session).

Scale notes: every query below aggregates FIRST (events -> one row
per (key, bin), a map-side-combinable shuffle on the grouping key),
then joins/fills on the already-tiny aggregate. The dense grid side
(hours x types, days x users) is bounded by the calendar, not the
data volume, so at 100 TB it is still broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.caching import query_persist

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.operators.timeseries import (
    funnel_stages,
    interp_linear,
    streak_runs,
)
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.plans.util import dsum, sql_dsum


@query(
    "ts_gapfill",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), bins AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
), ty AS (SELECT DISTINCT event_type FROM events)
SELECT bins.h, ty.event_type, coalesce(hourly.n, 0) AS n_events
FROM bins CROSS JOIN ty
LEFT JOIN hourly ON hourly.h = bins.h AND hourly.event_type = ty.event_type
""",
    section="C",
    notes="dense hourly series per event_type with explicit zero rows "
    "for silent hours. Aggregate-then-join: the raw stream collapses "
    "to |hours|x|types| before the grid join, and the generated grid "
    "is calendar-bounded (720 rows/month/type) so both join sides are "
    "broadcast-sized at any data scale",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("h"),
            "event_type",
        ).agg(F.count("*").alias("n"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    bins = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    return (
        bins.crossJoin(F.broadcast(types))
        .join(F.broadcast(hourly), ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("n", F.lit(0)).alias("n_events"))
    )


@query(
    "ts_fill_forward",
    oracle="""
WITH daily AS (
  SELECT user_id, cast(date_trunc('day', ts) AS timestamp) AS d,
         max(value) AS v
  FROM events GROUP BY 1, 2
), b AS (
  SELECT cast(date_trunc('day', min(ts)) AS timestamp) AS lo,
         cast(date_trunc('day', max(ts)) AS timestamp) AS hi
  FROM events
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b
), grid AS (
  SELECT u.user_id, days.d, daily.v
  FROM days CROSS JOIN (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = days.d
), grp AS (
  SELECT user_id, d, v,
         count(v) OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM grid
)
SELECT user_id, d, max(v) OVER (PARTITION BY user_id, g) AS ff_value
FROM grp
""",
    section="C",
    notes="forward-fill (last observation carried forward) without "
    "IGNORE NULLS: a running count of non-null observations assigns "
    "each gap row to the group of its most recent observation, and a "
    "per-group max propagates the value. Portable to any engine; two "
    "window passes over a calendar-bounded grid. Rows before the "
    "first observation stay null by construction. max(value) picks an "
    "element (no float arithmetic) so it hash-matches exactly. "
    "Scale shape (VERDICT r01): the only broadcast side is the 1-row "
    "global day-bounds relation; the calendar is exploded INSIDE each "
    "user's row (sequence+explode, linear output, no users/daily "
    "broadcast), then a plain shuffle join on (user_id, d) attaches "
    "observations — survives 100x users where broadcasting the "
    "distinct-user set would flip to OOM",
)
def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.max("value").alias("v"))
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    users = e.select("user_id").distinct()
    grid_keys = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
            "d"
        ),
    )
    grid = grid_keys.join(daily, ["user_id", "d"], "left")
    w_run = Window.partitionBy("user_id").orderBy("d")
    grp = grid.withColumn("g", F.count("v").over(w_run))
    w_grp = Window.partitionBy("user_id", "g")
    return grp.select(
        "user_id", "d", F.max("v").over(w_grp).alias("ff_value")
    )


@query(
    "batch_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         cast(sum(new_session)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bigint)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
FROM sess GROUP BY user_id, session_id
""",
    section="C",
    notes="batch sessionization: a >30min silence per user starts a "
    "new session (lag -> boundary flag -> running sum = session id). "
    "Batch twin of stream_session (session_window); this shape also "
    "answers the reference's 'group related k8s events into "
    "incidents'. Window ordering tie-broken by unique event_id. One "
    "shuffle on user_id serves both window passes and the final agg",
)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        ),
    )


@query(
    "ts_histogram",
    oracle=f"""
SELECT cast(least(19, floor(o_totalprice / 25000)) AS int) AS bucket,
       cast(least(19, floor(o_totalprice / 25000)) AS int) * 25000
         AS bin_lo,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS sum_price
FROM orders GROUP BY 1, 2
""",
    section="C",
    notes="fixed-domain histogram (20 x 25k bins over [0, 500k], "
    "top bin open): literal bin edges avoid the two-pass min/max "
    "scan, so the whole query is one map-side-combinable aggregation "
    "-- the shape that survives 100 TB. floor(double/const) is "
    "bit-identical across engines; sums use the scaled-int "
    "discipline (plans/util.py)",
)
def ts_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(19), F.floor(F.col("o_totalprice") / 25000)
    ).cast("int")
    return (
        o.select(
            bucket.alias("bucket"),
            (bucket * 25000).alias("bin_lo"),
            "o_totalprice",
        )
        .groupBy("bucket", "bin_lo")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
    )


@query(
    "ts_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
    AND epoch_us(e.ts) <= c.t_click + 259200000000
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_72h
""",
    section="C",
    notes="ordered funnel: view -> first click after it -> first "
    "purchase within 72h of that click, counted per stage — in ONE "
    "pass. Per user, events sort by (time, stage-priority) and two "
    "running window mins track the first view and the first "
    "QUALIFYING click seen so far; a row qualifies for its stage by "
    "comparing against those running anchors. The naive per-stage "
    "join chain re-scanned events per stage and recomputed each "
    "stage's subtree inside the next (plan audit: 6 exchanges, 7 "
    "scans); this form is 1 scan + 1 user-shuffle + the final "
    "single-row rollup. Stage-priority tiebreak (view<click<purchase "
    "at equal micros) reproduces the oracle's inclusive >= exactly. "
    "Timestamps compared as epoch-micros on both engines",
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass core in operators/timeseries.funnel_stages
    # (hypothesis-differentialed against a direct per-user spec).
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("t")
    )
    per_user = funnel_stages(e, 259_200_000_000)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_buy").alias("n_purchased_72h"),
    )


@query(
    "ts_anomaly",
    oracle="""
WITH m AS (
  SELECT user_id,
         count(*) AS n,
         sum(cast(round(value * 100) AS hugeint)) AS s1,
         sum(cast(round(value * 100) AS hugeint)
             * cast(round(value * 100) AS hugeint)) AS s2
  FROM events GROUP BY user_id
), z AS (
  SELECT e.event_id, e.user_id, e.value,
         round(cast(cast(round(e.value * 100) AS hugeint) * m.n - m.s1
                    AS double)
               / sqrt(cast(greatest(m.s2 * m.n - m.s1 * m.s1, 1)
                           AS double)), 6) AS zscore
  FROM events e JOIN m ON e.user_id = m.user_id
)
SELECT event_id, user_id, value, zscore FROM z
WHERE abs(zscore) > 2
""",
    section="C",
    notes="per-entity z-score anomaly flags (|z| > 2 vs the user's own "
    "distribution). The moments are EXACT scaled int64 sums, and the "
    "z formula is algebraically rearranged to divide once at the end "
    "-- both engines compute bit-identical doubles, so even the "
    "threshold filter agrees on borderline rows (a naive "
    "mean/stddev pipeline would not). Population variance; "
    "agg + broadcast join back, one shuffle on user_id",
)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # scale-0 DECIMAL(38) moments (hugeint in the oracle): int64 s2
    # overflows at |value| ~ 3e8 and value magnitude is a DATA
    # property. Scale-0 decimals stay exact, and the one cast to
    # double at the end is a single rounding from the same exact
    # integer on both engines (the two-roundings hazard in
    # plans/util.py applies only to scaled decimals).
    sv = F.round(F.col("value") * 100).cast("decimal(38,0)")
    m = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(sv).alias("s1"),
        F.sum(sv * sv).alias("s2"),
    )
    num = (sv * F.col("n") - F.col("s1")).cast("double")
    var = (
        F.greatest(
            F.col("s2") * F.col("n") - F.col("s1") * F.col("s1"),
            F.lit(1).cast("decimal(38,0)"),
        ).cast("double")
    )
    z = (
        e.join(F.broadcast(m), "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(num / F.sqrt(var), 6).alias("zscore"),
        )
    )
    return z.filter(F.abs(F.col("zscore")) > 2)


@query(
    "ts_retention",
    oracle="""
WITH f AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT f.cohort_week,
       cast(date_diff('day', f.cohort_week, a.w) // 7 AS bigint)
         AS week_offset,
       count(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""",
    section="C",
    notes="cohort retention matrix: users bucketed by first-seen week, "
    "counted in each later week they return -- the canonical product-"
    "analytics readout over the reference's event stream. Both the "
    "cohort table and the distinct (user, week) activity collapse to "
    "|users| and |users|x|weeks| rows before the join, so the cohort "
    "side is broadcast at any event volume; week truncation is "
    "Monday-based on both engines and offsets are exact multiples of "
    "7 days, so the integer division is lossless",
)
def ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("w")).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / F.lit(7))
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "ts_ohlc",
    oracle="""
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS hour_ts, event_type, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts, event_id) AS rn_open,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
)
SELECT hour_ts, event_type,
       max(CASE WHEN rn_open = 1 THEN value END) AS open_value,
       max(value) AS high_value,
       min(value) AS low_value,
       max(CASE WHEN rn_close = 1 THEN value END) AS close_value,
       count(*) AS n_events
FROM ranked GROUP BY hour_ts, event_type
""",
    section="C",
    notes="hourly OHLC bars per event_type (open/high/low/close), the "
    "downsampling shape every metrics store renders. first/last are "
    "selected via row_number tie-broken by the unique event_id (ts "
    "alone can collide), then folded with conditional max -- all "
    "EXACT selections of existing doubles, no float summation, so "
    "values hash-match bit-for-bit. One shuffle on (hour, type) "
    "serves both window passes and the final aggregation",
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    base = e.select(
        hr.alias("hour_ts"), "event_type", "value", "ts", "event_id"
    )
    part = Window.partitionBy("hour_ts", "event_type")
    ranked = base.select(
        "hour_ts",
        "event_type",
        "value",
        F.row_number()
        .over(part.orderBy(F.asc("ts"), F.asc("event_id")))
        .alias("rn_open"),
        F.row_number()
        .over(part.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_close"),
    )
    return ranked.groupBy("hour_ts", "event_type").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value")))
        .alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value")))
        .alias("close_value"),
        F.count("*").alias("n_events"),
    )


@query(
    "ts_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, cast(date_trunc('day', ts) AS date) AS d
  FROM events
), grp AS (
  SELECT user_id, d,
         d - cast(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS int) AS anchor
  FROM days
), runs AS (
  SELECT user_id, anchor, count(*) AS len,
         min(d) AS streak_start
  FROM grp GROUP BY user_id, anchor
)
SELECT user_id,
       cast(max(len) AS bigint) AS best_streak,
       cast(count(*) AS bigint) AS n_streaks,
       cast(min(streak_start) AS varchar) AS first_day
FROM runs GROUP BY user_id
""",
    section="C",
    notes="gaps-and-islands: consecutive-day activity streaks per user "
    "via the date-minus-row_number anchor (consecutive days share an "
    "anchor, a gap shifts it). One shuffle on user_id serves the "
    "distinct, the window, and both aggregations — Catalyst reuses "
    "the hash partitioning end-to-end. Pure int/date arithmetic, "
    "exact on both engines; the engagement/retention twin of "
    "batch_sessionize's time-gap sessions",
)
def ts_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash(user_id) satisfies every downstream clustering ((user_id, d)
    # distinct, the window, both aggs) — one exchange for the query.
    # The anchor-trick core lives in operators/timeseries.streak_runs
    # (hypothesis-differentialed against a direct consecutive-run spec).
    e = load(spark, sf_dir, "events").repartition("user_id")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    runs = streak_runs(days, "user_id", "d")
    # date emitted as its ISO string: pandas bridges a DATE column to
    # datetime64 on one engine and datetime.date on the other, which
    # value-hash-mismatches even when equal.
    return runs.groupBy("user_id").agg(
        F.max("len").alias("best_streak"),
        F.count("*").alias("n_streaks"),
        F.min("streak_start").cast("string").alias("first_day"),
    )


@query(
    "ts_active_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
), days AS (SELECT DISTINCT d FROM du),
w AS (
  SELECT days.d AS day, du.user_id
  FROM days JOIN du
    ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
  GROUP BY 1, 2
)
SELECT day, count(*) AS n_users_7d FROM w GROUP BY day
""",
    section="C",
    notes="trailing-7-day active users per day (the WAU curve): "
    "COUNT DISTINCT over a sliding window, which no window frame "
    "supports directly. Collapse to distinct (day, user) pairs "
    "first (one shuffle, |days|x|users| bound), then EXPLODE each "
    "pair onto the 7 days it covers and semi-join the observed-day "
    "grid (broadcast, calendar-bounded) -- no nested-loop range "
    "join, and the fan-out is a fixed x7 of the already-tiny pair "
    "set, not of the raw events. The pair set is PERSISTED: it feeds "
    "both the day grid and the fan-out, and without materialization "
    "Spark recomputes the full events scan + distinct twice (the "
    "dominant cost at scale); the pair set itself is bounded by "
    "|days| x |users|. repartition(day) before the final distinct "
    "lets hash(day) serve both the (day,user) dedup and the rollup",
)
def ts_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    e = load(spark, sf_dir, "events")
    du = (
        e.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .transform(query_persist, StorageLevel.MEMORY_AND_DISK)
    )
    days = du.select(F.col("d").alias("day")).distinct()
    covered = du.select(
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    return (
        covered.join(F.broadcast(days), "day", "left_semi")
        .repartition("day")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n_users_7d"))
    )


@query(
    "ts_cumulative_users",
    oracle="""
WITH fs AS (
  SELECT user_id, min(date_trunc('day', ts)) AS first_day
  FROM events GROUP BY user_id
), per_day AS (
  SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY first_day
), days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
SELECT days.day, coalesce(per_day.new_users, 0) AS new_users,
       cast(sum(coalesce(per_day.new_users, 0))
              OVER (ORDER BY days.day ROWS UNBOUNDED PRECEDING) AS bigint)
         AS cumulative_users
FROM days LEFT JOIN per_day ON per_day.day = days.day
""",
    section="C",
    notes="cumulative distinct users per day (the all-time growth "
    "curve): COUNT(DISTINCT) over an ever-growing prefix would "
    "rescan history, so collapse to each user's FIRST day (one "
    "shuffle on user_id, |users| rows), bucket to new-users-per-day, "
    "and running-sum the tiny day series. The global window runs on "
    "calendar-bounded data, not events -- the pattern that turns an "
    "O(days x history) rescan into one pass at any volume",
)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # distinct (day, user) pairs once (persisted — both the first-day
    # aggregate and the day grid derive from it; recompute = two full
    # events scans), then everything downstream works on the bounded
    # pair set.
    e = load(spark, sf_dir, "events")
    du = (
        e.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
        .transform(query_persist, StorageLevel.MEMORY_AND_DISK)
    )
    fs = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    per_day = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    days = du.select("day").distinct()
    joined = days.join(per_day, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    return joined.select(
        "day",
        "new_users",
        F.sum("new_users")
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint")
        .alias("cumulative_users"),
    )


@query(
    "ts_ewma",
    oracle="""
SELECT user_id, event_id, value,
  round((value
     + coalesce(lag(value, 1) OVER w, 0) * 0.5
     + coalesce(lag(value, 2) OVER w, 0) * 0.25
     + coalesce(lag(value, 3) OVER w, 0) * 0.125
     + coalesce(lag(value, 4) OVER w, 0) * 0.0625
     + coalesce(lag(value, 5) OVER w, 0) * 0.03125
     + coalesce(lag(value, 6) OVER w, 0) * 0.015625
     + coalesce(lag(value, 7) OVER w, 0) * 0.0078125)
  / (1.0
     + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 0.5 END
     + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 0.25 END
     + CASE WHEN lag(value, 3) OVER w IS NULL THEN 0 ELSE 0.125 END
     + CASE WHEN lag(value, 4) OVER w IS NULL THEN 0 ELSE 0.0625 END
     + CASE WHEN lag(value, 5) OVER w IS NULL THEN 0 ELSE 0.03125 END
     + CASE WHEN lag(value, 6) OVER w IS NULL THEN 0 ELSE 0.015625 END
     + CASE WHEN lag(value, 7) OVER w IS NULL THEN 0 ELSE 0.0078125 END),
  6) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    section="C",
    notes="exponentially-weighted smoothing per user (alpha=1/2, "
    "8-tap FIR truncation of the recursive EWMA; the tail beyond 8 "
    "taps is < 0.4% of the weight). The infinite recurrence doesn't "
    "distribute, but the truncated form is 8 lag() reads off ONE "
    "sort within one shuffle. Weights are powers of two, so every "
    "product is an exact mantissa shift and both engines sum "
    "identical doubles in identical order -- hash-match without "
    "scaled-int gymnastics; partial windows renormalize by the "
    "weights actually present",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_stream_for_k8s_spark.plans.util import ewma_fir

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.round(ewma_fir("value", w), 6).alias("ewma"),
    )


@query(
    "ts_interp_linear",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         {sql_dsum('value', 2)} AS v
  FROM events GROUP BY 1, 2
), b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), bins AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
), ty AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT bins.h, ty.event_type, hourly.v
  FROM bins CROSS JOIN ty
  LEFT JOIN hourly ON hourly.h = bins.h AND hourly.event_type = ty.event_type
), ctx AS (
  SELECT h, event_type, v,
    last_value(v IGNORE NULLS) OVER w_prev AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN epoch(h) END IGNORE NULLS)
      OVER w_prev AS ph,
    first_value(v IGNORE NULLS) OVER w_next AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN epoch(h) END IGNORE NULLS)
      OVER w_next AS nh
  FROM grid
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY h ROWS UNBOUNDED PRECEDING),
    w_next AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT h, event_type,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NULL THEN nv
       WHEN nv IS NULL THEN pv
       ELSE pv + (nv - pv) * (cast(epoch(h) - ph AS double)
                              / cast(nh - ph AS double))
  END AS v_interp
FROM ctx
""",
    section="C",
    notes="linear interpolation over gapped hourly series, completing "
    "the fill family (ts_gapfill: zeros; ts_fill_forward: LOCF): "
    "silent hours get pv + (nv-pv)*dt/span between the bracketing "
    "observed hours, edges clamp to the nearest observation. Same "
    "aggregate-first shape — the raw stream collapses to one row per "
    "(hour, type) before any window runs, and the two IGNORE NULLS "
    "scans share one shuffle. Determinism: hourly sums go through "
    "the scaled-int sum (plans/util.py) so both engines interpolate "
    "from bit-identical doubles with a structurally identical IEEE "
    "formula; hour distances are exact integer epochs",
)
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(dsum("value", 2).alias("v"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    bins = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = e.select("event_type").distinct()
    grid = (
        bins.crossJoin(F.broadcast(types))
        .join(F.broadcast(hourly), ["h", "event_type"], "left")
        .select("h", "event_type", "v", F.unix_timestamp("h").alias("t"))
    )
    # The four IGNORE NULLS context scans live in operators/timeseries
    # (hypothesis-differentialed); ordering by integer epoch t ==
    # ordering by h, and all scans share one (event_type, t) shuffle.
    return interp_linear(grid, "event_type", "t", "v").select(
        "h", "event_type", "v_interp"
    )


@query(
    "ts_seasonality",
    oracle=f"""
SELECT event_type,
       cast(dayofweek(ts) + 1 AS bigint) AS dow,
       cast(count(*) AS bigint) AS n,
       {sql_dsum('value', 2)} / count(*) AS avg_value
FROM events
GROUP BY event_type, dayofweek(ts)
""",
    section="C",
    notes="weekly seasonality profile: event volume and 2dp-rounded "
    "mean value per (event_type, day-of-week) — the fingerprint "
    "behind weekday/weekend anomaly baselines. One hash aggregation "
    "over a tiny key domain (types x 7), map-side partials collapse "
    "almost everything before the shuffle. Day-of-week parity: Spark "
    "dayofweek() is 1-7 Sunday-first, DuckDB's is 0-6 — the oracle "
    "adds 1",
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.dayofweek("ts").cast("bigint").alias("dow")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (dsum("value", 2) / F.count("*")).alias("avg_value"),
        )
    )


M4_ROLES = ("first", "last", "min", "max")

_M4_PART = "PARTITION BY event_type, date_trunc('day', ts)"
M4_ORACLE = f"""
WITH p AS (
  SELECT event_type, date_trunc('day', ts) AS d, ts, value,
    row_number() OVER ({_M4_PART}
      ORDER BY ts ASC NULLS FIRST, event_id ASC) AS rf,
    row_number() OVER ({_M4_PART}
      ORDER BY ts DESC NULLS LAST, event_id DESC) AS rl,
    row_number() OVER ({_M4_PART}
      ORDER BY value ASC NULLS FIRST, event_id ASC) AS rmin,
    row_number() OVER ({_M4_PART}
      ORDER BY value DESC NULLS LAST, event_id DESC) AS rmax
  FROM events
)
SELECT event_type, d, role, ts, value FROM (
  SELECT event_type, d, 'first' AS role, ts, value FROM p WHERE rf = 1
  UNION ALL
  SELECT event_type, d, 'last', ts, value FROM p WHERE rl = 1
  UNION ALL
  SELECT event_type, d, 'min', ts, value FROM p WHERE rmin = 1
  UNION ALL
  SELECT event_type, d, 'max', ts, value FROM p WHERE rmax = 1
)
"""


@query(
    "ts_downsample_m4",
    oracle=M4_ORACLE,
    section="C",
    notes="M4 downsampling (Jugel et al., VLDB 2014): per "
    "(event_type, day) bucket keep the ACTUAL first/last/min/max "
    "(ts, value) points — the 4 points per pixel column that make a "
    "downsampled line chart render pixel-identically to the raw "
    "series. Unlike ts_ohlc (which aggregates values), this emits the "
    "sampled points themselves, role-tagged. One shuffle on the "
    "bucket key serves all four row_number orderings (same "
    "partitioning), and the role fan-out is a per-row array filter + "
    "explode, not four scans; ties are broken on event_id so the "
    "selection is deterministic on both engines; null ordering pinned "
    "explicitly (Spark asc=NULLS FIRST / desc=NULLS LAST)",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").withColumn(
        "d", F.date_trunc("day", "ts")
    )
    part = Window.partitionBy("event_type", "d")
    rf = F.row_number().over(
        part.orderBy(F.col("ts").asc_nulls_first(), F.col("event_id").asc())
    )
    rl = F.row_number().over(
        part.orderBy(
            F.col("ts").desc_nulls_last(), F.col("event_id").desc()
        )
    )
    rmin = F.row_number().over(
        part.orderBy(
            F.col("value").asc_nulls_first(), F.col("event_id").asc()
        )
    )
    rmax = F.row_number().over(
        part.orderBy(
            F.col("value").desc_nulls_last(), F.col("event_id").desc()
        )
    )
    flagged = e.select(
        "event_type",
        "d",
        "ts",
        "value",
        F.filter(
            F.array(
                F.when(rf == 1, F.lit("first")),
                F.when(rl == 1, F.lit("last")),
                F.when(rmin == 1, F.lit("min")),
                F.when(rmax == 1, F.lit("max")),
            ),
            lambda x: x.isNotNull(),
        ).alias("roles"),
    )
    return flagged.select(
        "event_type",
        "d",
        F.explode("roles").alias("role"),
        "ts",
        "value",
    )


MAD_ORACLE = """
WITH r1 AS (
  SELECT event_type, event_id, value,
    row_number() OVER (PARTITION BY event_type
      ORDER BY value ASC NULLS FIRST, event_id ASC) AS rv,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, value AS med, n FROM r1 WHERE rv = (n + 1) // 2
), dev AS (
  SELECT e.event_type, e.event_id, abs(e.value - m.med) AS dev, m.med,
         m.n
  FROM events e JOIN med m USING (event_type)
), r2 AS (
  SELECT event_type, dev, med, n,
    row_number() OVER (PARTITION BY event_type
      ORDER BY dev ASC NULLS FIRST, event_id ASC) AS rd
  FROM dev
), mad AS (
  SELECT event_type, med, n, dev AS mad FROM r2 WHERE rd = (n + 1) // 2
)
SELECT m.event_type, cast(m.n AS bigint) AS n, m.med, m.mad,
       cast(count(*) FILTER (WHERE d.dev > 3 * 1.4826 * m.mad)
            AS bigint) AS n_anom
FROM mad m JOIN dev d USING (event_type)
GROUP BY m.event_type, m.n, m.med, m.mad
"""


@query(
    "ts_mad_anomaly",
    oracle=MAD_ORACLE,
    section="C",
    notes="robust anomaly profile per event_type: median + median "
    "absolute deviation (lower-median rank selection, NOT "
    "interpolation — the median is an ELEMENT of the data, so parity "
    "is exact with zero float arithmetic beyond one abs-difference), "
    "and the count of points beyond the 3-sigma-equivalent "
    "3*1.4826*MAD fence. The z-score twin (ts_anomaly) breaks under "
    "a single 1e9 outlier — median/MAD is the estimator that "
    "survives dirty telemetry. Exact rank selection costs a per-key "
    "sort; at 100 TB swap in approx_percentile(0.5) (mergeable "
    "sketch, no sort) — same fence, 1% rank error",
)
def ts_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    wpart = Window.partitionBy("event_type")
    wval = wpart.orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id").asc()
    )
    r1 = e.select(
        "event_type",
        "value",
        F.row_number().over(wval).alias("rv"),
        F.count("*").over(wpart).alias("n"),
    )
    med = (
        r1.filter(F.col("rv") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("med"), "n")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "med",
        "n",
    )
    wdev = wpart.orderBy(
        F.col("dev").asc_nulls_first(), F.col("event_id").asc()
    )
    mad = (
        dev.select(
            "event_type",
            "med",
            "n",
            "dev",
            F.row_number().over(wdev).alias("rd"),
        )
        .filter(F.col("rd") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", "med", "n", F.col("dev").alias("mad"))
    )
    return (
        dev.select("event_type", "dev")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(
            F.count(
                F.when(
                    F.col("dev") > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    True,
                )
            ).alias("n_anom")
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "med",
            "mad",
            F.col("n_anom").cast("long").alias("n_anom"),
        )
    )


ACF_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS x FROM events GROUP BY 1
), b AS (
  SELECT min(h) AS lo, max(h) AS hi FROM hourly
), grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
), s AS (
  SELECT grid.h, coalesce(hourly.x, 0) AS x
  FROM grid LEFT JOIN hourly USING (h)
), stats AS (
  SELECT cast(count(*) AS bigint) AS n, cast(sum(x) AS bigint) AS sx
  FROM s
), d AS (
  SELECT s.h, (stats.n * s.x - stats.sx) AS dv FROM s CROSS JOIN stats
), den AS (
  SELECT cast(sum(dv * dv) AS bigint) AS den FROM d
), lags AS (SELECT unnest([1, 2, 3]) AS lag),
num AS (
  SELECT l.lag, cast(count(*) AS bigint) AS n_pairs,
         cast(sum(a.dv * b2.dv) AS bigint) AS num
  FROM lags l CROSS JOIN d a
  JOIN d b2 ON b2.h = a.h + l.lag * INTERVAL 1 HOUR
  GROUP BY l.lag
)
SELECT num.lag, num.n_pairs,
       CASE WHEN den.den > 0
            THEN round(cast(num.num AS double) / den.den, 6) END AS acf
FROM num CROSS JOIN den
"""


@query(
    "ts_acf",
    oracle=ACF_ORACLE,
    section="C",
    notes="autocorrelation of the gap-filled global hourly count "
    "series at lags 1-3 h — the periodicity detector behind "
    "seasonality-aware alerting (a daily cycle shows up as a lag-24 "
    "peak). EXACT parity with zero float risk: with integer counts, "
    "r_k = sum (n*x_t - S)(n*x_{t+k} - S) / sum (n*x_t - S)^2 is a "
    "ratio of two exact int64 sums (deviations cleared of the "
    "rational mean by scaling with n), so both engines divide the "
    "same two integers. Lagged pairs come from an equi-join on the "
    "shifted hour key (never a range scan); the series is "
    "calendar-bounded so everything after the first groupBy is "
    "metadata-sized. Constant series (den=0) yields NULL acf",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("x")
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "h"
        )
    )
    s = grid.join(hourly, "h", "left").select(
        "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    stats = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    d = s.crossJoin(F.broadcast(stats)).select(
        "h", (F.col("n") * F.col("x") - F.col("sx")).alias("dv")
    ).transform(query_persist)
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).cast("long").alias("den"))
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    shifted = d.crossJoin(F.broadcast(lags)).select(
        "lag",
        "dv",
        (
            F.col("h")
            + F.expr("make_interval(0, 0, 0, 0, lag, 0, 0)")
        ).alias("h2"),
    )
    num = (
        shifted.join(
            d.select(F.col("h").alias("h2"), F.col("dv").alias("dv2")),
            "h2",
        )
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("dv") * F.col("dv2")).cast("long").alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.when(
            F.col("den") > 0,
            F.round(F.col("num").cast("double") / F.col("den"), 6),
        ).alias("acf"),
    )


CUSUM_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS x FROM events GROUP BY 1
), b AS (
  SELECT min(h) AS lo, max(h) AS hi FROM hourly
), grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
), s AS (
  SELECT grid.h, coalesce(hourly.x, 0) AS x
  FROM grid LEFT JOIN hourly USING (h)
), stats AS (
  SELECT cast(count(*) AS bigint) AS n, cast(sum(x) AS bigint) AS sx
  FROM s
), d AS (
  SELECT s.h, s.x, (stats.n * s.x - stats.sx) AS dv, stats.n
  FROM s CROSS JOIN stats
), den AS (
  SELECT cast(sum(dv * dv) AS bigint) AS den FROM d
), p1 AS (
  SELECT h, x, n, cast(sum(dv) OVER (ORDER BY h) AS bigint) AS p
  FROM d
), pre AS (
  SELECT h, x, n, p,
         cast(least(0, min(p) OVER (ORDER BY h)) AS bigint) AS floor_p
  FROM p1
)
SELECT pre.h, pre.x, cast(pre.p - pre.floor_p AS bigint) AS cusum_scaled,
       (pre.p - pre.floor_p) > 0
         AND (pre.p - pre.floor_p) * (pre.p - pre.floor_p) * pre.n
             > 9 * den.den AS is_alarm
FROM pre CROSS JOIN den
"""


@query(
    "ts_cusum",
    oracle=CUSUM_ORACLE,
    section="C",
    notes="one-sided CUSUM change detection on the gap-filled hourly "
    "count series — the classic sequential drift detector. The "
    "textbook recursion S_t = max(0, S_{t-1} + d_t) looks "
    "un-parallelizable, but it has the closed form S_t = P_t - "
    "min(0, min_{j<=t} P_j) (prefix sum minus its running floor), "
    "i.e. two cumulative windows — no recursion, no per-row UDF, "
    "and at scale it parallelizes like any prefix aggregate. "
    "Deviations are n-scaled to clear the rational mean (the ts_acf "
    "trick) so the whole statistic is exact int64; the 3-sigma alarm "
    "compares S^2*n > 9*den in integers — float parity is "
    "structurally impossible, not rounded away. Per-entity CUSUMs "
    "partition the same windows by key; a streaming twin would carry "
    "(P, min_P) as two numbers of state per key",
)
def ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("x")
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "h"
        )
    )
    s = grid.join(hourly, "h", "left").select(
        "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    stats = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    d = s.crossJoin(F.broadcast(stats)).select(
        "h", "x", "n", (F.col("n") * F.col("x") - F.col("sx")).alias("dv")
    ).transform(query_persist)
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).cast("long").alias("den"))
    w_cum = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = d.select(
        "h",
        "x",
        "n",
        F.sum("dv").over(w_cum).cast("long").alias("p"),
    ).select(
        "h",
        "x",
        "n",
        "p",
        F.least(F.lit(0).cast("long"), F.min("p").over(w_cum))
        .cast("long")
        .alias("floor_p"),
    )
    return pre.crossJoin(F.broadcast(den)).select(
        "h",
        "x",
        (F.col("p") - F.col("floor_p")).cast("long").alias("cusum_scaled"),
        (
            ((F.col("p") - F.col("floor_p")) > 0)
            & (
                (F.col("p") - F.col("floor_p"))
                * (F.col("p") - F.col("floor_p"))
                * F.col("n")
                > 9 * F.col("den")
            )
        ).alias("is_alarm"),
    )


@query(
    "ts_user_entropy",
    oracle="""
WITH ut AS (
  SELECT user_id, event_type, count(*) AS k
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
), agg AS (
  SELECT user_id, cast(sum(k) AS bigint) AS n_events,
         cast(count(*) AS bigint) AS n_types,
         cast(sum(cast(round(k * log2(cast(k AS double)) * 1000000)
                       AS bigint)) AS bigint) AS s6
  FROM ut GROUP BY 1
)
SELECT user_id, n_events, n_types,
       round(log2(cast(n_events AS double))
             - cast(s6 AS double) / 1000000 / n_events, 6) AS entropy
FROM agg
""",
    section="C",
    notes="behavioral diversity per user: Shannon entropy of the "
    "user's event-type mix (0 bits = monomaniac automation, high = "
    "diverse human-like activity — a standard bot/service-account "
    "separator). Same H = log2(N) - (1/N) sum k*log2(k) scaled-int64 "
    "discipline as llm_char_entropy; two map-side-combinable hash "
    "aggregations on (user, type) then user — shuffle volume is "
    "bounded by |users| x |types|, not events",
)
def ts_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ut = e.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    return (
        ut.groupBy("user_id")
        .agg(
            F.sum("k").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(
                F.round(
                    F.col("k")
                    * F.log2(F.col("k").cast("double"))
                    * 1000000
                ).cast("long")
            )
            .cast("long")
            .alias("s6"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(
                F.log2(F.col("n_events").cast("double"))
                - F.col("s6").cast("double") / 1000000 / F.col("n_events"),
                6,
            ).alias("entropy"),
        )
    )


def _sql_fir(col: str, taps: int = 8) -> str:
    """DuckDB twin of plans.util.ewma_fir over window ``w`` (alpha=1/2):
    power-of-two weights, renormalized over the lags present."""
    num = [col] + [
        f"coalesce(lag({col}, {k}) OVER w, 0) * {0.5 ** k!r}"
        for k in range(1, taps)
    ]
    den = ["1.0"] + [
        f"CASE WHEN lag({col}, {k}) OVER w IS NULL THEN 0"
        f" ELSE {0.5 ** k!r} END"
        for k in range(1, taps)
    ]
    return f"({' + '.join(num)}) / ({' + '.join(den)})"


@query(
    "ts_holt",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, event_id, value, ts,
         round({_sql_fir('value')}, 6) AS s1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, value, s1,
       round({_sql_fir('s1')}, 6) AS s2,
       round(2 * s1 - round({_sql_fir('s1')}, 6), 6) AS level,
       round(s1 - round({_sql_fir('s1')}, 6), 6) AS trend
FROM s1
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    section="C",
    notes="Brown's double exponential smoothing (Holt-style "
    "level+trend forecast state, the classic ops-metrics forecaster): "
    "s2 = EWMA of s1, level = 2*s1 - s2, trend = (alpha/(1-alpha))"
    "(s1 - s2) = s1 - s2 at alpha=1/2. Both smoothing passes are the "
    "8-tap truncated FIR from ts_ewma (power-of-two weights = exact "
    "mantissa shifts; renormalized partial windows), with s1 ROUNDED "
    "to 6dp before the second pass as part of the operator's defined "
    "semantics — that pins bit-identical inputs to pass two in both "
    "engines. TWO window passes over the SAME (user_id; ts, event_id) "
    "ordering = one shuffle then two sorts Catalyst collapses into "
    "one sort + two Window nodes; nothing widens beyond the partition",
)
def ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_stream_for_k8s_spark.plans.util import ewma_fir

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s1 = e.select(
        "user_id",
        "event_id",
        "value",
        "ts",
        F.round(ewma_fir("value", w), 6).alias("s1"),
    )
    s2 = F.round(ewma_fir("s1", w), 6)
    return s1.select(
        "user_id",
        "event_id",
        "value",
        "s1",
        s2.alias("s2"),
        F.round(2 * F.col("s1") - s2, 6).alias("level"),
        F.round(F.col("s1") - s2, 6).alias("trend"),
    )


LTTB_ORACLE = """
WITH pts AS (
  SELECT event_type, date_trunc('day', ts) AS d, event_id, ts, value,
         epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS xoff,
         CAST(round(value * 100) AS BIGINT) AS ys
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), b AS (
  SELECT event_type, d,
         CAST(epoch_us(d) AS DOUBLE)
           + CAST(sum(xoff) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ax,
         CAST(sum(ys) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ay
  FROM pts GROUP BY event_type, d
), nb AS (
  SELECT event_type, d,
         lag(ax)  OVER w AS pax, lag(ay)  OVER w AS pay,
         lead(ax) OVER w AS nax, lead(ay) OVER w AS nay
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY d)
), scored AS (
  SELECT p.event_type, p.d, p.event_id, p.ts, p.value,
         CASE WHEN nb.pax IS NULL THEN 'first'
              WHEN nb.nax IS NULL THEN 'last'
              ELSE 'area' END AS role,
         CASE WHEN nb.pax IS NULL THEN -CAST(epoch_us(p.ts) AS DOUBLE)
              WHEN nb.nax IS NULL THEN CAST(epoch_us(p.ts) AS DOUBLE)
              ELSE abs(
                (nb.pax - nb.nax)
                  * (CAST(p.ys AS DOUBLE) - nb.pay)
                - (nb.pax - CAST(epoch_us(p.ts) AS DOUBLE))
                  * (nb.nay - nb.pay))
         END AS sel
  FROM pts p JOIN nb ON p.event_type = nb.event_type AND p.d = nb.d
)
SELECT event_type, d, role, event_id, ts, value FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type, d
              ORDER BY sel DESC, event_id) AS rn
  FROM scored) WHERE rn = 1
"""


@query(
    "ts_downsample_lttb",
    oracle=LTTB_ORACLE,
    section="C",
    notes="LTTB downsampling (Steinarsson 2013), the PARALLEL "
    "fixed-anchor variant: per (event_type, day) bucket keep the one "
    "point maximizing the triangle area against the NEIGHBOR BUCKETS' "
    "average points (classic LTTB anchors on the previously-selected "
    "point, a sequential dependency; anchoring on bucket averages is "
    "the standard parallelization and what the original paper's "
    "'effective area' pre-pass computes). Endpoint buckets keep their "
    "first/last actual point, role-tagged. Float discipline: anchors "
    "derive from EXACT integer sums (micros-since-day-start, "
    "value*100 as bigint) divided once, and the area expression is "
    "written identically in both engines, so selection is "
    "deterministic -- a naive avg(double) anchor would make argmax "
    "flip on summation order. Three keyed exchanges (census-recorded, "
    "vs ts_downsample_m4's one): only the per-bucket rank moves the "
    "point set like m4's single exchange does; the bucket agg is "
    "map-side combined down to one row per bucket before moving, and "
    "the lag/lead window shuffles the bucket relation -- rows = "
    "buckets, calendar-sized, not data-sized",
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    d = F.date_trunc("day", F.col("ts"))
    pts = e.select(
        "event_type",
        d.alias("d"),
        "event_id",
        "ts",
        "value",
        (F.unix_micros(F.col("ts")) - F.unix_micros(d)).alias("xoff"),
        F.round(F.col("value") * 100).cast("long").alias("ys"),
    )
    b = pts.groupBy("event_type", "d").agg(
        (
            F.unix_micros(F.col("d")).cast("double")
            + F.sum("xoff").cast("double") / F.count("*").cast("double")
        ).alias("ax"),
        (F.sum("ys").cast("double") / F.count("*").cast("double")).alias(
            "ay"
        ),
    )
    wb = Window.partitionBy("event_type").orderBy("d")
    nb = b.select(
        "event_type",
        "d",
        F.lag("ax").over(wb).alias("pax"),
        F.lag("ay").over(wb).alias("pay"),
        F.lead("ax").over(wb).alias("nax"),
        F.lead("ay").over(wb).alias("nay"),
    )
    x = F.unix_micros(F.col("ts")).cast("double")
    scored = pts.join(F.broadcast(nb), ["event_type", "d"]).select(
        "event_type",
        "d",
        "event_id",
        "ts",
        "value",
        F.when(F.col("pax").isNull(), F.lit("first"))
        .when(F.col("nax").isNull(), F.lit("last"))
        .otherwise(F.lit("area"))
        .alias("role"),
        F.when(F.col("pax").isNull(), -x)
        .when(F.col("nax").isNull(), x)
        .otherwise(
            F.abs(
                (F.col("pax") - F.col("nax"))
                * (F.col("ys").cast("double") - F.col("pay"))
                - (F.col("pax") - x) * (F.col("nay") - F.col("pay"))
            )
        )
        .alias("sel"),
    )
    wr = Window.partitionBy("event_type", "d").orderBy(
        F.col("sel").desc(), "event_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("event_type", "d", "role", "event_id", "ts", "value")
    )
