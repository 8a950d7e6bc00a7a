"""Event-stream queries (batch form): tumbling windows,
sessionization, JSON props — the batch semantics that
cubert_spark.streaming mirrors on readStream (SURVEY.md §2.10: new
capability, the reference is batch-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cubert_spark.catalog import load_table
from cubert_spark.queries._util import dsum, dsum_sql


def q_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — ``window()`` in batch; the
    identical expression runs under readStream with a watermark
    (streaming.windows.tumbling)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SQL_TUMBLING = f"""
SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding window (1 day, slide 12h) — Expand-based window
    assignment; each event lands in 2 windows."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )


SQL_SLIDING = """
SELECT MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts)/43200)*43200 - i*43200 AS BIGINT) * 1000000) AS win_start,
       COUNT(*) AS n
FROM events, (VALUES (0), (1)) t(i)
GROUP BY 1
"""


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user, batch
    form: lag + cumulative session counter — the batch equivalent of
    ``session_window`` / applyInPandasWithState. Returns per-user
    session count and the largest session size."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # session tz = UTC
    gap = us - F.lag(us).over(w)
    sess = (
        e.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("user_id")
        .agg(
            F.countDistinct("sess_id").alias("n_sessions"),
            F.max("sz").alias("max_session_events"),
        )
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
), sizes AS (
  SELECT user_id, sess_id, COUNT(*) AS sz FROM s GROUP BY 1, 2
)
SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, MAX(sz) AS max_session_events
FROM sizes GROUP BY user_id
"""


def q_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Native ``session_window`` sessions (30-min gap) per user — runs
    streaming.windows.session_agg on the batch events relation: the
    exact expression tree the readStream form executes (Spark
    guarantees batch/stream parity for session_window; the stream
    replay itself is asserted in tests/test_streaming.py). Session end
    = last event + gap; a new session starts when the inter-event gap
    is >= the 30-min threshold."""
    from cubert_spark.streaming.windows import session_agg

    e = load_table(spark, sf, "events")
    return session_agg(
        e, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).select(
        "user_id",
        F.col("sess.start").alias("sess_start"),
        F.col("sess.end").alias("sess_end"),
        "n",
    )


SQL_SESSION_WINDOW = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
       COUNT(*) AS n
FROM s GROUP BY user_id, sid
"""


def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured props column: JSON field extraction (engine
    extension; reference has no JSON functions, SURVEY.md §2.8)."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_JSON_PROPS = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
       MAX(CAST(props->>'$.k' AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel per user: view -> click -> purchase, each step's
    first occurrence strictly after the previous step's. One events
    scan: three chained conditional window-mins over the same
    ``partitionBy(user_id)`` (a single exchange — consecutive window
    operators reuse the partitioning), one distinct-user reduce, and a
    ``stack`` unpivot. Fully lazy; no driver-side actions."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("v"),
        F.count("t_click").alias("c"),
        F.count("t_purchase").alias("p"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', v, '2_click_after_view', c,"
            " '3_purchase_after_click', p) AS (step, users)"
        )
    )


SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT '1_view' AS step, COUNT(*) AS users FROM v
UNION ALL
SELECT '2_click_after_view', COUNT(*) FROM c
UNION ALL
SELECT '3_purchase_after_click', COUNT(*) FROM p
"""


def q_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    by days-since-cohort of each active day. Two aggregations, both
    shuffling on user/cohort keys — the standard retention matrix at
    any scale."""
    e = load_table(spark, sf, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    active = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        active.join(first, "user_id")
        .withColumn("day_n", F.datediff("day", "cohort"))
        .groupBy("cohort", "day_n")
        .agg(F.countDistinct("user_id").alias("users"))
    )


SQL_RETENTION = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort, CAST(datediff('day', f.cohort, a.day) AS INT) AS day_n,
       COUNT(DISTINCT a.user_id) AS users
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Event-path mining: the corpus-wide event-type transition matrix
    — for each user's (ts, event_id)-ordered stream, count consecutive
    (from_type, to_type) steps globally. The Markov-chain view of user
    behavior (what follows what), and the input to path-dropoff
    analysis.

    Scale shape: ONE partitioned window (lag over user_id, bounded
    per-user state) + one keyed count agg; ties on ts are broken by
    event_id so the sequence — and the counts — are deterministic at
    any parallelism."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_EVENT_TRANSITIONS = """
WITH steps AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type, COUNT(*) AS n
FROM steps WHERE from_type IS NOT NULL
GROUP BY 1, 2
"""


def q_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of events.value (20 bins over [0, 100],
    outliers clamped into the edge bins, nulls dropped): one groupBy
    on a computed bin — the distribution profile at any scale. The
    bin formula is floor((v - lo) / w) on IEEE doubles with literal
    lo/w, so binning is bit-identical cross-engine."""
    lo, hi, n_bins = 0.0, 100.0, 20
    w = (hi - lo) / n_bins
    e = load_table(spark, sf, "events")
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - lo) / w).cast("int")),
    )
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
        )
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(w))
    )


SQL_VALUE_HISTOGRAM = f"""
SELECT bin, COUNT(*) AS n, {dsum_sql('value')} AS sum_value,
       0.0 + bin * 5.0 AS bin_lo
FROM (
  SELECT LEAST(19, GREATEST(0, CAST(FLOOR((value - 0.0) / 5.0) AS INT))) AS bin,
         value
  FROM events WHERE value IS NOT NULL
)
GROUP BY bin
"""


def q_anomaly_days(spark: SparkSession, sf: str) -> DataFrame:
    """Daily-volume anomaly screen: per event type, z-score each day's
    event count against that type's own daily distribution. Output
    every (event_type, day) with its z — the monitoring query that
    catches a broken producer or a traffic spike.

    Bit-exact cross-engine: counts are integers; mean, variance
    (computed as E[x^2] - E[x]^2 from exact integer sums), std
    (sqrt — correctly rounded per IEEE-754), and z are a fixed
    composition of IEEE double ops. Two keyed aggs + a broadcast-able
    per-type stats join; nothing unpartitioned."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days").cast("double")
    var = (
        F.col("s2").cast("double") / F.col("n_days").cast("double")
        - mean * mean
    )
    joined = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        mean.alias("mean_n"),
        F.sqrt(var).alias("std_n"),
    )
    z = F.when(
        F.col("std_n") > 0,
        (F.col("n").cast("double") - F.col("mean_n")) / F.col("std_n"),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("z", z)


SQL_ANOMALY_DAYS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(n) AS s1, SUM(n * n) AS s2
  FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.n,
       CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE) AS mean_n,
       SQRT(CAST(s.s2 AS DOUBLE) / CAST(s.n_days AS DOUBLE)
            - (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
              * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))) AS std_n,
       CASE WHEN SQRT(CAST(s.s2 AS DOUBLE) / CAST(s.n_days AS DOUBLE)
                 - (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                   * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))) > 0
            THEN (CAST(d.n AS DOUBLE)
                  - CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                 / SQRT(CAST(s.s2 AS DOUBLE) / CAST(s.n_days AS DOUBLE)
                   - (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                     * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE)))
            ELSE 0.0 END AS z
FROM daily d JOIN stats s ON s.event_type = d.event_type
"""


def q_cdc_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """CDC changelog compaction (operators.cdc.apply_changelog): the
    events table read as a per-user changelog — latest record by
    (ts, event_id) wins, 'error' as the tombstone op — producing the
    current snapshot via ONE combiner-friendly struct-max aggregation
    (no window sort). Oracle spells the same semantics as the
    row_number()=1 window form."""
    from cubert_spark.operators.cdc import apply_changelog

    e = load_table(spark, sf, "events")
    return apply_changelog(
        e,
        key_cols=["user_id"],
        seq_cols=["ts", "event_id"],
        op_col="event_type",
        delete_ops=["error"],
        payload_cols=["value"],
    )


SQL_CDC_UPSERT = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_op, value AS last_value, n_changes
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the
    user's most recent preceding click/view. ONE partitioned window
    (user_id, ordered by the unique (ts, event_id)) carrying the last
    non-null touch struct — the classic scale spelling; no self-join,
    no per-purchase scan. All outputs are ids/timestamps/an exact
    integer microsecond gap — nothing float to drift cross-engine."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"),
            F.struct("ts", "event_id", "event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("__t", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("__t.event_id").alias("touch_event_id"),
            F.col("__t.event_type").alias("touch_type"),
            F.col("__t.ts").alias("touch_ts"),
            F.expr("timestampdiff(MICROSECOND, __t.ts, ts)").alias(
                "micros_since_touch"
            ),
        )
    )


SQL_ATTRIBUTION = """
SELECT event_id, user_id, ts,
       __t.event_id AS touch_event_id,
       __t.event_type AS touch_type,
       __t.ts AS touch_ts,
       epoch_us(ts - __t.ts) AS micros_since_touch
FROM (
  SELECT *,
         last_value(
           CASE WHEN event_type IN ('click', 'view')
                THEN {'ts': ts, 'event_id': event_id, 'event_type': event_type}
           END IGNORE NULLS
         ) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS __t
  FROM events
)
WHERE event_type = 'purchase'
"""


def q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-type outlier profile: median/MAD (the
    median-absolute-deviation robust z-score — the outlier screen that
    survives the heavy tails that break mean/std z-scores, companion
    to anomaly_days). Exactness: percentile_disc picks an ACTUAL
    element (both engines use the same lower-median convention,
    verified), |x - med| is one exact-rounded IEEE subtract, and the
    3*MAD gate is one exact-rounded multiply — no interpolation
    anywhere, so the whole profile replays bit-for-bit.

    Scale shape: two sort-based grouped aggs + broadcast joins of the
    5-row med/mad tables back onto the stream; one events scan per
    agg stage."""
    e = load_table(spark, sf, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    j = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = j.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        j.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias("n_outliers"),
            F.max("adev").alias("max_abs_dev"),
        )
    )


SQL_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med FROM events GROUP BY 1
),
j AS (
  SELECT e.event_type, med.med, abs(e.value - med.med) AS adev
  FROM events e JOIN med USING (event_type)
),
mad AS (SELECT event_type, quantile_disc(adev, 0.5) AS mad FROM j GROUP BY 1)
SELECT j.event_type, MIN(j.med) AS med, MIN(mad.mad) AS mad,
       COUNT(CASE WHEN j.adev > 3 * mad.mad THEN 1 END) AS n_outliers,
       MAX(j.adev) AS max_abs_dev
FROM j JOIN mad USING (event_type)
GROUP BY 1
"""


def q_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series regularization: per-user DAILY grid between first
    and last activity, empty days filled with n_events=0 and the last
    observed value carried forward (the resample + ffill every
    metrics pipeline runs before modeling). Grid days come from
    sequence+explode (pure arithmetic); the day's closing value is a
    skew-safe struct-max over the unique (ts, event_id) order; the
    forward fill is one partitioned last-ignore-nulls window. All
    outputs are exact passthroughs — nothing to drift."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.struct("ts", "event_id", "value")).alias("__last"),
    ).select(
        "user_id", "day", "n_events", F.col("__last.value").alias("__close")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("__close", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


SQL_GAP_FILL = """
WITH ranked AS (
  SELECT user_id, date_trunc('day', ts) AS day, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY ts DESC, event_id DESC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, date_trunc('day', ts)) AS n_events
  FROM events
),
daily AS (SELECT user_id, day, n_events, value AS close FROM ranked WHERE rn = 1),
bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM bounds
)
SELECT g.user_id, g.day,
       COALESCE(d.n_events, 0) AS n_events,
       last_value(d.close IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""


def q_rolling_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """30-day rolling revenue per customer — a RANGE-frame window (the
    frame is over the DAY VALUE, not row counts, so sparse order
    histories work and same-day rows aggregate symmetrically). The
    sum routes through DECIMAL (order-independent) per the float
    discipline. One shuffle on the customer key."""
    o = load_table(spark, sf, "orders")
    day = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
    ).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        day.alias("day"),
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("rev_30d"),
    )


SQL_ROLLING_REVENUE = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_30d
FROM orders
"""


def q_interval_union(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-union coverage: each event opens a 5-minute activity
    interval; per user, overlapping intervals merge (the classic
    sweep: a running max of previous interval ends splits merge
    groups) and the output is total covered time + merged-interval
    count. The sweep is two same-spec windows over ONE user_id
    shuffle+sort; everything is exact bigint microseconds."""
    e = load_table(spark, sf, "events")
    span = 300_000_000  # 5 minutes in micros
    s = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = e.select(
        "user_id", "event_id", s.alias("s"), (s + span).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = F.sum(
        F.when(
            F.col("__pme").isNull() | (F.col("s") > F.col("__pme")), 1
        ).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = base.withColumn("__pme", prev_max_end).withColumn("__grp", grp)
    merged = marked.groupBy("user_id", "__grp").agg(
        (F.max("e") - F.min("s")).alias("__len")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_merged_intervals"),
        F.sum("__len").alias("covered_micros"),
    )


SQL_INTERVAL_UNION = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events
),
marked AS (
  SELECT *,
         MAX(e) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS pme
  FROM base
),
grouped AS (
  SELECT *,
         SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS grp
  FROM marked
),
merged AS (
  SELECT user_id, grp, MAX(e) - MIN(s) AS len
  FROM grouped GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_merged_intervals,
       CAST(SUM(len) AS BIGINT) AS covered_micros
FROM merged GROUP BY 1
"""


def q_latency_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Observability percentile bands: exact p50/p90/p99 of value per
    (day, event_type) via percentile_disc — each picks an ACTUAL
    element (lower-convention, verified equal cross-engine), so the
    whole dashboard row replays bit-for-bit. One sort-based grouped
    agg; at scale the sort is per (day, type) partition."""
    e = load_table(spark, sf, "events")
    g = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    )
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
    )


SQL_LATENCY_PERCENTILES = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99
FROM events GROUP BY 1, 2
"""


def q_decayed_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially time-decayed value per user (half-life = 1 day,
    anchor 2024-02-01) — the recency-weighted scoring pattern behind
    engagement ranking and freshness-weighted corpus stats, spelled
    as ONE aggregation instead of a per-user timeline scan.

    Exactness doctrine — FIXED-POINT, not float: value quantizes to
    milli-units (trunc, exact bigint), the age k is an integer day
    diff clamped to [0, 31], and the per-event term is
    v_milli * 2^(31-k) — an exact BIGINT product (no double ever
    enters the aggregation; a first cut that cast v*0.5^k through
    DECIMAL(38,18) failed at sf0.1 because the double->decimal cast
    of a long binary fraction rounds differently per engine). The
    bigint sum is exact; the reported double is sum's
    correctly-rounded int64->double conversion (identical in every
    IEEE engine) times the exact scale 2^-31 (pure exponent shift).
    Headroom: max |term| = v_milli * 2^31 <= 2^51 at this data's
    value range; at 100 TB swap the bigint for DECIMAL(38,0). Scale
    shape: one map-side-combined groupBy on user_id; no window, no
    sort."""
    e = load_table(spark, sf, "events")
    k = "least(greatest(datediff(DATE '2024-02-01', to_date(ts)), 0), 31)"
    term = F.expr(
        f"cast(value * 1000 as bigint) * shiftleft(cast(1 as bigint), 31 - ({k}))"
    )
    g = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(term).alias("__s"),
    )
    return g.select(
        "user_id",
        "n_events",
        (F.col("__s").cast("double") * F.lit(2.0**-31)).alias("decayed_value"),
    )


SQL_DECAYED_REVENUE = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(CAST(SUM(
         CAST(trunc(value * 1000) AS BIGINT)
         * (CAST(1 AS BIGINT) << (31 - LEAST(GREATEST(
             date_diff('day', CAST(ts AS DATE), DATE '2024-02-01'), 0), 31)))
       ) AS BIGINT) AS DOUBLE) * power(2.0, -31) AS decayed_value
FROM events
GROUP BY user_id
"""


def q_trend_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Linear regression as an AGGREGATION (the scalable spelling of
    per-group trend fitting): per event_type, the closed-form normal
    equations for value-over-time, emitted as EXACT RATIONALS —
    (slope_num/slope_den, icept_num/icept_den) in integer arithmetic
    end-to-end. Quantization: x = hours since 2024-01-01 (truncating
    div of epoch micros), y = milli-units (trunc(value*1000)); both
    engine-identical. The sums fit bigint; the combining products run
    in Spark DECIMAL(38,0) / DuckDB HUGEINT — both exact int
    arithmetic, magnitudes < 1e30 at sf1. Emitting the rational
    avoids the decimal->double cast (DuckDB double-rounds large
    scaled decimals; under the normal equations\' catastrophic
    cancellation that last-ulp difference surfaced in the intercept).
    Consumers divide num/den for the float slope; ONE pass, one
    keyed agg with map-side combine."""
    e = load_table(spark, sf, "events")
    # x = FLOOR-of-absolute-epoch-hours minus the origin's hour, NOT
    # trunc of the signed diff: `timestampdiff(...) div` truncates
    # toward zero, which diverges from the oracle's epoch_us // floor
    # for any pre-origin, non-hour-aligned timestamp. unix_micros is
    # positive for this data's epoch range, so div == floor and both
    # engines quantize identically on either side of the origin.
    x = F.expr(
        "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " div 3600000000) - 473352"
    )
    y = F.expr("cast(value * 1000 as bigint)")  # trunc toward zero
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = d("n") * d("sxx") - d("sx") * d("sx")
    g2 = g.select(
        "event_type", "n",
        num.alias("__num"), den.alias("__den"),
        (d("sy") * (d("n") * d("sxx") - d("sx") * d("sx"))
         - (d("n") * d("sxy") - d("sx") * d("sy")) * d("sx")).alias("__inum"),
    )
    # the rationals leave as STRINGS: pandas keeps Spark decimals as
    # objects but DuckDB's .df() converts DECIMAL to float64, so a raw
    # decimal output can never hash-match the driver — digit strings
    # replay exactly on both engines with no precision ceiling
    return g2.select(
        "event_type", "n",
        F.col("__num").cast("decimal(38,0)").cast("string").alias("slope_num"),
        F.col("__den").cast("decimal(38,0)").cast("string").alias("slope_den"),
        F.col("__inum").cast("decimal(38,0)").cast("string").alias("icept_num"),
        (F.col("__den") * F.col("n").cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("string").alias("icept_den"),
    )


SQL_TREND_BY_TYPE = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(epoch_us(ts) // 3600000000 - 473352) AS HUGEINT) AS sx,
         CAST(SUM(CAST(trunc(value * 1000) AS BIGINT)) AS HUGEINT) AS sy,
         CAST(SUM((epoch_us(ts) // 3600000000 - 473352)
                  * CAST(trunc(value * 1000) AS BIGINT)) AS HUGEINT) AS sxy,
         CAST(SUM((epoch_us(ts) // 3600000000 - 473352)
                  * (epoch_us(ts) // 3600000000 - 473352)) AS HUGEINT) AS sxx
  FROM events GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
       CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den,
       CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS VARCHAR) AS icept_num,
       CAST((n * sxx - sx * sx) * n AS VARCHAR) AS icept_den
FROM s
"""


def q_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral path mining: the 20 most common 3-step event-type
    sequences within a user's time-ordered stream (lead windows over
    one user_id shuffle — never a self-join), ties broken by path.
    The path-frequency table is the input to funnel design; counts
    are exact."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select(
            "user_id",
            F.concat_ws(
                ">",
                "event_type",
                F.lead("event_type", 1).over(w),
                F.lead("event_type", 2).over(w),
            ).alias("path"),
            F.lead("event_type", 2).over(w).alias("__ok"),
        )
        .filter(F.col("__ok").isNotNull())
    )
    top = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("path"))
        .limit(20)
    )
    w2 = Window.orderBy(F.desc("n"), F.col("path"))
    return top.withColumn("rnk", F.row_number().over(w2).cast("int"))


SQL_TOP_PATHS = """
WITH steps AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c
  FROM events
)
SELECT path, n, CAST(rnk AS INT) AS rnk FROM (
  SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, a || '>' || b || '>' || c) AS rnk
  FROM steps WHERE c IS NOT NULL
  GROUP BY 1
) WHERE rnk <= 20
"""


def q_scd2_build(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval build from a
    change stream: per user, each event becomes a version row
    [valid_from, valid_to) with valid_to = the next change's
    timestamp (NULL = current version) — the warehouse-standard
    temporal table construction, one user_id shuffle+sort. Exact
    bigint micros + milli-quantized value; total order (ts micros,
    event_id) is engine-identical."""
    e = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select(
        "user_id",
        "event_id",
        F.expr("cast(value * 1000 as bigint)").alias("value_m"),
        us.alias("vf_us"),
    )
    w = Window.partitionBy("user_id").orderBy("vf_us", "event_id")
    return base.withColumn("vt_us", F.lead("vf_us").over(w))


SQL_SCD2_BUILD = """
SELECT user_id, event_id,
       CAST(trunc(value * 1000) AS BIGINT) AS value_m,
       epoch_us(ts) AS vf_us,
       LEAD(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS vt_us
FROM events
"""


def q_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (quantile-binned) value profile per event type
    WITHOUT a per-group global sort: 7 percentile_disc cutpoints per
    type (one sort-based keyed agg — the distributed scale path an
    exact-NTILE formulation lacks: NTILE forces each type through one
    reducer), broadcast back; bucket = 1 + #cutpoints strictly below
    the value, so boundary ties land in the lowest eligible bucket —
    deterministic in both engines (counts differ from exact NTILE
    only at ties, by construction). Per-bucket stats are exact
    (count, min/max passthrough, milli-quantized bigint sum)."""
    e = load_table(spark, sf, "events")
    k = 8
    cuts = e.groupBy("event_type").agg(
        *[
            F.expr(
                f"percentile_disc({i / k}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"c{i}")
            for i in range(1, k)
        ]
    )
    j = e.join(F.broadcast(cuts), "event_type")
    bucket = F.lit(1)
    for i in range(1, k):
        bucket = bucket + F.when(F.col(f"c{i}") < F.col("value"), 1).otherwise(0)
    return (
        j.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum(F.expr("cast(value * 1000 as bigint)")).alias("sum_m"),
        )
    )


SQL_EQUIDEPTH_HISTOGRAM = f"""
WITH cuts AS (
  SELECT event_type,
         {", ".join(f"quantile_disc(value, {i / 8}) AS c{i}" for i in range(1, 8))}
  FROM events GROUP BY 1
)
SELECT e.event_type,
       1 {"".join(f"+ (CASE WHEN c{i} < value THEN 1 ELSE 0 END)" for i in range(1, 8))} AS bucket,
       COUNT(*) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi,
       CAST(SUM(CAST(trunc(value * 1000) AS BIGINT)) AS BIGINT) AS sum_m
FROM events e JOIN cuts USING (event_type)
GROUP BY 1, 2
"""


def q_rolling_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-7-day DISTINCT active users per day — the sliding
    count-distinct a RANGE window cannot do (COUNT DISTINCT is not
    window-able) and naive re-counting does 7x. Scale shape: reduce to
    distinct (user, day) first (the big shuffle, corpus-sized), then
    explode each pair to the <=7 target days it contributes to and run
    ONE exact count-distinct per day — shuffle volume 7x the distinct
    pairs, not 7 full re-scans. All date arithmetic integer-exact."""
    e = load_table(spark, sf, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
    )
    # clip to days that exist in the data (sequence overruns the tail)
    days = ud.select("day").distinct()
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


SQL_ROLLING_DISTINCT_USERS = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM ud),
contrib AS (
  SELECT ud.user_id, ud.day + CAST(o AS INT) AS day
  FROM ud, LATERAL UNNEST(range(0, 7)) AS t(o)
)
SELECT c.day, COUNT(DISTINCT c.user_id) AS active_users_7d
FROM contrib c
WHERE c.day IN (SELECT day FROM days)
GROUP BY 1
"""


def q_quantile_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """MERGEABLE approximate quantiles from a fixed-bin histogram —
    the 100 TB alternative to percentile_disc's per-group sort: one
    keyed (type, bin) count (map-side combine; 64 rows per group max,
    union-mergeable across days/partitions), then the quantile q is
    the LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q*n) — exact integer rule, error bounded by the bin width.
    The cumulative window runs over <= 64 rows per group. Everything
    is integer arithmetic + literal bin edges, so the approximation
    itself replays bit-for-bit in the oracle, and pytest pins it
    within one bin width of the exact percentile. The bin RANGE must
    cover the data (clamped outliers would bias edge quantiles —
    the first run of this query had [0,100) bins under a max of 560
    and missed p90 by 25; range chosen from the profiled max)."""
    lo, hi, nb = 0.0, 640.0, 128
    wdt = (hi - lo) / nb
    e = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    b = F.least(
        F.lit(nb - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - lo) / wdt).cast("int")),
    )
    hist = e.groupBy("event_type", b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = hist.withColumn("cum", F.sum("n").over(wc)).withColumn(
        "tot", F.sum("n").over(wt)
    )
    agg_cols = [F.max("tot").alias("n_rows")]
    for q in (50, 90, 99):
        target = F.expr(f"({q} * tot + 99) div 100")
        agg_cols.append(
            (
                F.lit(lo)
                + F.min(F.when(F.col("cum") >= target, F.col("bin"))) * F.lit(wdt)
            ).alias(f"p{q}_bin_lo")
        )
    return cum.groupBy("event_type").agg(*agg_cols)


SQL_QUANTILE_HISTOGRAM = """
WITH hist AS (
  SELECT event_type,
         LEAST(127, GREATEST(0, CAST(FLOOR((value - 0.0) / 5.0) AS INT))) AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM hist
)
SELECT event_type,
       CAST(MAX(tot) AS BIGINT) AS n_rows,
       0.0 + MIN(CASE WHEN cum >= (50 * tot + 99) // 100 THEN bin END) * 5.0 AS p50_bin_lo,
       0.0 + MIN(CASE WHEN cum >= (90 * tot + 99) // 100 THEN bin END) * 5.0 AS p90_bin_lo,
       0.0 + MIN(CASE WHEN cum >= (99 * tot + 99) // 100 THEN bin END) * 5.0 AS p99_bin_lo
FROM cum GROUP BY 1
"""




def q_windowed_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Per-window top-k leaderboard, batch twin of the streaming
    trending feed (streaming.ingest.windowed_topn): hourly tumbling
    counts per event_type, then the SHARED rank
    (streaming.ingest.rank_windows — the same function the streaming
    sink and flush_open_windows call) kept to the top 3 per window
    with the deterministic (count desc, key asc) tie-break. This row
    is the driver attestation for the streaming leaderboard's window
    algebra. One shuffle for the count, one on win_start for the rank;
    WindowGroupLimit prunes to k per window map-side."""
    from cubert_spark.streaming.ingest import rank_windows

    e = load_table(spark, sf, "events")
    counted = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    return rank_windows(counted, ["event_type"], 3)


SQL_WINDOWED_TOPN = """
SELECT win_start, event_type, n, rnk FROM (
  SELECT DATE_TRUNC('hour', ts) AS win_start, event_type,
         COUNT(*) AS n,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY DATE_TRUNC('hour', ts)
           ORDER BY COUNT(*) DESC, event_type
         ) AS INT) AS rnk
  FROM events GROUP BY 1, 2
) WHERE rnk <= 3
"""


def q_events_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectations over the EVENTS stream table — the
    driver attestation for the streaming monitor's shared rule
    engine (streaming.ingest.monitor_expectations evaluates exactly
    datapipe.expectations.run_expectations per micro-batch; this row
    runs the same function over the landed table). Two rules are
    deliberately violated by the data (event_type 'error' outside the
    accepted set; value above 250) so the report carries non-zero
    counts and the parity check exercises real violation math, plus a
    clean not_null and a keyed uniqueness check. One fused scan + one
    keyed agg; no joins (no FK rule — events has no enforced dim)."""
    from cubert_spark.datapipe import expectations as X

    e = load_table(spark, sf, "events")
    rules = [
        X.not_null("event_id"),
        X.accepted_values("event_type", ["click", "view", "purchase", "signup"]),
        X.in_range("value", 0.0, 250.0),
        X.unique("event_id"),
    ]
    return X.run_expectations(e, rules)


SQL_EVENTS_EXPECTATIONS = """
WITH n AS (SELECT COUNT(*) AS n FROM events)
SELECT 'not_null' AS rule, 'event_id' AS col_name,
       CAST((SELECT COUNT(*) FROM events WHERE event_id IS NULL) AS BIGINT) AS n_violations,
       n.n AS n_checked FROM n
UNION ALL
SELECT 'accepted_values', 'event_type',
       CAST((SELECT COUNT(*) FROM events
             WHERE event_type IS NOT NULL
               AND event_type NOT IN ('click','view','purchase','signup')) AS BIGINT),
       n.n FROM n
UNION ALL
SELECT 'in_range', 'value',
       CAST((SELECT COUNT(*) FROM events
             WHERE value IS NOT NULL AND (value < 0.0 OR value > 250.0)) AS BIGINT),
       n.n FROM n
UNION ALL
SELECT 'unique', 'event_id',
       CAST((SELECT SUM(c - 1) FROM (
          SELECT COUNT(*) AS c FROM events GROUP BY event_id)) AS BIGINT),
       n.n FROM n
"""




def q_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (temporal) enrichment via operators.asof.
    temporal_join: purchases join the SCD2 signup-version table at
    THEIR event time — each purchase picks up the signup version
    valid when it happened (Kimball SCD2 lookup / Flink temporal
    join). Versions built with the q_scd2_build window (exact bigint
    micros); equi-join on user_id with the interval as a post-join
    filter; at most one version matches per fact by the SCD2
    invariant."""
    from cubert_spark.operators.asof import temporal_join

    e = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("vf_us", "version_id")
    versions = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.expr("cast(value * 1000 as bigint)").alias("value_m"),
            us.alias("vf_us"),
        )
        .withColumn("vt_us", F.lead("vf_us").over(w))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), us.alias("p_us")
    )
    return temporal_join(
        purchases, versions, ["user_id"], "p_us", "vf_us", "vt_us"
    ).select("user_id", "purchase_id", "version_id", "value_m")


SQL_TEMPORAL_JOIN = """
WITH versions AS (
  SELECT user_id, event_id AS version_id,
         CAST(trunc(value * 1000) AS BIGINT) AS value_m,
         epoch_us(ts) AS vf_us,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS vt_us
  FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, v.version_id, v.value_m
FROM purchases p JOIN versions v
  ON p.user_id = v.user_id
 AND v.vf_us <= p.p_us
 AND (v.vt_us IS NULL OR p.p_us < v.vt_us)
"""


QUERIES = {
    "tumbling_window": q_tumbling_window,
    "quantile_histogram": q_quantile_histogram,
    "scd2_build": q_scd2_build,
    "equidepth_histogram": q_equidepth_histogram,
    "rolling_distinct_users": q_rolling_distinct_users,
    "cdc_upsert": q_cdc_upsert,
    "attribution": q_attribution,
    "mad_outliers": q_mad_outliers,
    "gap_fill": q_gap_fill,
    "rolling_revenue": q_rolling_revenue,
    "interval_union": q_interval_union,
    "latency_percentiles": q_latency_percentiles,
    "trend_by_type": q_trend_by_type,
    "decayed_revenue": q_decayed_revenue,
    "top_paths": q_top_paths,
    "sliding_window": q_sliding_window,
    "sessionize": q_sessionize,
    "session_window": q_session_window,
    "json_props": q_json_props,
    "funnel": q_funnel,
    "retention": q_retention,
    "event_transitions": q_event_transitions,
    "value_histogram": q_value_histogram,
    "anomaly_days": q_anomaly_days,
    "windowed_topn": q_windowed_topn,
    "events_expectations": q_events_expectations,
    "temporal_join": q_temporal_join,
}

ORACLES = {
    "tumbling_window": SQL_TUMBLING,
    "scd2_build": SQL_SCD2_BUILD,
    "quantile_histogram": SQL_QUANTILE_HISTOGRAM,
    "equidepth_histogram": SQL_EQUIDEPTH_HISTOGRAM,
    "rolling_distinct_users": SQL_ROLLING_DISTINCT_USERS,
    "cdc_upsert": SQL_CDC_UPSERT,
    "attribution": SQL_ATTRIBUTION,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "gap_fill": SQL_GAP_FILL,
    "rolling_revenue": SQL_ROLLING_REVENUE,
    "interval_union": SQL_INTERVAL_UNION,
    "latency_percentiles": SQL_LATENCY_PERCENTILES,
    "trend_by_type": SQL_TREND_BY_TYPE,
    "decayed_revenue": SQL_DECAYED_REVENUE,
    "top_paths": SQL_TOP_PATHS,
    "sliding_window": SQL_SLIDING,
    "sessionize": SQL_SESSIONIZE,
    "session_window": SQL_SESSION_WINDOW,
    "json_props": SQL_JSON_PROPS,
    "funnel": SQL_FUNNEL,
    "retention": SQL_RETENTION,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "anomaly_days": SQL_ANOMALY_DAYS,
    "windowed_topn": SQL_WINDOWED_TOPN,
    "events_expectations": SQL_EVENTS_EXPECTATIONS,
    "temporal_join": SQL_TEMPORAL_JOIN,
}
