package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic window-function surface (SURVEY.md §2.6 notes the reference
  * has none — this is the engine-side capability the pagination/top-k
  * use cases upgrade into): offsets (lag/lead), ranking families,
  * frame-spec moving aggregates, first/last/nth navigation.
  *
  * Scale posture: every window partitions by a real key (customer,
  * supplier) so work distributes; the one post-aggregation global
  * window (moving average over daily totals) runs over data already
  * reduced to one row per day — a deliberate, bounded single-partition
  * step, not a window over raw facts.
  */
object Windows {

  // --- W11: conversion funnel — per user, purchases attributed to a
  // preceding view within the attribution window (the event-analytics
  // query behind every "conversion rate" dashboard). Carrier pattern:
  // ONE ignore-nulls last_value window over the per-user event stream
  // (the j6 as-of technique) instead of a view×purchase self-join —
  // no candidate explosion, one shuffle on user_id, and the window
  // never goes global. Timestamps compare on floor(epoch) so both
  // engines bucket sub-second ties identically. ---
  def conversionFunnel(s: SparkSession, d: String,
                       windowSec: Long = 3600L): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true)
          .over(w))
    val isPurchase = col("event_type") === "purchase"
    val converted = isPurchase && col("last_view_ts").isNotNull &&
      (floor(unix_timestamp(col("ts"))) - floor(unix_timestamp(col("last_view_ts")))
        <= windowSec)
    marked.groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(isPurchase, 1L).otherwise(0L)).as("n_purchases"),
        sum(when(converted, 1L).otherwise(0L)).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double")
          / nullif(col("n_purchases"), lit(0L)), 4))
      .orderBy("user_id")
  }

  // --- W12: percent-of-total + Pareto cumulative share — the
  // "which segments carry the revenue" report. The window runs over
  // the AGGREGATE (one row per priority), never the fact table, so
  // its single-partition execution is a few rows at any corpus size;
  // the total joins back via broadcast. Exact integer-cents sums so
  // shares are bit-identical cross-engine. ---
  def paretoShare(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(sum(Benchmark2.priceCents(col("o_totalprice"))).as("cents"))
    val tot = agg.agg(sum(col("cents")).as("tot"))
    val wCum = Window.partitionBy(lit(0)).orderBy(col("cents").desc, col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.crossJoin(broadcast(tot))
      .withColumn("cum_cents", sum(col("cents")).over(wCum))
      .select(col("o_orderpriority"),
        (col("cents") / lit(100.0)).as("sales"),
        round(lit(100.0) * col("cents").cast("double")
          / col("tot").cast("double"), 4).as("pct"),
        round(lit(100.0) * col("cum_cents").cast("double")
          / col("tot").cast("double"), 4).as("cum_pct"))
      .orderBy(col("sales").desc, col("o_orderpriority"))
  }

  // --- W14 / ST7: SCD-2 temporal table build — collapse a change
  // stream into validity intervals [valid_from, valid_to) per user,
  // the slowly-changing-dimension pattern every warehouse needs: lag
  // to detect state changes, lead over the change rows to close each
  // interval, sentinel 9999-12-31 + is_current flag on the open one.
  // Both windows share the user_id partitioning (one shuffle); the
  // change filter shrinks the second window's input to state flips
  // only. ---
  def scdBuild(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = graft.Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
    changes
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        col("next_ts").isNull.cast("int").as("is_current"))
      // valid_to completes the sort key: valid_from is truncated to
      // seconds while events carry microsecond timestamps, so an
      // A→B→A flip within one second yields two rows agreeing on
      // (user_id, valid_from, event_type) but not valid_to — without
      // it Spark and DuckDB may order those rows differently.
      .orderBy("user_id", "valid_from", "event_type", "valid_to")
  }

  // --- W14: EWMA smoothing of daily sales — the exponential twin of
  // w6's boxcar moving average (trend-following with recency weight).
  // The recursive EWMA is unrolled to a `span`-term truncated sum with
  // Scala-side literal coefficients α·(1−α)^j (residual tail weight
  // (1−α)^span ≈ 8e-4 at α=0.3/span=20 — below the 4dp output grid),
  // so the whole thing is ONE window over the pre-aggregated daily
  // relation: no recursion, no state, and both engines evaluate the
  // identical left-associated literal-coefficient sum bit-for-bit. ---
  def ewmaDailySales(s: SparkSession, d: String,
                     alpha: Double = 0.3, span: Int = 20): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("day_sales"))
    val w = Window.partitionBy(lit(0)).orderBy("day")
    val terms = (0 until span).map { j =>
      val coef = alpha * math.pow(1 - alpha, j)
      (if (j == 0) col("day_sales")
       else coalesce(lag(col("day_sales"), j).over(w), lit(0.0))) * lit(coef)
    }
    daily.select(col("day"), col("day_sales"),
        round(terms.reduce(_ + _), 4).as(s"ewma$span"))
      .orderBy("day")
  }

  // --- W15: time-weighted average (TWAP) over IRREGULAR event times —
  // the finance/metrics aggregate a plain AVG gets wrong when
  // observations arrive unevenly: each value is weighted by how long
  // it remained current (the gap to the user's next event that day).
  // Exact integer arithmetic end to end: value scaled to micro-units
  // (round(v·1e6) as long) times gap in SECONDS — products ≤ ~1e14,
  // day-sums ≤ ~1e17, inside long — with ONE double division at the
  // end, so Spark and DuckDB agree bit-for-bit (the lineRevenueCents
  // rule applied to a window aggregate). Per-user window, never
  // global; last event of a user-day has no successor and carries no
  // weight (the [t, next) step-function convention). ---
  def twapDaily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .withColumn("gap_s",
        (coalesce(unix_timestamp(lead(col("ts"), 1).over(w)), unix_timestamp(col("ts")))
          - unix_timestamp(col("ts"))).cast("long"))
      .filter(col("gap_s") > 0)
      .withColumn("v_micro", round(col("value") * 1e6).cast("long"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("gap_s")).as("total_s"),
        round((sum(col("v_micro") * col("gap_s")) / 1e6)
          / sum(col("gap_s")), 6).as("twap"))
      .filter(col("n_obs") >= 2)
      .orderBy("user_id", "day")
  }

  // --- W4: lag/lead offsets — per-customer order-over-order deltas. ---
  def lagLeadDeltas(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2)
          .as("delta_prev"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  // --- W5: the ranking family over one partitioned ordering — rank,
  // dense_rank, percent_rank, cume_dist, ntile. One shuffle on the
  // partition key, one in-partition sort. ---
  def rankSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "rnk")
  }

  // --- W6: frame-spec moving aggregate — 7-day moving average of
  // daily sales. Facts reduce to one row/day first (shuffled, partial
  // agg); the window then runs over ~2.5k rows. ---
  def movingAvgSales(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("day_sales"))
    val w = Window.partitionBy(lit(0)).orderBy("day").rowsBetween(-6, 0)
    daily
      .select(col("day"), col("day_sales"),
        // 4dp, not 2dp: cent-grid values averaged over n <= 7 rows can
        // land exactly on 2dp half-way points (cents/2), but k/(100n)
        // never equals a 4dp boundary (2j+1)/20000 for n <= 7 — parity
        // argument; 4dp rounding is provably engine-stable here
        round(avg(col("day_sales")).over(w), 4).as("ma7"),
        count(lit(1)).over(w).as("n_days_in_frame"))
      .orderBy("day")
  }

  // --- W8: RANGE frame over event time — per-customer 30-day trailing
  // spend at each order. rangeBetween needs a numeric ordering, so the
  // frame runs over epoch seconds (one expression, engine-portable);
  // distinct from W6's ROWS frame: RANGE includes every order within
  // the time span regardless of row count, and peers (same timestamp)
  // share a frame. ---
  def trailingSpend(s: SparkSession, d: String, days: Int = 30): DataFrame = {
    // parquet may surface the column as TIMESTAMP_NTZ, which has no
    // direct long cast — normalize to session-TZ timestamp first
    val sec = col("o_orderdate").cast("timestamp").cast("long")
    val w = Window.partitionBy("o_custkey").orderBy(sec)
      .rangeBetween(-days.toLong * 86400L, 0L)
    Tables.orders(s, d).filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  // --- W7: navigation — first/last/nth value per supplier over ship
  // order, with an explicit full-partition frame (the default frame
  // ends at CURRENT ROW, which makes last_value order-dependent). ---
  def firstLastNav(s: SparkSession, d: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val full = Window.partitionBy("l_suppkey").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(s, d).filter(col("l_suppkey") < 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        first(col("l_orderkey")).over(full).as("first_order"),
        last(col("l_orderkey")).over(full).as("last_order"),
        nth_value(col("l_orderkey"), 3).over(full).as("third_order"))
      .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
  }

  // --- W16: rolling z-score anomaly detection — per event type, each
  // day's count against its own trailing 7-day mean/std: the
  // monitoring primitive behind traffic-drop/spike alerting, the
  // ROLLING complement of a22's global z outliers. The window carries
  // exact integer POWER SUMS (Σn, Σn² over 6 preceding + current) and
  // derives mean/var in doubles only at the end — identical
  // association on both engines, so the z values cross-match at 4
  // decimals. Only full 7-day windows score (partial windows would
  // flag every series start); σ = 0 windows emit z = 0 (a constant
  // series has no anomaly signal, and dividing by √0 is the only
  // nondeterminism risk in the chain). One shuffle on event_type for
  // the tiny daily aggregate; the window never sees raw events. ---
  def rollingAnomaly(s: SparkSession, d: String,
                     threshold: Double = 1.5): DataFrame =
    rollingAnomalyFrom(
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n")),
      threshold)

  /** The scoring tail over an arbitrary (event_type, day, n) daily
    * relation — shared by w16 and its count-maintaining stream twin
    * (Streams.dailyCountMaintainStream), whose read side enters here.
    */
  private[graft] def rollingAnomalyFrom(daily: DataFrame,
                                        threshold: Double = 1.5): DataFrame = {
    val win = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("c", count(lit(1)).over(win))
      .withColumn("s1", sum(col("n")).over(win))
      .withColumn("s2", sum(col("n") * col("n")).over(win))
      .filter(col("c") === 7)
      .withColumn("mean", col("s1").cast("double") / lit(7.0))
      .withColumn("variance",
        col("s2").cast("double") / lit(7.0) - col("mean") * col("mean"))
      .withColumn("z",
        when(col("variance") > 0,
          round((col("n").cast("double") - col("mean"))
            / sqrt(col("variance")), 4))
          .otherwise(lit(0.0)))
      .select(col("event_type"), col("day"), col("n"), col("z"),
        (abs(col("z")) > threshold).cast("int").as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // --- W17: running-peak drawdown — each day's revenue against the
  // best day seen so far: peak = running max, drawdown = peak −
  // current; the max row is the series' worst decline-from-best
  // (finance's max-drawdown statistic applied to a revenue series —
  // the "how far below our best are we" dashboard number). Exact
  // integer cents end-to-end; the running max runs over the
  // DAY-level aggregate (a few thousand rows — dp10's two-pass is
  // the form if the series were fact-sized). ---
  def revenueDrawdown(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(date_format(date_trunc("day", col("o_orderdate")),
        "yyyy-MM-dd").as("day"))
      .agg(sum(Benchmark2.priceCents(col("o_totalprice"))).as("cents"))
    val upTo = Window.partitionBy(lit(0)).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak", max(col("cents")).over(upTo))
      .withColumn("drawdown", col("peak") - col("cents"))
      .select(col("day"), col("cents"), col("peak"), col("drawdown"))
      .orderBy("day")
  }

  // --- W18: interval union (gaps-and-islands) — per supplier, merge
  // the overlapping [shipdate, receiptdate] in-flight windows of its
  // shipments and report how many merged busy periods exist and how
  // many distinct days are covered by at least one shipment. The
  // classic islands construction: order intervals by (start, end)
  // within the key, flag a new island when start jumps past the
  // running max of all preceding ends (ROWS … 1 PRECEDING), island id
  // = running count of flags, then one agg per island. Dates become
  // integer day offsets from a fixed epoch BEFORE the window so every
  // comparison and the final coverage sum is exact integer math. The
  // flag is deterministic under (start, end) ties: equal-start rows
  // can never open an island past the first (end ≥ start + 3 by
  // construction), and the running max is order-free within a tie
  // group. The interval end is synthesized the j9 way (ship + 3..16
  // days keyed on quantity) because this dataset carries no receipt
  // date. Scale: both windows partition by supplier — per-key ordered
  // scans, no global sort; the island agg is one hash agg on
  // (supplier, island). ---
  def intervalUnion(s: SparkSession, d: String): DataFrame = {
    val day0 = to_date(lit("1992-01-01"))
    val iv = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("sk"),
        datediff(col("l_shipdate").cast("date"), day0).cast("long").as("iv_s"),
        col("l_quantity").cast("long").as("q"))
      .select(col("sk"), col("iv_s"),
        (col("iv_s") + 3 + col("q") % 14).as("iv_e"))
    val ord = Window.partitionBy("sk").orderBy(col("iv_s"), col("iv_e"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    iv
      .withColumn("prev_max_e", max(col("iv_e")).over(prev))
      .withColumn("is_new",
        when(col("prev_max_e").isNull || col("iv_s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("sk"), col("island"))
      .agg(count(lit(1)).as("n_iv"), min(col("iv_s")).as("min_s"),
        max(col("iv_e")).as("max_e"))
      .groupBy(col("sk"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("max_e") - col("min_s") + 1).as("covered_days"))
      .orderBy("sk")
  }

  // --- W20: rolling correlation — Pearson r between the click and
  // purchase daily-revenue series over a trailing 30-day row frame,
  // the co-movement diagnostic next to w6's univariate moving average
  // and a42's whole-series ACF ("did these two signals decouple
  // recently?"). Exactness: daily cents are exact longs, every frame
  // statistic is a windowed sum of decimal(38,0) products (cast
  // BEFORE multiplying — a long×long product could overflow first at
  // extreme daily volumes), and r is one per-row double over the
  // frame's exact moments. Only full frames are emitted, and the
  // degenerate zero-variance frame maps to NULL by the same CASE in
  // both engines. The window runs over the (tiny) joined daily
  // aggregate, never raw events. ---
  def rollingCorrelation(s: SparkSession, d: String,
                         winDays: Int = 30): DataFrame = {
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val dec = "decimal(38,0)"
    val daily = Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
    val x = daily.filter(col("event_type") === "click")
      .select(col("day"), col("c").cast(dec).as("x"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("day"), col("c").cast(dec).as("y"))
    val w = Window.partitionBy(lit(0)).orderBy("day").rowsBetween(-(winDays - 1), 0)
    val m = x.join(y, "day")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .filter(col("n") === winDays)
    val num = dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val dxx = dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val dyy = dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))
    m.select(col("day"),
        when(col("sxx") * col("n") > col("sx") * col("sx") &&
             col("syy") * col("n") > col("sy") * col("sy"),
          round(num / sqrt(dxx * dyy), 6)).as("corr30"))
      .orderBy("day")
  }

  /** Oracle twin of [[rollingCorrelation]] — identical frame moments
    * and double association.
    */
  def rollingCorrelationOracleSql(winDays: Int = 30): String =
    s"""WITH daily AS (
       |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |    event_type,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS c
       |  FROM events GROUP BY 1, 2),
       |j AS (
       |  SELECT x.day, x.c AS x, y.c AS y
       |  FROM (SELECT day, c FROM daily WHERE event_type = 'click') x
       |  JOIN (SELECT day, c FROM daily WHERE event_type = 'purchase') y
       |    ON x.day = y.day),
       |m AS (
       |  SELECT day,
       |    count(*) OVER w AS n,
       |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
       |    sum(x * y) OVER w AS sxy,
       |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
       |  FROM j
       |  WINDOW w AS (ORDER BY day
       |    ROWS BETWEEN ${winDays - 1} PRECEDING AND CURRENT ROW))
       |SELECT day,
       |  CASE WHEN sxx * n > sx * sx AND syy * n > sy * sy
       |    THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       |  END AS corr30
       |FROM m WHERE n = $winDays ORDER BY day""".stripMargin

  // --- W21: gaps-and-islands — longest consecutive-day activity
  // streak per user, reported as a streak-length histogram. The
  // classic trick: within a user, `day - row_number_over(day)` is
  // constant exactly on a run of consecutive days, so islands fall
  // out of one per-user window plus one groupBy — no self-join, no
  // recursive scan. Every window and aggregate partitions on
  // user_id (hash-distributes evenly), and the histogram tail
  // reduces to at most max-streak rows, so the plan is two narrow
  // shuffles at any corpus size. The example_user column makes the
  // report actionable without emitting a per-user relation. ---
  def activityStreaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("anchor",
        date_sub(col("day"), row_number().over(byUser)))
    val streaks = islands.groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("user_id").agg(max(col("len")).as("best"))
      .groupBy(col("best").as("streak_len"))
      .agg(count(lit(1)).as("n_users"),
        min(col("user_id")).as("example_user"))
      .orderBy(col("streak_len").desc)
  }
}
