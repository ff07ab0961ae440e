package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's relational query surface (SURVEY.md §2.2-§2.7),
  * re-expressed over the synthetic star schema.
  *
  * Every function takes `(spark, sfDir)` and returns a DataFrame whose
  * output is deterministically ordered (explicit total-order sort keys)
  * so the driver's parquet-vs-DuckDB hash compare is stable.
  *
  * Scale posture: all filters/projections are plain Column expressions
  * (pushed into the parquet scan by Catalyst), dims are broadcast
  * explicitly, and no query collects to the driver.
  */
object Relational {

  // --- P1: point equality filter (reference: DatabaseAccessor.py:94) ---
  def pointFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  // --- P2: substring LIKE (reference: DatabaseAccessor.py:100, wildcard
  // defaulting Server.py:20-23 — empty key ⇒ LIKE '%%', which still
  // excludes NULL names). The key is spliced into LIKE '%{key}%'
  // unescaped, exactly as the reference builds it, so '%'/'_' in the
  // key act as wildcards there too. ---
  def likeSubstring(s: SparkSession, d: String, key: String = "wid"): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like(s"%$key%"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  // --- P3: prefix LIKE on a time string (reference: DatabaseAccessor.py:107,
  // pattern built OrderList.vue:125-131). The reference stores
  // 'yyyy-MM-dd HH:mm:ss' strings; here the timestamp is native, so we
  // format then LIKE — exact reference semantics incl. mid-pattern
  // wildcards ('2024-%-15%') that a year()/month() rewrite would break
  // (SURVEY.md §7.4). ---
  def timePrefixLike(s: SparkSession, d: String,
                     pattern: String = "1996-0%-1%"): DataFrame =
    Tables.orders(s, d)
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").like(pattern))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_time"))
      .orderBy("o_orderkey")

  // --- P4 + O3: NOT NULL filter + top-k by score (reference:
  // DatabaseAccessor.py:112-117, top-15 per Boarding.vue:31-34).
  // Plans as TakeOrderedAndProject — true top-k, no full sort. ---
  def topKByScore(s: SparkSession, d: String, k: Int = 15): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_acctbal").isNotNull)
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(k)
      .select("c_custkey", "c_name", "c_acctbal")

  // --- P8/G7: substring filter over a path-like listing (reference:
  // GreilFS `find`, Client/managers.py:342-365) ---
  def findSubstring(s: SparkSession, d: String, needle: String = "1"): DataFrame =
    Tables.documents(s, d)
      .filter(col("source").contains(needle))
      .select("doc_id", "source")
      .orderBy("doc_id")

  // --- O1: ORDER BY ASC + LIMIT/OFFSET pagination (reference:
  // DatabaseAccessor.py:101). Spark ≥3.4 `offset` keeps this a single
  // GlobalLimit/Offset plan, no window needed. ---
  def paginateAsc(s: SparkSession, d: String,
                  startFrom: Int = 50, limitation: Int = 100): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_orderkey").asc)
      .offset(startFrom).limit(limitation)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  // --- O2: ORDER BY DESC + LIMIT/OFFSET, newest first (reference:
  // DatabaseAccessor.py:108). o_orderkey tiebreak makes paging stable
  // (SURVEY.md §7.4 "unstable pagination"). ---
  def paginateDesc(s: SparkSession, d: String,
                   startFrom: Int = 20, limitation: Int = 50): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .offset(startFrom).limit(limitation)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_time"),
        col("o_totalprice"))

  // --- O6: keyset ("load more") pagination — the scale-correct form
  // of the reference's cursor paging (`OrderList.vue:105-124`
  // advances start_from += limitation). OFFSET k scans-and-discards k
  // rows (O(k) per page, quadratic over a full walk); the keyset
  // predicate seeks directly and is pushed into the scan. ---
  def keysetPage(s: SparkSession, d: String,
                 afterDate: String = "1997-06-01 00:00:00",
                 afterKey: Long = 999999L, limitation: Int = 50): DataFrame = {
    val ts = to_timestamp(lit(afterDate))
    Tables.orders(s, d)
      .filter(col("o_orderdate") < ts ||
        (col("o_orderdate") === ts && col("o_orderkey") < afterKey))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(limitation)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_time"),
        col("o_totalprice"))
  }

  // --- O5: sort on any column (`OrderList.vue:38-43` — all 6 columns
  // sortable client-side); server-side with a deterministic tiebreak. ---
  def sortByAnyColumn(s: SparkSession, d: String,
                      column: String = "o_totalprice",
                      ascending: Boolean = false, n: Int = 100): DataFrame = {
    val key = if (ascending) col(column).asc else col(column).desc
    Tables.orders(s, d)
      .orderBy(key, col("o_orderkey").asc)
      .limit(n)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
  }

  // --- J1: one-to-many join with nested collection (reference: ORM
  // relationship DatabaseAccessor.py:39 + nesting :44-47 — movie with its
  // reviews as an array). orders ⋈ lineitem, lines nested per order.
  // The per-order line list is sorted so the array is deterministic. ---
  def joinNested(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderkey") < 200L)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderkey", "o_totalprice")
      .agg(
        count(col("l_linenumber")).as("n_lines"),
        // exact integer-cents revenue (Benchmark2.lineRevenueCents1e4):
        // round(sum(double),2) sat on a half-cent boundary at sf0.001
        // where Spark's BigDecimal-string and DuckDB's binary rounding
        // disagree — the one parity rule every revenue agg follows
        coalesce(sum(Benchmark2.lineRevenueCents1e4) / 10000.0, lit(0.0))
          .as("revenue"),
        array_join(sort_array(collect_list(col("l_linenumber"))).cast("array<string>"), ",")
          .as("line_numbers"))
      .orderBy("o_orderkey")

  // --- J2 (semi): customers having orders — EXISTS via left_semi, no
  // row multiplication, hash-join on the shuffled key at scale. ---
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // --- J2 (anti): customers with no orders — NOT EXISTS via left_anti. ---
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // --- J4: star join — fact ⋈ fact ⋈ broadcast dims (TPC-H Q5 shape;
  // the general-case replacement for the reference's join-avoidance-by-
  // denormalization, SURVEY.md §2.3 J3). Dims are broadcast explicitly:
  // region/nation/customer are tiny even at 100 TB-of-facts scale, so the
  // only shuffle is lineitem⋈orders on the orderkey. ---
  def starJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg((sum(Benchmark2.lineRevenueCents1e4) / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  // --- J5: range (band) join — inequality condition between two
  // relations (SURVEY.md §2.3 ABSENT row made available): suppliers
  // matched to customers whose balance lies within a band. Small side
  // broadcast -> BroadcastNestedLoopJoin; at scale, band joins get
  // bucketized on floor(balance/band) first to make them equi-joins. ---
  def rangeJoin(s: SparkSession, d: String, band: Double = 50.0): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.supplier(s, d)),
        col("c_acctbal").between(col("s_acctbal") - band, col("s_acctbal") + band))
      .groupBy("s_suppkey", "s_name")
      // sum, not avg: dividing a 2-decimal-grid sum by a small count
      // lands exactly on rounding half-way points, where Spark's and
      // the oracle's last-bit FP noise disagree
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("c_acctbal")), 2).as("sum_cust_bal"))
      .orderBy("s_suppkey")

  // --- J6: as-of join — each event matched to the latest order of the
  // same user at-or-before the event time. Spark lacks a native as-of
  // join; the naive form (candidate equi-join + filter + top-1) blows
  // up as |events|x|orders per user|. This is the scale-correct
  // composition (preference ladder (a), SURVEY.md §4.2): union both
  // streams, ONE sort per user, and carry the last non-null order key
  // forward with an ignore-nulls window — O(n log n), no candidate
  // explosion, works at 100 TB. ---
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d).select(
      col("o_custkey").as("uid"), col("o_orderdate").as("t"),
      col("o_orderkey").as("okey"), lit(null).cast("long").as("event_id"))
    val events = Tables.events(s, d).select(
      col("user_id").as("uid"), col("ts").as("t"),
      lit(null).cast("long").as("okey"), col("event_id"))
    // orders sort before events at the same instant (inclusive as-of);
    // okey tiebreaks equal-time orders deterministically
    val w = Window.partitionBy(col("uid"))
      .orderBy(col("t").asc, col("okey").asc_nulls_last, col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_okey", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("event_id").isNotNull)
      .select(col("event_id"), col("uid").as("user_id"),
        col("asof_okey").as("last_order_key"))
      .orderBy("event_id")
  }

  // --- J11: NATIVE as-of join — j6's exact semantics through the
  // rung-(c) custom operator (plans.AsOfJoinPlan → AsOfJoinStrategy →
  // AsOfJoinExec, a one-pass co-partitioned merge; see that file's
  // scaladoc for the plan contract). Same relation, same inclusive
  // at-or-before rule, same max-(time, okey) tie policy, so j6's
  // DuckDB oracle is j11's oracle verbatim — the hash match across
  // two INDEPENDENT formulations (union+window vs merge exec) is the
  // operator's correctness proof, and the spec additionally pins the
  // plan shape (AsOfJoinExec present, no window, SMJ-style exchanges). ---
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    graft.plans.AsOfJoin.asof(
        events, "user_id", "ts",
        orders, "o_custkey", "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("last_order_key"))
      .orderBy("event_id")
  }

  // --- J12: as-of with INTERLEAVED mixed-unit times — the native
  // operator under the regime j11's corpus never exercises: the right
  // side is a dated promotion calendar (DateType, deterministic in the
  // order key: 2023-12-18 + okey mod 50 days) whose dates straddle the
  // January-2024 event stream (TimestampType), so the date→micros lift
  // decides real matches — compared raw, days vs micros would match
  // everything — and the LEFT OUTER null branch fires at corpus scale
  // (an event before its user's first promotion has no match). Same
  // one-pass co-partitioned merge plan as j11. ---
  def asofPromo(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asof(
        events, "user_id", "ts",
        promoCalendar(s, d), "o_custkey", "promo_date", "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("promo_order_key"))
      .orderBy("event_id")
  }

  /** j12's promotion calendar (DateType, 2023-12-18 + okey mod 50 —
    * straddles the January-2024 event stream), shared by the three
    * as-of directions so their results are comparable per event.
    */
  private def promoCalendar(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_custkey"),
      date_add(to_date(lit("2023-12-18")),
        (col("o_orderkey") % 50).cast("int")).as("promo_date"),
      col("o_orderkey"))

  // --- J13: FORWARD as-of — each event matched to the user's EARLIEST
  // promotion at-or-after it ("which offer lands next?", the
  // conversion-attribution mirror image of j11's backward rule). Same
  // native one-pass merge, direction flipped: the match is the merge
  // LOOKAHEAD itself, so forward carries zero held state. Min-okey
  // breaks date ties (the first row in right sort order). Both outer
  // branches fire at corpus scale: events after their user's last
  // promotion get nulls. ---
  def asofForward(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asof(
        events, "user_id", "ts",
        promoCalendar(s, d), "o_custkey", "promo_date", "o_orderkey",
        direction = "forward")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("next_promo_key"))
      .orderBy("event_id")
  }

  // --- J14: NEAREST as-of — each event matched to the promotion
  // CLOSEST in time, either side ("which offer was this user acting
  // on?"). The merge holds the backward candidate and compares it
  // with the forward lookahead in internal micros; equal distances
  // resolve to the backward row (pandas merge_asof convention). The
  // oracle replays both one-sided passes in SQL and re-applies the
  // same distance rule — a genuinely independent formulation. ---
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asof(
        events, "user_id", "ts",
        promoCalendar(s, d), "o_custkey", "promo_date", "o_orderkey",
        direction = "nearest")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("near_promo_key"))
      .orderBy("event_id")
  }

  // --- J15: as-of with TOLERANCE — merge_asof's staleness bound on
  // the native operator: each event matched to the user's latest
  // promotion at-or-before it ONLY if that promotion is at most 7
  // days old ("don't attribute to an offer the user has surely
  // forgotten"). The tolerance is checked inside the same one-pass
  // merge (a per-row long compare, no extra state); events whose
  // latest promo is staler than the bound take the LEFT OUTER null
  // branch, which fires at corpus scale by construction of the
  // calendar. The oracle is an independent bounded-range-join replay
  // (pt ∈ [ts − 7d, ts], max (pt, okey) wins). ---
  def asofTolerance(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val events = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoin.asof(
        events, "user_id", "ts",
        promoCalendar(s, d), "o_custkey", "promo_date", "o_orderkey",
        direction = "backward", tolerance = 7L * 86400L * 1000000L)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("recent_promo_key"))
      .orderBy("event_id")
  }

  // --- D1: DISTINCT (SURVEY.md §2.4 ABSENT row — built-in) ---
  def distinctValues(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderpriority").distinct().orderBy("o_orderpriority")

  // --- S1-S3: set operations (SURVEY.md §2.7) — custkeys ordering in
  // January vs February 2024. ---
  private def custkeysInMonth(s: SparkSession, d: String, m: Int): DataFrame =
    Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === m)
      .select("o_custkey")

  def setUnion(s: SparkSession, d: String): DataFrame =
    custkeysInMonth(s, d, 1).union(custkeysInMonth(s, d, 2))
      .distinct().orderBy("o_custkey")

  def setIntersect(s: SparkSession, d: String): DataFrame =
    custkeysInMonth(s, d, 1).intersect(custkeysInMonth(s, d, 2))
      .orderBy("o_custkey")

  def setExcept(s: SparkSession, d: String): DataFrame =
    custkeysInMonth(s, d, 1).except(custkeysInMonth(s, d, 2))
      .orderBy("o_custkey")

  /** §2.7 MULTISET difference — `exceptAll` keeps multiplicities (a
    * customer with 3 January orders and 1 February order survives
    * twice), the bag semantics s3's set-EXCEPT collapses. Spark plans
    * it as the sum-of-signed-counts generate (no distinct), the same
    * rewrite engines use for EXCEPT ALL; the surviving rows are
    * rolled up per key so the relation hash-compares deterministically.
    */
  def setExceptAll(s: SparkSession, d: String): DataFrame =
    custkeysInMonth(s, d, 1).exceptAll(custkeysInMonth(s, d, 2))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  // --- W1: row_number pagination/top-n-per-group (SURVEY.md §2.6 — the
  // windowed form of O1-O4). Total order inside each partition via the
  // (o_totalprice desc, o_orderkey) tiebreak. ---
  def topNPerGroup(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  // --- W3: running total (SURVEY.md §2.6 extension note — running sales).
  // Unique (l_shipdate, l_orderkey, l_linenumber) order makes the
  // cumulative sum deterministic. ---
  def runningRevenue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") < 3L)
      .withColumn("running_qty", sum(col("l_quantity")).over(w))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("running_qty"))
      .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
  }

  // --- F1-F7: scalar-function suite (SURVEY.md §2.8) — concat, substring,
  // upper/lower, replace, length, round, abs, casts, year/month/day. ---
  def scalarSuite(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_type")).as("type_lower"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        round(col("p_retailprice") * 1.1, 2).as("price_up"),
        abs(col("p_size") - 25).as("size_dist"),
        col("p_size").cast("double").as("size_d"),
        floor(col("p_retailprice")).as("price_floor_l"))
      .orderBy("p_partkey")

  // --- F (array functions, SURVEY.md §2.8 ABSENT row made available):
  // contains / size / sort / join / element access over split arrays. ---
  def arraySuite(s: SparkSession, d: String): DataFrame = {
    val ws = split(col("p_name"), " ")
    Tables.part(s, d)
      .select(col("p_partkey"),
        array_contains(ws, "widget").as("has_widget"),
        size(ws).as("n_words"),
        array_join(sort_array(ws), "|").as("sorted_words"),
        element_at(ws, 1).as("first_word"))
      .orderBy("p_partkey")
  }

  // --- P7/F6: JSON projection (reference: json.loads(information),
  // DatabaseAccessor.py:43 → SURVEY.md §1.4 from_json mapping). The
  // events.props JSON string stands in for movie.information. ---
  def jsonProjection(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") > 50)
      .orderBy("event_id")

  // --- J7: FULL OUTER join — wealthy customers vs. their January-1996
  // order activity; unmatched rows survive on BOTH sides (customers
  // with no January orders, active customers under the balance bar). ---
  def fullOuterActivity(s: SparkSession, d: String,
                        minBal: Double = 5000.0): DataFrame = {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > minBal)
      .select(col("c_custkey"), col("c_acctbal"))
    val jan = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("jan_sales"),
        count(lit(1)).as("n_jan_orders"))
    rich.join(jan, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("jan_sales"),
        coalesce(col("n_jan_orders"), lit(0L)).as("n_jan_orders"))
      .orderBy("custkey")
  }

  // --- J8: explicit CROSS join — the full region x nation grid with a
  // membership flag (the build-a-dense-grid pattern: deliberate
  // cartesian of two TINY dims, never facts). ---
  def crossGrid(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"),
        (col("n_regionkey") === col("r_regionkey")).as("in_region"))
      .orderBy("r_name", "n_name")

  // --- J9: interval-overlap self-join — per-(part, order) shipping
  // windows, pairs of overlapping windows for the same part. The
  // partkey equi-anchor keeps this a hash join with the range test as
  // a post-filter — never a BNLJ; at 100 TB the skew path is bucketing
  // time into coarse epochs and equi-joining on (key, epoch) so one
  // hot key can't concentrate a partition. Windows are aggregated
  // first (one hash agg), so pair identity is the unique
  // (partkey, orderkey) and output order is total. ---
  def intervalOverlapJoin(s: SparkSession, d: String,
                          sampleMod: Long = 200L): DataFrame = {
    val iv = Tables.lineitem(s, d)
      .filter(col("l_partkey") % sampleMod === 0)
      .groupBy(col("l_partkey"), col("l_orderkey"))
      .agg(min(col("l_shipdate")).as("s"),
        max(expr(
          "l_shipdate + make_interval(0, 0, 0, 3 + CAST(l_quantity AS INT) % 14)"))
          .as("e"))
    val a = iv.select(col("l_partkey"), col("l_orderkey").as("okey_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = iv.select(col("l_partkey"), col("l_orderkey").as("okey_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    a.join(b, Seq("l_partkey"))
      .filter(col("okey_a") < col("okey_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select(col("l_partkey"), col("okey_a"), col("okey_b"),
        // date arithmetic (days × 86400), NOT unix_timestamp: the
        // latter converts through spark.sql.session.timeZone, so the
        // result would silently diverge from the oracle's pure
        // date_diff under a DST timezone. The NTZ→date cast is
        // wall-clock-pure, and both interval endpoints are whole-day
        // aligned (shipdate + whole-day extension), so days×86400 is
        // exactly the oracle's date_diff('second', ...).
        (datediff(least(col("e_a"), col("e_b")).cast("date"),
            greatest(col("s_a"), col("s_b")).cast("date")).cast("long")
          * lit(86400L)).as("overlap_secs"))
      .orderBy("l_partkey", "okey_a", "okey_b")
  }

  // --- J10: POINT-IN-TIME join — the feature-store lookup that keeps
  // training data leakage-free: each purchase event is joined to the
  // dimension version that was valid AT the purchase's event time
  // ("as of the event", never "as of now"). The dimension is the SCD2
  // interval relation st7 builds, here derived from the user's
  // NON-purchase activity (state = latest browsing/error/… type), so
  // the lookup answers "what state was this user in when they
  // bought". Mechanics: change rows → [ts, next-change-ts) half-open
  // intervals (lead over the change rows, st7's chain); the join is
  // an equi-join on user_id with the containment predicate as a
  // post-join filter — at scale a sort-merge join per user whose
  // per-key interval list is the user's change count, never a cross
  // product. Intervals partition each user's timeline (zero-width
  // flips match nothing by half-openness), so every fact matches at
  // most one version; purchases before any activity keep a NULL
  // state — exactly the leakage-safe answer. ---
  def pointInTimeJoin(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = Tables.events(s, d)
      .filter(col("event_type") =!= "purchase")
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("event_type") =!= col("prev_type"))
    val dims = changes
      .withColumn("vt", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("vf"), col("vt"))
    val facts = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    facts.join(dims,
        facts("user_id") === dims("user_id") &&
          facts("ts") >= dims("vf") &&
          (dims("vt").isNull || facts("ts") < dims("vt")),
        "left_outer")
      .select(facts("event_id"), facts("user_id"),
        date_format(facts("ts"), "yyyy-MM-dd HH:mm:ss")
          .as("purchase_time"),
        col("state").as("state_at_purchase"))
      .orderBy("event_id")
  }
}
