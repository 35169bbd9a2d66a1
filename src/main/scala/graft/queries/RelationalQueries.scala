package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Relational query surface (SURVEY.md §2.5): the reference's QueryRecord
  * operator exposes arbitrary Calcite SQL over the record set
  * (56409-tika.xml:1846-1860); our engine exposes full Spark SQL — these
  * queries exercise scan/filter/project/aggregate/join/window/sort/limit
  * against the synthetic TPC-H-ish tables.
  *
  * Oracle-stability rules used throughout graft.queries:
  *  - the synthetic money columns are exact cents and discounts exact
  *    hundredths (verified), so each base column is cast to
  *    DecimalType(18,2) FIRST and all arithmetic runs in decimal —
  *    Spark and DuckDB then agree bit-for-bit regardless of summation
  *    order (a double product cast to decimal would tie-break
  *    differently at dyadic .xx5 values);
  *  - TERMINAL decimal columns are cast back to DOUBLE on BOTH engines:
  *    the driver hashes each engine's native output, and Spark's
  *    DECIMAL(18,2) rendering differs from DuckDB's (round-1 lesson —
  *    all 9 hash failures were decimal-output queries). The decimal
  *    value is exact, and decimal→double conversion is correctly
  *    rounded IEEE in both engines, so the doubles are bit-identical.
  *    (round() on doubles would NOT be safe: half-up vs binary
  *    tie-breaking differs across engines.)
  *  - every result has a deterministic total ORDER BY.
  */
object RelationalQueries {
  private val dec = DecimalType(18, 2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing-summary aggregate (TPC-H Q1 shape) — partial aggregation
    // map-side, single shuffle on the two low-cardinality grouping keys.
    "q_agg_pricing" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" < lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(dec)).cast("double").as("sum_base_price"),
          sum($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Revenue by nation: two joins; nation/region are tiny → broadcast.
    "q_join_revenue_by_nation" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy($"n_name")
    }),

    // Top-k per group via window row_number (no global sort).
    "q_window_topk_orders" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    }),

    // RANGE frame (value-based window bounds, vs the ROWS frames used
    // elsewhere): each order aggregates its customer's orders within
    // ±3 DAYS — the frame widens/narrows with the data, one shuffle on
    // the partition key, decimal sum inside the frame (order-free)
    "q_window_range_orders" -> ((s, d) => {
      import s.implicits._
      // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the cast a
      // same-instant reinterpretation, matching DuckDB's naive epoch_us
      val od = expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      val w = Window.partitionBy($"o_custkey").orderBy(od)
        .rangeBetween(-3L, 3L)
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", od.as("od"),
          count(lit(1)).over(w).as("n_near"),
          sum($"o_totalprice".cast(dec)).over(w).cast("double").as("near_total"))
        .orderBy($"o_orderkey")
    }),

    // Filter + projection pushed to parquet scan; global sort + limit.
    "q_filter_topn" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderstatus" === "O" && $"o_totalprice" > 100000.0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    }),

    // Existence / anti joins (left_semi + left_anti).
    "q_semi_customers_with_urgent" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),
    "q_anti_customers_no_orders" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Set operation + distinct.
    "q_union_keys" -> ((s, d) => {
      import s.implicits._
      val a = Tables.orders(s, d).filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
      val b = Tables.customer(s, d).filter($"c_acctbal" < 0).select($"c_custkey".as("k"))
      a.union(b).distinct().orderBy($"k")
    }),

    // JsonTreeReader analogue: from_json over the events props column,
    // then aggregate the parsed field (QueryRecord's record-reader path).
    "q_events_json_props" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("rec", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy($"event_type")
        .agg(sum($"rec.k").cast("long").as("sum_k"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // ROLLUP grouping sets (subtotals + grand total).
    "q_rollup_lineitem" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast(dec)).cast("double").as("qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // PIVOT: wide per-user counts of the 5 event types — one shuffle,
    // pivot columns resolved from an explicit value list (no extra
    // distinct-scan job, the form that scales: an unlisted pivot first
    // collects the key domain to the driver).
    "q_pivot_events" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    }),

    // CUBE grouping sets: all four (lang, source) marginal combinations
    // in one pass — partial aggregation expands grouping sets map-side,
    // one shuffle on the expanded keys.
    "q_cube_docs" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .cube($"lang", $"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("chars"))
        .orderBy($"lang".asc_nulls_first, $"source".asc_nulls_first)
    }),

    // explicit GROUPING SETS (the general form under ROLLUP/CUBE):
    // per-lang and per-source marginals plus the grand total in ONE
    // pass — the Expand operator replicates rows map-side, still a
    // single shuffle on the expanded keys (no per-set re-scan).
    "q_grouping_sets" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupingSets(Seq(Seq($"lang"), Seq($"source"), Seq()),
          $"lang", $"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("chars"))
        .orderBy($"lang".asc_nulls_first, $"source".asc_nulls_first)
    }),

    // UNPIVOT: wide per-source metrics → long (metric, value) rows —
    // a narrow projection+expand, no shuffle beyond the source agg.
    "q_unpivot_stats" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          countDistinct($"lang").as("n_langs"))
        .unpivot(Array(col("source")),
          Array(col("n_docs"), col("total_chars"), col("n_langs")),
          "metric", "value")
        .orderBy($"source", $"metric")
    }),

    // Correlated scalar subquery, through the spark.sql text path.
    "q_corr_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT max(o_totalprice)
          |   FROM orders_v WHERE o_custkey = c_custkey) AS max_order
          |FROM customer_v ORDER BY c_custkey""".stripMargin)
    }),

    // Set intersection: customers that are both F-status orderers and
    // negative-balance (INTERSECT distinct semantics).
    "q_intersect_keys" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
        .intersect(Tables.customer(s, d).filter($"c_acctbal" < 0).select($"c_custkey".as("k")))
        .orderBy($"k")
    }),

    // LAG/LEAD analytic windows: per-user gap to the previous event and
    // the next event's type — one shuffle on the partition key, the
    // window evaluates in a single per-partition sort pass.
    "q_lag_lead_events" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"event_id", expr("ts div 1000").as("tus"), $"event_type")
        .withColumn("prev_gap_us", $"tus" - lag($"tus", 1).over(w))
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .orderBy($"user_id", $"tus", $"event_id")
    }),

    // Weekly retention cohorts: users grouped by signup week, each
    // cohort's share still active at week offsets 0..n — the classic
    // engagement matrix. Cohorts and activity are narrow (user, week)
    // relations; the matrix aggregate is bounded by weeks², and the
    // single ratio goes through the floor contract.
    "q_retention_cohorts" -> ((s, d) => {
      import s.implicits._
      val wk = 604800000000L // µs per week
      val e = Tables.events(s, d)
        .select($"user_id", expr("ts div 1000").as("tus"), $"event_type")
      val cohorts = e.filter($"event_type" === "signup")
        .groupBy($"user_id")
        .agg(expr(s"min(tus) div $wk").as("cohort_wk"))
      val active = e.select($"user_id",
        expr(s"tus div $wk").as("act_wk")).distinct()
      val cohortSize = cohorts.groupBy($"cohort_wk")
        .agg(count(lit(1)).as("n_cohort"))
      cohorts.join(active, Seq("user_id"))
        .filter($"act_wk" >= $"cohort_wk")
        .groupBy($"cohort_wk", ($"act_wk" - $"cohort_wk").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_active"))
        .join(broadcast(cohortSize), Seq("cohort_wk"))
        .select($"cohort_wk", $"week_offset", $"n_active", $"n_cohort",
          (floor($"n_active".cast("double") / $"n_cohort" * 1e4 + 0.5) / 1e4)
            .as("retention"))
        .orderBy($"cohort_wk", $"week_offset")
    }),

    // Burst detection over the hourly event-rate series: a window is a
    // burst when its count exceeds mean + 2σ for its type. Counts,
    // Σc, and Σc² are integers, so mean/σ derive identically on both
    // engines; the per-window series is bounded (~720 windows/type a
    // month), never corpus-sized.
    "q_burst_detect" -> ((s, d) => {
      import s.implicits._
      val hr = 3600000000L
      val wc = Tables.events(s, d)
        .select($"event_type", expr("(ts div 1000) div 3600000000").as("w"))
        .groupBy($"event_type", $"w").agg(count(lit(1)).as("c"))
      val stats = wc.groupBy($"event_type")
        .agg(count(lit(1)).as("nw"), sum($"c").as("sc"),
          sum($"c" * $"c").as("sc2"))
        .select($"event_type",
          ($"sc".cast("double") / $"nw").as("mean"),
          sqrt(($"nw".cast("double") * $"sc2" - $"sc".cast("double") * $"sc")
            / ($"nw".cast("double") * $"nw")).as("sd"))
      wc.join(broadcast(stats), Seq("event_type"))
        .select($"event_type", ($"w" * hr).as("window_start_us"), $"c",
          (floor($"mean" * 1e4 + 0.5) / 1e4).as("mean4"),
          (floor($"sd" * 1e4 + 0.5) / 1e4).as("sd4"),
          ($"c" > $"mean" + lit(2.0) * $"sd").as("is_burst"))
        .orderBy($"event_type", $"window_start_us")
    }),

    // Stage-ordered funnel conversion (signup → view → click →
    // purchase): one typed per-user walk in (tus, event_id) order —
    // single shuffle on user_id, no chained per-stage joins; the
    // oracle is the equivalent staged-min SQL (each stage = earliest
    // event of its type strictly after the previous stage's time).
    "q_funnel_steps" -> ((s, d) => {
      import graft.streaming.StreamPipeline
      val src = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .as[StreamPipeline.TypedEvent](StreamPipeline.typedEventEnc)
      StreamPipeline.funnelStages(src).toDF().orderBy(col("user_id"))
    }),

    // Incremental aggregate maintenance — the materialized-view merge
    // pattern: yesterday's per-type rollup (event_id % 10 != 0) and
    // today's delta (% 10 = 0) aggregate SEPARATELY and merge by key
    // (counts add, decimal sums add, min/max fold through a full-outer
    // join) — at 100 TB this is how a running rollup absorbs a new
    // partition without rescanning history. The oracle recomputes the
    // whole aggregate from scratch: merge path and recompute path must
    // agree to the bit (decimal addition is exact, so they do).
    "q_incr_agg_merge" -> ((s, d) => {
      import s.implicits._
      def slice(p: org.apache.spark.sql.Column) =
        Tables.events(s, d).filter(p)
          .select($"event_type", expr("ts div 1000").as("tus"),
            $"value".cast("decimal(18,2)").as("v"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"v").as("tv"),
            min($"tus").as("first_us"), max($"tus").as("last_us"))
      val base = slice($"event_id" % 10 =!= 0)
      val delta = slice($"event_id" % 10 === 0)
      base.as("a").join(delta.as("b"),
          $"a.event_type" === $"b.event_type", "full_outer")
        .select(
          coalesce($"a.event_type", $"b.event_type").as("event_type"),
          (coalesce($"a.n", lit(0L)) + coalesce($"b.n", lit(0L))).as("n"),
          (coalesce($"a.tv", lit(0).cast("decimal(18,2)")) +
            coalesce($"b.tv", lit(0).cast("decimal(18,2)")))
            .cast("double").as("total_value"),
          least($"a.first_us", $"b.first_us").as("first_us"),
          greatest($"a.last_us", $"b.last_us").as("last_us"))
        .orderBy($"event_type")
    }),

    // SCD type-2 history: per-user event_type CHANGE rows become
    // versioned validity intervals [valid_from, valid_to) with an
    // is_current flag — the slowly-changing-dimension shape every
    // warehouse upsert pipeline materializes. One shuffle on user_id;
    // the lag (change detection), row_number (version), and lead
    // (interval close) all share the (user_id / tus, event_id) window
    // spec, so Catalyst evaluates them in a single sort pass.
    "q_scd2" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus".asc, $"event_id".asc)
      val changes = Tables.events(s, d)
        .select($"user_id", $"event_id", expr("ts div 1000").as("tus"),
          $"event_type")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead($"tus", 1).over(w))
        .select($"user_id", $"version", $"event_type",
          $"tus".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"))
        .orderBy($"user_id", $"version")
    }),

    // Set difference: parts never ordered (EXCEPT).
    "q_except_unordered_parts" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d).select($"p_partkey".as("k"))
        .except(Tables.lineitem(s, d).select($"l_partkey".as("k")))
        .orderBy($"k")
    }),

    // Left outer join: customers keep rows with zero orders.
    "q_left_outer_order_counts" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d).join(Tables.orders(s, d),
          $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    }),

    // Full outer join over two aggregates (null-padded sides).
    "q_full_outer_nation_counts" -> ((s, d) => {
      import s.implicits._
      val sn = Tables.supplier(s, d).groupBy($"s_nationkey".as("k"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cn = Tables.customer(s, d).groupBy($"c_nationkey".as("k"))
        .agg(count(lit(1)).as("n_customers"))
      sn.join(cn, Seq("k"), "full_outer")
        .select(col("k"), col("n_suppliers"), col("n_customers"))
        .orderBy(col("k"))
    }),

    // Grouped aggregate over events with time bucketing (micro-batch shape).
    "q_events_by_type" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum($"value".cast(dec)).cast("double").as("total_value"),
             countDistinct($"user_id").as("n_users"))
        .orderBy($"event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_revenue_by_nation" ->
      """SELECT n_name,
        |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_topk_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, cast(rn AS INT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_filter_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_semi_customers_with_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_union_keys" ->
      """SELECT DISTINCT k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |) ORDER BY k""".stripMargin,
    "q_events_json_props" ->
      """SELECT event_type,
        |  cast(sum(cast(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // conditional-aggregation mirror of the pivot
    "q_pivot_events" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click')    AS click,
        |  count(*) FILTER (event_type = 'error')    AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup')   AS signup,
        |  count(*) FILTER (event_type = 'view')     AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_rollup_lineitem" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube_docs" ->
      """SELECT lang, source, count(*) AS n, cast(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT lang, source, count(*) AS n, cast(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q_window_range_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_us(o_orderdate) // 86400000000 AS od,
        |  count(*) OVER w AS n_near,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS near_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY epoch_us(o_orderdate) // 86400000000
        |             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    // UNION ALL mirror of the unpivot
    "q_unpivot_stats" ->
      """WITH w AS (SELECT source, count(*) AS n_docs,
        |             cast(sum(n_chars) AS BIGINT) AS total_chars,
        |             count(DISTINCT lang) AS n_langs
        |           FROM documents GROUP BY 1)
        |SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
        |UNION ALL SELECT source, 'n_langs', n_langs FROM w
        |UNION ALL SELECT source, 'total_chars', total_chars FROM w
        |ORDER BY source, metric""".stripMargin,
    "q_corr_subquery" ->
      """SELECT c_custkey,
        |  (SELECT max(o_totalprice)
        |   FROM orders WHERE o_custkey = c_custkey) AS max_order
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_intersect_keys" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0 ORDER BY k""".stripMargin,
    "q_lag_lead_events" ->
      """SELECT user_id, event_id, tus,  event_type,
        |  tus - lag(tus, 1) OVER w AS prev_gap_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus, event_type
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus ASC, event_id ASC)
        |ORDER BY user_id, tus, event_id""".stripMargin,
    "q_retention_cohorts" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_type
        |           FROM events),
        |cohorts AS (SELECT user_id, min(tus) // 604800000000 AS cohort_wk
        |            FROM e WHERE event_type = 'signup' GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, tus // 604800000000 AS act_wk
        |           FROM e),
        |sz AS (SELECT cohort_wk, count(*) AS n_cohort FROM cohorts GROUP BY 1),
        |m AS (SELECT cohort_wk, act_wk - cohort_wk AS week_offset,
        |        count(DISTINCT c.user_id) AS n_active
        |      FROM cohorts c JOIN active a USING (user_id)
        |      WHERE act_wk >= cohort_wk GROUP BY 1, 2)
        |SELECT cohort_wk, week_offset, n_active, n_cohort,
        |  floor(CAST(n_active AS DOUBLE) / n_cohort * 1e4 + 0.5) / 1e4
        |    AS retention
        |FROM m JOIN sz USING (cohort_wk)
        |ORDER BY cohort_wk, week_offset""".stripMargin,
    "q_burst_detect" ->
      """WITH wc AS (SELECT event_type, (epoch_ns(ts) // 1000) // 3600000000 AS w,
        |              count(*) AS c
        |            FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS nw, CAST(sum(c) AS BIGINT) AS sc,
        |         CAST(sum(c * c) AS BIGINT) AS sc2
        |       FROM wc GROUP BY 1),
        |sd AS (SELECT event_type,
        |         CAST(sc AS DOUBLE) / nw AS mean,
        |         sqrt((CAST(nw AS DOUBLE) * sc2 - CAST(sc AS DOUBLE) * sc)
        |              / (CAST(nw AS DOUBLE) * nw)) AS sd
        |       FROM st)
        |SELECT event_type, w * 3600000000 AS window_start_us, c,
        |  floor(mean * 1e4 + 0.5) / 1e4 AS mean4,
        |  floor(sd * 1e4 + 0.5) / 1e4 AS sd4,
        |  (c > mean + 2.0 * sd) AS is_burst
        |FROM wc JOIN sd USING (event_type)
        |ORDER BY event_type, window_start_us""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
        |             event_type
        |           FROM events),
        |u AS (SELECT user_id, min(tus) AS s1 FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |v AS (SELECT e.user_id, min(tus) AS s2 FROM e JOIN u USING (user_id)
        |      WHERE event_type = 'view' AND tus > s1 GROUP BY 1),
        |c AS (SELECT e.user_id, min(tus) AS s3 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND tus > s2 GROUP BY 1),
        |p AS (SELECT e.user_id, min(tus) AS s4 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND tus > s3 GROUP BY 1)
        |SELECT u.user_id, s1, s2, s3, s4,
        |  CAST(1 + CAST(s2 IS NOT NULL AS INT) + CAST(s3 IS NOT NULL AS INT)
        |         + CAST(s4 IS NOT NULL AS INT) AS INT) AS stage_reached
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // the oracle is the from-scratch recompute the merge must equal
    "q_incr_agg_merge" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  min(epoch_ns(ts) // 1000) AS first_us,
        |  max(epoch_ns(ts) // 1000) AS last_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
        |             event_type
        |           FROM events),
        |ch AS (SELECT *, lag(event_type, 1) OVER (PARTITION BY user_id
        |         ORDER BY tus ASC, event_id ASC) AS prev_type FROM e),
        |c2 AS (SELECT user_id, event_id, tus, event_type FROM ch
        |       WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
        |  event_type, tus AS valid_from, lead(tus, 1) OVER w AS valid_to,
        |  (lead(tus, 1) OVER w IS NULL) AS is_current
        |FROM c2 WINDOW w AS (PARTITION BY user_id ORDER BY tus ASC, event_id ASC)
        |ORDER BY user_id, version""".stripMargin,
    "q_except_unordered_parts" ->
      """SELECT p_partkey AS k FROM part
        |EXCEPT SELECT l_partkey AS k FROM lineitem ORDER BY k""".stripMargin,
    "q_left_outer_order_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_full_outer_nation_counts" ->
      """SELECT coalesce(sn.k, cn.k) AS k, sn.n_suppliers, cn.n_customers
        |FROM (SELECT s_nationkey AS k, count(*) AS n_suppliers FROM supplier GROUP BY 1) sn
        |FULL JOIN (SELECT c_nationkey AS k, count(*) AS n_customers FROM customer GROUP BY 1) cn
        |  ON sn.k = cn.k
        |ORDER BY k""".stripMargin,
    "q_events_by_type" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
