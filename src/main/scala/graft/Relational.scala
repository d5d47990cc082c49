package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard relational surface (SURVEY.md §2.6): scans, projections,
  * filters, joins (broadcast + shuffle), aggregations, window functions,
  * sorts/top-k, set ops — expressed declaratively so Catalyst handles
  * pushdown, pruning and join strategy.
  *
  * Oracle-parity conventions (applied on BOTH the Spark and DuckDB side):
  *  - money/quantity sums use fixed-point integer arithmetic
  *    (`round(x·10^k)` per row, summed as BIGINT) — double summation order
  *    differs between engines and across parallelism levels, so plain
  *    `sum(double)` is not reproducible at scale;
  *  - dates emitted as 'yyyy-MM-dd' strings;
  *  - every query deterministically ordered, with unique tiebreaks.
  */
object Relational {

  /** Fixed-point encode: x → round(x·10^scale) as i64 (exact, associative,
    * order-independent — safe under any partial-aggregation schedule). */
  private def fx(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale).toLong).cast("long")

  /** Sum in fixed-point, present as double with 4-decimal rounding. */
  private def sumFx(c: Column, scale: Int): Column =
    round(sum(fx(c, scale)) / math.pow(10, scale), 4)

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> q1Agg _,
    "q2_join_nation"    -> q2JoinNation _,
    "q3_topk_orders"    -> q3TopkOrders _,
    "q4_semi_join"      -> q4SemiJoin _,
    "q5_anti_join"      -> q5AntiJoin _,
    "q6_window_topn"    -> q6WindowTopn _,
    "q7_running_sum"    -> q7RunningSum _,
    "q8_lag_delta"      -> q8LagDelta _,
    "q9_set_ops"        -> q9SetOps _,
    "q10_distinct_agg"  -> q10DistinctAgg _,
    "q11_cond_agg"      -> q11CondAgg _,
    "q12_string_funcs"  -> q12StringFuncs _,
    "q13_rollup"        -> q13Rollup _,
    "q14_date_funcs"    -> q14DateFuncs _,
    "q15_having"        -> q15Having _,
    "q16_scalar_subq"   -> q16ScalarSubq _,
    "q17_in_subq"       -> q17InSubq _,
    "q18_cube"          -> q18Cube _,
    "q19_percentile"    -> q19Percentile _,
    "q20_pivot"         -> q20Pivot _,
    "q21_range_window"  -> q21RangeWindow _,
    "q22_json"          -> q22Json _,
    "q23_lateral"       -> q23Lateral _,
    "q24_session_window" -> q24SessionWindow _,
    "q25_funnel"        -> q25Funnel _,
    "q26_streaks"       -> q26Streaks _,
    "q27_full_outer"    -> q27FullOuter _,
    "q28_grouping_sets" -> q28GroupingSets _,
    "q29_set_ops_all"   -> q29SetOpsAll _,
    "q30_bloom_join"    -> q30BloomJoin _,
    "q31_zorder_layout" -> q31ZorderLayout _,
    "q32_attribution"   -> q32Attribution _,
    "q33_skew_salted"   -> q33SkewSalted _,
    "q34_partition_prune" -> q34PartitionPrune _
  )

  /** Once-per-corpus hive-partitioned materialization of the events
    * table (`partitionBy(event_type)`) under the JVM temp dir — the
    * layout a 100 TB warehouse actually stores hot dimensions in.
    * Signature-keyed like the WARC file fixture, so a driver-side
    * testdata regeneration invalidates it; the write runs through
    * Spark's own partitioned writer (executor-side, one directory per
    * type). */
  private def partitionedEventsDir(s: SparkSession, dir: String): String = {
    def sig(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(sig).sum
      else f.length() + f.lastModified()
    val ident = s"$dir:${sig(new java.io.File(s"$dir/events.parquet"))}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_evpart_$key")
    val marker = new java.io.File(root, "_GRAFT_READY")
    if (!marker.exists()) Relational.synchronized {
      if (!marker.exists()) {
        Tables.events(s, dir).write.mode("overwrite")
          .partitionBy("event_type").parquet(root.getAbsolutePath)
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
    }
    root.getAbsolutePath
  }

  /** Partition pruning — THE 100 TB scan lever, exercised on a real
    * hive-partitioned layout instead of asserted in prose: a
    * one-type question answered through the partitioned dataset must
    * plan a `PartitionFilters` entry and list ONE directory of five
    * (the plan audit pins it); the oracle answers the same question
    * off the flat table, proving the layout is transparent to
    * results. */
  private def q34PartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val p = partitionedEventsDir(s, dir)
    s.read.parquet(p)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .selectExpr("n_events", "n_users", "sum_cents")
  }

  /** Correlated LATERAL join: top-2 customers by balance PER NATION as
    * a lateral subquery with ORDER BY + LIMIT — the "for each row of
    * the left, run this parameterized query" shape. Catalyst
    * DECORRELATES it (DecorrelateInnerQuery rewrites the per-row limit
    * into a rank window over one join), so the plan is one shuffle on
    * the correlation key — not nation-count sequential scans, which is
    * what a literal reading would execute at 100 TB. */
  private def q23Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT n.n_name, t.c_name,
        |  round(CAST(round(t.c_acctbal * 100) AS BIGINT) / 100.0D, 2)
        |    AS bal
        |FROM nation_v n JOIN LATERAL (
        |  SELECT c_name, c_acctbal
        |  FROM customer_v c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, bal DESC, c_name""".stripMargin)
  }

  /** Native event-time SESSION windows (5-minute inactivity gap) per
    * user — Spark's `session_window` grouping, where the window widens
    * with each in-gap event. Bounds exposed as epoch-µs integers (the
    * engines' timestamp types differ on this nanosecond corpus). The
    * oracle derives the identical sessions by gaps-and-islands (lag +
    * running break sum); the break rule is `>= gap` because Spark
    * merges only on STRICT window overlap. One shuffle on user_id;
    * session state is gap-bounded — the same property the streaming
    * clusterer leans on. */
  private def q24SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("tsx"))
      .groupBy(col("user_id"),
        expr("session_window(tsx, '5 minutes')").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .selectExpr("user_id", "unix_micros(sw.start) AS session_start",
        "unix_micros(sw.end) AS session_end", "n_events")
      .orderBy("user_id", "session_start")

  /** Staged conversion funnel (view → click → purchase, each stage
    * strictly after the user's previous-stage time) — the sequential
    * event-pattern aggregate of product analytics, expressed as chained
    * min-time reductions rather than per-user event replays: stage N is
    * a filter + join-to-stage-(N−1) + min, so per-user state is one
    * timestamp, never the event list. Three shuffles, all on user_id —
    * one co-partitioned key end to end. The 3-row readout assembles from
    * single-row count aggregates (broadcast scalars). */
  private def q25Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .selectExpr("user_id", "event_type", "ts div 1000 AS us")
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).where(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).where(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    val n1 = s1.agg(count(lit(1)).as("u1"))
    val n2 = s2.agg(count(lit(1)).as("u2"))
    val n3 = s3.agg(count(lit(1)).as("u3"))
    n1.crossJoin(n2).crossJoin(n3).selectExpr(
      "stack(3, " +
        "'1_view', u1, CAST(NULL AS DOUBLE), " +
        "'2_click', u2, round(u2 / CAST(u1 AS DOUBLE), 4), " +
        "'3_purchase', u3, round(u3 / CAST(u2 AS DOUBLE), 4)) " +
        "AS (stage, users, conv)")
      .orderBy("stage")
  }

  /** Gaps-and-islands: each user's longest run of consecutive
    * same-type events (the row_number-difference island id — the
    * classic streak idiom), tie-broken by earliest start then type.
    * One shuffle on user_id; every window is user-partitioned, so
    * parallelism is user-cardinality and no global sort exists. The
    * order key includes event_id because timestamps alone are not
    * unique per user. */
  private def q26Streaks(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .selectExpr("user_id", "event_type", "ts div 1000 AS us", "event_id")
    val wAll = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wTyp = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    val isl = e
      .withColumn("grp",
        row_number().over(wAll) - row_number().over(wTyp))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(count(lit(1)).as("streak"), min("us").as("start_us"))
    isl.withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(desc("streak"), asc("start_us"), asc("event_type"))))
      .where("rk = 1")
      .select("user_id", "event_type", "streak", "start_us")
      .orderBy("user_id")
  }

  /** FULL OUTER join — the reconciliation shape (which nations have
    * deep-debt customers but no deep-debt suppliers, and vice versa?):
    * both inputs pre-aggregate to nation cardinality before the join,
    * so the full-outer operates on two dimension-sized tables (at any
    * corpus scale), with unmatched rows surviving from BOTH sides and
    * a presence tag making the outer semantics observable. Thresholds
    * chosen so sf0.01 produces customer-only AND supplier-only rows. */
  private def q27FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).where("c_acctbal < -800")
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("cust_debt"))
    val sp = Tables.supplier(s, dir).where("s_acctbal < -600")
      .groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("supp_debt"))
    c.join(sp, Seq("nk"), "full_outer")
      .selectExpr("nk AS nationkey",
        "coalesce(cust_debt, CAST(0 AS BIGINT)) AS cust_debt",
        "coalesce(supp_debt, CAST(0 AS BIGINT)) AS supp_debt",
        "CASE WHEN cust_debt IS NULL THEN 'supplier_only' " +
          "WHEN supp_debt IS NULL THEN 'customer_only' " +
          "ELSE 'both' END AS presence")
      .orderBy("nationkey")
  }

  /** Explicit GROUPING SETS — the irregular grouping-set list neither
    * ROLLUP (q13) nor CUBE (q18) can express: per-status totals,
    * per-priority totals, and the grand total, WITHOUT the (status,
    * priority) cross detail. One aggregation pass (Catalyst expands the
    * sets into a single Expand + hash aggregate, not one scan per
    * set). */
  private def q28GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0D, 2)
        |    AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL, the
    * duplicate-preserving variants q9's distinct set ops can't express:
    * comparing supplier DELIVERY WORKLOADS (one row per lineitem, so a
    * supplier appearing 5× in one half and 3× in the other contributes
    * min(5,3) to the intersection and 2 to the difference — counts, not
    * membership). Both engines implement SQL bag semantics. */
  private def q29SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val h1 = l.where(col("l_shipdate") < "1998-07-01").select("l_suppkey")
    val h2 = l.where(col("l_shipdate") >= "1998-07-01").select("l_suppkey")
    h1.intersectAll(h2).groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_common"))
      .join(h1.exceptAll(h2).groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_only_early")), Seq("l_suppkey"), "full_outer")
      .selectExpr("l_suppkey",
        "coalesce(n_common, CAST(0 AS BIGINT)) AS n_common",
        "coalesce(n_only_early, CAST(0 AS BIGINT)) AS n_only_early")
      .orderBy("l_suppkey")
  }

  /** The manual runtime-Bloom join ([[graft.operators.BloomPrune]]):
    * lineitem joined to the URGENT slice of orders, with the fact side
    * pruned by the build side's 1 KiB Bloom bitset BEFORE the orderkey
    * shuffle. At 100 TB neither side broadcasts — the bitset rides a
    * broadcast scalar while the join itself shuffles only (matches +
    * measured ~0.1% false positives) instead of the whole fact table.
    * The filter is semantically transparent (the inner join removes
    * false positives), so the oracle is the PLAIN join — the pruning is
    * proven by BloomPruneSpec (superset + measured FP rate vs the
    * (1−e^{−kn/m})^k analytic) and the plan audit. */
  private def q30BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val fact = graft.operators.BloomPrune.pruned(
      Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag",
        "l_quantity"),
      "l_orderkey", urgent, "o_orderkey")
    fact.join(urgent, fact("l_orderkey") === urgent("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
      .orderBy("l_returnflag")
  }

  /** Z-order layout readout ([[graft.operators.ZOrder]]): lineitem
    * clustered into 16 Morton-key buckets of (l_partkey, l_suppkey) and
    * reduced to the per-bucket min/max footer stats a clustered writer
    * would produce — the observable artifact of the layout. The key is
    * a pure map-pass bit interleave; the only shuffle is the 16-key
    * stats aggregation with map-side combine. ZOrderSpec measures the
    * point of it: under this layout BOTH dimensions' per-bucket spans
    * are tight, vs the insertion-order layout where one dimension spans
    * the full domain in every bucket. */
  private def q31ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val zed = Tables.lineitem(s, dir)
      .selectExpr("l_orderkey", "l_linenumber",
        "l_partkey % 65536 AS x", "l_suppkey % 65536 AS y")
      .selectExpr("l_orderkey", "l_linenumber", "x", "y",
        s"(${graft.operators.ZOrder.zKeySql("x", "y")}) AS z")
    // 16 equal-frequency z-buckets — the deterministic, oracle-able
    // stand-in for repartitionByRange(16, $"z") + sortWithinPartitions,
    // which is how a writer lays the files out at 100 TB (sampled range
    // bounds instead of this bench-scale global ntile); the unique
    // (z, orderkey, linenumber) order makes tie assignment
    // engine-identical
    zed.withColumn("bucket", ntile(16).over(
        Window.orderBy("z", "l_orderkey", "l_linenumber")).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("bucket")
  }

  /** Conversion attribution — the marketing-analytics windowed idiom:
    * each purchase is attributed to the user's FIRST preceding view
    * (first-touch) and the MOST RECENT preceding view (last-touch) by
    * IGNORE-NULLS carry-forward windows over the (ts, event_id)-pinned
    * per-user order; purchases with no preceding view attribute to −1.
    * One user-keyed window shuffle — the sessionize partitioning — and
    * both engines run the identical ignore-nulls frame. */
  /** Salted skew join, oracle-proven transparent: `event_type` carries
    * 1/5 of the fact table per key — the classic hot-key shape that
    * sends a whole key to one task in a plain shuffle join. The fact
    * side joins the per-type aggregate (the aggregate-then-join
    * pipeline where AQE's runtime skew splitting does not apply: the
    * dimension is derived, not scanned), salted 8 ways on the
    * `event_id` discriminator via [[operators.SkewJoin.saltedJoin]].
    * Salting is an equality-preserving refinement, so the oracle is
    * the UNsalted join — the gate proves the rewrite changes the
    * partitioning, never the rows. At 100 TB the dimension is
    * key-cardinality-sized (not broadcastable) and each hot key's
    * billions of fact rows spread across `salts` tasks. */
  private def q33SkewSalted(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).selectExpr("event_id", "event_type",
      "CAST(round(value * 100) AS BIGINT) AS value_c")
    val dim = ev.groupBy("event_type").agg(
      count(lit(1)).as("n_type"), sum("value_c").as("sv"))
    operators.SkewJoin.saltedJoin(ev, dim, "event_type", col("event_id"), 8)
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(when(col("value_c") * col("n_type") > col("sv"), 1L)
          .otherwise(0L)).as("n_above"))
      .orderBy("event_type")
  }

  private def q32Attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("first_touch", first(
        when(col("event_type") === "view", col("event_id")), true).over(w))
      .withColumn("last_touch", last(
        when(col("event_type") === "view", col("event_id")), true).over(w))
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id AS purchase_id",
        "coalesce(first_touch, CAST(-1 AS BIGINT)) AS first_touch",
        "coalesce(last_touch, CAST(-1 AS BIGINT)) AS last_touch")
      .orderBy("user_id", "purchase_id")
  }

  /** Value-based RANGE frame (vs q7's ROWS frame): per-station rolling
    * 10-minute event count + fixed-point value sum over the nanosecond
    * event-time axis — the telemetry "rate over trailing window" shape
    * where the frame is TIME, not row count, so bursts and gaps weigh
    * correctly. One shuffle on the station key; the frame scan is a
    * per-partition two-pointer pass, never quadratic. */
  private def q21RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val tenMinNs = 600000000000L
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(-tenMinNs, 0L)
    Tables.events(s, dir)
      // µs-truncate: DuckDB reads the ns parquet as µs TIMESTAMP
      .select(col("user_id"), col("event_id"),
        (expr("ts div 1000") * 1000).as("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v100"))
      .withColumn("cnt_10m", count(lit(1)).over(w))
      .withColumn("sum_10m", round(sum("v100").over(w) / 100.0, 4))
      .select("user_id", "event_id", "ts", "cnt_10m", "sum_10m")
      .orderBy("user_id", "ts", "event_id")
  }

  /** JSON property extraction — the semi-structured column every event
    * pipeline carries: `props` is a JSON document per row;
    * get_json_object pulls the typed field inside the scan stage
    * (codegen'd built-in, no UDF) and only the small grouped aggregate
    * shuffles. At 100 TB the parse is per-row map work at scan speed. */
  private def q22Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .selectExpr("event_type",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Pivot (long → wide): order counts by priority with one column per
    * order status. The status domain is declared (`pivot(col, values)`),
    * so Spark skips the extra distinct-values job and the plan is a
    * single grouped conditional aggregation — exactly how the DuckDB
    * oracle (FILTER clauses) states it. */
  private def q20Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  /** Exact discrete percentiles per group (the DISC family): value at
    * 1-indexed rank ceil(p·n) of the sorted group — an explicitly-indexed
    * formula instead of `percentile`/`quantile_cont`, whose interpolation
    * expressions differ between engines in the last ulp. The sorted-array
    * pick is exact and order-independent; group arrays are the group's
    * row count (bounded by the grouping key's selectivity — the pattern
    * to avoid on an unbounded key). */
  private def q19Percentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(sort_array(collect_list("q")).as("arr"),
        count(lit(1)).as("n"))
      .selectExpr("l_returnflag", "n",
        "element_at(arr, cast(ceil(n * 0.25D) AS int)) AS p25",
        "element_at(arr, cast(ceil(n * 0.5D) AS int)) AS p50",
        "element_at(arr, cast(ceil(n * 0.9D) AS int)) AS p90",
        "element_at(arr, cast(n AS int)) AS p100")
      .orderBy("l_returnflag")

  /** Pricing-summary aggregate (TPC-H Q1 shape): grouped sums/avg/count
    * with map-side partial aggregation; one shuffle on the group keys. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumFx(col("l_quantity"), 2).as("sum_qty"),
        sumFx(col("l_extendedprice"), 2).as("sum_base_price"),
        sumFx(revenue, 4).as("sum_disc_price"),
        ((sum(fx(col("l_quantity"), 2)) / 100.0) / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multi-way join star query (TPC-H Q5 shape). The dimension chain
    * customer⋈nation⋈region is tiny at every SF — broadcast it so the only
    * shuffle is lineitem⋈orders; at 100 TB that one co-partitions on
    * orderkey and the dims still broadcast. */
  private def q2JoinNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sumFx(revenue, 4).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** Filtered join + top-k by aggregate (TPC-H Q3 shape): sort + limit
    * is a TakeOrderedAndProject — no full sort at scale. */
  private def q3TopkOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sumFx(revenue, 4).as("order_revenue"))
      .orderBy(col("order_revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Semi join: orders having at least one returned line (EXISTS). */
  private def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir)
    val ret = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    o.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("total"))
      .orderBy("o_orderkey")
  }

  /** Anti join: customers with no finished ('F') order (NOT EXISTS). */
  private def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    c.join(f, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Ranking window: top-2 parts per supplier by revenue (row_number over
    * partitioned window — one shuffle on l_suppkey). */
  private def q6WindowTopn(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(s, dir)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sumFx(revenue, 4).as("part_revenue"))
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("part_revenue").desc, col("l_partkey"))
    perPart.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy("l_suppkey", "rn")
  }

  /** Running-total window: cumulative quantity per supplier. The sort key
    * includes quantity/price tiebreaks because (orderkey, linenumber) is
    * NOT unique in this corpus, and the accumulator is fixed-point so tied
    * rows commute. */
  private def q7RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
               col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .withColumn("running_qty",
        round(sum(fx(col("l_quantity"), 2)).over(w) / 100.0, 4))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
  }

  /** lag() window: days between a customer's consecutive orders
    * (same shape as the reference's ublox-counter delta, SURVEY §2.2 R4). */
  private def q8LagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), to_date(col("prev_date")))
          .cast("long").as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set ops: customers with both open and finished orders, minus any
    * with a pending ('P') order — INTERSECT then EXCEPT. */
  private def q9SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def keys(st: String) =
      o.filter(col("o_orderstatus") === st).select("o_custkey").distinct()
    keys("O").intersect(keys("F")).except(keys("P")).orderBy("o_custkey")
  }

  /** Distinct aggregation: per order status, distinct customers vs rows. */
  private def q10DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           count(lit(1)).as("n_orders"),
           sumFx(col("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")

  /** Conditional (pivot-style) aggregation: per return flag, quantity
    * split by line status via CASE WHEN — map-side combinable. */
  private def q11CondAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_linestatus") === "F", fx(col("l_quantity"), 2))
          .otherwise(lit(0L))) / 100.0, 4).as("qty_f"),
        round(sum(when(col("l_linestatus") === "O", fx(col("l_quantity"), 2))
          .otherwise(lit(0L))) / 100.0, 4).as("qty_o"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** String scalar functions: upper/substring/length/concat/replace —
    * all codegen'd builtins, no UDFs. */
  private def q12StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_pref"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"))
      .orderBy("p_partkey")

  /** Rollup (hierarchical grouping sets) over order status × priority;
    * group markers coalesced to 'ALL' for engine-neutral output. */
  private def q13Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumFx(col("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** CUBE grouping sets: every (status, priority) combination including
    * both one-dimension margins — the grouping-set family beyond q13's
    * ROLLUP. */
  private def q18Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumFx(col("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** Temporal scalar functions: year/month/quarter extraction and
    * month truncation, grouped counts. */
  private def q14DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        col("o_totalprice"))
      .groupBy("y", "m", "q", "month_start")
      .agg(count(lit(1)).as("n"), sumFx(col("o_totalprice"), 2).as("total"))
      .orderBy("y", "m")

  /** HAVING: parts whose total shipped quantity exceeds a threshold. */
  private def q15Having(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(sumFx(col("l_quantity"), 2).as("total_qty"),
           count(lit(1)).as("n"))
      .filter(col("total_qty") > 100.0)
      .orderBy("l_partkey")

  /** Correlated scalar subquery shape: each order vs its customer's
    * average order value (decorrelated by Catalyst into an aggregate +
    * join — no per-row subquery execution at scale). */
  private def q16ScalarSubq(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.as("o").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  round(CAST(round(o_totalprice * 100) AS BIGINT) / 100.0D, 4) AS total,
        |  (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT)) / 100.0D
        |            / count(*)
        |   FROM orders_v i WHERE i.o_custkey = orders_v.o_custkey) AS cust_avg
        |FROM orders_v
        |WHERE o_totalprice > 5000
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** IN-subquery + CTE shape: lineitems of the top-priority orders. */
  private def q17InSubq(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_w")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_w")
    s.sql(
      """WITH urgent AS (
        |  SELECT o_orderkey FROM orders_w WHERE o_orderpriority = '1-URGENT')
        |SELECT l_orderkey, count(*) AS n_lines,
        |  round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0D, 4)
        |    AS qty
        |FROM lineitem_w
        |WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
  }

  def oracleSql: Map[String, String] = Map(
    "q16_scalar_subq" ->
      """SELECT o_orderkey, o_custkey,
        |  round(CAST(round(o_totalprice * 100) AS BIGINT) / 100.0, 4) AS total,
        |  (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT)) / 100.0
        |            / count(*)
        |   FROM orders i WHERE i.o_custkey = o.o_custkey) AS cust_avg
        |FROM orders o
        |WHERE o_totalprice > 5000
        |ORDER BY o_orderkey""".stripMargin,
    "q17_in_subq" ->
      """WITH urgent AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT l_orderkey, count(*) AS n_lines,
        |  round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 4) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 4) AS sum_qty,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 4) AS sum_base_price,
        |  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4) AS sum_disc_price,
        |  sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_nation" ->
      """SELECT r_name, n_name,
        |  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q3_topk_orders" ->
      """SELECT o_orderkey,
        |  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4) AS order_revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderkey
        |ORDER BY order_revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q6_window_topn" ->
      """SELECT l_suppkey, l_partkey, part_revenue, rn FROM (
        |  SELECT l_suppkey, l_partkey, part_revenue,
        |    row_number() OVER (PARTITION BY l_suppkey
        |                       ORDER BY part_revenue DESC, l_partkey) AS rn
        |  FROM (SELECT l_suppkey, l_partkey,
        |          round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4) AS part_revenue
        |        FROM lineitem GROUP BY l_suppkey, l_partkey))
        |WHERE rn <= 2 ORDER BY l_suppkey, rn""".stripMargin,
    "q7_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(CAST(round(l_quantity * 100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 4) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,
    "q8_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day',
        |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q9_set_ops" ->
      """(SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q11_cond_agg" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(round(l_quantity * 100) AS BIGINT) ELSE 0 END) / 100.0, 4) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(round(l_quantity * 100) AS BIGINT) ELSE 0 END) / 100.0, 4) AS qty_o,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q12_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name_pref,
        |  length(p_name) AS name_len,
        |  p_brand || '|' || p_type AS brand_type,
        |  replace(p_type, ' ', '_') AS type_u
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q21_range_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ts, value FROM events)
        |SELECT user_id, event_id, ts,
        |  count(*) OVER w AS cnt_10m,
        |  round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
        |    / 100.0, 4) AS sum_10m
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q22_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_lateral" ->
      """SELECT n.n_name, t.c_name,
        |  round(CAST(round(t.c_acctbal * 100) AS BIGINT) / 100.0, 2)
        |    AS bal
        |FROM nation n JOIN LATERAL (
        |  SELECT c_name, c_acctbal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
        |ORDER BY n_name, bal DESC, c_name""".stripMargin,
    "q24_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts) >= 300000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us) AS sid
        |  FROM e)
        |SELECT user_id, min(us) AS session_start,
        |  max(us) + 300000000 AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q28_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q29_set_ops_all" ->
      """WITH h1 AS (
        |  SELECT l_suppkey FROM lineitem WHERE l_shipdate < '1998-07-01'),
        |h2 AS (
        |  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= '1998-07-01'),
        |c AS (
        |  SELECT l_suppkey, count(*) AS n_common
        |  FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2)
        |  GROUP BY l_suppkey),
        |e AS (
        |  SELECT l_suppkey, count(*) AS n_only_early
        |  FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
        |  GROUP BY l_suppkey)
        |SELECT coalesce(c.l_suppkey, e.l_suppkey) AS l_suppkey,
        |  coalesce(n_common, CAST(0 AS BIGINT)) AS n_common,
        |  coalesce(n_only_early, CAST(0 AS BIGINT)) AS n_only_early
        |FROM c FULL OUTER JOIN e ON c.l_suppkey = e.l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    "q27_full_outer" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk, count(*) AS cust_debt
        |  FROM customer WHERE c_acctbal < -800 GROUP BY 1),
        |s AS (
        |  SELECT s_nationkey AS nk, count(*) AS supp_debt
        |  FROM supplier WHERE s_acctbal < -600 GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |  coalesce(cust_debt, CAST(0 AS BIGINT)) AS cust_debt,
        |  coalesce(supp_debt, CAST(0 AS BIGINT)) AS supp_debt,
        |  CASE WHEN cust_debt IS NULL THEN 'supplier_only'
        |    WHEN supp_debt IS NULL THEN 'customer_only'
        |    ELSE 'both' END AS presence
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    "q34_partition_prune" ->
      // the flat-table answer: the hive-partitioned layout must be
      // transparent to results
      """SELECT count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q33_skew_salted" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
        |d AS (
        |  SELECT event_type, count(*) AS n_type,
        |    CAST(sum(value_c) AS BIGINT) AS sv FROM ev GROUP BY 1)
        |SELECT ev.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value_c * n_type > sv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_above
        |FROM ev JOIN d ON ev.event_type = d.event_type
        |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin,
    "q32_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn, event_type
        |  FROM events),
        |a AS (
        |  SELECT user_id, event_id, event_type,
        |    first_value(CASE WHEN event_type = 'view' THEN event_id END
        |      IGNORE NULLS) OVER w AS first_touch,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END
        |      IGNORE NULLS) OVER w AS last_touch
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id))
        |SELECT user_id, event_id AS purchase_id,
        |  coalesce(first_touch, CAST(-1 AS BIGINT)) AS first_touch,
        |  coalesce(last_touch, CAST(-1 AS BIGINT)) AS last_touch
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin,
    "q31_zorder_layout" ->
      s"""WITH d AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_partkey % 65536 AS x, l_suppkey % 65536 AS y
         |  FROM lineitem),
         |z AS (
         |  SELECT l_orderkey, l_linenumber, x, y,
         |    (${graft.operators.ZOrder.zKeyDuck("x", "y")}) AS z
         |  FROM d),
         |b AS (
         |  SELECT x, y, CAST(ntile(16) OVER (
         |    ORDER BY z, l_orderkey, l_linenumber) AS BIGINT) AS bucket
         |  FROM z)
         |SELECT bucket, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q30_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
        |n AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |             (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3)
        |SELECT stage, users, conv FROM (
        |  SELECT '1_view' AS stage, u1 AS users,
        |    CAST(NULL AS DOUBLE) AS conv FROM n
        |  UNION ALL
        |  SELECT '2_click', u2, round(u2 / CAST(u1 AS DOUBLE), 4) FROM n
        |  UNION ALL
        |  SELECT '3_purchase', u3, round(u3 / CAST(u2 AS DOUBLE), 4) FROM n)
        |ORDER BY stage""".stripMargin,
    "q26_streaks" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |i AS (
        |  SELECT user_id, event_type, us, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY us, event_id) AS grp
        |  FROM e),
        |g AS (
        |  SELECT user_id, event_type, grp, count(*) AS streak,
        |    min(us) AS start_us
        |  FROM i GROUP BY user_id, event_type, grp)
        |SELECT user_id, event_type, streak, start_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY streak DESC, start_us, event_type) AS rk
        |  FROM g)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "q20_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q19_percentile" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    list(CAST(round(l_quantity) AS BIGINT)
        |      ORDER BY CAST(round(l_quantity) AS BIGINT)) AS arr
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  arr[CAST(ceil(n * 0.25) AS INT)] AS p25,
        |  arr[CAST(ceil(n * 0.5) AS INT)] AS p50,
        |  arr[CAST(ceil(n * 0.9) AS INT)] AS p90,
        |  arr[CAST(n AS INT)] AS p100
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q18_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q13_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q14_date_funcs" ->
      """SELECT date_part('year', o_orderdate) AS y,
        |  date_part('month', o_orderdate) AS m,
        |  date_part('quarter', o_orderdate) AS q,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders GROUP BY 1, 2, 3, 4 ORDER BY y, m""".stripMargin,
    "q15_having" ->
      """SELECT l_partkey,
        |  round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 4) AS total_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 4) > 100.0
        |ORDER BY l_partkey""".stripMargin
  )
}
