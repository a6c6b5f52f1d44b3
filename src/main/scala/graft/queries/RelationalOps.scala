package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 relational-operator inventory re-expressed as declarative
  * Spark pipelines over the driver-provided TPC-H-ish tables, each with a
  * DuckDB oracle. Query names carry the §2 operator id they cover
  * (a=aggregation, j=join, w=window, p=predicate, o=sort/limit, u=set-op,
  * f=scalar function).
  *
  * The reference computes these shapes imperatively over RDDs (citations on
  * each query); here they are single Catalyst plans so pushdown, partial
  * aggregation, AQE and join selection apply unchanged at 100 TB.
  */
object RelationalOps {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Deterministic CDC changelog derived from `documents` — shared by the
    * store_cdc / store_timetravel / store_diff gates (their oracles spell
    * out the same arithmetic): inserts of the rows held out of the base
    * store, an update wave, a delete wave, and LATE-ARRIVING stale
    * updates whose sequence is below the base rows' (they must lose).
    * Sequence offsets are distinct per source, so every (key, seq) pair
    * is unique and the LWW election is total. */
  private def cdcBatch1(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 4 === 3)
      .withColumn("seq", col("doc_id") * 10 + 5).withColumn("op", lit("U"))
    .unionByName(docs.filter(col("doc_id") % 7 === 0)
      .withColumn("lang", lit("xx"))
      .withColumn("n_chars", col("n_chars") + 1000)
      .withColumn("seq", col("doc_id") * 10 + 7).withColumn("op", lit("U")))
    .unionByName(docs.filter(col("doc_id") % 11 === 0)
      .withColumn("seq", col("doc_id") * 10 + 9).withColumn("op", lit("D")))
    .unionByName(docs.filter(col("doc_id") % 13 === 0)
      .withColumn("lang", lit("stale"))
      .withColumn("seq", col("doc_id") * 10 - 5).withColumn("op", lit("U")))

  /** Second CDC wave for the versioned-store gates: an update sweep and
    * a delete sweep, both sequenced above every batch-1 change. */
  private def cdcBatch2(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 5 === 0)
      .withColumn("lang", lit("v2"))
      .withColumn("n_chars", col("n_chars") + 5000)
      .withColumn("seq", col("doc_id") * 10 + 20).withColumn("op", lit("U"))
    .unionByName(docs.filter(col("doc_id") % 17 === 0)
      .withColumn("seq", col("doc_id") * 10 + 25).withColumn("op", lit("D")))

  val all: Seq[Q] = Seq(
    // ---- flagship: TPC-H Q1 shape = A7 monoid-sum of a struct of measures
    // (reference: FullCheck.scala:157-165 reduceByKey of Counts monoid).
    q(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
    },

    // ---- A1: plain count (reference: CountReads.scala:40-55).
    q("a1_count", "SELECT COUNT(*) AS n FROM lineitem") { (s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))
    },

    // ---- A2: TP/TN/FP/FN accumulators → confusion-matrix groupBy
    // (reference: CheckerApp.scala:70-96 four longAccumulators).
    q(
      "a2_confusion",
      """SELECT l_returnflag = 'R' AS expected, l_linestatus = 'F' AS actual,
        |COUNT(*) AS n FROM lineitem GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(
          (col("l_returnflag") === "R").as("expected"),
          (col("l_linestatus") === "F").as("actual"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- A6/O2: histogram sorted desc by count
    // (reference: CheckerApp.scala:165-169 reduceByKey + sortBy(-count)).
    q(
      "a6_hist",
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("o_orderpriority"))
    },

    // ---- A6 under skew: the same histogram via two-phase salted
    // aggregation (hot-key resilience; identical results, so the same
    // oracle applies).
    q(
      "a6_salted_hist",
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority""".stripMargin
    ) { (s, dir) =>
      graft.ops.SkewOps.saltedCount(
        t(s, dir, "orders"), Seq("o_orderpriority"))
        .orderBy(desc("n"), col("o_orderpriority"))
    },

    // ---- A8/W3: running CDF over sorted keys
    // (reference: FullCheck.scala:171-188 scanLeft of Counts monoid).
    q(
      "a8_cdf",
      """SELECT l_linenumber, n,
        |  CAST(SUM(n) OVER (ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cdf
        |FROM (SELECT l_linenumber, COUNT(*) AS n FROM lineitem GROUP BY l_linenumber)""".stripMargin
    ) { (s, dir) =>
      // two-phase distributed scan, not a single-partition Window (100 TB
      // path; see graft.ops.ScalableWindow) — cdf = exclusive prefix + n
      val perKey = t(s, dir, "lineitem")
        .groupBy("l_linenumber").agg(count(lit(1)).as("n"))
      graft.ops.ScalableWindow.prefixSumExclusive(
        perKey, Seq("l_linenumber"), col("n"), "p")
        .select(col("l_linenumber"), col("n"),
          (col("p") + col("n")).cast("long").as("cdf"))
    },

    // ---- A11: stats summary (N/mean/min/max/percentiles/stddev)
    // (reference: ComputeSplits.scala:58-99 Stats over split sizes).
    // Mean/variance via exact decimal sums; percentiles rounded to absorb
    // last-ulp interpolation differences between engines.
    q(
      "a11_stats",
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
        |  MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.50), 4) AS p50,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75,
        |  ROUND(SQRT((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1)), 2) AS sd
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      val d = col("o_totalprice").cast(D)
      // ONE exact-percentile aggregate with an array of fractions: a
      // single sort buffer instead of three (halves the agg cost).
      t(s, dir, "orders").agg(
        count(lit(1)).as("n"),
        dmean(col("o_totalprice")).as("mean"),
        min("o_totalprice").as("mn"),
        max("o_totalprice").as("mx"),
        expr("percentile(o_totalprice, array(0.25, 0.50, 0.75))").as("__p"),
        round(
          sqrt(
            (sum(d * d).cast("double") -
              sum(d).cast("double") * sum(d).cast("double") / count(lit(1))) /
              (count(lit(1)) - 1)), 2).as("sd")
      ).select(col("n"), col("mean"), col("mn"), col("mx"),
        round(col("__p").getItem(0), 4).as("p25"),
        round(col("__p").getItem(1), 4).as("p50"),
        round(col("__p").getItem(2), 4).as("p75"),
        col("sd"))
    },

    // ---- A15/W3: prefix-sum of sizes for partition planning
    // (reference: Blocks.scala:98-107 scanLeftValues of compressedSize).
    q(
      "a15_prefix_sum",
      """SELECT s_suppkey,
        |  COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER
        |    (ORDER BY s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE), 0.0) AS prefix
        |FROM supplier""".stripMargin
    ) { (s, dir) =>
      // two-phase distributed scan, not a single-partition Window (100 TB
      // path; see graft.ops.ScalableWindow)
      graft.ops.ScalableWindow.prefixSumExclusive(
        t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_acctbal").cast(D).as("bal")),
        Seq("s_suppkey"), col("bal"), "p")
        .select(col("s_suppkey"), col("p").cast("double").as("prefix"))
    },

    // ---- J1: checker-vs-ground-truth join → expected = truth.isNotNull
    // (reference: BlocksAndIndexedRecords.scala:22-58 ordered zip join).
    q(
      "j1_truth_join",
      """SELECT l.l_orderkey, l.l_linenumber, o.o_orderkey IS NOT NULL AS expected
        |FROM lineitem l LEFT JOIN
        |  (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o
        |ON l.l_orderkey = o.o_orderkey""".stripMargin
    ) { (s, dir) =>
      val truth = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      t(s, dir, "lineitem")
        .join(truth, col("l_orderkey") === col("o_orderkey"), "left")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("o_orderkey").isNotNull.as("expected"))
    },

    // ---- J2/U1: full-outer merge of two key lists, keep one-sided rows
    // (reference: ComputeSplits.scala:113-124 orMerge split diff).
    q(
      "j2_splits_diff",
      """SELECT COALESCE(l.k, r.k) AS o_orderkey,
        |  CASE WHEN l.k IS NOT NULL THEN 'L' ELSE 'R' END AS side
        |FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F') l
        |FULL OUTER JOIN (SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 150000) r
        |ON l.k = r.k
        |WHERE l.k IS NULL OR r.k IS NULL""".stripMargin
    ) { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("lk"))
      val r = o.filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey").as("rk"))
      l.join(r, col("lk") === col("rk"), "full_outer")
        .filter(col("lk").isNull || col("rk").isNull)
        .select(
          coalesce(col("lk"), col("rk")).as("o_orderkey"),
          when(col("lk").isNotNull, "L").otherwise("R").as("side"))
    },

    // ---- J3/U2: set-difference both directions via anti-joins
    // (reference: TimeLoad.scala:77-93 read-name set diff).
    q(
      "j3_anti_diff",
      """SELECT c_custkey AS key, 'customer_no_orders' AS side FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT o_custkey AS key, 'order_no_customer' AS side FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin
    ) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val noOrders = c
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey").as("key"),
          lit("customer_no_orders").as("side"))
      val noCust = o
        .join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .select(col("o_custkey").as("key"),
          lit("order_no_customer").as("side"))
      noOrders.unionAll(noCust)
    },

    // ---- J5/W2: predecessor pairing via lag
    // (reference: CheckBlocks.scala:102 sliding2Prev block+prev-size).
    q(
      "j5_lag_prev",
      """SELECT o_orderkey,
        |  LAG(o_totalprice) OVER (ORDER BY o_orderkey) AS prev_price
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      graft.ops.ScalableWindow.lag1(
        t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"), "o_totalprice", "prev_price")
        .select("o_orderkey", "prev_price")
    },

    // ---- W1: successor pairing → splits (start, end)
    // (reference: CanLoadBam.scala:166-174 sliding2(endPos)).
    q(
      "w1_lead_splits",
      """SELECT s_suppkey AS start_key,
        |  COALESCE(LEAD(s_suppkey) OVER (ORDER BY s_suppkey), -1) AS end_key
        |FROM supplier""".stripMargin
    ) { (s, dir) =>
      graft.ops.ScalableWindow.lead1(
        t(s, dir, "supplier").select("s_suppkey"),
        Seq("s_suppkey"), "s_suppkey", "end_key", lit(-1L))
        .select(col("s_suppkey").as("start_key"), col("end_key"))
    },

    // ---- W4/P9: row-number range selection
    // (reference: HTSJDKRewrite.scala:54-58 zipWithIndex range filter).
    q(
      "w4_rownum_range",
      """SELECT o_orderkey, rn FROM
        |(SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |WHERE rn BETWEEN 1000 AND 1100""".stripMargin
    ) { (s, dir) =>
      graft.ops.ScalableWindow.rowNumber(
        t(s, dir, "orders").select("o_orderkey"),
        Seq("o_orderkey"), "rn")
        .filter(col("rn").between(1000, 1100))
        .select("o_orderkey", "rn")
    },

    // ---- P2/P3: multi-interval range predicate (byte-range/loci filters)
    // (reference: Blocks.scala:89-96 TreeRangeSet membership).
    q(
      "p2_interval_filter",
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE (CAST(l_shipdate AS DATE) BETWEEN DATE '1994-01-01' AND DATE '1994-06-30')
        |   OR (CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31')""".stripMargin
    ) { (s, dir) =>
      val d = col("l_shipdate").cast("date")
      t(s, dir, "lineitem")
        .filter(
          d.between(lit("1994-01-01").cast("date"), lit("1994-06-30").cast("date")) ||
          d.between(lit("1996-01-01").cast("date"), lit("1996-03-31").cast("date")))
        .select(col("l_orderkey"), col("l_linenumber"), d.as("ship_date"))
    },

    // ---- P6/P7: mismatch filter (expected vs actual calls)
    // (reference: CheckerApp.scala:76-99).
    q(
      "p6_mismatch",
      """SELECT l_orderkey, l_linenumber,
        |  l_returnflag = 'R' AS expected, l_linestatus = 'F' AS actual
        |FROM lineitem WHERE (l_returnflag = 'R') <> (l_linestatus = 'F')""".stripMargin
    ) { (s, dir) =>
      val e = col("l_returnflag") === "R"
      val a = col("l_linestatus") === "F"
      t(s, dir, "lineitem")
        .filter(e =!= a)
        .select(col("l_orderkey"), col("l_linenumber"),
          e.as("expected"), a.as("actual"))
    },

    // ---- U1/U2: symmetric difference via EXCEPT both ways
    // (reference: Result.scala:57-67 one-sided split diffs).
    q(
      "u2_except",
      """SELECT key, 'only_part' AS side FROM
        |  (SELECT p_partkey AS key FROM part EXCEPT SELECT l_partkey AS key FROM lineitem)
        |UNION ALL
        |SELECT key, 'only_lineitem' AS side FROM
        |  (SELECT l_partkey AS key FROM lineitem EXCEPT SELECT p_partkey AS key FROM part)""".stripMargin
    ) { (s, dir) =>
      val p = t(s, dir, "part").select(col("p_partkey").as("key"))
      val l = t(s, dir, "lineitem").select(col("l_partkey").as("key"))
      p.except(l).withColumn("side", lit("only_part"))
        .unionAll(l.except(p).withColumn("side", lit("only_lineitem")))
    },

    // ---- F7: virtual-position bit packing (Pos.toHTSJDK round trip)
    // (reference: Pos.scala:32-36, blockPos << 16 | offset).
    q(
      "f7_pos_pack",
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey * 65536 + l_linenumber AS vpos,
        |  (l_orderkey * 65536 + l_linenumber) // 65536 AS block_back,
        |  (l_orderkey * 65536 + l_linenumber) % 65536 AS off_back
        |FROM lineitem""".stripMargin
    ) { (s, dir) =>
      val vpos = shiftleft(col("l_orderkey"), 16)
        .bitwiseOR(col("l_linenumber").cast("long"))
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        vpos.as("vpos"),
        shiftright(vpos, 16).as("block_back"),
        vpos.bitwiseAND(lit(0xFFFFL)).as("off_back"))
    },

    // ---- O2/O3: deterministic top-k (sample/print-limit analog)
    // (reference: CheckerApp.scala:188-200 capped collect).
    q(
      "o2_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    },

    // ---- F11: regex field extraction (benchmark-scraper shape,
    // benchmarks/BAM.scala:50-52 regex parse of outputs).
    q(
      "f11_regex",
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir).select(col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
    },

    // ---- A12: partition-size profile (reference: partitionSizes via
    // magic-rdds, ComputeSplits.scala:83). Rows-only shape: the profile
    // depends on the scan's file-split layout.
    // A12 partition-size profile, projected to its LAYOUT-INDEPENDENT
    // invariants so DuckDB can gate it (raw per-pid rows depend on file
    // splits): after an explicit round-robin repartition(16), the profile
    // must show (a) every input row in exactly one partition (total_rows),
    // (b) all 16 partitions materialized and non-empty (n_parts), and
    // (c) bounded skew — round-robin hands each output ⌊n/16⌋ or ⌈n/16⌉
    // rows PER INPUT SPLIT, so max−min is at most the input split count,
    // which is read off the ACTUAL scan partitioning (a constant bound
    // would re-introduce the layout dependence this rewrite removed: a
    // larger SF or smaller maxPartitionBytes means more splits). A
    // dropped/duplicated row in the exchange, an empty partition, or a
    // broken partitioner turns a column red. The per-pid detail frame
    // stays the first stage of the query — this is the same profile,
    // folded to what layout cannot move.
    q(
      "a12_partition_sizes",
      "SELECT COUNT(*) AS total_rows, CAST(16 AS BIGINT) AS n_parts, TRUE AS balanced FROM lineitem"
    ) { (s, dir) =>
      val src = t(s, dir, "lineitem")
      val nSplits = src.rdd.getNumPartitions.toLong
      src
        .repartition(16)
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"))
        .agg(sum("rows").as("total_rows"),
          count(lit(1)).as("n_parts"),
          (max("rows") - min("rows") <= nSplits).as("balanced"))
    },

    // ---- J-broadcast: dimension join chain + grouped revenue top-k
    // (TPC-H Q3 shape; exercises broadcast join selection).
    q(
      "q3_topk_join",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      // NO broadcast hints anywhere in this chain: the filtered customer
      // side is a fixed FRACTION (~20%) of a table that grows linearly with
      // scale factor, so a planning-time hint becomes an executor OOM at
      // the 100 TB posture. The parquet scan's size stats pick broadcast at
      // plan time when the side is genuinely small, and AQE re-plans from
      // runtime stats otherwise — the decision tracks the data, not the hint
      l.join(o.join(c, col("c_custkey") === col("o_custkey"))
          .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },

    // ---- Six-table star join (TPC-H Q5 shape): revenue per nation for
    // one region, customer and supplier in the SAME nation (the join
    // graph has a cycle — planner must pick an order). region/nation are
    // constant-size → scan stats broadcast them; customer/supplier/orders
    // grow with SF → no hints, AQE decides from runtime sizes.
    q(
      "q5_region_join",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin
    ) { (s, dir) =>
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
        .join(r, col("n_regionkey") === col("r_regionkey"))
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
    },

    // ---- EXISTS semi-join (TPC-H Q4 shape): the planner's LeftSemi path
    // with a compound (equi + range) condition — dedupes the probe side
    // without materializing the match multiplicity.
    q(
      "q4_semi_join",
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    },

    // ---- J6 (beyond-reference): runtime bloom-filter join pruning — the
    // 100 TB fact⋈dim pattern. One fixed-size sketch of the (selective)
    // dim keys is built by partial aggregation, and `might_contain` kills
    // non-joining fact rows BEFORE the shuffle. Blooms have no false
    // negatives and the exact join still runs, so the plain-join oracle
    // applies unchanged (false positives are eliminated by the join).
    q(
      "j6_bloom_join",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      val dim = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val pruned = graft.ops.RuntimeFilterOps.bloomPrune(
        t(s, dir, "orders"), "o_custkey", dim, "c_custkey",
        expectedItems = 1L << 16, numBits = 1L << 20)
      pruned.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ---- J7 (beyond-reference): point-in-interval range join WITHOUT an
    // equi key, by bin discretization (RangeJoinOps) — Spark's planner
    // would otherwise nest-loop it. Overlapping price bands (each price
    // matches ~3) make it a true interval join, not a disguised group-by;
    // DuckDB runs the plain range join declaratively.
    q(
      "j7_range_bin",
      """WITH p AS (
        |  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS price FROM orders
        |), b AS (
        |  SELECT i AS band_id, i * 2000 AS lo, i * 2000 + 6000 AS hi
        |  FROM GENERATE_SERIES(0, 119) AS t(i)
        |)
        |SELECT band_id, COUNT(*) AS n, CAST(SUM(price) AS BIGINT) AS total
        |FROM p JOIN b ON price >= lo AND price < hi
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      val points = t(s, dir, "orders")
        .select(floor(col("o_totalprice")).cast("long").as("price"))
      val bands = s.range(0, 120)
        .select(col("id").as("band_id"),
          (col("id") * 2000).as("lo"), (col("id") * 2000 + 6000).as("hi"))
      graft.ops.RangeJoinOps
        .binnedPointIntervalJoin(points, "price", bands, "lo", "hi", binWidth = 2000L)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), sum("price").as("total"))
    },

    // ---- J8 (beyond-reference): as-of join — for each purchase, the
    // latest click by the same user at or before it (AsofJoinOps: union-
    // tag + keyed window, ONE shuffle on user_id, no range/nested-loop
    // join). The oracle is DuckDB's native ASOF LEFT JOIN — a genuinely
    // independent implementation of the same semantics. Unmatched
    // purchases survive with NULL click columns (left-outer).
    q(
      "j8_asof",
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us, c.event_id AS click_id,
        |  epoch_us(c.ts) AS click_us,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin
    ) { (s, dir) =>
      val ev = tEvents(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.ops.AsofJoinOps
        .asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          rightPayload = Seq("event_id"), rightPrefix = "click_")
        .select(
          col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("click_event_id").as("click_id"),
          col("click_ts_us").as("click_us"),
          (unix_micros(col("ts")) - col("click_ts_us")).as("gap_us"))
    },

    // ---- J9 (beyond-reference): INTERVAL-interval overlap join — the
    // genomic reads ⋈ annotations shape, binned so both sides replicate
    // into the bins they touch and meet in a plain shuffled EQUI join;
    // each overlapping pair is kept exactly once by the first-shared-bin
    // rule (the bin of max(s1,s2)) — no output-sized distinct. Price
    // intervals overlap ~2 bands each, so this is a true many-to-many
    // overlap, and DuckDB runs the plain theta join declaratively.
    q(
      "j9_interval_join",
      """WITH l AS (
        |  SELECT o_orderkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS s1,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) + 500 AS e1 FROM orders
        |), r AS (
        |  SELECT i AS band_id, i * 1000 AS s2, i * 1000 + 3000 AS e2
        |  FROM GENERATE_SERIES(0, 599) AS t(i)
        |)
        |SELECT band_id, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM l JOIN r ON s1 < e2 AND s2 < e1
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      val l = t(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice")).cast("long").as("s1"))
        .withColumn("e1", col("s1") + 500)
      val r = s.range(0, 600)
        .select(col("id").as("band_id"),
          (col("id") * 1000).as("s2"), (col("id") * 1000 + 3000).as("e2"))
      graft.ops.RangeJoinOps
        .binnedIntervalJoin(l, "s1", "e1", r, "s2", "e2", binWidth = 2000L)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
    },

    // ---- J10: the KEYED interval-interval overlap join — the
    // per-contig genomic form: overlap pairs only count within the same
    // partition key (here o_orderpriority), so the shuffle key is
    // (priority, bin) and the first-shared-bin rule runs under the key.
    // Each priority gets its OWN band grid (offset by the priority
    // digit ×137) so a cross-key pair that leaked in would change the
    // hash — the oracle joins on the key declaratively.
    q(
      "j10_interval_keyed",
      """WITH l AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS s1,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) + 500 AS e1 FROM orders
        |), p AS (
        |  SELECT DISTINCT o_orderpriority,
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS d FROM orders
        |), r AS (
        |  SELECT o_orderpriority, i AS band_id,
        |    i * 1000 + d * 137 AS s2, i * 1000 + d * 137 + 3000 AS e2
        |  FROM p CROSS JOIN GENERATE_SERIES(0, 599) AS t(i)
        |)
        |SELECT band_id, l.o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM l JOIN r ON l.o_orderpriority = r.o_orderpriority
        |  AND s1 < e2 AND s2 < e1
        |GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val l = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice")).cast("long").as("s1"))
        .withColumn("e1", col("s1") + 500)
      val r = t(s, dir, "orders").select("o_orderpriority").distinct()
        .crossJoin(s.range(0, 600).select(col("id").as("band_id")))
        .withColumn("__d",
          substring(col("o_orderpriority"), 1, 1).cast("long"))
        .select(col("o_orderpriority"), col("band_id"),
          (col("band_id") * 1000 + col("__d") * 137).as("s2"),
          (col("band_id") * 1000 + col("__d") * 137 + 3000).as("e2"))
      graft.ops.RangeJoinOps
        .binnedIntervalJoinKeyed(l, "s1", "e1", r, "s2", "e2",
          binWidth = 2000L, keys = Seq("o_orderpriority"))
        .groupBy("band_id", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
    },

    // ---- W5: NTILE quartiles within each priority group — both
    // engines' NATIVE ntile over a deterministic (price, key) order;
    // the window is keyed by o_orderpriority, so it scales like any
    // partitioned window (never a global sort).
    q(
      "w5_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")).cast("long").as("quartile"))
    },

    // ---- W6: the GLOBAL rank family — rank / dense_rank /
    // percent_rank / cume_dist over a tie-heavy total order
    // (priority × date: ~thousands of peers per key), all on the
    // two-phase ScalableWindow (range-bucket + per-bucket window +
    // broadcast carry; never a single-partition sort). The ratio
    // columns are single IEEE double divisions on exact integer
    // operands — bit-stable across engines, no rounding. The chained
    // calls share one input; each adds its column through its own
    // two-phase pass.
    q(
      "w6_rank_family",
      """SELECT o_orderkey,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |  PERCENT_RANK() OVER w AS prnk,
        |  CUME_DIST() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (ORDER BY o_orderpriority, o_orderdate)""".stripMargin
    ) { (s, dir) =>
      import graft.ops.ScalableWindow
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      ScalableWindow.rankFamily(base,
        Seq("o_orderpriority", "o_orderdate"),
        "rnk", "drnk", "prnk", "cdist")
        .select("o_orderkey", "rnk", "drnk", "prnk", "cdist")
    },

    // ---- W7: GLOBAL ntile on the two-phase machinery — tile ids
    // derived arithmetically from the scalable row_number + one
    // broadcast total (never a second window). The order includes the
    // unique key: ntile splits PEERS across tiles by row order, so only
    // a total order makes it deterministic — in any engine.
    q(
      "w7_global_ntile",
      """SELECT o_orderkey,
        |  CAST(NTILE(7) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      graft.ops.ScalableWindow.ntile(
        t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"), 7, "tile")
        .select("o_orderkey", "tile")
    },

    // ---- Fixed-point-integer PageRank (beyond-reference) on the
    // bipartite part↔supplier co-occurrence graph (both directions, so
    // no dangling mass): 3 power-iteration rounds entirely in scaled
    // integers with floor division — bit-reproducible across engines,
    // so ALL node ranks hash-compare exactly. The Spark loop is
    // agg+join rounds with eager lineage cuts (GraphOps); DuckDB runs
    // the same recurrence as chained CTEs.
    q(
      "graph_pagerank",
      """WITH e AS (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem
        |), nodes AS (
        |  SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e
        |), nn AS (SELECT COUNT(*) AS n FROM nodes),
        |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |bs AS (SELECT ((15 * 1000000000000) // 100) // n AS b,
        |              1000000000000 // n AS r0 FROM nn),
        |r0 AS (SELECT id, (SELECT r0 FROM bs) AS r FROM nodes),
        |r1 AS (
        |  SELECT nd.id, (SELECT b FROM bs) + (85 * COALESCE(m.im, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS id, SUM(r0.r // od.outdeg) AS im
        |    FROM e JOIN r0 ON r0.id = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) m ON m.id = nd.id
        |), r2 AS (
        |  SELECT nd.id, (SELECT b FROM bs) + (85 * COALESCE(m.im, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS id, SUM(r1.r // od.outdeg) AS im
        |    FROM e JOIN r1 ON r1.id = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) m ON m.id = nd.id
        |), r3 AS (
        |  SELECT nd.id, (SELECT b FROM bs) + (85 * COALESCE(m.im, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS id, SUM(r2.r // od.outdeg) AS im
        |    FROM e JOIN r2 ON r2.id = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) m ON m.id = nd.id
        |)
        |SELECT id AS node_id, CAST(r AS BIGINT) AS rank_fp FROM r3""".stripMargin
    ) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      graft.ops.GraphOps.pageRankFixedPoint(edges, "src", "dst", iters = 3)
        .select(col("id").as("node_id"), col("r").as("rank_fp"))
        .orderBy("node_id")
    },

    // ---- Incrementally-maintained rollup (beyond-reference): the
    // materialized GROUP BY is built from the initial 80% of orders,
    // the 20% delta is FOLDED in (IncrementalAggOps: delta aggregated,
    // only its hash buckets read back, re-summed, dynamic partition
    // overwrite of just those buckets — untouched buckets byte-equal,
    // spec-asserted), and the store read back must hash-equal DuckDB's
    // one-shot GROUP BY over all the data. Measures are sum-monoids
    // (count as sum(1), cents as exact integers).
    q(
      "agg_store_inc",
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      val base = scratchDir("graft-aggstore")
      val prepped = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        lit(1L).as("n_orders"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      val keys = Seq("o_custkey")
      val ms = Seq("n_orders", "total_cents")
      // split on ORDER key: the same customers appear in store and
      // delta, so the merge genuinely re-sums existing partials
      // 16 buckets at gate scale (the 64 default targets wider stores:
      // bucket count trades merge locality against per-directory I/O)
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("o_orderkey") % 5 =!= 0).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16)
      // the fold is SUBMITTED TWICE under one batch tag — the
      // at-least-once redelivery; a double-fold would double every
      // delta key's partials and flip the hash
      val delta = prepped.filter(col("o_orderkey") % 5 === 0)
        .drop("o_orderkey")
      IncrementalAggOps.mergeIntoAggStore(
        delta, s, base, keys, ms, nBuckets = 16, batchTag = Some("b1"))
      IncrementalAggOps.mergeIntoAggStore(
        delta, s, base, keys, ms, nBuckets = 16, batchTag = Some("b1"))
      IncrementalAggOps.readAggStore(s, base).orderBy("o_custkey")
    },

    // ---- TIME TRAVEL on the rollup store: the copy-on-write layout
    // retains superseded bucket versions until vacuum, so the store is
    // readable AS OF any merge — rollback/audit of a bad fold. Seed
    // (v0) + two merges (v1, v2), then vacuum WITH a retention floor
    // of one version, then read AT v1: the answer must equal DuckDB's
    // one-shot aggregate over the pre-delta2 facts, proving both the
    // versioned resolution and that the retention vacuum kept exactly
    // the history it promised.
    q(
      "agg_store_at",
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders WHERE o_orderkey % 5 <> 4 GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      val base = scratchDir("graft-aggstore-at")
      val prepped = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        lit(1L).as("n_orders"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      val keys = Seq("o_custkey")
      val ms = Seq("n_orders", "total_cents")
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("o_orderkey") % 5 =!= 0 &&
          col("o_orderkey") % 5 =!= 4).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16)
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("o_orderkey") % 5 === 0).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16, batchTag = Some("d1"))
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("o_orderkey") % 5 === 4).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16, batchTag = Some("d2"))
      // reclaim what only v0 resolves; v1 must stay readable
      IncrementalAggOps.vacuumAggStore(s, base, retainVersions = 1)
      IncrementalAggOps.readAggStoreAt(s, base, 1L).orderBy("o_custkey")
    },

    // ---- VERSION DIFF on the rollup store: per-key partials at two
    // versions, one row per key whose mass MOVED between them — only
    // the buckets touched by the intervening merges are read (the
    // VersionedStoreOps.diffVersions symmetry, bucket-local). DuckDB
    // full-outer-joins the two one-shot aggregates and keeps the
    // distinct rows; nulls mark a key absent on one side.
    q(
      "agg_store_vdiff",
      """WITH f AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM orders WHERE o_orderkey % 5 <> 4 GROUP BY 1
        |), t AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM orders GROUP BY 1
        |)
        |SELECT COALESCE(f.o_custkey, t.o_custkey) AS o_custkey,
        |  f.n AS n_orders_from, f.s AS total_cents_from,
        |  t.n AS n_orders_to, t.s AS total_cents_to
        |FROM f FULL OUTER JOIN t ON f.o_custkey = t.o_custkey
        |WHERE f.n IS DISTINCT FROM t.n OR f.s IS DISTINCT FROM t.s""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      val base = scratchDir("graft-aggstore-vd")
      val prepped = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        lit(1L).as("n_orders"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      val keys = Seq("o_custkey")
      val ms = Seq("n_orders", "total_cents")
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("o_orderkey") % 5 =!= 4).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16)
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("o_orderkey") % 5 === 4).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 16, batchTag = Some("d1"))
      IncrementalAggOps.diffAggStore(s, base, keys, ms, 0L, 1L)
        .orderBy("o_custkey")
    },

    // ---- CDC change feed DRIVING rollup maintenance (the downstream-
    // sync pattern, end-to-end): a versioned store takes two change
    // waves; the v1→v2 snapshot diff becomes a retract/merge pair
    // against a rollup built from the v1 state — old rows of deletes
    // and updates retract, new rows of adds and updates merge. The
    // rollup maintained ONLY from the change feed must equal the
    // oracle's aggregate of the final LWW state, proving the diff
    // loses nothing and the monoid fold inverts cleanly. Zero-count
    // rows (a group retracted to nothing) are filtered on read — the
    // documented compaction semantic.
    q(
      "pipeline_cdc_rollup",
      """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |r2 AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+5, 'U'
        |  FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 'xx', source, n_chars+1000, doc_id*10+7, 'U'
        |  FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+9, 'D'
        |  FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, 'stale', source, n_chars, doc_id*10-5, 'U'
        |  FROM d WHERE doc_id % 13 = 0
        |  UNION ALL SELECT doc_id, 'v2', source, n_chars+5000, doc_id*10+20, 'U'
        |  FROM d WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+25, 'D'
        |  FROM d WHERE doc_id % 17 = 0),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM r2)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM w WHERE rn = 1 AND op <> 'D' GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      import graft.ops.{IncrementalAggOps, VersionedStoreOps}
      val vbase = scratchDir("graft-cdcroll-v")
      val abase = scratchDir("graft-cdcroll-a")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      VersionedStoreOps.writeVersioned(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, vbase, "doc_id", "seq", nBuckets = 16)
      val v1 = VersionedStoreOps.applyChangesVersioned(
        cdcBatch1(docs), s, vbase, "doc_id", "seq", "op", 16)
      val v2 = VersionedStoreOps.applyChangesVersioned(
        cdcBatch2(docs), s, vbase, "doc_id", "seq", "op", 16)
      def prep(df: DataFrame) =
        df.select(col("lang"), lit(1L).as("n"), col("n_chars").as("chars"))
      // the rollup is built from the v1 SNAPSHOT and then maintained
      // purely from the change feed
      IncrementalAggOps.writeAggStore(
        prep(VersionedStoreOps.readVersion(s, vbase, Some(v1))),
        s, abase, Seq("lang"), Seq("n", "chars"), nBuckets = 8)
      // the payload-carrying change feed: ONE pair of snapshot reads +
      // one full-outer join yields the changed keys WITH both sides'
      // payloads — the diff-then-join-each-snapshot-again shape this
      // replaces read v1 and v2 twice and paid two extra key joins for
      // the same rows
      val feed = VersionedStoreOps
        .changeFeed(s, vbase, "doc_id", "seq", v1, v2)
        .localCheckpoint(true) // two consumers below; changed keys only
      val oldRows = feed.filter(col("change").isin("del", "upd"))
        .select(col("old_row.lang").as("lang"),
          col("old_row.n_chars").as("n_chars"))
      val newRows = feed.filter(col("change").isin("add", "upd"))
        .select(col("new_row.lang").as("lang"),
          col("new_row.n_chars").as("n_chars"))
      // retract + merge composed into ONE bucket-local fold (sums
      // commute): one read-modify-write cycle per change feed, not two
      IncrementalAggOps.applyDiffToAggStore(
        prep(oldRows), prep(newRows), s, abase,
        Seq("lang"), Seq("n", "chars"), 8)
      IncrementalAggOps.readAggStore(s, abase)
        .filter(col("n") =!= 0)
        .orderBy("lang")
    },

    // ---- Min/max measure kinds in the rollup store: min and max are
    // commutative monoids like sum (partial ∘ partial = whole in any
    // order), so the same bucket-local build + fold maintains them —
    // they just forgo retraction (no inverses). Exact integer cents.
    q(
      "agg_store_minmax",
      """SELECT o_orderpriority,
        |  MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS min_cents,
        |  MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_cents,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      val base = scratchDir("graft-mmstore")
      val cents = round(col("o_totalprice") * 100).cast("long")
      val prepped = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        cents.as("min_cents"), cents.as("max_cents"), cents.as("total_cents"))
      val keys = Seq("o_orderpriority")
      val ms = Seq("min_cents", "max_cents", "total_cents")
      val kinds = Seq("min", "max", "sum")
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("o_orderkey") % 5 =!= 0).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 8, kinds = kinds)
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("o_orderkey") % 5 === 0).drop("o_orderkey"),
        s, base, keys, ms, nBuckets = 8, kinds = kinds)
      IncrementalAggOps.readAggStore(s, base).orderBy("o_orderpriority")
    },

    // ---- Materialized-view matching (beyond-reference): the optimizer
    // half of IVM. A rollup store is built 80/20 (write + fold) and
    // REGISTERED; the query then runs the PLAIN raw aggregate over the
    // fact parquet — AggStoreRewrite redirects it to the store at plan
    // time (plan-asserted in AggRewriteSpec; at 100 TB this is a
    // corpus scan turned into a |keys|-row read with no caller change).
    // The oracle aggregates the raw table: equal hashes prove the
    // served store state matches the truth through build + fold +
    // rewrite. Quantities are integer-valued doubles, so sums are
    // exact and order-free in both engines.
    q(
      "agg_rewrite",
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      import graft.plans.AggStoreRegistry
      val store = scratchDir("graft-aggrw")
      val factPath = s"$dir/lineitem.parquet"
      val li = s.read.parquet(factPath)
      val keys = Seq("l_returnflag", "l_linestatus")
      val ms = Seq("l_quantity", "l_orderkey")
      IncrementalAggOps.writeAggStore(
        li.filter(col("l_orderkey") % 5 =!= 0)
          .select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
        s, store, keys, ms, nBuckets = 8)
      IncrementalAggOps.mergeIntoAggStore(
        li.filter(col("l_orderkey") % 5 === 0)
          .select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
        s, store, keys, ms, nBuckets = 8)
      AggStoreRegistry.clear()
      AggStoreRegistry.register(s, factPath, store, keys, ms)
      // the RAW aggregate — served by the store via the optimizer rule
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          sum("l_orderkey").as("key_sum"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- The same registered rollup answering a COARSER grouping: the
    // rule re-aggregates the store's partials (sums are monoids;
    // integral measures only, so re-association is exact and
    // type-stable). One store, many granularities — the point of a
    // materialized rollup. Oracle aggregates raw; AggRewriteSpec pins
    // that the plan reads the store.
    q(
      "agg_rewrite_rollup",
      """SELECT l_returnflag, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups_src
        |FROM lineitem GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      import graft.plans.AggStoreRegistry
      val store = scratchDir("graft-aggrw2")
      val factPath = s"$dir/lineitem.parquet"
      val li = s.read.parquet(factPath)
      val keys = Seq("l_returnflag", "l_linestatus")
      // n_rows as a prepared 1-column: COUNT(*) is a sum on both sides
      val withOne = li.select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), lit(1L).as("n_rows"))
      IncrementalAggOps.writeAggStore(withOne, s, store, keys,
        Seq("l_orderkey", "n_rows"), nBuckets = 8)
      AggStoreRegistry.clear()
      AggStoreRegistry.register(s, factPath, store, keys,
        Seq("l_orderkey", "n_rows"), countMeasure = Some("n_rows"))
      // BOTH outputs are coarser RAW aggregates over the bare fact
      // table: the rule re-sums l_orderkey from the store, and serves
      // COUNT(*) from the declared sum-of-ones column — no scan of
      // lineitem survives in either branch (spec-asserted).
      val served = li.groupBy("l_returnflag")
        .agg(sum("l_orderkey").as("key_sum"))
      val counts = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_groups_src"))
      served.join(counts, "l_returnflag")
        .select("l_returnflag", "key_sum", "n_groups_src")
        .orderBy("l_returnflag")
    },

    // ---- Triangle counting (beyond-reference): co-purchase graph
    // (parts sharing an order) counted via GraphOps.triangleStats'
    // degree-ordered orientation — each triangle generated once from
    // its lowest-(degree,id) apex, wedge fan-out bounded by out-degree
    // ≤ O(√m) (hub-safe on power-law graphs). The oracle brute-forces
    // the id-canonical 3-way self-join; counts are representation
    // independent, so equality proves the oriented formulation drops
    // and double-counts nothing. Clustering coefficient in exact ppm.
    // The registered graph keeps every third part: the full co-purchase
    // graph's WEDGE VOLUME (Σ C(deg,2), ~80M at sf0.1) is a property of
    // the data, not the operator — the subset preserves the shape while
    // keeping the gate query proportionate to the rest of the suite.
    q(
      "graph_triangles",
      """WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |           WHERE l_partkey % 3 = 0),
        |e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM p x JOIN p y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |d AS (SELECT id, COUNT(*) AS dg FROM (
        |  SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |t AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
        |  (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) FROM d) AS n_wedges,
        |  (SELECT n_triangles FROM t) AS n_triangles,
        |  (SELECT CAST(3 * n_triangles * 1000000 //
        |    (SELECT SUM(dg * (dg - 1) // 2) FROM d) AS BIGINT) FROM t)
        |    AS gcc_ppm""".stripMargin
    ) { (s, dir) =>
      val p = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 3 === 0)
        .select("l_orderkey", "l_partkey").distinct()
      val e = p.as("x").join(p.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
      graft.ops.GraphOps.triangleStats(e, "src", "dst")
    },

    // ---- Incrementally-maintained JOIN view (beyond-reference): the
    // delta-join IVM rule (IncrementalJoinOps: ΔJ = ΔA⋈B ∪ A⋈ΔB ∪
    // ΔA⋈ΔB, every table bucket-partitioned by the key hash, deltas
    // join only their buckets and every write is an append). Orders and
    // lineitem are split 80/20 on INDEPENDENT key sets so all four
    // old/new pair combinations genuinely occur; the maintained view
    // read back must hash-equal DuckDB's one-shot join of the full
    // tables.
    q(
      "join_view_inc",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalJoinOps
      val base = scratchDir("graft-jview")
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      // independent 80/20 splits: %5 on the key for A, %7 ON THE KEY for
      // B, so delta-A keys meet base-B rows and vice versa
      IncrementalJoinOps.writeJoinView(
        a.filter(col("k") % 5 =!= 0), b.filter(col("k") % 7 =!= 0),
        s, base, "k", nBuckets = 16)
      IncrementalJoinOps.appendToJoinView(
        a.filter(col("k") % 5 === 0), b.filter(col("k") % 7 === 0),
        s, base, "k", nBuckets = 16)
      IncrementalJoinOps.readJoinView(s, base)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(D)
            * (lit(1) - col("l_discount").cast(D)))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },

    // ---- The join view's FULL maintenance lifecycle under the oracle
    // (the sibling of the vector store's ann_del_q): seed build, two
    // delta refreshes on overlapping keys (so buckets fragment), a
    // deferred-GC compaction (every fragmented bucket of all three
    // tables rewritten into a new commit, manifest swapped), then the
    // vacuum sweep of the superseded dirs — and only then the read.
    // DuckDB computes the same join declaratively from the full tables;
    // a red hash means compaction or vacuum changed live data.
    q(
      "join_view_maint",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalJoinOps
      val base = scratchDir("graft-jvmaint")
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      // seed 80%ish, then two waves per side on independent splits —
      // repeated hits on the same buckets are the fragmentation
      // compaction exists for
      IncrementalJoinOps.writeJoinView(
        a.filter(col("k") % 5 =!= 0), b.filter(col("k") % 7 =!= 0),
        s, base, "k", nBuckets = 8)
      IncrementalJoinOps.appendToJoinView(
        a.filter(col("k") % 10 === 0), b.filter(col("k") % 14 === 0),
        s, base, "k", nBuckets = 8)
      IncrementalJoinOps.appendToJoinView(
        a.filter(col("k") % 10 === 5), b.filter(col("k") % 14 === 7),
        s, base, "k", nBuckets = 8)
      // rewrite every bucket holding more than one live file, deferring
      // GC; the vacuum is the quiet-window sweep that must not touch
      // committed data
      IncrementalJoinOps.compactJoinView(s, base,
        maxFilesPerBucket = 1, gc = false)
      IncrementalJoinOps.vacuumJoinView(s, base)
      IncrementalJoinOps.readJoinView(s, base)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(D)
            * (lit(1) - col("l_discount").cast(D)))
            .cast("double").as("revenue"),
          countDistinct(col("k")).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // ---- Row-level CDC store (beyond-reference): the lakehouse MERGE
    // pattern — a keyed current-rows store maintained by changelog apply
    // (DocStoreOps: within-batch LWW election, only the winners' hash
    // buckets read back and dynamically overwritten; untouched buckets
    // byte-equal, spec-asserted). The batch mixes inserts, updates, a
    // delete wave and LATE-ARRIVING stale updates that must LOSE to the
    // rows already in the store, and is applied TWICE — the oracle's
    // one-shot global last-writer-wins recompute over base+changelog
    // must match, which proves the election order (seq desc, delete
    // wins ties), out-of-order safety and idempotent re-apply at once.
    q(
      "store_cdc",
      """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |rows_all AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+5, 'U'
        |  FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 'xx', source, n_chars+1000, doc_id*10+7, 'U'
        |  FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+9, 'D'
        |  FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, 'stale', source, n_chars, doc_id*10-5, 'U'
        |  FROM d WHERE doc_id % 13 = 0),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM rows_all)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM w WHERE rn = 1 AND op <> 'D' GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      import graft.ops.DocStoreOps
      val base = scratchDir("graft-docstore")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      DocStoreOps.writeDocStore(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, base, "doc_id", "seq", nBuckets = 16)
      val changes = cdcBatch1(docs)
      DocStoreOps.applyChanges(changes, s, base, "doc_id", "seq", "op", 16)
      // second apply of the SAME batch: must be a no-op under the oracle
      DocStoreOps.applyChanges(changes, s, base, "doc_id", "seq", "op", 16)
      DocStoreOps.readDocStore(s, base)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")
    },

    // ---- Constraint-enforced CDC apply (the dead-letter pattern):
    // changes violating declared expectations are diverted to a
    // quarantine table instead of corrupting the store; deletes are
    // rule-exempt by construction of the predicates. The oracle splits
    // the changelog with the same predicates, recomputes the LWW state
    // of the VALID subset, and accounts for the quarantined rows in a
    // summary row — equal hashes prove the gate diverted exactly the
    // violating rows and nothing else.
    q(
      "store_cdc_checked",
      """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |ch AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10+5 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 'xx', source, n_chars+1000, doc_id*10+7, 'U'
        |  FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+9, 'D'
        |  FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, 'stale', source, n_chars, doc_id*10-5, 'U'
        |  FROM d WHERE doc_id % 13 = 0),
        |ok AS (SELECT op = 'D' OR (n_chars % 9 <> 0 AND lang <> 'stale') AS v, *
        |       FROM ch),
        |rows_all AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, lang, source, n_chars, seq, op
        |  FROM ok WHERE v),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM rows_all)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM w WHERE rn = 1 AND op <> 'D' GROUP BY lang
        |UNION ALL
        |SELECT '__quarantined', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        |FROM ok WHERE NOT v""".stripMargin
    ) { (s, dir) =>
      import graft.ops.DocStoreOps
      val base = scratchDir("graft-docstore-chk")
      val quarantine = scratchDir("graft-docstore-dlq")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      DocStoreOps.writeDocStore(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, base, "doc_id", "seq", nBuckets = 16)
      DocStoreOps.applyChangesChecked(
        cdcBatch1(docs), s, base, "doc_id", "seq", "op",
        expectations = Seq(
          "chars_not_div9" -> (col("op") === "D" || col("n_chars") % 9 =!= 0),
          "no_stale_lang" -> (col("op") === "D" || col("lang") =!= "stale")),
        quarantinePath = quarantine, nBuckets = 16)
      DocStoreOps.readDocStore(s, base)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .unionByName(s.read.parquet(quarantine)
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
          .select(lit("__quarantined").as("lang"), col("n"), col("chars")))
        .orderBy("lang")
    },

    // ---- Keyed lookup against the CDC store: only the requested keys'
    // hash buckets are listed and scanned (file-level prune asserted in
    // DocStoreSpec); the oracle reads the flat original — equal hashes
    // prove pruning loses nothing.
    q(
      "store_lookup",
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % 97 = 0""".stripMargin
    ) { (s, dir) =>
      import graft.ops.DocStoreOps
      val base = scratchDir("graft-docstore-lk")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      DocStoreOps.writeDocStore(
        docs.withColumn("seq", col("doc_id")),
        s, base, "doc_id", "seq", nBuckets = 16)
      DocStoreOps.lookupKeys(s, base,
          docs.filter(col("doc_id") % 97 === 0).select("doc_id"),
          "doc_id", nBuckets = 16)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ---- Attribute lookup through a MAINTAINED SECONDARY INDEX:
    // postings (lang, doc_id) bucketed by lang, appended on every CDC
    // apply, never cleaned in-line — the lookup read-repairs against
    // the primary, so stale postings (docs whose lang changed to 'xx',
    // deleted docs) prune away instead of corrupting results. The
    // CDC wave guarantees stale postings EXIST at query time; the
    // oracle recomputes the LWW current state and filters — equal
    // hashes prove the index+repair path returns exactly the current
    // matches, nothing resurrected, nothing lost.
    q(
      "store_attr_lookup",
      """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |rows_all AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+5, 'U'
        |  FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 'xx', source, n_chars+1000, doc_id*10+7, 'U'
        |  FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+9, 'D'
        |  FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, 'stale', source, n_chars, doc_id*10-5, 'U'
        |  FROM d WHERE doc_id % 13 = 0),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM rows_all)
        |SELECT doc_id, lang, source, n_chars FROM w
        |WHERE rn = 1 AND op <> 'D' AND lang IN ('xx', 'de')""".stripMargin
    ) { (s, dir) =>
      import graft.ops.DocStoreOps
      val base = scratchDir("graft-docstore-ai")
      val idx = scratchDir("graft-docstore-ai-idx")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      DocStoreOps.writeDocStore(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, base, "doc_id", "seq", nBuckets = 16)
      DocStoreOps.buildAttrIndex(s, base, idx, "doc_id", "lang", 16)
      DocStoreOps.applyChangesIndexed(cdcBatch1(docs), s, base, idx,
        "doc_id", "seq", "op", "lang", 16)
      import s.implicits._
      DocStoreOps.lookupByAttr(s, base, idx, "doc_id", "lang",
          Seq("xx", "de").toDF("lang"), 16)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ---- Time travel (beyond-reference): copy-on-write snapshots over
    // the CDC store (VersionedStoreOps) — each apply writes ONLY its
    // touched buckets under a new v=N dir; prior versions share every
    // other bucket and are never rewritten. The query applies TWO waves
    // and reads AT VERSION 1: the oracle recomputes the batch-1-only
    // state, so a hash match proves snapshot immutability under later
    // writes (the v1 read resolves through the manifest while v2's dirs
    // already exist on disk).
    q(
      "store_timetravel",
      """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |rows_all AS (
        |  SELECT doc_id, lang, source, n_chars, doc_id*10 AS seq, 'U' AS op
        |  FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+5, 'U'
        |  FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, 'xx', source, n_chars+1000, doc_id*10+7, 'U'
        |  FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, lang, source, n_chars, doc_id*10+9, 'D'
        |  FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, 'stale', source, n_chars, doc_id*10-5, 'U'
        |  FROM d WHERE doc_id % 13 = 0),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM rows_all)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM w WHERE rn = 1 AND op <> 'D' GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      import graft.ops.VersionedStoreOps
      val base = scratchDir("graft-vstore-tt")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      VersionedStoreOps.writeVersioned(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, base, "doc_id", "seq", nBuckets = 16)
      VersionedStoreOps.applyChangesVersioned(
        cdcBatch1(docs), s, base, "doc_id", "seq", "op", 16)
      VersionedStoreOps.applyChangesVersioned(
        cdcBatch2(docs), s, base, "doc_id", "seq", "op", 16)
      VersionedStoreOps.readVersion(s, base, Some(1L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")
    },

    // ---- Snapshot diff (beyond-reference): rows added / deleted /
    // changed between two store versions, computed as a full-outer join
    // of the two snapshot reads on the key with the producing SEQUENCE
    // as the change detector (LWW guarantees versions of a key differ
    // iff their sequences do). The oracle recomputes both states from
    // the changelog arithmetic and diffs them declaratively.
    q(
      "store_diff",
      """WITH d AS (SELECT doc_id FROM documents),
        |r1 AS (
        |  SELECT doc_id, doc_id*10 AS seq, 'U' AS op FROM d WHERE doc_id % 4 <> 3
        |  UNION ALL SELECT doc_id, doc_id*10+5, 'U' FROM d WHERE doc_id % 4 = 3
        |  UNION ALL SELECT doc_id, doc_id*10+7, 'U' FROM d WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, doc_id*10+9, 'D' FROM d WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, doc_id*10-5, 'U' FROM d WHERE doc_id % 13 = 0),
        |s1 AS (SELECT doc_id, seq FROM (SELECT doc_id, seq, op,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM r1)
        |  WHERE rn = 1 AND op <> 'D'),
        |r2 AS (
        |  SELECT doc_id, seq, op FROM r1
        |  UNION ALL SELECT doc_id, doc_id*10+20, 'U' FROM d WHERE doc_id % 5 = 0
        |  UNION ALL SELECT doc_id, doc_id*10+25, 'D' FROM d WHERE doc_id % 17 = 0),
        |s2 AS (SELECT doc_id, seq FROM (SELECT doc_id, seq, op,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY seq DESC, (op = 'D') DESC) AS rn FROM r2)
        |  WHERE rn = 1 AND op <> 'D')
        |SELECT CASE WHEN s1.doc_id IS NULL THEN 'add'
        |            WHEN s2.doc_id IS NULL THEN 'del'
        |            ELSE 'upd' END AS change,
        |  COUNT(*) AS n,
        |  CAST(SUM(COALESCE(s2.doc_id, s1.doc_id)) AS BIGINT) AS id_sum
        |FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
        |WHERE s1.doc_id IS NULL OR s2.doc_id IS NULL OR s1.seq <> s2.seq
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.VersionedStoreOps
      val base = scratchDir("graft-vstore-diff")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      VersionedStoreOps.writeVersioned(
        docs.filter(col("doc_id") % 4 =!= 3)
          .withColumn("seq", col("doc_id") * 10),
        s, base, "doc_id", "seq", nBuckets = 16)
      val v1 = VersionedStoreOps.applyChangesVersioned(
        cdcBatch1(docs), s, base, "doc_id", "seq", "op", 16)
      val v2 = VersionedStoreOps.applyChangesVersioned(
        cdcBatch2(docs), s, base, "doc_id", "seq", "op", 16)
      VersionedStoreOps.diffVersions(s, base, "doc_id", "seq", v1, v2)
        .groupBy("change")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("change")
    },

    // ---- Exact Pearson correlation (beyond-reference): the libm-free,
    // order-free formulation — quantize both measures to exact integers
    // (quantity is integral; price has 2 decimals → ×100), accumulate
    // the five moment sums in DECIMAL(38,0) (partial-agg order can't
    // perturb integers), and evaluate the closed form in ONE identical
    // double expression on both engines. corr() built-ins would disagree
    // across engines in the last ulps; this hash-matches exactly.
    q(
      "a_corr",
      """WITH s AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem)
        |SELECT COUNT(*) AS n,
        |  ROUND(CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) /
        |    SQRT(CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE) *
        |         CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS DOUBLE)), 6)
        |  AS corr_qty_price
        |FROM s""".stripMargin
    ) { (s, dir) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val xy = t(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      xy.agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .select(col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
            6).as("corr_qty_price"))
    },

    // ---- Data-quality gate (beyond-reference): Deequ-style declarative
    // rules compiled to conditional aggregates — per table, N rules ride
    // ONE scan (QualityOps; single-scan plan spec-asserted); referential
    // integrity is a broadcast anti-join count. Rules are chosen so some
    // genuinely FAIL (negative balances, >5% discounts) — the gate
    // proves violation COUNTING, not just all-zeros.
    q(
      "dq_checks",
      """SELECT 'o_custkey.not_null' AS rule,
        |  COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations,
        |  COUNT(*) FILTER (WHERE o_custkey IS NULL) = 0 AS pass FROM orders
        |UNION ALL SELECT 'o_orderkey.unique',
        |  COUNT(*) - COUNT(DISTINCT o_orderkey),
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 FROM orders
        |UNION ALL SELECT 'o_totalprice.positive',
        |  COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE)),
        |  COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE)) = 0
        |  FROM orders
        |UNION ALL SELECT 'c_acctbal.non_negative',
        |  COUNT(*) FILTER (WHERE NOT COALESCE(c_acctbal >= 0, FALSE)),
        |  COUNT(*) FILTER (WHERE NOT COALESCE(c_acctbal >= 0, FALSE)) = 0
        |  FROM customer
        |UNION ALL SELECT 'l_discount.le_5pct',
        |  COUNT(*) FILTER (WHERE NOT COALESCE(l_discount <= 0.05, FALSE)),
        |  COUNT(*) FILTER (WHERE NOT COALESCE(l_discount <= 0.05, FALSE)) = 0
        |  FROM lineitem
        |UNION ALL SELECT 'l_quantity.in_range',
        |  COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)),
        |  COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)) = 0
        |  FROM lineitem
        |UNION ALL SELECT 'o_custkey.in_customer',
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0""".stripMargin
    ) { (s, dir) =>
      import graft.ops.QualityOps
      import graft.ops.QualityOps._
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val li = t(s, dir, "lineitem")
      QualityOps.validate(orders, Seq(
          notNull("o_custkey"), unique("o_orderkey"),
          satisfies("o_totalprice.positive", col("o_totalprice") > 0)))
        .unionByName(QualityOps.validate(cust, Seq(
          satisfies("c_acctbal.non_negative", col("c_acctbal") >= 0))))
        .unionByName(QualityOps.validate(li, Seq(
          satisfies("l_discount.le_5pct", col("l_discount") <= 0.05),
          satisfies("l_quantity.in_range", col("l_quantity").between(1, 50)))))
        .unionByName(QualityOps.refIntegrity(
          orders, "o_custkey", cust, "c_custkey", "o_custkey.in_customer"))
        .orderBy("rule")
    },

    // ---- Ratio-to-report: each group's share of the grand total via a
    // window over the AGGREGATED frame (6 rows — bounded by the flag
    // domain, so the unpartitioned window is scale-safe; the raw data
    // never sees it). Exact decimal sums; one double division at the end.
    q(
      "a_rev_share",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) /
        |        CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) OVER () AS DOUBLE), 6) AS share
        |FROM lineitem GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast(D)).as("__rev"))
        .withColumn("__tot", sum("__rev").over(Window.partitionBy()))
        .select(col("l_returnflag"),
          col("__rev").cast("double").as("revenue"),
          round(col("__rev").cast("double") / col("__tot").cast("double"), 6)
            .as("share"))
    },

    // ---- ROLLUP multi-level aggregate: per-(flag,status) cells plus
    // per-flag and grand totals in ONE pass (Expand feeds a single
    // hash aggregation — no separate re-scan per level).
    q(
      "a_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    },

    // ---- A17 (beyond-rollup): full CUBE — all 2^k grouping combinations
    // in ONE pass (Catalyst expands to a single Expand + hash agg, not
    // 2^k scans; same reference analog as a_rollup). NULL is a real value
    // of l_linestatus nowhere in the data, so the grouping-id columns
    // disambiguate subtotal rows from data rows portably in both engines.
    q(
      "a_cube",
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping("l_returnflag").cast("int").as("g_rf"),
          grouping("l_linestatus").cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("qty"))
    },

    // ---- A18: exact discrete quantiles by rank selection — the value at
    // row ceil(p·n) of each group's sorted order. Pure element selection:
    // no interpolation arithmetic to diverge between engines, and ties in
    // the value don't matter (the multiset value at a rank is unique even
    // when row_number among ties is not). The window partitions by group —
    // parallel across groups, no global sort. The production scale path
    // for ungrouped/huge groups is approx_percentile (t-digest-style GK
    // summaries, merge order-sensitive hence NOT oracle-able — bounded in
    // QuantileSpec instead).
    q(
      "a_quantile_disc",
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN l_quantity END) AS p50,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN l_quantity END) AS p90,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN l_quantity END) AS p99
        |FROM r GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val byFlag = Window.partitionBy("l_returnflag")
      val r = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .withColumn("rn", row_number().over(byFlag.orderBy("l_quantity")))
        .withColumn("n", count(lit(1)).over(byFlag))
      def at(p: Double) =
        max(when(col("rn") === ceil(lit(p) * col("n")).cast("long"),
          col("l_quantity")))
      r.groupBy("l_returnflag")
        .agg(at(0.5).as("p50"), at(0.9).as("p90"), at(0.99).as("p99"))
    },

    // ---- approx_percentile (the GK-summary scale path the row above
    // documents) under the gate, self-check pattern like ev_hll_users:
    // the EXACT p50/p90 hash-compare (same rank selection as
    // a_quantile_disc), and the sketch's guarantee — the returned value's
    // RANK is within n/accuracy of the target — rides along as claim
    // columns DuckDB asserts literally TRUE. Rank-of-value is computed
    // with <= / < counts so value ties can't fake a failure; the raw
    // approx values are merge-order-sensitive and never leave the query.
    q(
      "a_quantile_approx",
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN l_quantity END) AS p50,
        |  MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN l_quantity END) AS p90,
        |  TRUE AS ok50, TRUE AS ok90
        |FROM r GROUP BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val acc = 1000
      val approx = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_quantity"),
          array(lit(0.5), lit(0.9)), lit(acc)).as("ap"))
        .select(col("l_returnflag"),
          element_at(col("ap"), 1).as("a50"), element_at(col("ap"), 2).as("a90"))
      val byFlag = Window.partitionBy("l_returnflag")
      val exact = li
        .withColumn("rn", row_number().over(byFlag.orderBy("l_quantity")))
        .withColumn("n", count(lit(1)).over(byFlag))
        .groupBy("l_returnflag")
        .agg(
          max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"),
            col("l_quantity"))).as("p50"),
          max(when(col("rn") === ceil(lit(0.9) * col("n")).cast("long"),
            col("l_quantity"))).as("p90"))
      val ranks = li.join(broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_quantity") <= col("a50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("l_quantity") < col("a50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("l_quantity") <= col("a90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("l_quantity") < col("a90"), 1L).otherwise(0L)).as("lt90"))
      def okAt(p: Double, le: String, lt: String) = {
        val target = ceil(lit(p) * col("n")).cast("long")
        val slack = (col("n") / acc).cast("long") + 1L
        (col(le) >= target - slack) && (col(lt) <= target + slack)
      }
      exact.join(ranks, "l_returnflag")
        .select(col("l_returnflag"), col("p50"), col("p90"),
          okAt(0.5, "le50", "lt50").as("ok50"),
          okAt(0.9, "le90", "lt90").as("ok90"))
    }
  )
}
