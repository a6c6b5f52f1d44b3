package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the registered queries: the properties that
  * keep the engine fast at 100 TB must be visible in the executed plans,
  * not just hoped for. */
class PlanQualitySpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny).queryExecution.executedPlan.toString

  test("filters are pushed to the parquet scan") {
    val p = plan("p2_interval_filter")
    assert(p.contains("PushedFilters: ["), p)
    // the interval disjunction pushes Or(GreaterThanOrEqual..) row-group stats
    assert(p.contains("Or(") || p.contains("GreaterThanOrEqual"), p)
  }

  test("column pruning reaches the scan (ReadSchema is narrow)") {
    val p = plan("a1_count")
    // count(*) should read an empty/struct-less schema, not all 16 columns
    assert(p.contains("ReadSchema: struct<>"), p)
  }

  test("the dimension join chain broadcasts the dim from STATS, not a hint") {
    // sf0.01: big enough that the choice is a real decision, small enough
    // for the suite. The filtered customer side grows linearly with scale
    // factor, so a planning-time hint would be an OOM at 100 TB — the
    // broadcast must come from the scan's size stats / AQE runtime stats.
    val df = SparkEntry.queries("q3_topk_join")(spark, sfSmall)
    df.collect() // let AQE finalize from runtime stats
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // ZERO planning-time broadcast hints anywhere in the chain
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.toLowerCase.contains("hint"), logical)
  }

  test("contamination's test side is not pinned by a hint (huge side → shuffle)") {
    // With broadcast disabled there must be NO broadcast join left in the
    // decontamination plan: a hint would force one regardless — the exact
    // failure mode when the test side is a corpus fraction at 100 TB.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    val oldAqe = spark.conf.getOption(aqeKey)
    try {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      val df = SparkEntry.queries("decontam_ngram")(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), p)
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      oldAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
    }
    // and with stats enabled, the genuinely-small test side DOES broadcast
    val df2 = SparkEntry.queries("decontam_ngram")(spark, sfTiny)
    df2.collect()
    assert(df2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("aggregations are partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("no accidental cartesian products in the LSH dedup path") {
    Seq("dedup_minhash", "dedup_simhash", "ann_lsh", "dedup_incremental_md5",
      "ann_del_q", "ann_qstore_q", "decontam_store_q")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"),
          s"$q must join on band keys, not cross:\n$p")
      }
  }

  test("hdr store-serving gate queries read the store, not the fact") {
    try {
      Seq("agg_hdr_serve" -> "graft-hdrserve",
        "agg_hdr_rollup" -> "graft-hdrrollup").foreach { case (q, dir) =>
        val df = SparkEntry.queries(q)(spark, sfTiny)
        val scans = df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString)
              case _ => Seq.empty[String]
            }
        }.flatten
        assert(scans.exists(p => p.contains(dir) && p.contains("store")),
          s"$q must scan its rollup store: $scans")
        assert(!scans.exists(_.contains("events_")),
          s"$q must not scan the prepared fact: $scans")
      }
    } finally graft.plans.AggStoreRegistry.clear()
  }

  test("IVF's data-sized join is an equi-join on the cell id") {
    val p = plan("ann_ivf")
    // centroid scoring is a bounded nlist-row broadcast; the corpus-side
    // candidate join must be keyed on cid, never a cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cid"), p)
  }

  test("global-order queries carry no partition-less window") {
    Seq("a15_prefix_sum", "j5_lag_prev", "w1_lead_splits", "w4_rownum_range",
      "a8_cdf", "bam_check_blocks", "tok_vocab")
      .foreach { q =>
        val p = plan(q)
        // ScalableWindow partitions every window by the deterministic
        // range-bucket id; tok_vocab is window-free by design (top-k via
        // TakeOrderedAndProject + broadcast self-join rank)
        val bad = "windowspecdefinition\\((?!__swb)".r
        assert(bad.findFirstIn(p).isEmpty,
          s"$q has a window not partitioned by __swb:\n$p")
      }
  }

  test("bam interval query plans only pruned partitions") {
    val fx = graft.bam.fixtures.BamFixture.default
    val full = spark.read.format("bam").option("splitSize", "16384")
      .load(fx.bamPath)
    val pruned = full.filter(col("refIdx") === 2 && col("pos") < 100000)
    assert(pruned.rdd.getNumPartitions < full.rdd.getNumPartitions)
  }

  test("pid-shuffle elimination never strips a join child's exchange") {
    import spark.implicits._
    // Repro from the round-2 advisory: a sort-merge join keyed on a
    // materialized spark_partition_id column. Stripping only the left
    // side's exchange mis-aligns the co-partitioning and drops rows.
    val left = spark.range(1000).repartitionByRange(4, col("id"))
      .withColumn("pid", spark_partition_id())
    val right = (0 until 4).toDF("pid").withColumn("tag", col("pid") * 10)
    val joined = left.hint("merge").join(right, "pid")
    assert(joined.count() === 1000L)
    val p = joined.queryExecution.executedPlan.toString
    // both sides of the SMJ must still be hash-partitioned on pid
    assert("Exchange hashpartitioning\\(pid".r.findAllIn(p).length >= 2, p)
  }

  test("whole-stage codegen covers the scan->filter->project pipelines") {
    val p = plan("f7_pos_pack")
    assert(p.contains("*(1)"), p) // codegen stage marker
  }

  test("weighted sampling is shuffle-free (pure per-row projection)") {
    // mixtureSample/mixtureUpsample must stay scan-bandwidth-bound at
    // 100 TB: any Exchange here means the sampling pass added a shuffle
    // it doesn't need
    Seq("sample_mixture", "sample_upweight").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q plans a shuffle:\n$p")
    }
  }

  test("bounded member sample runs through WindowGroupLimit") {
    // the rank-then-filter cap must be pushed: WindowGroupLimit trims
    // every group to K rows per partition BEFORE the shuffle, which is
    // the whole bounded-row guarantee of the membership sample
    val p = plan("dedup_prefix_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("curation funnel is one scan, not one per stage") {
    val df = SparkEntry.queries("curation_funnel")(spark, sfTiny)
    df.collect()
    // AQE's toString prints the Final AND the Initial plan — count scans
    // in the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // one parquet scan of documents feeds every stage flag
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
    // partial+final conditional aggregation (map-side combine)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("cube is one Expand pass, not 2^k scans") {
    val df = SparkEntry.queries("a_cube")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
    assert("Expand".r.findAllIn(p).length == 1, p)
    // the expanded stream still partial-aggregates before the shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("bloom prune: might_contain sits on the fact scan side, below the join") {
    val df = SparkEntry.queries("j6_bloom_join")(spark, sfTiny)
    val p = df.queryExecution.optimizedPlan.toString
    val join = p.indexOf("Join Inner")
    val bloom = p.indexOf("might_contain")
    assert(join >= 0 && bloom >= 0, p)
    // printed top-down: the filter being AFTER the join node means it is a
    // child of the join (pre-shuffle prune), not a post-join residue
    assert(bloom > join, s"might_contain must prune BEFORE the join:\n$p")
  }

  test("sliding windows expand once, never self-join") {
    val df = SparkEntry.queries("ev_sliding_agg")(spark, sfTiny)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // AQE prints Final + Initial sections: assert on the final plan only
    val p = full.split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), s"window expansion must not be a join:\n$p")
    // partial agg before the one shuffle: 4× expanded rows combine map-side
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("native session windows merge per-user, no global sort") {
    val df = SparkEntry.queries("ev_session_native")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("MergingSessions"), p)
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
    assert(!p.contains("rangepartitioning"),
      s"session merge must shuffle by user, not globally sort:\n$p")
  }

  test("attribution interval join is equi-keyed on user, never nested-loop") {
    val df = SparkEntry.queries("ev_attrib")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"time-range condition must ride the user_id equi-join:\n$p")
    assert(p.contains("HashJoin [user_id") || p.contains("SortMergeJoin [user_id"), p)
  }

  test("exact quantiles use a partitioned window, never a global sort") {
    val df = SparkEntry.queries("a_quantile_disc")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // every window is partitioned by the group key (a partition-less
    // window would funnel the whole table through one task), and no sort
    // is keyed first on the measure — that would be a global sort
    assert(p.contains("Window"), p)
    assert("windowspecdefinition\\((?!l_returnflag)".r.findFirstIn(p).isEmpty,
      s"window not partitioned by l_returnflag:\n$p")
    assert("Sort \\[l_quantity".r.findAllIn(p).isEmpty,
      s"global sort on the measure:\n$p")
  }

  test("real-codec decode is map-only: no Exchange anywhere in mm_decode_ppm") {
    // payload construction (md5 concat) and the decode (mapPartitions) are
    // both per-row: a shuffle here would mean the decode stage picked up an
    // accidental repartition/aggregation — at 100 TB the difference between
    // scan-bandwidth and a corpus shuffle
    val p = plan("mm_decode_ppm")
    assert(!p.contains("Exchange"), s"decode must not shuffle:\n$p")
  }

  test("hll store read touches the store, never the raw events") {
    // the rollup read must be a scan of the store parquet + one cell-count
    // aggregation — re-deriving from raw events would defeat the store
    val store = java.nio.file.Files
      .createTempDirectory("graft-hllplan").toString
    val ev = graft.queries.tEvents(spark, sfTiny)
    graft.ops.SketchOps.writeHllStore(ev, store, Seq("event_type"), col("user_id"))
    val read = graft.ops.SketchOps.readHllStore(spark, store, Seq("event_type"))
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains(store.split('/').last) || p.contains(store),
      s"read must scan the store path:\n$p")
    assert(!p.contains("events.parquet"), s"read must not rescan raw events:\n$p")
  }

  test("round-8 tier: corpus-scale windows keyed, stores pruned, no nest loops") {
    // bpe windows partition by word, ev_transitions by user — none of the
    // new tier's corpus-sized frames may fall into a global WindowExec
    Seq("bpe_merges", "ev_transitions", "store_cdc", "join_view_inc")
      .foreach { q =>
        val df = SparkEntry.queries(q)(spark, sfTiny)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$q must not nest-loop:\n$p")
      }
    // the store lookup carries its bucket partition filter into the scan
    val lk = SparkEntry.queries("store_lookup")(spark, sfTiny)
    lk.collect()
    assert(lk.queryExecution.executedPlan.toString.contains("__bucket"),
      "store_lookup must prune on the bucket partition column")
  }

  test("hdr sketch: bucket expr codegen'd on the scan; windows see only the bucket table") {
    val df = SparkEntry.queries("ev_hdr_quantile")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the log2-bucket arithmetic (bin/shiftleft/pmod) must sit inside the
    // scan-side whole-stage-codegen'd project, not a fallback UDF
    assert(p.contains("shiftleft") && p.contains("pmod"), p)
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
    // exactly ONE data-sized exchange: the partial count on (g, bucket)
    // pre-aggregates map-side; every later exchange moves the bounded
    // bucket table (and the final tiny ordered result)
    assert(p.contains("partial_count"), "bucket counts must combine map-side")
    val noWindowOnRaw = !p.contains("WindowExec")
    assert(noWindowOnRaw || p.contains("Window"), p) // windows exist but partitioned
    assert(!p.contains("Window [")
      || p.contains("windowspecdefinition(g#") || p.contains("windowspecdefinition(g,"),
      s"quantile windows must partition by group:\n$p")
  }

  test("asof / funnel / pagerank / store queries: no data-sized nested loops") {
    // queries with deliberate single-row cross joins (a broadcast scalar
    // frame joined onto a result — a_corr, ev_cms, ev_join_size,
    // tok_vocab) are excluded: a 1-row BNLJ is the right plan there.
    Seq("j8_asof", "ev_funnel", "graph_pagerank", "agg_store_inc",
      "text_search", "text_chunk", "dq_checks", "agg_hdr_serve").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not nest-loop:\n$p")
    }
  }

  test("round-12 tier: ranked windows partitioned, store paths pruned, " +
    "dedup joins equi-keyed") {
    // cms store / perceptual dedup / attr lookup: no data-sized nested
    // loop anywhere, and the store-backed paths carry pruning into
    // scans. Excluded from the no-BNLJ sweep with cause: w6/w7 (the
    // two-phase windows' carry join is a theta join over the BOUNDED
    // bucket-aggregate frame — ≤ 4·shuffle.partitions rows — where a
    // broadcast nested loop is the right plan; window-partitioning
    // asserted below instead) and text_bm25 (its corpus stats are a
    // ONE-ROW broadcast crossJoin, the a_corr/ev_cms exception class;
    // its pruning is asserted below).
    Seq("ev_cms_store",
      "mm_dhash_dedup", "mm_ahash_dedup", "mm_vdup_pairs", "mm_dhash_near",
      "store_attr_lookup").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not nest-loop:\n$p")
    }
    // no partition-less window in the rank-family plan (the tie-heavy
    // global order MUST ride the two-phase bucket machinery: every
    // windowspec leads with the bucket id, never with the order column)
    val w6 = SparkEntry.queries("w6_rank_family")(spark, sfTiny)
    w6.collect()
    val w6p = w6.queryExecution.executedPlan.toString
    assert(w6p.contains("Window"), w6p)
    assert(!w6p.contains("windowspecdefinition(o_orderpriority"),
      "rank-family window must be partitioned by the bucket id")
    // the attr-index lookup prunes BOTH sides on their bucket columns
    val al = SparkEntry.queries("store_attr_lookup")(spark, sfTiny)
    al.collect()
    assert(al.queryExecution.executedPlan.toString.contains("__bucket"),
      "attr lookup must prune bucket partitions")
    // bm25's postings scan is bucket-pruned (SelectedBucketsCount)
    val bm = SparkEntry.queries("text_bm25")(spark, sfTiny)
    bm.collect()
    assert(bm.queryExecution.executedPlan.toString
      .contains("SelectedBucketsCount"),
      "bm25 must bucket-prune the postings scan")
  }

  test("r16 tier: brute-force top-k broadcasts the bounded query side, " +
    "never a size-estimate-driven cartesian") {
    // The unhinted shape flipped to CartesianProduct exactly when the
    // query-side size estimate crossed the broadcast threshold (sf0.1,
    // 32 cores): left-partitions × right-partitions tasks, quadratic in
    // the core count. The explicit broadcast pins the join strategy at
    // every scale; the corpus side streams.
    Seq("emb_hash_q", "hybrid_rrf").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$q must broadcast the query side, not cartesian:\n$p")
    }
  }

  test("r16 tier: the proximity chain-walk is the codegen'd expression, " +
    "not the interpreted HOF chain") {
    // the scoring runs in an INTERMEDIATE action (the bounded result
    // checkpoint), invisible in the returned frame's plan — capture
    // every execution the query body runs, the DumpExplain machinery
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(fn: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      SparkEntry.queries("text_phrase_slop")(spark, sfTiny).collect()
      Thread.sleep(2000) // listener bus is async
    } finally spark.listenerManager.unregister(l)
    val all = plans.toArray.mkString("\n")
    assert(all.contains("greedy_chain_count"),
      "text_phrase_slop must score with greedy_chain_count")
    assert(!all.contains("aggregate(slice"),
      "the interpreted greedy fold must be gone from the hot filter")
  }

  test("r16 tier: index visibility is a PUSHED IN-filter on __batch " +
    "(file-level pruning), not a per-search broadcast join") {
    val df = SparkEntry.queries("text_bm25")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("In(__batch") || p.contains("__batch IN"),
      s"bm25's scan must carry the committed-tags IN pushdown:\n$p")
  }
}
