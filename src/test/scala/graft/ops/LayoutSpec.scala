package graft.ops

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Layout-level properties of [[LayoutOps]] — the gate queries
  * (layout_part_roundtrip / layout_bucket_join / layout_compact) prove the
  * DATA survives each rewrite; this spec proves the LAYOUT is the one that
  * scales: bounded files per dir, directory pruning, in-file sort,
  * Exchange-free bucketed joins, size-derived compaction. */
class LayoutSpec extends SparkTestBase {

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  test("partitioned write: salted fan-out bounds files per dir, one dir per value") {
    val out = Files.createTempDirectory("layout-part")
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
    // 256 route-key slots: the two salt lanes of every lang land in
    // distinct tasks (deterministic xxhash64 routing — this outcome is
    // fixed for this data, not a flaky coin flip)
    LayoutOps.writePartitioned(docs, out.toString,
      partCols = Seq("lang"), sortCols = Seq("doc_id"),
      filesPerDir = 2, distCol = Some("doc_id"), numTasks = 256)

    val langDirs = Files.list(out).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("lang=")).toSeq
    val langs = docs.select("lang").distinct().count()
    assert(langDirs.size == langs, s"expected $langs lang dirs, got $langDirs")
    langDirs.foreach { d =>
      val files = parquetFiles(d)
      assert(files.nonEmpty && files.size <= 2,
        s"$d should hold 1..filesPerDir files, got ${files.size}")
    }
    // the skewed value actually fans out: en is ~44% of the corpus and
    // must use both salt lanes, not serialize on one writer
    val en = langDirs.find(_.getFileName.toString == "lang=en").get
    assert(parquetFiles(en).size == 2, "hot partition should use both salt lanes")

    // in-file sort: each individual file is doc_id-ordered (row-group
    // min/max stats stay disjoint → range filters prune inside the dir)
    val aFile = parquetFiles(en).head.toString
    val ids = spark.read.parquet(aFile).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "files must be sorted by sortCols")
  }

  test("partitioned read-back prunes directories, not rows") {
    val out = Files.createTempDirectory("layout-prune")
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
    LayoutOps.writePartitioned(docs, out.toString,
      partCols = Seq("lang"), sortCols = Seq("doc_id"))
    val df = spark.read.parquet(out.toString).filter(col("lang") === "zh")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("lang"), plan)
    // directory pruning is visible in the scan's file selection: only the
    // zh dir's single file is read
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    df.collect()
    assert(scanned.exists(_.value == 1), s"expected 1 file scanned, got $scanned")
  }

  test("bucketed tables join with zero Exchange") {
    val out = Files.createTempDirectory("layout-bkt")
    LayoutOps.writeBucketed(
      spark.read.parquet(s"$sfSmall/orders.parquet"),
      spark, "layout_spec_orders", s"$out/o", 8, "o_orderkey")
    LayoutOps.writeBucketed(
      spark.read.parquet(s"$sfSmall/lineitem.parquet"),
      spark, "layout_spec_lineitem", s"$out/l", 8, "l_orderkey")

    // one file per bucket — the precondition for Spark trusting sortBy
    // metadata (and for a stable task count on read)
    assert(parquetFiles(Path.of(s"$out/o")).size == 8)
    assert(parquetFiles(Path.of(s"$out/l")).size == 8)

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    val oldAqe = spark.conf.getOption(aqeKey)
    try {
      // force the join decision a 100 TB run faces: neither side broadcast
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      // projection-only join: any Exchange in this plan would be the
      // join's own. (The scan-level Sort survives — since SPARK-28595 a
      // bucketed scan only reports sortBy ordering under a legacy flag —
      // but a local per-bucket sort is O(bucket) with no network, not the
      // scale hazard the Exchange is.)
      val joined = spark.table("layout_spec_orders")
        .join(spark.table("layout_spec_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderpriority", "l_linenumber")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      oldAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
      spark.sql("DROP TABLE IF EXISTS layout_spec_orders")
      spark.sql("DROP TABLE IF EXISTS layout_spec_lineitem")
    }
  }

  test("z-order layout: disjoint z-ranges per file, 2-D box skips most files") {
    val out = Files.createTempDirectory("layout-z")
    val src = spark.read.parquet(s"$sfSmall/orders.parquet")
      .select(col("o_orderkey"),
        (col("o_custkey") % 256).as("x"),
        (col("o_orderkey") % 256).as("y"))
    LayoutOps.writeZOrdered(src, out.toString, col("x"), col("y"),
      numFiles = 16, bits = 8)

    val back = spark.read.parquet(out.toString)
    // semantic no-op: every row survives the clustered rewrite
    assert(back.count() == src.count())

    // range partitioning on z ⇒ per-file z-ranges are pairwise disjoint
    val fileRanges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("zmin"), max("z").as("zmax"),
        min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
      .collect()
    val sorted = fileRanges.sortBy(_.getAs[Long]("zmin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("zmax") < b.getAs[Long]("zmin"),
          "file z-ranges must be disjoint")
      case _ =>
    }

    // the layout's reason to exist: parquet footer min/max on x AND y stay
    // tight per file, so a 2-D box prunes on stats. A 16×16 box is 1/256
    // of the key space; under z-clustering few files' (x,y) bounding boxes
    // intersect it, where a 1-D x-sort would keep y's range full-width in
    // every file (no pruning on y at all).
    val (bx0, bx1, by0, by1) = (32L, 47L, 64L, 79L)
    val touched = fileRanges.count { r =>
      r.getAs[Long]("xmin") <= bx1 && r.getAs[Long]("xmax") >= bx0 &&
        r.getAs[Long]("ymin") <= by1 && r.getAs[Long]("ymax") >= by0
    }
    assert(touched <= fileRanges.length / 2,
      s"z-order should let a 1/256 box skip most of the $touched/${fileRanges.length} files")

    // and the surviving rows are exactly the source's box rows
    val got = back.filter(col("x").between(bx0, bx1) && col("y").between(by0, by1))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val want = src.filter(col("x").between(bx0, bx1) && col("y").between(by0, by1))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("compact sizes output from on-disk bytes and preserves every row") {
    val base = Files.createTempDirectory("layout-cmp")
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
    docs.repartition(32).write.mode("overwrite").parquet(s"$base/frag")
    assert(parquetFiles(Path.of(s"$base/frag")).size == 32)

    // target far above total size → exactly one packed file
    LayoutOps.compact(spark, s"$base/frag", s"$base/one", 1L << 30)
    assert(parquetFiles(Path.of(s"$base/one")).size == 1)

    // target ~quarter of total size → ceil(bytes/target) files
    val hPath = new org.apache.hadoop.fs.Path(s"$base/frag")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val target = math.max(1L, bytes / 4)
    LayoutOps.compact(spark, s"$base/frag", s"$base/four", target)
    val expect = ((bytes + target - 1) / target).toInt
    assert(parquetFiles(Path.of(s"$base/four")).size == expect)

    assert(spark.read.parquet(s"$base/one").count() == docs.count())
    assert(spark.read.parquet(s"$base/four").count() == docs.count())
  }
}
