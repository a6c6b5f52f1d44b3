package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.StatsOps.ColRange

class StatsSkippingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def docs =
    spark.read.parquet(s"$sfSmall/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("n_chars").cast("long").as("n_chars"))

  test("range read equals full scan + filter, on far fewer files") {
    val base = freshDir("stats-skip")
    StatsOps.writeWithStats(docs, spark, base,
      sortCols = Seq("n_chars"), statsCols = Seq("n_chars"), numFiles = 8)

    val ranges = Seq(ColRange("n_chars", Some(100L), Some(150L)))
    val total = new java.io.File(base).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val surviving = StatsOps.survivingFiles(spark, base, ranges)
    assert(total == 8, s"expected 8 data files, got $total")
    assert(surviving.size < total,
      s"manifest must prune files: $surviving of $total survive")

    val got = StatsOps.readSkipping(spark, base, ranges)
      .select("doc_id").as[Long].collect().sorted
    val want = docs.filter(col("n_chars").between(100, 150))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("append maintains the manifest incrementally; appended rows are found") {
    val base = freshDir("stats-append")
    StatsOps.writeWithStats(docs.filter($"doc_id" % 5 =!= 0), spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 8)
    val before = spark.read.parquet(s"$base/_graft_stats").count()
    StatsOps.appendWithStats(docs.filter($"doc_id" % 5 === 0), spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 2)
    val manifest = spark.read.parquet(s"$base/_graft_stats")
    val dataFiles = new java.io.File(base).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(manifest.count() == dataFiles,
      "manifest must have exactly one row per data file on disk")
    assert(manifest.count() > before,
      "append must extend the manifest with its own files' stats rows")
    // every data file on disk is covered — nothing left to the
    // conservative unknown-file path
    val known = manifest.select(substring_index($"file", "/", -1))
      .as[String].collect().toSet
    val onDisk = new java.io.File(base).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk.subsetOf(known))

    val got = StatsOps.readSkipping(spark, base,
        Seq(ColRange("n_chars", Some(100L), Some(150L))))
      .select("doc_id").as[Long].collect().sorted
    val want = docs.filter($"n_chars".between(100, 150))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("a moved store keeps a valid manifest (paths are store-relative)") {
    val base = freshDir("stats-move-src")
    StatsOps.writeWithStats(docs, spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 8)
    val moved = freshDir("stats-move-dst") + "/store"
    assert(new java.io.File(base).renameTo(new java.io.File(moved)))
    spark.catalog.refreshByPath(base)
    val ranges = Seq(ColRange("n_chars", Some(100L), Some(150L)))
    val surviving = StatsOps.survivingFiles(spark, moved, ranges)
    assert(surviving.nonEmpty && surviving.forall(_.contains("stats-move-dst")),
      s"survivors must resolve inside the NEW location: $surviving")
    assert(surviving.size < 8, "pruning must still work after the move")
    val got = StatsOps.readSkipping(spark, moved, ranges)
      .select("doc_id").as[Long].collect().sorted
    val want = docs.filter($"n_chars".between(100, 150))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("appendWithStats bootstraps a manifest on a store that never had one") {
    val base = freshDir("stats-boot")
    docs.filter($"doc_id" < 400).coalesce(2)
      .write.mode("overwrite").parquet(base)
    // no writeWithStats/buildStats ever ran; append must not throw and
    // must cover EVERY file (pre-existing ones included)
    StatsOps.appendWithStats(docs.filter($"doc_id" >= 400), spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 2)
    val manifest = spark.read.parquet(s"$base/_graft_stats")
    val dataFiles = new java.io.File(base).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(manifest.count() == dataFiles)
    val got = StatsOps.readSkipping(spark, base,
        Seq(ColRange("n_chars", Some(100L), Some(150L))))
      .select("doc_id").as[Long].collect().sorted
    val want = docs.filter($"n_chars".between(100, 150))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("long-lived append history compacts the manifest back to one part") {
    val base = freshDir("stats-compact")
    StatsOps.writeWithStats(docs.filter($"doc_id" < 100), spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 2)
    val slices = (0 until StatsOps.ManifestCompactionThreshold + 2).map { i =>
      docs.filter($"doc_id" % 37 === i && $"doc_id" >= 100)
    }
    slices.foreach(s =>
      StatsOps.appendWithStats(s, spark, base, Seq("n_chars"), Seq("n_chars"), 1))
    val manifestParts = new java.io.File(s"$base/_graft_stats").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(manifestParts <= StatsOps.ManifestCompactionThreshold,
      s"manifest must compact, found $manifestParts parts")
    // compaction loses no stats rows: still one row per data file
    spark.catalog.refreshByPath(s"$base/_graft_stats")
    val manifest = spark.read.parquet(s"$base/_graft_stats")
    val dataFiles = new java.io.File(base).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(manifest.count() == dataFiles)
    assert(manifest.select($"file").as[String].collect().toSet.size == dataFiles,
      "no duplicate manifest rows after compaction")
  }

  test("files missing from the manifest are read conservatively") {
    val base = freshDir("stats-unknown")
    StatsOps.writeWithStats(docs.filter($"doc_id" < 400), spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 4)
    // a foreign writer appends without touching the manifest
    docs.filter($"doc_id" >= 400).coalesce(1)
      .write.mode("append").parquet(base)
    spark.catalog.refreshByPath(base)
    val got = StatsOps.readSkipping(spark, base,
        Seq(ColRange("n_chars", Some(100L), Some(150L))))
      .select("doc_id").as[Long].collect().sorted
    val want = docs.filter($"n_chars".between(100, 150))
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want),
      "unmanifested files must still be scanned")
  }

  test("empty survivor set returns an empty frame with the data schema") {
    val base = freshDir("stats-empty")
    StatsOps.writeWithStats(docs, spark, base,
      Seq("n_chars"), Seq("n_chars"), numFiles = 4)
    val out = StatsOps.readSkipping(spark, base,
      Seq(ColRange("n_chars", Some(1000000L), None)))
    assert(out.columns.contains("doc_id") && out.count() == 0)
  }

  test("2-D box over a Z-ordered layout prunes on both dimensions") {
    val base = freshDir("stats-zbox")
    val pts = spark.range(0, 4096).select(
      $"id".as("k"),
      ($"id" % 64).as("x"),
      (($"id" / 64).cast("long") % 64).as("y"))
    LayoutOps.writeZOrdered(pts, base, $"x", $"y", numFiles = 16, bits = 6)
    StatsOps.buildStats(spark, base, Seq("x", "y"))
    val ranges = Seq(
      ColRange("x", Some(8L), Some(15L)), ColRange("y", Some(16L), Some(23L)))
    val surviving = StatsOps.survivingFiles(spark, base, ranges)
    assert(surviving.size <= 4,
      s"z-clustered box should touch few files, got ${surviving.size} of 16")
    val got = StatsOps.readSkipping(spark, base, ranges).count()
    assert(got == 64, s"8x8 box over the full grid has 64 points, got $got")
  }

  test("multi-column conjunction prunes with per-column intervals") {
    val base = freshDir("stats-multi")
    StatsOps.writeWithStats(docs, spark, base,
      Seq("doc_id"), Seq("doc_id", "n_chars"), numFiles = 8)
    val got = StatsOps.readSkipping(spark, base, Seq(
        ColRange("doc_id", Some(100L), Some(299L)),
        ColRange("n_chars", Some(150L), None)))
      .select("doc_id").as[Long].collect().sorted
    val want = docs
      .filter($"doc_id".between(100, 299) && $"n_chars" >= 150)
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    val surviving = StatsOps.survivingFiles(spark, base,
      Seq(ColRange("doc_id", Some(100L), Some(299L))))
    assert(surviving.size <= 4,
      s"doc_id-clustered layout should prune, got ${surviving.size} of 8")
  }
}
