package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Dev-only stage profiler for the pipeline_cdc_rollup lifecycle. */
object DevProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .appName("dev-profile-cdc").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    import graft.ops.{IncrementalAggOps, VersionedStoreOps}
    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    (0 until 3).foreach { round =>
      println(s"== round $round ==")
      val vbase = scratchDir("dev-cdcroll-v")
      val abase = scratchDir("dev-cdcroll-a")
      val docs = tDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
      stage("writeVersioned") {
        VersionedStoreOps.writeVersioned(
          docs.filter(col("doc_id") % 4 =!= 3)
            .withColumn("seq", col("doc_id") * 10),
          s, vbase, "doc_id", "seq", nBuckets = 16)
      }
      val b1 = docs.filter(col("doc_id") % 4 === 3)
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
      val b2 = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("lang", lit("v2"))
        .withColumn("n_chars", col("n_chars") + 5000)
        .withColumn("seq", col("doc_id") * 10 + 20).withColumn("op", lit("U"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .withColumn("seq", col("doc_id") * 10 + 25).withColumn("op", lit("D")))
      val v1 = stage("applyChanges v1") {
        VersionedStoreOps.applyChangesVersioned(
          b1, s, vbase, "doc_id", "seq", "op", 16)
      }
      val v2 = stage("applyChanges v2") {
        VersionedStoreOps.applyChangesVersioned(
          b2, s, vbase, "doc_id", "seq", "op", 16)
      }
      def prep(df: DataFrame) =
        df.select(col("lang"), lit(1L).as("n"), col("n_chars").as("chars"))
      stage("writeAggStore(v1)") {
        IncrementalAggOps.writeAggStore(
          prep(VersionedStoreOps.readVersion(s, vbase, Some(v1))),
          s, abase, Seq("lang"), Seq("n", "chars"), nBuckets = 8)
      }
      val diff = stage("diffVersions+ckpt") {
        VersionedStoreOps
          .diffVersions(s, vbase, "doc_id", "seq", v1, v2)
          .localCheckpoint(true)
      }
      val oldRows = VersionedStoreOps.readVersion(s, vbase, Some(v1))
        .join(diff.filter(col("change").isin("del", "upd")), "doc_id")
      val newRows = VersionedStoreOps.readVersion(s, vbase, Some(v2))
        .join(diff.filter(col("change").isin("add", "upd")), "doc_id")
      stage("retract") {
        IncrementalAggOps.retractFromAggStore(
          prep(oldRows), s, abase, Seq("lang"), Seq("n", "chars"), 8)
      }
      stage("merge") {
        IncrementalAggOps.mergeIntoAggStore(
          prep(newRows), s, abase, Seq("lang"), Seq("n", "chars"), 8)
      }
      stage("readAggStore") {
        IncrementalAggOps.readAggStore(s, abase)
          .filter(col("n") =!= 0)
          .orderBy("lang").collect()
      }
    }
    s.stop()
  }
}
