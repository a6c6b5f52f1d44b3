package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the shuffle-elimination technique for
  * repeated large⋈large joins at the 100 TB posture: pre-bucket both fact
  * tables on the join key once, and every subsequent join planned over the
  * bucket metadata skips BOTH exchanges. This spec proves the engine
  * exploits it: same results as the plain join, zero `Exchange
  * hashpartitioning` in the executed plan. */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buckets")
    val l = spark.read.parquet(s"$sfSmall/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfSmall/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    try {
      l.write.mode("overwrite")
        .option("path", s"$tmp/l_b").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("l_b")
      o.write.mode("overwrite")
        .option("path", s"$tmp/o_b").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_b")
      // force the non-broadcast path so the exchange question is real
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("l_b")
          .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n"), graft.queries.dsum(col("l_quantity")).as("q"))
        val rows = j.collect()
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n${plan.take(2000)}")
        // value parity with the plain (shuffling) join
        val expect = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n"), graft.queries.dsum(col("l_quantity")).as("q"))
          .collect()
        def key(rs: Array[org.apache.spark.sql.Row]) =
          rs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
        assert(key(rows) == key(expect))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS l_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
