package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted count equals plain groupBy count, incl. a hot key") {
    // 90% of rows share one key — the skew scenario
    val df = (1 to 20000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "HOT", i.toLong))
      .toDF("k", "v").repartition(8)
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCount(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("the salted plan has two aggregation exchanges") {
    val df = spark.read.parquet(s"$sfTiny/orders.parquet")
    val p = SkewOps.saltedCount(df, Seq("o_orderpriority"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2, p)
  }

  test("AQE skew-join splits the hot key's partition at runtime") {
    // Joins don't need manual salting: AQE detects the oversized shuffle
    // partition AT RUNTIME and splits it across tasks. This pins that the
    // mechanism actually fires on a hot-key join (thresholds scaled down
    // to fixture size; at 100 TB the defaults play the same role).
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32kb")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one key carries 300k of 310k rows; dim side is uniform
      val hot = spark.range(300000).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(10000).select(($"id" % 100 + 1).as("k"), $"id".as("v")))
      val dim = spark.range(101).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = hot.join(dim, "k")
        .agg(sum($"v" * $"w").as("s"), count(lit(1)).as("n"))
      val row = joined.collect().head
      // exact expected: k=0 contributes w=0; uniform tail sums v*2k
      val expect = (0L until 10000L).map(i => i * 2 * (i % 100 + 1)).sum
      assert(row.getLong(0) == expect && row.getLong(1) == 310000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead"), p)
      assert(p.toLowerCase.contains("skewed"),
        s"skew-join did not fire:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
