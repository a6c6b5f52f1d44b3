package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** AQE skew-join — the RUNTIME half of the skew defense (SkewOps salting
  * is the plan-time half): a sort-merge join whose shuffle produces one
  * giant partition must be re-planned at runtime into splits of that
  * partition joined against replicated build rows. Proven here: AQE marks
  * the join `skew=true` and the result matches the non-adaptive join. */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits the skewed partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 97% of the left side lands on key 0 — one monster shuffle partition
      val left = spark.range(300000).select(
        when(col("id") < 290000, 0L).otherwise(col("id") % 100).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("payload"))
      val right = spark.range(100).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("label"))
      // GLOBAL aggregate consumer: a groupBy on the join key would require
      // the join's hash partitioning downstream, which legally blocks the
      // skew rule (splitting the partition would break that requirement);
      // max(payload) keeps the wide column alive through the shuffle so
      // the key-0 partition is genuinely oversized
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max("payload").as("mp"),
          max("label").as("ml"))
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew-join split in plan:\n${plan.take(1500)}")
      // every left row matches exactly one dim row
      assert(rows.head.getLong(0) == 300000L)
      // lexicographic max of the padded payloads: digits sort below 'x',
      // so the shortest id wins — "xxx...x9"
      assert(rows.head.getString(1).length == 64 &&
        rows.head.getString(1).endsWith("9"))
      assert(rows.head.getString(2) == "dim_99")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
