package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the scan-reduction mechanism for
  * partitioned fact tables at the 100 TB posture: a fact ⋈ filtered-dim
  * join must prune fact PARTITIONS from the dim side's runtime values,
  * not scan everything and filter rows. This spec lays lineitem out
  * partitioned by l_returnflag and proves the join plans a
  * `dynamicpruning` partition filter and returns the same rows as the
  * unpartitioned join. */
class PartitionPruningSpec extends SparkTestBase {

  test("fact join prunes partitions from the dim side at runtime") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp")
    try {
      val l = spark.read.parquet(s"$sfSmall/lineitem.parquet")
        .select("l_orderkey", "l_returnflag", "l_quantity")
      l.write.mode("overwrite").partitionBy("l_returnflag")
        .parquet(s"$tmp/lineitem_part")
      val fact = spark.read.parquet(s"$tmp/lineitem_part")
      // dim: flag descriptions, filtered to ONE flag at runtime. Written
      // to parquet: a LocalRelation dim would constant-fold the filter
      // away and the pruning rule needs a surviving selective predicate
      import spark.implicits._
      Seq(("A", "accepted"), ("N", "none"), ("R", "returned"))
        .toDF("flag", "label")
        .write.mode("overwrite").parquet(s"$tmp/dim")
      val dim = spark.read.parquet(s"$tmp/dim")
      val j = fact.join(dim.filter(col("label") === "returned"),
          col("l_returnflag") === col("flag"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), graft.queries.dsum(col("l_quantity")).as("q"))
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n${plan.take(1500)}")
      // value parity with the unpartitioned formulation
      val expect = l.join(dim.filter(col("label") === "returned"),
          col("l_returnflag") === col("flag"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), graft.queries.dsum(col("l_quantity")).as("q"))
        .collect()
      def key(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(key(rows) == key(expect))
      assert(rows.map(_.getLong(1)).sum > 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
