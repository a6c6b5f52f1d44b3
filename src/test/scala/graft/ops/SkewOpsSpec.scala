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
}
