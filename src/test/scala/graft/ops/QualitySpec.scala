package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[QualityOps]] — the gate (dq_checks) hash-compares violation counts
  * on the real tables; this spec pins the rule semantics on adversarial
  * synthetic data (nulls in predicates, duplicates, orphan and NULL
  * foreign keys) and the one-scan plan claim. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(2L), Some(-3.0), "b"),
    (Some(2L), None, "c"),       // null measure: satisfies() must violate
    (None, Some(5.0), "d")       // null key
  ).toDF("k", "v", "tag")

  test("rule semantics: nulls violate predicates, uniqueness counts dupes") {
    val out = QualityOps.validate(df, Seq(
        QualityOps.notNull("k"),
        QualityOps.satisfies("v.non_negative", col("v") >= 0),
        QualityOps.unique("k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("k.not_null") == ((1L, false)))
    // -3.0 violates, the NULL v violates (pred not TRUE), 10 and 5 pass
    assert(out("v.non_negative") == ((2L, false)))
    // k values: 1, 2, 2, null → non-null count 3, distinct {1,2} = 2:
    // exactly ONE genuine duplicate. SQL UNIQUE semantics — the null is
    // NOT a phantom dupe (pair with notNull when nulls should fail)
    assert(out("k.unique") == ((1L, false)))
    // a unique-but-nullable column passes cleanly
    val nullsOnly = Seq(Some(1L), Some(2L), Option.empty[Long]).toDF("k")
    val u = QualityOps.validate(nullsOnly, Seq(QualityOps.unique("k")))
      .collect().head
    assert(u.getLong(1) == 0L && u.getBoolean(2),
      "nulls alone must not report duplicates")
    // and an EMPTY table gates pass=true with zero violations, not null
    val empty = QualityOps.validate(nullsOnly.limit(0),
      Seq(QualityOps.notNull("k"), QualityOps.unique("k"))).collect()
    assert(empty.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("refIntegrity counts orphans including NULL foreign keys") {
    val dim = Seq(1L, 2L).toDF("id")
    val out = QualityOps.refIntegrity(df, "k", dim, "id", "k.in_dim")
      .collect().head
    assert(out.getString(0) == "k.in_dim")
    assert(out.getLong(1) == 1L && !out.getBoolean(2),
      "the NULL k row never matches and must count as an orphan")
    val clean = QualityOps.refIntegrity(
      df.filter(col("k").isNotNull), "k", dim, "id", "k.in_dim")
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(2))
  }

  test("all row-local rules ride one scan of the table") {
    val orders = graft.queries.t(spark, sfTiny, "orders")
    val out = QualityOps.validate(orders, Seq(
      QualityOps.notNull("o_custkey"),
      QualityOps.unique("o_orderkey"),
      QualityOps.satisfies("price.pos", col("o_totalprice") > 0)))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"N rules must not mean N scans:\n$plan")
  }

  test("gate shape matches independently computed counts") {
    val cust = graft.queries.t(spark, sfSmall, "customer")
    val bad = cust.filter(col("c_acctbal") < 0).count()
    val out = QualityOps.validate(cust, Seq(
        QualityOps.satisfies("c_acctbal.non_negative", col("c_acctbal") >= 0)))
      .collect().head
    assert(out.getLong(1) == bad && bad > 0,
      "fixture must exercise a genuinely failing rule")
  }
}
