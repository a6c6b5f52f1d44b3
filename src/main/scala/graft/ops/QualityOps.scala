package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape) as ONE aggregation pass.
  *
  * Every row-local rule compiles to a conditional aggregate over the
  * same scan — N rules cost one pass over the table, not N (the plan
  * keeps a single file scan; spec-asserted). Uniqueness rules ride the
  * same aggregation as `count - count_distinct` (Catalyst plans the
  * distinct via Expand — still one scan). Referential integrity is the
  * one rule shape that genuinely needs a second relation: a left-anti
  * join counted, broadcastable when the dimension is small.
  *
  * Output contract (all rule kinds): one row per rule —
  * `(rule string, violations long, pass boolean)` — so a 100 TB
  * pipeline gate is a handful of scalar rows, not a data-sized result.
  */
object QualityOps {

  /** One rule: a name plus an AGGREGATE expression counting violations. */
  final case class DqRule(name: String, violations: Column)

  /** Rows where `c` is null. */
  def notNull(c: String): DqRule =
    DqRule(s"$c.not_null", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Rows where `pred` is not TRUE — a null predicate (null-valued
    * operand) counts as a violation, matching SQL's "constraint
    * satisfied only when condition is true" semantics. */
  def satisfies(name: String, pred: Column): DqRule =
    DqRule(name, sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)))

  /** Duplicate rows by `c`: non-null count − count(distinct). Both sides
    * of the subtraction ignore nulls (SQL UNIQUE semantics: nulls are
    * distinct), so a nullable-but-unique column doesn't report its null
    * count as phantom duplicates — pair with [[notNull]] when nulls
    * themselves should fail. */
  def unique(c: String): DqRule =
    DqRule(s"$c.unique", count(col(c)) - countDistinct(col(c)))

  /** Run all row-local rules in one aggregation pass over `df`. */
  def validate(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    // coalesce: sum() over ZERO rows is null — an empty table has zero
    // violations and must gate as pass=true, not a null that a
    // !pass filter silently drops
    val aggd = df.agg(
      coalesce(rules.head.violations, lit(0L)).as(rules.head.name),
      rules.tail.map(r => coalesce(r.violations, lit(0L)).as(r.name)): _*)
    aggd
      // backtick-quoted: rule names contain dots, which col() would
      // otherwise parse as struct-field paths
      .unpivot(Array.empty[Column],
        rules.map(r => col(s"`${r.name}`")).toArray, "rule", "violations")
      .withColumn("pass", col("violations") === 0L)
  }

  /** Referential integrity: `fact.factCol ⊆ dim.dimCol` (null fact keys
    * are orphans too — a null FK never matches). One summary row.
    * `broadcastDim = false` drops the hint for big dimensions (a forced
    * broadcast of a billion-row entity table OOMs the driver; the
    * shuffle anti-join is the right plan there). */
  def refIntegrity(fact: DataFrame, factCol: String,
                   dim: DataFrame, dimCol: String,
                   name: String,
                   broadcastDim: Boolean = true): DataFrame = {
    val dimKeys = dim.select(col(dimCol).as(factCol))
    fact.select(col(factCol))
      .join(if (broadcastDim) broadcast(dimKeys) else dimKeys, Seq(factCol),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"),
        (col("violations") === 0L).as("pass"))
  }
}
