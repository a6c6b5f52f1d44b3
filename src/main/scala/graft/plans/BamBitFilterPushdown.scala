package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, BitwiseAnd, EqualTo, Expression, GreaterThan, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.bam.ds.BamTable

/** Carries `flags`-bit predicates into the BAM scan.
  *
  * `flags & 4 = 4` (unmapped-only) and friends have no V1 `Filter`
  * form, so they never reach `BamScanBuilder.pushFilters` — the scan
  * decodes every record and Spark filters above it. This rule matches
  * bit-test conjuncts over a BAM `DataSourceV2Relation`'s `flags`
  * column and restates them as a `flagbits` scan OPTION
  * ([[graft.bam.ds.RecordFilter]] grammar); the partition reader then
  * rejects non-matching records from the fixed 32-byte prefix without
  * materializing name/cigar/seq/qual/attrs. The `Filter` node is LEFT
  * IN PLACE — the option is a decode-skip hint, Spark's own filter
  * stays the source of truth, so the rewrite cannot change results.
  *
  * Recognized conjunct shapes (m, k integer literals):
  *  - `(flags & m) = m`                  → all:m
  *  - `(flags & m) = 0`                  → none:m
  *  - `(flags & m) = k` with k ⊂ m       → all:k;none:(m^k)
  *  - `NOT ((flags & m) = 0)` / `> 0`    → any:m
  *
  * Idempotent: re-deriving the same spec leaves the plan unchanged
  * (fixed-point safe).
  */
case class BamBitFilterPushdown(
    spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(v.toInt)
    case Literal(v: Short, _) => Some(v.toInt)
    case _ => None
  }

  private def isFlags(e: Expression, rel: DataSourceV2Relation): Boolean =
    e match {
      case a: Attribute =>
        a.name == "flags" && rel.output.exists(_.exprId == a.exprId)
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        isFlags(c.child, rel)
      case _ => false
    }

  /** `flags & m` in either operand order. */
  private def flagsAnd(e: Expression,
                       rel: DataSourceV2Relation): Option[Int] = e match {
    case BitwiseAnd(l, r) if isFlags(l, rel) => intLit(r)
    case BitwiseAnd(l, r) if isFlags(r, rel) => intLit(l)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      flagsAnd(c.child, rel)
    case _ => None
  }

  private def bitSpec(c: Expression, rel: DataSourceV2Relation): Seq[String] =
    c match {
      case EqualTo(l, r) =>
        val masked = flagsAnd(l, rel).map((_, intLit(r)))
          .orElse(flagsAnd(r, rel).map((_, intLit(l))))
        masked match {
          case Some((m, Some(k))) if k == m => Seq(s"all:$m")
          case Some((m, Some(0))) => Seq(s"none:$m")
          case Some((m, Some(k))) if (k & ~m) == 0 =>
            Seq(s"all:$k", s"none:${m ^ k}")
          case _ => Seq.empty
        }
      case Not(EqualTo(l, r)) =>
        val masked = flagsAnd(l, rel).map((_, intLit(r)))
          .orElse(flagsAnd(r, rel).map((_, intLit(l))))
        masked match {
          case Some((m, Some(0))) => Seq(s"any:$m")
          case _ => Seq.empty
        }
      case GreaterThan(l, r) =>
        (flagsAnd(l, rel), intLit(r)) match {
          case (Some(m), Some(0)) => Seq(s"any:$m")
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[BamTable] =>
      val derived = splitConjuncts(cond).flatMap(bitSpec(_, rel)).distinct
      // flagbits conjuncts are ANDed, so a caller-supplied spec merges by
      // UNION of conjuncts — overwriting would silently widen a reader
      // restriction the caller set directly (which has no Catalyst filter
      // above it to re-apply it)
      val existing = Option(rel.options.get("flagbits")).getOrElse("")
        .split(";").toIndexedSeq.filter(_.nonEmpty)
      val spec = (existing ++ derived).distinct
      if (derived.isEmpty || spec == existing) f
      else {
        val merged = new java.util.HashMap[String, String](rel.options.asCaseSensitiveMap())
        merged.put("flagbits", spec.mkString(";"))
        f.copy(child = rel.copy(options = new CaseInsensitiveStringMap(merged)))
      }
  }
}
