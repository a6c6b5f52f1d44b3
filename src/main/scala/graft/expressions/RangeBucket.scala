package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Range-bucket id by binary search over driver-collected boundary
  * tuples — the bucket stamp of [[graft.ops.ScalableWindow]].
  *
  * Returns `min{ i : key <lex boundaries(i) }`, else `boundaries.length`
  * — the index of the first boundary tuple lexicographically ABOVE the
  * row's key tuple, nulls sorting FIRST at every position. Monotone in
  * the key for any ascending boundary list, so binary search is valid.
  *
  * Why an Expression and not a `when`-chain/tree of literal
  * comparisons: at 4×partitions boundaries the Column encoding is a
  * ~1500-node expression that Catalyst clones into EVERY branch the
  * bucket column reaches (both plan arms of the two-phase window, and
  * each arm of a multi-branch union input) — measured megabyte task
  * binaries and a Janino compile per clone that dominated the whole
  * operator's cpu on moderate inputs. Here the boundary table rides
  * along as ONE reference object; the generated code is a single
  * method call, so plan size, task broadcast and codegen cost are
  * independent of the bucket count, and the per-row cost is the
  * ⌈log₂ buckets⌉ tuple comparisons the search actually needs.
  *
  * Keys are the NORMALIZED order columns (numeric/date/timestamp cast
  * to double, strings as-is); boundary elements are java.lang.Double /
  * UTF8String / null, matching positionally. Strings compare in
  * UTF8String (binary) order — Spark's own `<` semantics. */
case class RangeBucket(keys: Seq[Expression],
                       boundaries: Array[Array[AnyRef]])
    extends Expression {

  require(boundaries.forall(_.length == keys.length),
    "range_bucket: boundary tuple width must equal the key width")

  override def children: Seq[Expression] = keys
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = keys.map(_.dataType).filterNot {
      case DoubleType | StringType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"range_bucket expects double|string keys, got " +
        bad.map(_.simpleString).mkString(", "))
  }

  @transient private lazy val width = keys.length

  /** Lexicographic `vals < b`, nulls first — eval-side twin of the
    * retired Column-land `lexLt` (same fold semantics: a null boundary
    * element matches only a null value and defers to the next column;
    * equal full tuples are NOT less). */
  private def lexLt(vals: Array[AnyRef], b: Array[AnyRef]): Boolean = {
    var i = 0
    while (i < width) {
      val bi = b(i)
      val vi = vals(i)
      if (bi == null) {
        if (vi != null) return false
      } else if (vi == null) return true
      else {
        val c = vi match {
          case d: java.lang.Double =>
            java.lang.Double.compare(d.doubleValue(),
              bi.asInstanceOf[java.lang.Double].doubleValue())
          case s: UTF8String => s.compareTo(bi.asInstanceOf[UTF8String])
          case other => throw new IllegalStateException(
            s"range_bucket: unexpected key value class ${other.getClass}")
        }
        if (c < 0) return true
        if (c > 0) return false
      }
      i += 1
    }
    false
  }

  /** Lower-bound binary search; public so generated code can call it. */
  def search(vals: Array[AnyRef]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lexLt(vals, boundaries(mid))) hi = mid else lo = mid + 1
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[AnyRef](width)
    var i = 0
    while (i < width) {
      vals(i) = keys(i).eval(input).asInstanceOf[AnyRef]
      i += 1
    }
    search(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rb = ctx.addReferenceObj("rangeBucket", this,
      classOf[RangeBucket].getName)
    val evals = keys.map(_.genCode(ctx))
    val arr = ctx.freshName("rbVals")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? null : (Object) ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        |$childCode
        |Object[] $arr = new Object[$width];
        |$fill
        |int ${ev.value} = $rb.search($arr);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeBucket =
    copy(keys = newChildren)
  override def prettyName: String = "range_bucket"
}
