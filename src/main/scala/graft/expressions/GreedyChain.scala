package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Proximity (sloppy-phrase) anchor count as ONE codegen'd primitive
  * pass — the kernel of [[graft.ops.InvertedIndexOps.searchPhraseWindow]].
  *
  * Input: `occ` = this (query, doc) pair's occurrences of the query's
  * terms as `array<struct<__i: int, pos: bigint>>` (`__i` the term's
  * offset in the phrase, `pos` its 1-based position in the doc), `k` the
  * phrase length. Output: the number of anchor positions (occurrences of
  * phrase offset 0) from which the GREEDY ordered chain — always the
  * smallest next position strictly greater than the previous — ends
  * within `maxSpan` tokens of the anchor. Greedy minimizes the final
  * position for a fixed anchor, so "some ordered chain fits in the span"
  * ⟺ "the greedy chain fits" (the exactness argument in the op's doc).
  *
  * The higher-order-function formulation (a `filter` over anchors whose
  * predicate `aggregate`s a `slice` of per-offset `array_sort`ed
  * position arrays, after an `array_distinct`/`transform` completeness
  * pre-filter) is CodegenFallback: five nested interpreted lambdas with
  * boxed longs per (query, doc) candidate — the hot inner loop of every
  * phrase/proximity search. This expression replaces the whole chain,
  * pre-filter included: a doc missing ANY phrase offset counts zero
  * anchors by construction (every chain poisons), exactly the rows the
  * pre-filter dropped. Differential parity with the HOF form is pinned
  * in GreedyChainSpec.
  *
  * Occurrences with `__i` outside [0, k) are ignored (the HOF's
  * `sequence(0, k-1)` never looked at them); `k <= 0` yields 0 (such a
  * query produces no occurrence rows at all upstream). Null lanes
  * cannot occur (`collect_list` never emits null elements); a null
  * `occ`/`k` input yields null via the standard null-safe contract. */
case class GreedyChainCount(left: Expression, right: Expression,
                            maxSpan: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(Array(f0, f1)), _), IntegerType)
          if f0.dataType == IntegerType && f1.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"greedy_chain_count expects (array<struct<int, bigint>>, int), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(occ: Any, k: Any): Any =
    GreedyChain.count(occ.asInstanceOf[ArrayData], k.asInstanceOf[Int],
      maxSpan)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val helper = GreedyChain.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (occ, k) =>
      s"${ev.value} = $helper.count($occ, $k, $maxSpan);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GreedyChainCount =
    copy(left = l, right = r)
  override def prettyName: String = "greedy_chain_count"
}

/** The shared primitive kernel — one compiled method serving both the
  * interpreted `eval` and the generated code (the loop is non-trivial;
  * a single JIT-hot static method beats splicing it into every
  * whole-stage-codegen function, and the 8000-bytecode JIT ceiling the
  * bench config documents never threatens it). */
object GreedyChain {

  /** See [[GreedyChainCount]]. O(n log n) per row in the pair's own
    * occurrence count n — never corpus-sized. */
  def count(occ: ArrayData, k: Int, maxSpan: Int): Long = {
    if (k <= 0) return 0L
    val n = occ.numElements()
    // per-offset occurrence counts; a missing offset ⇒ zero anchors fit
    val cnt = new Array[Int](k)
    var i = 0
    while (i < n) {
      val s = occ.getStruct(i, 2)
      val off = s.getInt(0)
      if (off >= 0 && off < k) cnt(off) += 1
      i += 1
    }
    var j = 0
    while (j < k) { if (cnt(j) == 0) return 0L; j += 1 }
    // slice the positions into per-offset sorted arrays
    val pp = new Array[Array[Long]](k)
    val fill = new Array[Int](k)
    j = 0
    while (j < k) { pp(j) = new Array[Long](cnt(j)); j += 1 }
    i = 0
    while (i < n) {
      val s = occ.getStruct(i, 2)
      val off = s.getInt(0)
      if (off >= 0 && off < k) {
        pp(off)(fill(off)) = s.getLong(1)
        fill(off) += 1
      }
      i += 1
    }
    j = 0
    while (j < k) { java.util.Arrays.sort(pp(j)); j += 1 }
    // greedy chain from each anchor: smallest position > prev per step
    val anchors = pp(0)
    var matches = 0L
    var a = 0
    while (a < anchors.length) {
      val anchor = anchors(a)
      var prev = anchor
      var alive = true
      j = 1
      while (alive && j < k) {
        val arr = pp(j)
        // first element strictly greater than prev (arr is sorted)
        var idx = java.util.Arrays.binarySearch(arr, prev + 1)
        if (idx < 0) idx = -idx - 1
        if (idx >= arr.length) alive = false else prev = arr(idx)
        j += 1
      }
      if (alive && prev - anchor <= maxSpan) matches += 1L
      a += 1
    }
    matches
  }
}
