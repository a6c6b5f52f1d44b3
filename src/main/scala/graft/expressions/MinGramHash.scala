package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style robust fingerprint: min over xxhash64 of all character
  * k-grams of a (pre-normalized) string, as ONE codegen'd primitive pass.
  *
  * Exactly equivalent to
  * `array_min(transform(sequence(1, len-k+1), i -> xxhash64(substr(s,i,k))))`
  * (seed 42, the xxhash64 default), but that form runs interpreted — one
  * boxed array element + substring copy per window (~4 s for 500 docs at
  * round 1). Here the k-gram windows are byte-range hashes over the
  * original buffer: a single codepoint-boundary walk, zero allocation.
  * Strings shorter than k hash whole, matching the HOF fallback.
  */
case class MinGramHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinGramHashUtil.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = classOf[MinGramHashUtil].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $util.compute($v, $k);")
  }

  override protected def withNewChildInternal(c: Expression): MinGramHash =
    copy(child = c)
  override def prettyName: String = "min_gram_hash"
}

class MinGramHashUtil
object MinGramHashUtil {
  /** xxhash64's default seed (Spark's `xxhash64` function). */
  final val Seed = 42L

  def compute(s: UTF8String, k: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val nc = s.numChars()
    if (nc < k) return XXH64.hashUnsafeBytes(base, off, nb, Seed)
    // one pass to mark codepoint boundaries (k-grams are CHARACTER grams,
    // byte windows would split multi-byte codepoints)
    val starts = new Array[Int](nc + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
      c += 1
    }
    starts(nc) = nb
    var min = Long.MaxValue
    var w = 0
    while (w + k <= nc) {
      val b0 = starts(w)
      val h = XXH64.hashUnsafeBytes(base, off + b0, starts(w + k) - b0, Seed)
      if (h < min) min = h
      w += 1
    }
    min
  }
}
