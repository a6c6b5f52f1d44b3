package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5 counterpart of [[MinGramHash]]: the lexicographic minimum of the
  * md5 hex digests of all character k-grams of a (pre-normalized) string,
  * as ONE codegen'd pass.
  *
  * Exactly equivalent to
  * `array_min(transform(sequence(1, len-k+1), i -> md5(substr(s,i,k))))`
  * (strings shorter than k hash whole, matching the HOF fallback), but
  * that form runs interpreted — one boxed element + substring + hex
  * string per window (3.1 s for 5k docs at sf0.1). Two exact identities
  * make the kernel cheap:
  *
  *  - nibble→hex is monotone, so the lexicographic min over HEX strings
  *    equals the unsigned-byte-order min over the raw 16-byte digests —
  *    compare digests, hex-encode once at the end;
  *  - windows are byte ranges of the original UTF-8 buffer (one
  *    codepoint-boundary walk), so no per-window substring exists.
  *
  * This is the oracle-twin fingerprint (`text_fingerprint_md5`) — DuckDB
  * computes the same min over `md5(SUBSTR(norm, i, k))` — so the VALUES
  * must stay bit-identical to the HOF form (differential-tested in
  * SignaturesSpec).
  */
case class MinGramMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_gram_md5 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinGramMd5Util.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = classOf[MinGramMd5Util].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $util.compute($v, $k);")
  }

  override protected def withNewChildInternal(c: Expression): MinGramMd5 =
    copy(child = c)
  override def prettyName: String = "min_gram_md5"
}

class MinGramMd5Util
object MinGramMd5Util {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** a < b under unsigned byte order (both length 16). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(s: UTF8String, k: Int): UTF8String = {
    val bytes = s.getBytes // full UTF-8 buffer; windows are ranges into it
    val nb = bytes.length
    val md = digests.get()
    // codepoint-boundary walk (k-grams are CHARACTER grams; byte windows
    // would split multi-byte codepoints)
    val starts = new Array[Int](nb + 1)
    var i = 0
    var nc = 0
    while (i < nb) {
      starts(nc) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nc += 1
    }
    starts(nc) = nb
    if (nc < k) {
      md.update(bytes, 0, nb)
      return hex(md.digest())
    }
    var min: Array[Byte] = null
    var w = 0
    while (w + k <= nc) {
      val b0 = starts(w)
      md.update(bytes, b0, starts(w + k) - b0)
      val d = md.digest()
      if (min == null || less(d, min)) min = d
      w += 1
    }
    hex(min)
  }
}
