package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of the `w`-word shingles of a token array, as
  * ONE codegen'd pass — the hash side of near-dup signatures and n-gram
  * decontamination.
  *
  * Exactly equivalent (barring 64-bit hash collisions inside one
  * document's distinct step) to the HOF chain
  * `array_distinct(transform(shingles(toks, w), s => xxhash64(s)))` with
  * `shingles` = space-joined sliding windows falling back to the whole
  * text when the doc is shorter than `w` tokens — but that chain is TWO
  * CodegenFallback higher-order functions (window materialization, then
  * per-shingle hash), interpreted per row under every MinHash /
  * decontamination query. With `modPrime` the hash is folded to a 31-bit
  * base hash (`pmod(h, SignatureParams.Prime)`), the input domain of
  * [[MinHashSignature]].
  *
  * Output ORDER is first-occurrence (same as `array_distinct`); every
  * consumer is order-invariant (min-fold, equi-join, set intersect).
  */
case class WordGramHashes(child: Expression, w: Int, modPrime: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramHashesUtil.compute(input.asInstanceOf[ArrayData], w, modPrime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = classOf[WordGramHashesUtil].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = $util.compute($arr, $w, $modPrime);")
  }

  override protected def withNewChildInternal(c: Expression): WordGramHashes =
    copy(child = c)
  override def prettyName: String = "word_gram_hashes"
}

/** Per-element xxhash64 of a token array (ALL tokens, duplicates kept —
  * SimHash votes are occurrence-weighted), as one codegen'd pass.
  * Equivalent to `transform(toks, t => xxhash64(t))`, which is a
  * CodegenFallback higher-order function interpreted per row. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramHashesUtil.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = classOf[WordGramHashesUtil].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $util.hashAll($arr);")
  }

  override protected def withNewChildInternal(c: Expression): TokenHashes =
    copy(child = c)
  override def prettyName: String = "token_hashes"
}

/** md5 counterpart of [[WordGramHashes]] — the ORACLE-TWIN gram hash:
  * distinct `md5-top-60-bits mod Prime` values of the `w`-word shingles
  * (whole-text fallback below `w` tokens), one codegen'd pass.
  *
  * Bit-identical to the HOF chain
  * `array_distinct(transform(shingles(toks, w), g =>
  *   pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), Prime)))`
  * — the first 15 hex chars of the digest are its top 60 bits, assembled
  * here by byte arithmetic instead of hex-encode + string-parse — and to
  * the DuckDB side's `CAST(concat('0x', substr(md5(g),1,15)) AS UBIGINT)
  * % Prime`. The HOF form runs interpreted (two CodegenFallback lambdas
  * plus a hex round-trip per gram) on every md5-twin gate query;
  * differential-tested in SignaturesSpec. */
case class WordGramMd5Hashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_gram_md5_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramHashesUtil.computeMd5(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = classOf[WordGramHashesUtil].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      arr => s"${ev.value} = $util.computeMd5($arr, $w);")
  }

  override protected def withNewChildInternal(c: Expression): WordGramMd5Hashes =
    copy(child = c)
  override def prettyName: String = "word_gram_md5_hashes"
}

class WordGramHashesUtil
object WordGramHashesUtil {
  /** xxhash64's default seed (Spark's `xxhash64` function). */
  final val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  private def hashOf(s: UTF8String, modPrime: Boolean): Long = {
    val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes, Seed)
    if (modPrime) {
      // Spark pmod semantics: non-negative remainder
      val m = h % SignatureParams.Prime
      if (m < 0) m + SignatureParams.Prime else m
    } else h
  }

  /** out(i) = xxhash64(arr(i)); a null element hashes to the seed,
    * matching Spark's `xxhash64` null semantics. */
  def hashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Seed
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  def compute(arr: ArrayData, w: Int, modPrime: Boolean): ArrayData =
    computeWith(arr, w, hashOf(_, modPrime))

  /** Shared shingle walk: distinct `hash(gram)` in first-occurrence
    * order, whole-text fallback below `w` tokens. */
  private def computeWith(arr: ArrayData, w: Int,
                          hash: UTF8String => Long): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // null tokens are skipped by concatWs, matching concat_ws
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (n < w) {
      // degenerate short doc: one shingle = the whole space-joined text
      val g = UTF8String.concatWs(Space, toks: _*)
      return new GenericArrayData(Array(hash(g)))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]((n * 2) max 8)
    val win = new Array[UTF8String](w)
    var s = 0
    while (s + w <= n) {
      System.arraycopy(toks, s, win, 0, w)
      seen.add(hash(UTF8String.concatWs(Space, win: _*)))
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private val md5s = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(gram) mod Prime — ≡ the first 15 hex chars of
    * the digest parsed base-16 (nibble→hex is positional: 15 nibbles =
    * bytes 0..6 plus byte 7's high nibble), the value the DuckDB twins
    * compute; always non-negative, so `%` is pmod. */
  private def md5Of(s: UTF8String): Long = {
    val md = md5s.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
    v % SignatureParams.Prime
  }

  def computeMd5(arr: ArrayData, w: Int): ArrayData =
    computeWith(arr, w, md5Of)
}
