package graft.util

/** Byte-size formatting/parsing (F8 — reference: `Bytes.format` usage at
  * cli/.../CheckerApp.scala:158 and the `-m 64m`-style split-size option
  * grammar, args/SplitSize.scala:10-31). */
object Bytes {

  private val units = "BKMGTPE"

  /** "583 B", "12.3 KB", "64 MB" — two significant decimals below 10. */
  def format(bytes: Long): String = {
    require(bytes >= 0, s"negative size $bytes")
    if (bytes < 1024) return s"$bytes B"
    var v = bytes.toDouble
    var u = 0
    while (v >= 1024 && u < units.length - 1) { v /= 1024; u += 1 }
    val s =
      if (v >= 100) f"$v%.0f"
      else if (v >= 10) f"$v%.1f"
      else f"$v%.2f"
    s"$s ${units.charAt(u)}B"
  }

  /** Compact form for report lines — "519K", "23.5K", "2.69M" (the
    * reference's `583K compressed` header shape): no space, no trailing B,
    * ≤3 significant digits. */
  def formatShort(bytes: Long): String = {
    require(bytes >= 0, s"negative size $bytes")
    if (bytes < 1024) return s"${bytes}B"
    var v = bytes.toDouble
    var u = 0
    while (v >= 1024 && u < units.length - 1) { v /= 1024; u += 1 }
    val s =
      if (v >= 100) f"$v%.0f"
      else if (v >= 10) f"$v%.1f"
      else f"$v%.2f"
    s"$s${units.charAt(u)}"
  }

  /** Parse "64m", "100K", "2 GB", "1024" (case-insensitive, optional B). */
  def parse(s: String): Long = {
    val t = s.trim.toUpperCase.stripSuffix("B").trim
    if (t.isEmpty) throw new IllegalArgumentException(s"empty byte size '$s'")
    val unitIdx = units.indexOf(t.last)
    val (num, mult) =
      if (unitIdx > 0) (t.dropRight(1).trim, 1L << (10 * unitIdx))
      else (t, 1L)
    val v = BigDecimal(num) * mult
    require(v.isValidLong && v >= 0, s"bad byte size '$s'")
    v.toLong
  }
}

/** Driver-side stats summary (A11 — the reference's Stats over split
  * sizes / timing ratios, ComputeSplits.scala:58-99; output shape follows
  * bgzf StreamTest.scala:67-128). Inputs are driver-side sequences in the
  * reference too; the distributed analog is `a11_stats`. */
final case class Stats(values: Seq[Double]) {
  require(values.nonEmpty, "stats of empty seq")
  private val sorted = values.sorted.toIndexedSeq
  val n: Int = values.length
  val mean: Double = values.sum / n
  val stddev: Double =
    math.sqrt(values.map(v => (v - mean) * (v - mean)).sum / n)

  /** Interpolated quantile (type-7, matching QUANTILE_CONT). */
  def percentile(p: Double): Double = Stats.quantile(sorted, p)
  val median: Double = percentile(0.5)
  /** Median absolute deviation. */
  val mad: Double =
    Stats.quantile(values.map(v => math.abs(v - median)).sorted.toIndexedSeq, 0.5)

  /** The reference's full Stats rendering (bgzf StreamTest.scala:69-128
    * shape): header, insertion-order `elems` with ×-run-length collapsing
    * and first/last-10 elision, a `sorted` line when insertion order
    * differs, and the percentile ladder. Rung values that repeat their
    * predecessor are dropped (our deterministic reading of the
    * reference's collapsed ladders). */
  override def toString: String = {
    def fmt(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else f"$d%.1f"
    def rle(vs: Seq[Double]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < vs.length) {
        var j = i
        while (j < vs.length && vs(j) == vs(i)) j += 1
        out += (if (j - i >= 2) s"${fmt(vs(i))}×${j - i}" else fmt(vs(i)))
        i = j
      }
      out.toSeq
    }
    def line(vs: Seq[Double]): String = {
      val runs = rle(vs)
      if (runs.length > 20)
        (runs.take(10) :+ "…").appendedAll(runs.takeRight(10)).mkString(" ")
      else runs.mkString(" ")
    }
    val sb = new StringBuilder
    sb ++= s"N: $n, μ/σ: ${fmt(mean)}/${fmt(stddev)}, med/mad: ${fmt(median)}/${fmt(mad)}"
    sb ++= s"\n elems: ${line(values)}"
    if (values != sorted) sb ++= s"\nsorted: ${line(sorted)}"
    if (n >= 10) {
      val rungs = Seq(0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95)
      var last = Double.NaN
      rungs.foreach { p =>
        val v = percentile(p)
        if (v != last) {
          sb ++= f"\n  .${(p * 100).toInt}%02d:\t${fmt(v)}"
          last = v
        }
      }
    }
    sb.result()
  }
}

object Stats {
  private[util] def quantile(sorted: IndexedSeq[Double], p: Double): Double = {
    val h = (sorted.length - 1) * p
    val lo = h.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }
}
