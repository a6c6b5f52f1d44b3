package graft.util

import org.scalatest.funsuite.AnyFunSuite

class BytesSpec extends AnyFunSuite {

  test("format follows the unit ladder") {
    assert(Bytes.format(0) == "0 B")
    assert(Bytes.format(583) == "583 B")
    assert(Bytes.format(583L * 1024) == "583 KB")
    assert(Bytes.format(16L << 20) == "16.0 MB")
    assert(Bytes.format((2.69 * (1L << 30)).toLong) == "2.69 GB")
  }

  test("parse accepts the reference's option grammar") {
    assert(Bytes.parse("1024") == 1024L)
    assert(Bytes.parse("100k") == 100L * 1024)
    assert(Bytes.parse("64m") == 64L << 20)
    assert(Bytes.parse("64 MB") == 64L << 20)
    assert(Bytes.parse("2G") == 2L << 30)
    assert(Bytes.parse("1.5K") == 1536L)
    intercept[IllegalArgumentException](Bytes.parse(""))
  }

  test("format/parse round-trip on unit boundaries") {
    Seq(1L, 1023L, 1024L, 1L << 20, 64L << 20, 1L << 30).foreach { v =>
      assert(Bytes.parse(Bytes.format(v)) == v, s"$v")
    }
  }

  test("stats computes the summary ladder") {
    val s = Stats(Seq(1.0, 2.0, 3.0, 4.0, 100.0))
    assert(s.n == 5)
    assert(s.mean == 22.0)
    assert(s.median == 3.0)
    assert(s.mad == 1.0) // |1-3|,|2-3|,|3-3|,|4-3|,|100-3| -> 2,1,0,1,97 -> med 1
    assert(s.percentile(0.0) == 1.0 && s.percentile(1.0) == 100.0)
    assert(s.toString.startsWith("N: 5, μ/σ: 22/"))
  }

  test("stats rendering pins the reference ladder shape") {
    // run-length collapsing + sorted line + percentile rungs
    val s = Stats(Seq(5.0, 5.0, 5.0, 1.0, 2.0, 2.0, 9.0, 9.0, 9.0, 9.0, 3.0, 4.0))
    val text = s.toString
    assert(text.contains(" elems: 5×3 1 2×2 9×4 3 4"), text)
    assert(text.contains("\nsorted: 1 2×2 3 4 5×3 9×4"), text)
    assert(text.contains("\n  .50:\t"), text)
    // .90/.95 repeat .75's value (9) and collapse out of the ladder
    assert(!text.contains(".90:") && !text.contains(".95:"), text)
    // distinct data keeps the full 7-rung ladder
    val full = Stats((1 to 100).map(_.toDouble)).toString
    Seq(".05:", ".10:", ".25:", ".50:", ".75:", ".90:", ".95:")
      .foreach(r => assert(full.contains(r), full))
    // degenerate data: one rung line only (repeats collapse)
    val flat = Stats(Seq.fill(12)(7.0))
    val ft = flat.toString
    assert(ft.contains(" elems: 7×12"), ft)
    assert(!ft.contains("sorted:"), ft)
    assert("\\.\\d\\d:".r.findAllIn(ft).length == 1, ft)
    // small n: no ladder at all
    assert(!Stats(Seq(1.0, 2.0)).toString.contains(".50"), "no ladder under 10")
  }

  test("stats percentile matches the SQL QUANTILE_CONT convention") {
    val s = Stats((1 to 100).map(_.toDouble))
    assert(s.percentile(0.25) == 25.75)
    assert(s.percentile(0.5) == 50.5)
    assert(s.percentile(0.75) == 75.25)
  }
}
