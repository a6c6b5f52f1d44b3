package graft.expressions

import graft.SparkTestBase
import graft.ops.{DedupOps, TextAnalysisOps}
import org.apache.spark.sql.functions._

/** Seeded-random differential properties for the native text-hash
  * expressions vs their interpreted HOF formulations, over adversarial
  * unicode input: multi-byte codepoints exercise the byte-level hash
  * windows, whitespace runs exercise the tokenizer edges, repeats
  * exercise the distinct step. */
class TextHashProps extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)
  private val atoms = Vector(
    "the", "und", "la", "的", "是", "é", "ß", "日本語", "x", "a1b2",
    "αβγ", "中文字", "", "the", "naïve", "😀ok", "tab nb")
  private val seps = Vector(" ", "  ", "\t", "\n", " \t ")

  private def doc(): String = {
    val n = rng.nextInt(12)
    val sb = new StringBuilder(if (rng.nextBoolean()) " " else "")
    (0 until n).foreach { _ =>
      sb ++= atoms(rng.nextInt(atoms.length))
      sb ++= seps(rng.nextInt(seps.length))
    }
    sb.toString
  }

  test("native text hashes equal HOF formulations on adversarial unicode docs") {
    val texts = Seq.fill(400)(doc())
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .withColumn("toks", DedupOps.tokens($"text"))
    val en = TextAnalysisOps.Stopwords("en")
    val sw = array(en.map(lit): _*)
    Seq(2, 3, 5).foreach { w =>
      val bad = df
        .withColumn("g_fast", array_sort(DedupOps.gramHashes($"toks", w)))
        .withColumn("g_ref", array_sort(array_distinct(
          transform(DedupOps.shingles($"toks", w), s => xxhash64(s)))))
        .filter($"g_fast" =!= $"g_ref").count()
      assert(bad == 0, s"gramHashes w=$w")
    }
    val bad2 = df
      .withColumn("t_fast", DedupOps.tokenHashes($"toks"))
      .withColumn("t_ref", transform($"toks", t => xxhash64(t)))
      .withColumn("s_fast", TextAnalysisOps.stopwordHits($"toks", en))
      .withColumn("s_ref", size(filter($"toks", t => array_contains(sw, t))))
      .filter($"t_fast" =!= $"t_ref" || $"s_fast" =!= $"s_ref")
      .count()
    assert(bad2 == 0)
  }
}
