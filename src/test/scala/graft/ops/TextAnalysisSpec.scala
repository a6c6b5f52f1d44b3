package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm for the winter"),
      (2L, "der hund ist nicht auf der straße und das ist gut"),
      (3L, "le chat est dans la maison et les oiseaux dans le jardin"),
      (4L, "el perro y el gato en la casa por la noche"),
      (5L, "的 是 了 在 和 有 不 我 这 他")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysisOps.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh"))
  }

  test("quality metrics compute the documented ratios") {
    val df = Seq((1L, "Hello world!! 123 this is a test of the scoring")).toDF("doc_id", "text")
    val m = TextAnalysisOps.qualityMetrics($"text")
    val row = df.select(m.map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getAs[Int]("n_chars") == 47)
    assert(row.getAs[Int]("n_tokens") == 10)
    // "!!" and "123": 2 punct chars, 3 digit chars
    assert(math.abs(row.getAs[Double]("punct_ratio") - 2.0 / 47) < 1e-6)
    assert(math.abs(row.getAs[Double]("digit_ratio") - 3.0 / 47) < 1e-6)
    assert(row.getAs[Double]("stopword_ratio") > 0)
  }

  test("quality score gates: clean text scores high, garbage low") {
    val df = Seq(
      (1L, "this is a perfectly reasonable paragraph of english text that the scorer should like because it has the right shape"),
      (2L, "@@@@ #### !!!! 99999 $$$$ %%%% ^^^^ &&&& **** (((( )))) ~~~~")
    ).toDF("doc_id", "text")
    val s = df.select($"doc_id", TextAnalysisOps.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) == 1.0, s"clean text got ${s(1L)}")
    // garbage fails the punct + stopword gates (3/5 = 0.6)
    assert(s(2L) <= 0.6 && s(2L) < s(1L), s"garbage got ${s(2L)}")
  }

  test("bpe-ish token count splits alpha/digit/punct runs") {
    val df = Seq((1L, "hello world2 can't stop-go 42")).toDF("doc_id", "text")
    // hello | world | 2 | can | ' | t | stop | - | go | 42  = 10
    assert(df.select(TextAnalysisOps.bpeTokenCount($"text")).head().getInt(0) == 10)
  }

  test("native min_gram_hash equals the interpreted HOF formulation") {
    // multi-byte codepoints, short-text fallback, ascii, emoji, mixed
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"), // < k chars -> whole-string hash fallback
      (3L, "der größte Gruß über die Straße"),
      (4L, "的是了在和有不我这他 chinese stopwords mixed in"),
      (5L, "emoji 🙂🙃 in the middle of text"),
      (6L, "exactly8!") // boundary: one window at k=8... 9 chars -> 2
    ).toDF("doc_id", "text")
      .withColumn("norm", TextAnalysisOps.normalized($"text"))
    val native = df.select($"doc_id",
      TextAnalysisOps.minGramFromNorm($"norm").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select($"doc_id",
      TextAnalysisOps.minGramFromNormHof($"norm").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
  }

  test("langIdFromToks over a staged token column matches langId") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht auf der straße und das ist gut"),
      (3L, "le chat est dans la maison et les oiseaux")
    ).toDF("doc_id", "text")
      .withColumn("toks", DedupOps.tokens($"text"))
    val staged = df.select($"doc_id",
      TextAnalysisOps.langIdFromToks($"toks").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inline = df.select($"doc_id", TextAnalysisOps.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(staged == inline)
  }

  test("contamination flags train docs sharing n-grams with the test set") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "train"),
      (2L, "something about a quick brown fox jumps high", "train"),
      (3L, "totally unrelated words in this document here", "train"),
      (4L, "xx yy", "train"), // shorter than w=3: can't carry an n-gram
      (10L, "a quick brown fox jumps over fences", "test")
    ).toDF("doc_id", "text", "source")
    val pairs = TextAnalysisOps.contamination(
      df, col("source") === "test", w = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 shares {quick brown fox, brown fox jumps, fox jumps over};
    // doc 2 shares {a quick brown, quick brown fox, brown fox jumps};
    // doc 3 shares none
    assert(pairs.keySet == Set((1L, 10L), (2L, 10L)))
    assert(pairs((1L, 10L)) == 3 && pairs((2L, 10L)) == 3)
    // broadcast OFF still yields identical pairs (the large-test-set path)
    val shuffled = TextAnalysisOps.contamination(
      df, col("source") === "test", w = 3, minShared = 2,
      broadcastTest = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(shuffled == pairs)
  }

  test("fingerprints are whitespace-robust and edit-sensitive") {
    val df = Seq(
      (1L, "some  text   with weird    spacing"),
      (2L, "some text with weird spacing"),
      (3L, "some text with weird spacing plus an edit")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysisOps.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "normalization must collapse whitespace")
    assert(fp(2L) != fp(3L))
    // min-gram fingerprint is MORE stable: a suffix edit often preserves it
    val mg = df.select($"doc_id", TextAnalysisOps.minGramFingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mg(1L) == mg(2L))
  }
}
