package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  // Planted corpus: exact dup, near dup (1-word edit), and unrelated docs.
  private lazy val planted = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank now"),   // near dup of 1
    (4L, "completely different content about spark query engines and columnar formats"),
    (5L, "another unrelated document mentioning streams watermarks and aggregation state"),
    (6L, "the quick brown fox jumps over the lazy cat near the river bank today")   // near dup of 1
  ).toDF("doc_id", "text")

  test("jaccard pairs: exact dup scores 1.0, near dups high, unrelated absent") {
    val pairs = DedupOps.jaccardPairs(planted, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical texts share every gram
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 6L)) > 0.3) // one-word edits
    assert(!pairs.keySet.exists { case (a, b) => a >= 4L || b == 4L || b == 5L })
    // stop-gram guard drops pairs that only share ultra-common grams
    val capped = DedupOps.jaccardPairs(planted, threshold = 0.3, maxDf = 1)
    assert(capped.count() == 0) // every shared gram has df >= 2 by definition
  }

  test("minhash pairs find planted exact and near duplicates, not unrelated") {
    val pairs = DedupOps.minhashPairs(planted, threshold = 0.4)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0, "exact dup")
    assert(pairs.contains((1L, 3L)), "near dup 1-3")
    assert(pairs.contains((1L, 6L)), "near dup 1-6")
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty },
      "unrelated docs must not pair")
  }

  test("hot-bucket cap drops degenerate buckets but keeps disjoint pairs") {
    // 30 identical boilerplate docs make every band bucket hot (the skew
    // shape); two near-dup outliers must still pair through their own,
    // small buckets
    val boiler = (100L until 130L).map(i =>
      (i, "identical boilerplate footer text repeated across the whole crawl corpus"))
    val outliers = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"))
    val df = (boiler ++ outliers).toDF("doc_id", "text")
    val capped = DedupOps.minhashPairs(df, threshold = 0.4, maxBucket = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = DedupOps.minhashPairs(df, threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // the 30-doc boilerplate bucket (435 pairs) is gone...
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L })
    // ...but the small-bucket near-dup pair survives the cap
    assert(capped.contains((1L, 2L)))
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } == 435)
  }

  test("estimated jaccard tracks exact jaccard on candidates") {
    val rows = DedupOps.minhashPairs(planted, threshold = 0.3)
      .select("est_jaccard", "jaccard").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.3,
        s"est=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("simhash: identical texts at distance 0, near dups close, unrelated far") {
    val sh = planted.select($"doc_id", DedupOps.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) <= 12, s"near dup distance ${ham(sh(1L), sh(3L))}")
    assert(ham(sh(1L), sh(4L)) > 12, s"unrelated distance ${ham(sh(1L), sh(4L))}")
  }

  test("simhash pairs surface the exact duplicate") {
    val pairs = DedupOps.simhashPairs(planted, maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("jaccard pairs equal brute-force pairwise exactJaccard on real docs") {
    // differential: the inverted-index shape must reproduce the scalar
    // exactJaccard for EVERY pair it emits, and must not miss any pair
    // over threshold (any such pair shares >= 1 gram, so the gram join
    // generates it as a candidate by construction). Deterministic sample
    // (an unordered limit() could pick different subsets per side), and
    // only docs long enough to carry a full gram — jaccardPairs skips
    // sub-gram docs by design where exactJaccard whole-text-falls-back.
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter($"doc_id" < 120 && size(DedupOps.tokens($"text")) >= 3)
    val got = DedupOps.jaccardPairs(docs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val a = docs.select($"doc_id".as("id_a"), $"text".as("ta"))
    val b = docs.select($"doc_id".as("id_b"), $"text".as("tb"))
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("j", DedupOps.exactJaccard($"ta", $"tb"))
      .filter($"j" >= 0.4)
      .select($"id_a", $"id_b", round($"j", 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == brute.keySet,
      s"missing=${brute.keySet -- got.keySet} extra=${got.keySet -- brute.keySet}")
    got.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-9, k) }
  }

  test("exact dup clusters pick min-id keeper") {
    val rows = DedupOps.exactDupes(planted).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("keeper") == 1L)
    assert(rows.head.getAs[Long]("n_copies") == 2L)
    assert(rows.head.getAs[scala.collection.Seq[Long]]("member_sample").toSeq == Seq(1L, 2L))
  }

  test("exact dup member sample is bounded by sampleK, count stays full") {
    // 20 identical copies, sampleK=5: n_copies must report all 20 while
    // member_sample carries only the 5 smallest ids — the bounded-row
    // guarantee that replaces the unbounded collect_list.
    val many = spark.range(1, 21).select($"id".as("doc_id"), lit("same text").as("text"))
    val r = DedupOps.exactDupes(many, sampleK = 5).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_copies") == 20L)
    assert(r.head.getAs[scala.collection.Seq[Long]]("member_sample").toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("minhash on real documents: every reported pair verifies exactly") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val pairs = DedupOps.minhashPairs(docs, threshold = 0.5).collect()
    // LSH candidates are estimates; the exact jaccard column is ground truth
    pairs.foreach { r =>
      val exact = r.getAs[Double]("jaccard")
      assert(exact > 0.2, s"pair (${r.get(0)},${r.get(1)}) exact jaccard $exact")
    }
  }
}
