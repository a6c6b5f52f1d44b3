package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val NumHashes: Int = graft.expressions.SignatureParams.NumHashes
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows // 16
  private val Prime = graft.expressions.SignatureParams.Prime

  /** Permutation params shared with the codegen'd expression (single
    * source of truth: graft.expressions.SignatureParams). */
  private val perms: IndexedSeq[(Long, Long)] =
    graft.expressions.SignatureParams.A
      .zip(graft.expressions.SignatureParams.B).toIndexedSeq

  /** Whitespace tokens of the lower-cased text. `array_remove(_, "")` is
    * the codegen'd equivalent of `filter(_, t => length(t) > 0)` — the
    * lambda form is a higher-order function, which Catalyst evaluates
    * interpreted (CodegenFallback) on every row of every text operator
    * built on this tokenizer. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\s+"), "")

  /** w-word shingles; degenerate short docs fall back to the whole text. */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", (0 until w).map(d => element_at(toks, i + d + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks)))

  /** 31-bit base hashes of the shingle set. HOF reference formulation —
    * the production path is the codegen'd [[gramHashes]] (identical
    * values; differential-tested in SignaturesSpec). */
  private def baseHashes(sh: Column): Column =
    array_distinct(transform(sh, s => pmod(xxhash64(s), lit(Prime))))

  /** Distinct w-gram hashes straight from the token array in ONE
    * codegen'd pass (see [[graft.expressions.WordGramHashes]]) — replaces
    * the interpreted shingle-materialize + per-shingle-hash HOF chain on
    * every near-dup / decontamination hot path. */
  def gramHashes(toks: Column, w: Int = 3, modPrime: Boolean = false): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WordGramHashes(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), w, modPrime))

  /** Per-token xxhash64 (duplicates kept) in one codegen'd pass — the
    * SimHash input; the `transform(toks, xxhash64)` HOF form is
    * interpreted per row (see [[graft.expressions.TokenHashes]]). */
  def tokenHashes(toks: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.TokenHashes(
        org.apache.spark.sql.GraftColumnBridge.expression(toks)))

  /** HOF signature from an already-materialized base-hash array column.
    * Reference implementation for the codegen'd `minhash_signature`
    * expression; the 64 minima each scan `hs`, so `hs` MUST be a plain
    * attribute — an inlined expression tree would be re-evaluated per
    * permutation (measured: ~1000× slowdown, interpreted eval). */
  def signatureFromHashesHof(hs: Column): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(Prime))))
    }: _*)

  /** (id, sig) signatures for a document table. Staged as separate
    * columns — tokens → shingles → hashes → signature — so each stage is
    * computed once per row (multi-referenced aliases stay un-inlined),
    * and repartitioned first: signature computation is the compute-bound
    * narrow stage, so it must not be serialized into one input split. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 seam: HashSeam = productionSeam): DataFrame = {
    graft.expressions.SignatureFunctions.register(docs.sparkSession)
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(n)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", seam.sigHashes(col("toks")))
      .withColumn("sig", call_function("minhash_signature", col("hs")))
      .select("id", "sig")
  }

  /** Fraction of matching signature components ≈ Jaccard similarity.
    * One codegen'd primitive loop ([[graft.expressions.SigMatchCount]]):
    * the estimator runs on EVERY LSH candidate pair, and the HOF
    * `aggregate(zip_with(...))` formulation it replaces was interpreted
    * (CodegenFallback) with boxed longs on that hot path. Same value:
    * integer match count cast to double over the constant lane count. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SigMatchCount(
        org.apache.spark.sql.GraftColumnBridge.expression(sigA),
        org.apache.spark.sql.GraftColumnBridge.expression(sigB)))
      .cast("double") / NumHashes

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
  /** `maxBucket > 0` drops band buckets holding more than that many docs
    * BEFORE the self-join — the standard LSH hot-bucket guard: a
    * degenerate key (empty/boilerplate shingles) makes its bucket's
    * candidate count quadratic, the skew that kills the join at 100 TB.
    * Docs sharing a dropped bucket almost always still collide in one of
    * their other bands; the oracle default (0) keeps every bucket. */
  /** The hot-bucket skew guard shared by every band self-join: drop
    * buckets holding more than `maxBucket` members (0 = keep all). One
    * implementation — minhash and simhash must cap identically. */
  private def capHotBuckets(allBands: DataFrame, bucketCols: Seq[String],
                            maxBucket: Int): DataFrame =
    if (maxBucket <= 0) allBands
    else {
      val sizes = allBands.groupBy(bucketCols.map(col): _*)
        .agg(count(lit(1)).as("__bc"))
        .filter(col("__bc") <= maxBucket)
      allBands.join(sizes, bucketCols).drop("__bc")
    }

  /** The 16-way band explode over an `(id, sig, …)` signature frame —
    * shared by [[bandFrame]] and the staged-delta path so the banding can
    * never desynchronize between them. */
  private def explodeBands(sigFrame: DataFrame, seam: HashSeam): DataFrame =
    sigFrame.select(col("id"), col("sig"),
      posexplode(array((0 until NumBands).map(j =>
        seam.bandKey((0 until BandRows).map(r =>
          element_at(col("sig"), j * BandRows + r + 1)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")

  /** Production band frame `(id, sig, band, bandHash)` — one row per doc
    * per band, keys from `hash()` over the band's signature components.
    * Factored out of [[minhashPairs]] so the batch self-join and the
    * incremental store/delta join ([[incrementalPairs]]) share the exact
    * same banding. */
  def bandFrame(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text",
                seam: HashSeam = productionSeam): DataFrame =
    explodeBands(signatures(docs, idCol, textCol, seam), seam)

  /** `(id, sig, ss)` in ONE tokenize+hash pass over a batch — the staged
    * input of the per-ingest operators. [[incrementalPairs]] and
    * [[appendToFingerprintStore]] each need BOTH the band frame and the
    * verify sets of the same batch; deriving them independently
    * re-tokenizes and re-hashes the batch text once per use (two full
    * passes per ingest, plus the two plan subtrees of the pair join).
    * The caller eagerly materializes this frame (delta-sized by the
    * ingest contract — never the corpus), so the text work happens
    * exactly once. */
  private def stagedFingerprints(docs: DataFrame, idCol: String,
                                 textCol: String, seam: HashSeam): DataFrame = {
    graft.expressions.SignatureFunctions.register(docs.sparkSession)
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(n)
      .withColumn("toks", tokens(col("text")))
      .withColumn("__hs", seam.sigHashes(col("toks")))
      .withColumn("sig", call_function("minhash_signature", col("__hs")))
      .withColumn("ss",
        if (seam.sharedHashes) col("__hs") else seam.setHashes(col("toks")))
      .select("id", "sig", "ss")
  }

  /** Per-doc distinct shingle-hash sets `(id, ss)` — the exact-verify
    * side of every MinHash pipeline (8-byte hashes, never gram strings). */
  def shingleSets(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  seam: HashSeam = productionSeam): DataFrame =
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("ss", seam.setHashes(col("toks")))
      .select("id", "ss")

  def minhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   threshold: Double = 0.5,
                   maxBucket: Int = 0): DataFrame = {
    val allBands = bandFrame(docs, idCol, textCol)
    val bands = capHotBuckets(allBands, Seq("band", "bandHash"), maxBucket)
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
      .select("id_a", "id_b", "est_jaccard")
    // exact verification joins the pre-computed shingle-HASH sets back
    // (never re-tokenize per pair; 8-byte elements instead of gram
    // strings — same Jaccard barring 64-bit collisions; broadcast-size at
    // test SF, co-partitioned hash join at scale)
    val shing = shingleSets(docs, idCol, textCol)
    cand
      .join(shing.select(col("id").as("id_a"), col("ss").as("ss_a")), "id_a")
      .join(shing.select(col("id").as("id_b"), col("ss").as("ss_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("ss_a"), col("ss_b"))).cast("double") /
          size(array_union(col("ss_a"), col("ss_b"))).cast("double"))
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** 64-bit SimHash from token hashes, as a single codegen'd expression:
    * bit b = sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    * The per-bit vote is an aggregate over the token array; 64 of them are
    * folded into the packed long. */
  /** SimHash over an already-materialized token-hash array attribute (see
    * [[signatureFromHashes]] for why the input must not be an expression
    * tree — it is scanned 64 times). */
  def simhashFromHashes(hs: Column): Column = {
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** (id, sh) 64-bit SimHash per document, staged like [[signatures]]. */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expressions.SignatureFunctions.register(docs.sparkSession)
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(n)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", tokenHashes(col("toks")))
      .withColumn("sh", call_function("simhash64", col("hs")))
      .select("id", "sh")
  }

  /** Single-column simhash for small/test inputs (inline tree). */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(tokens(text), t => xxhash64(t)))

  /** Hamming-ball pairing over ANY 64-bit fingerprint column: pairs of
    * `(id, sh)` rows within `maxDist` bits, candidates from a 4×16-bit
    * band equi-join (pigeonhole: a pair differing in ≤ 3 bits leaves at
    * least one of the 4 bands untouched, so banding is COMPLETE for
    * maxDist ≤ 3 — required), verified by exact `bit_count(xor)`.
    * Shared by text SimHash ([[simhashPairs]]) and perceptual image
    * dHash ([[MultimodalOps.imageNearDups]]) so near-miss semantics
    * can't drift between modalities; `maxBucket` is the usual
    * hot-bucket skew guard. */
  def hammingPairs64(sig: DataFrame, maxDist: Int = 3,
                     maxBucket: Int = 0): DataFrame = {
    require(maxDist <= 3,
      s"4-band pigeonhole is only complete for maxDist <= 3, got $maxDist")
    val allBands = sig.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), j * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    // same hot-bucket guard as minhashPairs: a degenerate 16-bit band key
    // (boilerplate/empty docs) makes its bucket's candidates quadratic
    val bands = capHotBuckets(allBands, Seq("band", "key"), maxBucket)
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

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidate
    * generation by 4×16-bit band buckets (any pair within distance 3 must
    * agree on ≥1 of 4 bands — pigeonhole). */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxDist: Int = 3,
                   maxBucket: Int = 0): DataFrame =
    hammingPairs64(simhashes(docs, idCol, textCol), maxDist, maxBucket)

  /** Exact n-gram Jaccard near-dup pairs via the INVERTED-INDEX shape
    * with PREFIX FILTERING: per-doc distinct gram hashes → candidates
    * from a self-equi-join on each doc's rarest-first PREFIX grams only
    * (provably complete for J ≥ threshold — see the inline note; never
    * all-pairs, and a fraction of the full gram join's candidates) →
    * exact set-intersection verify
    * (|A∩B| / (|A|+|B|−|A∩B|)). Docs shorter than `w` tokens are
    * SKIPPED (can't carry a full gram) — deliberately diverging from
    * [[exactJaccard]]/[[minhashPairs]], whose whole-text fallback scores
    * sub-gram docs: at corpus scale a <w-token document is noise a dedup
    * pass should not pair on, and the skip matches the decontamination
    * semantics (and the DuckDB oracle's `LEN(t) >= w` filter) exactly.
    *
    * `maxDf > 0` removes grams appearing in more than that many documents
    * from the gram universe — shared counts AND per-doc counts — before
    * the join, so the result is the exact Jaccard over the RETAINED
    * grams. This is the stop-gram guard: a boilerplate gram's bucket
    * makes candidates quadratic at crawl scale (same role as
    * [[minhashPairs]]' `maxBucket`), and dropping it from both sides of
    * the ratio keeps the metric consistent (standard stopword-removal
    * semantics). The registered query runs WITH the cap and its DuckDB
    * oracle replicates the document-frequency filter, so the scale guard
    * is exercised inside the correctness gate. */
  def jaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", w: Int = 3,
                   threshold: Double = 0.5, maxDf: Int = 0): DataFrame = {
    val staged = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= w)
      .withColumn("hs", gramHashes(col("toks"), w))
    val grams = staged.select(col("id"), explode(col("hs")).as("__h"))
    // one gram→document-frequency aggregation serves BOTH the stop-gram
    // guard and the prefix ordering below
    val dfRel = grams.groupBy("__h").agg(count(lit(1)).as("__df"))
    // The guard joins against the HOT set (grams in > maxDf docs), which is
    // tiny — AQE broadcasts the anti-join — where a semi-join against the
    // retained set would shuffle the full gram relation twice.
    val kept =
      if (maxDf <= 0) grams
      else grams.join(dfRel.filter(col("__df") > maxDf).select("__h"),
        Seq("__h"), "left_anti")
    // PREFIX FILTERING (AllPairs/PPJoin; Bayardo et al. WWW'07, Xiao et
    // al. WWW'08 — public literature): under a global gram order
    // (df asc, hash asc — rarest first), any pair with J ≥ t shares a
    // gram within each side's first  n − ceil(t·n) + 1  grams. Proof: if
    // A∩B missed A's prefix it would fit in A's last ceil(t·|A|)−1 grams,
    // but |A∩B| = J·|A∪B| ≥ t·|A| — contradiction. So joining ONLY prefix
    // grams generates every qualifying pair with a fraction of the
    // candidates (measured 1.27M → ~0.2M at sf0.1), and the exact
    // set-intersection verify keeps the result identical to the full
    // inverted-index formulation.
    val byDoc = kept.join(dfRel, Seq("__h"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__h")))).as("__s")) // bounded: one row per doc; list = that doc's own grams
      .select(col("id"), col("__s.__h").as("__hs"))
      .withColumn("__n", size(col("__hs")).cast("long"))
      // prefix length n − ceil(t·n) + 1, computed CONSERVATIVELY: double
      // rounding can land t·n a hair ABOVE an exact integer product
      // (0.07·100 = 7.000000000000001 → ceil 8), silently shortening the
      // prefix and dropping a boundary pair the exact verify would keep.
      // One extra prefix gram costs a few candidates; the set-intersect
      // verify keeps the RESULT exact either way.
      .withColumn("__p",
        least(col("__n"),
          col("__n") - ceil(lit(threshold) * col("__n")) + 2).cast("int"))
    val prefix = byDoc.select(col("id"), col("__n"),
      explode(slice(col("__hs"), lit(1), col("__p"))).as("__h"))
    // LENGTH-RATIO filter (AllPairs): J ≤ min(|A|,|B|)/max(|A|,|B|), so a
    // pair failing min/max ≥ t can never verify — prune it in the
    // candidate join, before the set-intersection pays for it. The
    // epsilon keeps boundary pairs that double rounding would push a
    // hair below the exact ratio (same failure mode as the prefix
    // length); the verify step's exact J ≥ t keeps the result identical.
    val cand = prefix.select(col("id").as("id_a"), col("__n").as("__la"), col("__h"))
      .join(prefix.select(col("id").as("id_b"), col("__n").as("__lb"), col("__h")),
        Seq("__h"))
      .filter(col("id_a") < col("id_b") &&
        least(col("__la"), col("__lb")).cast("double") >=
          lit(threshold) * greatest(col("__la"), col("__lb")).cast("double") - lit(1e-9))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val sets = byDoc.select(col("id"), col("__hs"), col("__n"))
    cand
      .join(sets.select(col("id").as("id_a"), col("__hs").as("__ha"),
        col("__n").as("__na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("__hs").as("__hb"),
        col("__n").as("__nb")), "id_b")
      .withColumn("n_shared",
        size(array_intersect(col("__ha"), col("__hb"))).cast("long"))
      .withColumn("__j", col("n_shared").cast("double") /
        (col("__na") + col("__nb") - col("n_shared")))
      .filter(col("__j") >= threshold) // filter on the RAW ratio (oracle parity)
      .withColumn("jaccard", round(col("__j"), 4))
      .select("id_a", "id_b", "n_shared", "jaccard")
  }

  /** Exact duplicate clusters: group identical normalized texts (the
    * hash-groupBy dedup; flag-0x400-style survivor = min id).
    *
    * Membership is reported as a BOUNDED sample (`member_sample`, the
    * `sampleK` smallest ids) plus the full `n_copies` count — never the
    * whole list: a viral boilerplate text has billions of identical copies
    * at crawl scale, and a `collect_list` of its members would put the
    * entire membership in one row (the hot-row shape
    * [[graft.ops.GraphOps]] designs out). The sample is produced by
    * rank-then-filter, which Spark's WindowGroupLimit rewrites into a
    * per-partition top-K BEFORE the shuffle, so no group materializes more
    * than `sampleK` rows anywhere in the plan. Full membership of a given
    * keeper is a join away: `docs.filter(xxhash64(text) === its hash)`. */
  def exactDupes(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", sampleK: Int = 8): DataFrame = {
    val hashed = docs.select(xxhash64(col(textCol)).as("text_hash"),
      col(idCol).as("__id"))
    val dupes = hashed.groupBy("text_hash")
      .agg(min("__id").as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("text_hash").orderBy("__id")
    val sample = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= sampleK)
      .groupBy("text_hash")
      .agg(sort_array(collect_list(col("__id"))).as("member_sample")) // bounded: input filtered to <= sampleK rows per group
    dupes.join(sample, "text_hash")
      .select("text_hash", "keeper", "n_copies", "member_sample")
  }

  // ---- Incremental dedup: new batch vs an existing fingerprint store ----

  /** Oracle-twin hash seam. The production near-dup hashes (codegen'd
    * xxhash64 grams, murmur3 `hash()` band keys) are not reproducible in
    * the DuckDB oracle, so the `dedup_incremental_md5` gate runs the VERY
    * SAME [[writeFingerprintStore]]/[[appendToFingerprintStore]]/
    * [[incrementalPairs]] code with md5-derived hashes swapped in through
    * this seam — the machinery under test is the production pipeline
    * itself, not a parallel reimplementation.
    *
    *  - `sigHashes`: token array → distinct 31-bit gram hashes feeding
    *    `minhash_signature`
    *  - `setHashes`: token array → gram-hash set for the exact verify
    *  - `bandKey`: the band's signature components → equi-join key
    *    (production: one murmur3 `hash()`; twin: the decimal-string
    *    concat both engines render identically)
    *  - `sharedHashes`: set true when `sigHashes` and `setHashes` are
    *    the SAME function (the md5 twin: both are the mod-prime gram
    *    hashes) — the staged pass then computes the gram hashes once
    *    and reuses the column, instead of running the hash kernel twice
    *    per row. Production keeps false: its signature hashes are
    *    mod-prime, its verify sets raw.
    */
  final case class HashSeam(sigHashes: Column => Column,
                            setHashes: Column => Column,
                            bandKey: Seq[Column] => Column,
                            sharedHashes: Boolean = false)

  /** Production hashes: codegen'd xxhash64 grams, murmur3 band keys. */
  val productionSeam: HashSeam = HashSeam(
    toks => gramHashes(toks, modPrime = true),
    toks => gramHashes(toks),
    comps => hash(comps: _*))

  /** Persist a corpus' MinHash fingerprints as the two bucketed tables
    * [[incrementalPairs]] joins against:
    *
    *  - `bandsTable` bucketed on `(band, bandHash)` — the candidate join
    *    key. Each delta batch shuffles only ITSELF into this layout; the
    *    corpus side (the 100 TB side, re-joined on every ingest) never
    *    exchanges again.
    *  - `setsTable` bucketed on `id` — the exact-verify key, same
    *    property for the verify join.
    *
    * The band rows carry the full signature (the same 16× duplication
    * [[minhashPairs]] flows through its shuffle) so candidate estimation
    * needs no extra join against a signature table.
    *
    * Durability contract of record: `graft.ops.StoreContractSpec` (the
    * cross-family suite — this store's mechanism is the data-row guard
    * in [[graft.streaming.IngestOps.ingestBatch]] plus the tombstone
    * carry-forward in [[rebuildFingerprintStore]]). */
  def writeFingerprintStore(docs: DataFrame, spark: SparkSession,
                            bandsTable: String, setsTable: String,
                            basePath: String, nBuckets: Int = 32,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            seam: HashSeam = productionSeam,
                            stageSeed: Boolean = false): Unit = {
    // the ONE-TIME seed build by default recomputes the text pass for
    // its two writes instead of staging: `docs` here is the corpus, and
    // an eager corpus-sized (id, sig, ss) materialization on executor
    // storage is exactly the footprint a 100 TB build cannot afford —
    // codegen'd tokenize+hash twice is the cheaper side of that trade.
    // The per-ingest operators (append / incrementalPairs) stage their
    // batch-sized inputs once instead. `stageSeed = true` flips the
    // trade for corpora KNOWN to fit executor storage (gate fixtures,
    // mid-size backfills): one staged pass feeds both writes — the same
    // one-pass shape as the ingest operators.
    // the two tables are disjoint (bands vs sets) — their writes are
    // independent jobs, submitted concurrently so one write's task tail
    // back-fills the other
    if (stageSeed) {
      val staged = stagedFingerprints(docs, idCol, textCol, seam)
        .localCheckpoint(true)
      graft.util.Par.run(
        () => LayoutOps.writeBucketed(explodeBands(staged, seam), spark,
          bandsTable, s"$basePath/bands", nBuckets, "band", "bandHash"),
        () => LayoutOps.writeBucketed(staged.select("id", "ss"), spark,
          setsTable, s"$basePath/sets", nBuckets, "id"))
      staged.unpersist()
    } else {
      graft.util.Par.run(
        () => LayoutOps.writeBucketed(bandFrame(docs, idCol, textCol, seam),
          spark, bandsTable, s"$basePath/bands", nBuckets, "band", "bandHash"),
        () => LayoutOps.writeBucketed(shingleSets(docs, idCol, textCol, seam),
          spark, setsTable, s"$basePath/sets", nBuckets, "id"))
    }
  }

  /** Fold an accepted batch's fingerprints INTO the store so the next
    * batch dedups against it too — the loop step of continuous ingest.
    * Appends preserve the tables' bucket routing ([[LayoutOps
    * .appendBucketed]] re-states the catalog's own bucket spec), so the
    * Exchange-free join property survives any number of ingests; each
    * append adds at most one file per bucket (re-bucket via
    * [[writeFingerprintStore]] to compact). */
  def appendToFingerprintStore(batch: DataFrame, spark: SparkSession,
                               bandsTable: String, setsTable: String,
                               idCol: String = "doc_id",
                               textCol: String = "text",
                               seam: HashSeam = productionSeam): Unit = {
    // one tokenize+hash pass feeds both appends (batch-sized staging;
    // the seed build in writeFingerprintStore deliberately recomputes
    // instead — see its note)
    val staged = stagedFingerprints(batch, idCol, textCol, seam)
      .localCheckpoint(true)
    // disjoint tables — independent appends, submitted concurrently
    graft.util.Par.run(
      () => LayoutOps.appendBucketed(explodeBands(staged, seam), spark,
        bandsTable),
      () => LayoutOps.appendBucketed(staged.select("id", "ss"), spark,
        setsTable))
  }

  /** Right-to-be-forgotten for the dedup tier: tombstone `ids` so no
    * future ingest dedups against them. The bucketed tables are
    * append-only, so the tombstone is a NULL-set row in the SETS table
    * (delete-wins, no sequence — deletion is permanent, matching the
    * doc-ids-are-immutable ingest contract: a deleted id stays burned,
    * because the replay guard treats any id ever seen as ingested).
    * [[incrementalPairs]] drops candidates against tombstoned ids at
    * pair time; the fingerprints linger PHYSICALLY (band rows, the
    * original set row) until a periodic rebuild
    * ([[writeFingerprintStore]] over surviving docs) reclaims them —
    * the same linger-then-rebuild trade the doc store documents for
    * its tombstones. */
  def deleteFromFingerprintStore(ids: DataFrame, spark: SparkSession,
                                 setsTable: String,
                                 idCol: String = "doc_id"): Unit = {
    val schema = spark.table(setsTable).schema
    LayoutOps.appendBucketed(
      ids.select(col(idCol).cast(schema("id").dataType).as("id")).distinct()
        .withColumn("ss", lit(null).cast(schema("ss").dataType)),
      spark, setsTable)
  }

  /** The periodic reclaim [[deleteFromFingerprintStore]] defers to:
    * rewrite both store tables WITHOUT the deleted docs' fingerprints —
    * their band rows and original set rows are physically gone from the
    * new layout — while CARRYING THE TOMBSTONE ROWS FORWARD. The
    * carry-forward is load-bearing, not cosmetic: the streaming replay
    * guard ([[graft.streaming.IngestOps.ingestBatch]]) treats any id
    * present in the sets table as already-ingested, so deletion stays
    * permanent only while the tombstone row exists. A rebuild that
    * dropped tombstones would un-burn the ids, and a replayed (or
    * later) batch carrying a deleted doc would re-ingest it through the
    * guard — resurrecting the document RTBF promised to forget.
    *
    * No re-signaturing: survivors' fingerprints are copied from the
    * existing tables (one bucketed read + write per table, the
    * compaction cost profile), never recomputed from text. Writes land
    * at the NEW `basePath`; the old directories are never touched, so a
    * crash mid-rebuild loses nothing — re-run it (the second write's
    * inputs resolve against the surviving old files) and vacuum the old
    * basePath only after both tables re-registered. */
  def rebuildFingerprintStore(spark: SparkSession, bandsTable: String,
                              setsTable: String, basePath: String,
                              nBuckets: Int = 32): Unit = {
    val sets = spark.table(setsTable)
    val bands = spark.table(bandsTable)
    val tomb = sets.filter(col("ss").isNull).select("id").distinct()
    val liveSets = sets.filter(col("ss").isNotNull)
      .join(tomb, Seq("id"), "left_anti")
    val liveBands = bands.join(tomb, Seq("id"), "left_anti")
    val newSets = liveSets.unionByName(
      tomb.withColumn("ss", lit(null).cast(sets.schema("ss").dataType)))
    // disjoint tables — independent rewrites, submitted concurrently
    graft.util.Par.run(
      () => LayoutOps.writeBucketed(liveBands, spark, bandsTable,
        s"$basePath/bands", nBuckets, "band", "bandHash"),
      () => LayoutOps.writeBucketed(newSets, spark, setsTable,
        s"$basePath/sets", nBuckets, "id"))
  }

  /** Near-dup pairs `(id_old, id_new, est_jaccard, jaccard)` between a
    * new batch and the stored corpus — identical banding, estimator and
    * exact verify as [[minhashPairs]], but the corpus participates only
    * through its bucketed store: both joins read it Exchange-free
    * (asserted in IncrementalDedupSpec), and the corpus is never
    * re-signatured — per ingest the corpus costs one columnar scan, vs a
    * full re-dedup's corpus-wide signature pass plus shuffle
    * (growth curves measured in ScaleStress). Equivalence to the batch
    * operator (the
    * store×delta restriction of `minhashPairs(store ∪ delta)`) is pinned
    * value-level in the same spec. Tombstoned ids
    * ([[deleteFromFingerprintStore]]) never emit pairs: candidates drop
    * against the (narrow, null-set-row) tombstone scan BEFORE the
    * estimator, and the verify join reads live set rows only. */
  def incrementalPairs(delta: DataFrame, spark: SparkSession,
                       bandsTable: String, setsTable: String,
                       idCol: String = "doc_id", textCol: String = "text",
                       threshold: Double = 0.5,
                       seam: HashSeam = productionSeam): DataFrame = {
    // the delta's bands feed the candidate join and its sets feed the
    // verify join — two subtrees of ONE plan that would each re-tokenize
    // the batch; stage the fingerprints once (delta-sized by contract)
    val staged = stagedFingerprints(delta, idCol, textCol, seam)
      .localCheckpoint(true)
    val dBands = explodeBands(staged, seam)
    val cand = spark.table(bandsTable)
      .select(col("band"), col("bandHash"),
        col("id").as("id_old"), col("sig").as("sig_old"))
      .join(dBands.select(col("band"), col("bandHash"),
        col("id").as("id_new"), col("sig").as("sig_new")),
        Seq("band", "bandHash"))
      .filter(col("id_old") =!= col("id_new")) // re-ingest guard
      .select("id_old", "id_new", "sig_old", "sig_new")
      .dropDuplicates("id_old", "id_new")
      .withColumn("est_jaccard", estJaccard(col("sig_old"), col("sig_new")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_old", "id_new", "est_jaccard")
    val dSets = staged.select("id", "ss")
    val storeSets = spark.table(setsTable)
    val tombstoned = storeSets.filter(col("ss").isNull)
      .select(col("id").as("id_old")).distinct()
    cand
      .join(tombstoned, Seq("id_old"), "left_anti") // deleted docs never pair
      .join(storeSets.filter(col("ss").isNotNull)
        .select(col("id").as("id_old"), col("ss").as("ss_old")), "id_old")
      .join(dSets.select(col("id").as("id_new"), col("ss").as("ss_new")), "id_new")
      .withColumn("jaccard",
        size(array_intersect(col("ss_old"), col("ss_new"))).cast("double") /
          size(array_union(col("ss_old"), col("ss_new"))).cast("double"))
      .select("id_old", "id_new", "est_jaccard", "jaccard")
  }
}
