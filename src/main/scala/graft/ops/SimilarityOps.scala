package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), with a brute-force cosine baseline and a random-
  * hyperplane LSH scale path.
  *
  * Hot-path dot products go through the fused native `cosine_sim`
  * expression (graft.expressions.CosineSim); the `aggregate(zip_with(...))`
  * HOF form is interpreted (CodegenFallback) and kept only as the
  * differential reference and for tiny literal hyperplane dots.
  * Accumulation is sequential left-to-right in double space, so results
  * are deterministic regardless of partitioning.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ in double space (higher-order-function form; used for the
    * tiny literal hyperplane dots where codegen doesn't matter). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF cosine — interpreted; kept as the reference implementation the
    * codegen'd expression is tested against. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Codegen'd fused cosine (graft.expressions.CosineSim): the hot-path
    * form used by every pairwise op below. */
  def cosineFast(spark: org.apache.spark.sql.SparkSession,
                 a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Ranking is on (rounded cosine desc, vec_id) so ties are
    * deterministic.
    *
    * Join shape: the QUERY side is broadcast explicitly — by contract it
    * is the sampled/bounded side (every call site passes a query batch,
    * never a second corpus) — so the corpus STREAMS through one
    * BroadcastNestedLoopJoin and the task count stays linear in the
    * corpus scan. The planner's unhinted CartesianProduct ran
    * left-partitions × right-partitions tasks: the task count grew
    * QUADRATICALLY with the core count (both sides' shuffle partitions
    * track it), which made the bench query slower at 32 cores than at 8.
    * The pair stream is projected to (query_id, item_id, cos) BEFORE the
    * ranking exchange so the window shuffle carries ~24 bytes/row, not
    * two embedding arrays (guide §2.3: project before the exchange);
    * rank ≤ k then caps every group pre-shuffle (WindowGroupLimit). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos",
        round(cosineFast(queries.sparkSession, col("qv"), col("cv")), 4))
      .select("query_id", "item_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** Symmetric per-vector int8 quantization: 4x smaller embeddings for
    * corpus-scale storage/shuffle. Returns (vecCol+"_scale" float,
    * vecCol+"_q" array<tinyint>); [[dequantize]] restores floats. The
    * scale is staged as its own column (multi-referenced — a single-use
    * alias would re-evaluate the max per element through the interpreted
    * HOF). Quantization is an offline corpus transform, so the
    * interpreted transform() path is acceptable here — the hot search
    * path runs on the dequantized (or original) floats with the codegen
    * cosine. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val scaled = df.withColumn(s"${vecCol}_scale",
      (greatest(array_max(transform(col(vecCol), x => abs(x))), lit(1e-30f)) /
        lit(127.0f)).cast("float"))
    scaled.withColumn(s"${vecCol}_q",
      transform(col(vecCol),
        x => round(x / col(s"${vecCol}_scale")).cast("byte")))
  }

  /** Restore floats from [[quantizeInt8]] columns. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, x => (x.cast("float") * scaleCol).cast("float"))

  /** Deterministic random hyperplanes: `numPlanes` unit-free direction
    * vectors of dimension `dim` (sign-only LSH doesn't need normalization). */
  private def planes(dim: Int, numPlanes: Int, seed: Long): IndexedSeq[IndexedSeq[Double]] = {
    var s = seed ^ 0x9e3779b97f4a7c15L
    if (s == 0L) s = 0x106689d45497fdb5L // same absorbing-zero guard as rademacherSigns
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    IndexedSeq.fill(numPlanes)(IndexedSeq.fill(dim)(next()))
  }

  /** Sign-bit signature of `v` against the hyperplanes, packed into a
    * long — the codegen'd [[graft.expressions.LshSign]] (one fused
    * planes×dim loop; the HOF per-plane formulation is interpreted and
    * ~1000× slower per row). */
  def lshSignature(v: Column, dim: Int, numPlanes: Int = 16,
                   seed: Long = 42L): Column = {
    val flat = planes(dim, numPlanes, seed).flatten.toArray
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.LshSign(
        org.apache.spark.sql.GraftColumnBridge.expression(v), flat, dim))
  }

  /** Deterministic ±1 Rademacher sign matrix (row-major, outDim × dim) —
    * the projection's only state, shared with gate oracles that
    * interpolate it as SQL literals (the minhash-permutation precedent). */
  def rademacherSigns(dim: Int, outDim: Int, seed: Long = 42L): Array[Byte] = {
    // xorshift64 has an absorbing zero state: the one seed that XORs to 0
    // would emit 0 forever and collapse every sign to +1, silently
    // destroying the JL property — remap it to an arbitrary odd constant
    var s = seed ^ 0x9e3779b97f4a7c15L
    if (s == 0L) s = 0x106689d45497fdb5L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    Array.fill(outDim * dim)(if ((next() & 1L) == 0L) 1.toByte else -1.toByte)
  }

  /** Johnson-Lindenstrauss dimensionality reduction: project `vecCol`
    * (dim-wide float/double) to `outDim` exact-integer coordinates with
    * a deterministic ±1 sign matrix ([[graft.expressions
    * .RademacherProject]] — one codegen'd outDim×dim loop per row, no
    * shuffle, no model). The 100 TB pre-ANN step: a 1024-dim corpus
    * projects to 64 dims in one narrow map pass, cutting every
    * downstream cosine/LSH/IVF cost ~16× while JL preserves pairwise
    * geometry (Achlioptas 2003). Output is `array<long>` (quantized ×10⁶
    * inputs, ±sums) — bit-replicable in any engine, and cosine is
    * scale-invariant so downstream search never undoes the scaling;
    * cast to `array<double>` for the cosine kernels (exact: magnitudes
    * sit far below 2⁵³). */
  def randomProject(df: DataFrame, outDim: Int, dim: Int,
                    seed: Long = 42L, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val signs = rademacherSigns(dim, outDim, seed)
    df.withColumn(vecCol, bridge.column(
      graft.expressions.RademacherProject(
        bridge.expression(col(vecCol)), signs, dim)))
  }

  /** Interpreted HOF reference implementation (kept for the parity spec). */
  def lshSignatureHof(v: Column, dim: Int, numPlanes: Int = 16,
                      seed: Long = 42L): Column = {
    val ps = planes(dim, numPlanes, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share ≥1 of the 4 signature bands
    * (multi-probe by banding), exact cosine re-rank inside the candidate
    * set. Trades recall for replacing the cross join with an equi-join on
    * band keys — the shuffle is proportional to candidates, not |Q|×|C|. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              numPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    def withBands(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        lshSignature(col(vecCol), dim, numPlanes, seed).as("sig"))
        .select(col(id), col(vec),
          posexplode(array((0 until 4).map(j =>
            shiftright(col("sig"), j * (numPlanes / 4))
              .bitwiseAND((1L << (numPlanes / 4)) - 1)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val qb = withBands(queries, "query_id", "qv")
    val cb = withBands(corpus, "item_id", "cv")
    val cand = qb.join(cb, Seq("band", "key"))
      .filter(col("query_id") =!= col("item_id"))
      .select("query_id", "item_id", "qv", "cv")
      .dropDuplicates("query_id", "item_id")
      .withColumn("cos",
        round(cosineFast(queries.sparkSession, col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** Integer-quantized hyperplanes (`round(w·10^9)`) for the oracle-twin
    * LSH path: the quantized components are interpolated into the DuckDB
    * SQL as literals, so both engines score against the SAME integers. */
  def quantizedPlanes(dim: Int, numPlanes: Int = 16,
                      seed: Long = 42L): IndexedSeq[IndexedSeq[Long]] =
    planes(dim, numPlanes, seed).map(_.map(w => math.round(w * 1e9)))

  /** Oracle-twin LSH ANN: the SAME band/candidate/re-rank machinery as
    * [[lshTopK]] but with sign bits from EXACT INTEGER dots — embeddings
    * quantized to `round(v·10^6)` and hyperplanes to `round(w·10^9)`
    * Longs (|Σ qv·qw| ≤ dims·10^15 ≪ 2^63), so band keys and the
    * candidate set are replicable bit-for-bit by an external engine; the
    * re-rank is the rounded-cosine convention `ann_topk` already proves.
    * The per-plane dots run as interpreted HOFs — oracle tier only; the
    * production path ([[lshTopK]]) keeps the codegen'd [[lshSignature]]. */
  def lshTopKQuantizedBands(df: DataFrame, id: String, dim: Int,
                            numPlanes: Int = 16, seed: Long = 42L,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val ps = quantizedPlanes(dim, numPlanes, seed)
    val bandBits = numPlanes / 4
    def qdot(qv: Column, plane: IndexedSeq[Long]): Column =
      aggregate(zip_with(qv, array(plane.map(lit): _*), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    val staged = df.select(col(idCol).as(id),
      transform(col(vecCol),
        x => round(x.cast("double") * 1000000).cast("long")).as("__qv"))
    staged.select(col(id),
      posexplode(array((0 until 4).map { j =>
        (0 until bandBits).map { r =>
          when(qdot(col("__qv"), ps(j * bandBits + r)) > 0, lit(1L << r))
            .otherwise(lit(0L))
        }.reduce((a: Column, b: Column) => a + b)
      }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
  }

  /** IVF (inverted-file) ANN — the classic scale path beside LSH. A
    * coarse quantizer of `nlist` centroids splits the corpus into cells;
    * a query probes its `nprobe` highest-cosine cells and re-ranks
    * exactly inside them. Candidate volume ≈ |Q|·nprobe·|C|/nlist, never
    * |Q|×|C|, and the only data-sized join is an EQUI-join on the cell
    * id. Centroid scoring cross-joins touch an nlist-row broadcast only.
    *
    * Build = Lloyd's iterations as DataFrame aggregations: assign each
    * vector to its best centroid (broadcast score + max_by), then average
    * per cell via posexplode/avg — no driver-side data pass; the centroid
    * table itself is the only small collect-free broadcast. Averages are
    * rounded so centroids are reproducible across partitionings. */
  def ivfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 2,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // deterministic seed cells: the nlist lowest-id vectors (their ids
    // double as arbitrary-but-stable cell labels)
    var cents = c.orderBy("__id").limit(nlist)
      .select(col("__id").cast("long").as("cid"),
        col("__v").cast("array<double>").as("cvec"))
    (0 until iters).foreach { _ =>
      val assigned = assignCells(spark, c, cents)
      cents = assigned.join(c, "__id")
        .select(col("cid"), posexplode(col("__v")))
        .groupBy("cid", "pos").agg(round(avg("col"), 9).as("v"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))), // bounded: `dims` entries per cell

          x => x.getField("v")).as("cvec"))
    }
    cents
  }

  /** (__id, cid): each vector's best cell, ties to the lowest cid. */
  private def assignCells(spark: org.apache.spark.sql.SparkSession,
                          vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("__s", cosineFast(spark, col("__v"), col("cvec")))
      .groupBy("__id")
      .agg(max_by(col("cid"), struct(col("__s"), -col("cid"))).as("cid"))

  /** IVF top-k: probe `nprobe` cells per query, exact cosine re-rank
    * inside the probed cells. Same output contract as [[bruteForceTopK]]
    * / [[lshTopK]]; recall vs brute force is asserted in ScalaTest.
    * Builds the centroids inline; a serving path that runs many query
    * batches against one corpus should build them ONCE with
    * [[ivfCentroids]] (persist or write the small nlist-row table) and
    * call [[ivfTopKWithCentroids]] — Lloyd's iterations are the dominant
    * build cost and are corpus-only, so re-running them per batch is
    * pure waste (the `ann_ivf` vs `ann_ivf_cached` bench delta). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    ivfTopKWithCentroids(queries, corpus,
      ivfCentroids(corpus, nlist, iters, idCol, vecCol), k, nprobe,
      idCol, vecCol)

  /** [[ivfTopK]] against a PRE-BUILT centroid table (`cid`,
    * `cvec array<double>` — the [[ivfCentroids]] schema, possibly
    * persisted and re-read): search cost only, no Lloyd's pass. */
  def ivfTopKWithCentroids(queries: DataFrame, corpus: DataFrame,
                           cents: DataFrame, k: Int, nprobe: Int = 4,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val items = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cells = assignCells(spark, items, cents)
      .join(items, "__id")
      .select(col("__id").as("item_id"), col("__v").as("cv"), col("cid"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__s", cosineFast(spark, col("qv"), col("cvec")))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("__s"), col("cid"))))
      .filter(col("__pr") <= nprobe)
      .select("query_id", "qv", "cid")
    val cand = probes.join(cells, "cid") // items live in exactly one cell
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", round(cosineFast(spark, col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** The scale path for [[cosinePairs]]: candidate pairs share ≥1 LSH
    * band (equi-join on band keys — shuffle ∝ candidates, not |C|²),
    * exact cosine keeps precision at 1.0; recall is the banding
    * probability. Band WIDTH is the recall/cost dial: the default
    * 8 bands × 8 bits keeps buckets near-singleton (candidates ∝ |C|)
    * and still always catches near-exact duplicates (identical
    * signatures collide in every band); narrow 4-bit bands raise
    * moderate-similarity recall but make the candidate set approach the
    * cross join — measured SLOWER than brute force at corpus sizes where
    * buckets stop pruning. */
  def cosinePairsLsh(corpus: DataFrame, threshold: Double, dim: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     numPlanes: Int = 64, numBands: Int = 8,
                     seed: Long = 42L): DataFrame = {
    require(numPlanes % numBands == 0 && numPlanes <= 64,
      s"numBands=$numBands must divide numPlanes=$numPlanes (<= 64)")
    val bandBits = numPlanes / numBands
    def withBands(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        lshSignature(col(vecCol), dim, numPlanes, seed).as("sig"))
        .select(col(id), col(vec),
          posexplode(array((0 until numBands).map(j =>
            shiftright(col("sig"), j * bandBits)
              .bitwiseAND(if (bandBits == 64) -1L else (1L << bandBits) - 1)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val a = withBands(corpus, "id_a", "va")
    val b = withBands(corpus, "id_b", "vb")
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "va", "vb")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos",
        round(cosineFast(corpus.sparkSession, col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * decontamination family (n-gram join and bloom prefilter are the
    * lexical members, TextAnalysisOps/RuntimeFilterOps): every corpus
    * row whose cosine against ANY test-set row reaches `threshold`,
    * with the best-matching test row (max cosine, min test id on ties)
    * so a curator can audit WHICH benchmark item leaked.
    *
    * Scale shape: the test side is a benchmark — O(1) in corpus size —
    * so it BROADCASTS and the corpus streams through one narrow
    * codegen'd `cosine_sim` pass per test row: embarrassingly parallel,
    * no shuffle until the per-doc argmax (hash agg on doc id). A
    * corpus-sized "test set" is a near-dup problem instead — use
    * [[cosinePairsLsh]]. */
  def semanticContamination(corpus: DataFrame, testSet: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("doc_vec_id"), col(vecCol).as("__ec"))
    val t = testSet.select(col(idCol).as("__tid"), col(vecCol).as("__et"))
    c.crossJoin(org.apache.spark.sql.functions.broadcast(t))
      .withColumn("cos",
        round(cosineFast(corpus.sparkSession, col("__ec"), col("__et")), 4))
      .filter(col("cos") >= threshold)
      // argmax by (cos desc, test id asc): max over (cos, -tid) structs
      .groupBy("doc_vec_id")
      .agg(max(struct(col("cos"), (-col("__tid")).as("__ntid"))).as("__m"))
      .select(col("doc_vec_id"), (-col("__m.__ntid")).as("test_vec_id"),
        col("__m.cos").as("cos"))
  }

  // ---------------------------------------------- feature-hash embedding

  /** The hashing trick: embed raw text as a `dim`-wide vector of
    * signed token votes — bucket = token-hash mod dim, sign = one hash
    * bit, vector[b] = Σ signs. No model, no vocabulary, fully
    * deterministic, and the votes are exact integers, so the embedding
    * is bit-replicable by any engine. Cosine over hash embeddings
    * approximates token-multiset similarity, which makes every
    * downstream vector operator (brute/LSH/IVF/PQ search, the IVF
    * store, embedding near-dup) runnable on a TEXT corpus with no
    * external embedder — the cheap end-to-end path, and the plumbing
    * proof for the real-model one. Vectors are unnormalized (cosine is
    * scale-invariant); all-zero vectors (empty docs, or votes that
    * cancel exactly) are dropped — their cosine is 0/0. */
  def hashEmbed(docs: DataFrame, dim: Int = 64,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    hashEmbedWith(docs, dim, idCol, textCol,
      t => xxhash64(t),
      h => pmod(h, lit(dim)).cast("int"),
      h => when(pmod(shiftright(h, 32), lit(2)) === 0, 1L)
        .otherwise(-1L))

  /** The md5-seamed twin of [[hashEmbed]] — identical machinery, hash
    * replicable in DuckDB (the HashSeam convention): bucket from the
    * first 8 hex chars, sign from the 9th's parity. */
  def hashEmbedMd5(docs: DataFrame, dim: Int = 64,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    hashEmbedWith(docs, dim, idCol, textCol,
      t => md5(t),
      h => pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
        lit(dim)).cast("int"),
      h => when(conv(substring(h, 9, 1), 16, 10).cast("long")
        % 2 === 0, 1L).otherwise(-1L))

  /** `stage` hashes the token ONCE per occurrence in its own projection
    * (CollapseProject keeps non-cheap multiply-referenced expressions
    * staged); bucket and sign then both derive from the staged hash —
    * half the md5/xxhash work of computing each from the raw token. */
  private def hashEmbedWith(docs: DataFrame, dim: Int, idCol: String,
                            textCol: String,
                            stage: Column => Column,
                            bucket: Column => Column,
                            sign: Column => Column): DataFrame = {
    val votes = docs
      .select(col(idCol), explode(DedupOps.tokens(col(textCol))).as("__t"))
      .select(col(idCol), stage(col("__t")).as("__h"))
      .select(col(idCol), bucket(col("__h")).as("__b"),
        sign(col("__h")).as("__s"))
      .groupBy(idCol, "__b").agg(sum("__s").as("__v"))
    votes.groupBy(idCol)
      .agg(map_from_entries(
        collect_list(struct(col("__b"), col("__v")))).as("__m")) // bounded: ≤ dim entries per doc (votes grouped by (doc, bucket))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("float"))
          .as("embedding"))
      .filter(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) > 0)
  }

  // ------------------------------------------------ product quantization

  /** PQ codebook table (`sub`, `code`, `cvec array<float>`): the
    * `ksub` lowest-id corpus vectors sliced into `m` sub-spaces —
    * code c of sub-space s is vector c's elements [s·dsub, (s+1)·dsub).
    * Deterministic raw-vector seeds, the `ann_inc_q` convention: no
    * cross-row float averaging, so the codeword VALUES are corpus
    * floats any engine can reproduce bit-for-bit, which puts the whole
    * encode→decode cycle under the driver's hash gate (`ann_pq_q`).
    * A production refinement would run per-sub-space Lloyd rounds over
    * these seeds (the [[ivfCentroids]] machinery applied per slice);
    * encode/decode/ADC below are codebook-agnostic. */
  def pqCodebooks(corpus: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim must divide into $m sub-spaces")
    val dsub = dim / m
    val seeds = corpus.orderBy(idCol).limit(ksub)
      .select(col(idCol).as("__sid"), col(vecCol).as("__v"))
    val ranked = seeds.withColumn("code",
      (row_number().over(Window.orderBy("__sid")) - 1)) // ksub rows: fine
    val subs = corpus.sparkSession.range(0, m)
      .select(col("id").cast("int").as("sub"))
    ranked.crossJoin(broadcast(subs))
      .select(col("sub"), col("code"),
        slice(col("__v"), col("sub") * dsub + 1, lit(dsub))
          .cast("array<float>").as("cvec"))
  }

  /** Train the codebooks: per-sub-space Lloyd rounds over the
    * [[pqCodebooks]] seeds. Assignment reuses the codegen'd exact-integer
    * encoder (one [[pqEncode]] pass assigns ALL sub-spaces at once);
    * re-centering is EXACT INTEGER arithmetic end-to-end — per-(sub,
    * code) coordinate mean computed as Σ quantize(x) (a long sum:
    * associativity-free, so partitioning can never move it) divided by
    * the member count with half-away-from-zero integer rounding, then
    * one double division by 10⁶ and one float cast. No float ever
    * accumulates across rows, so the TRAINED codebook is bit-replicable
    * in any engine — the full train→encode→decode cycle sits under the
    * driver's hash gate (`ann_pq_train_q`), not just the seeded one.
    * Codes that attract no vectors keep their previous codeword (k
    * stays fixed; a vanished cell would shrink the code space and break
    * stored codes). Train once per corpus and persist the m·ksub-row
    * table beside the encoded vectors — encode / decode / ADC are
    * codebook-agnostic. */
  def pqCodebooksTrained(corpus: DataFrame, dim: Int, m: Int = 8,
                         ksub: Int = 16, iters: Int = 2,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val dsub = dim / m
    var cb = pqCodebooks(corpus, dim, m, ksub, idCol, vecCol)
    (0 until iters).foreach { _ =>
      val asg = pqEncode(corpus, cb, idCol, vecCol)
        .select(col(idCol), posexplode(col("codes")))
        .select(col(idCol), col("pos").cast("int").as("sub"),
          col("col").as("code"))
      val sl = corpus.select(col(idCol), posexplode(col(vecCol)))
        .select(col(idCol), (col("pos") / lit(dsub)).cast("int").as("sub"),
          (col("pos") % lit(dsub)).as("d"),
          // the same round(x·10⁶) fixed-point the encoder assigns by
          round(col("col").cast("double") * lit(1e6), 0).cast("long")
            .as("__q"))
      val trained = asg.join(sl, Seq(idCol, "sub"))
        .groupBy("sub", "code", "d")
        .agg(sum("__q").as("__sq"), count(lit(1)).as("__n"))
        // integer mean, ties half away from zero: exact in longs
        .withColumn("__cq", when(col("__sq") >= 0,
            expr("(2 * __sq + __n) div (2 * __n)"))
          .otherwise(-expr("(2 * -__sq + __n) div (2 * __n)")))
        .withColumn("cv", col("__cq").cast("double") / lit(1e6))
        .groupBy("sub", "code")
        .agg(transform(
          array_sort(collect_list(struct(col("d"), col("cv")))), // bounded: dsub entries per (sub, code)
          x => x.getField("cv")).cast("array<float>").as("tvec"))
      cb = cb.join(trained, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("tvec"), col("cvec")).as("cvec"))
    }
    cb
  }

  /** Collect a codebook table into the m × ksub × dsub driver array the
    * PQ expressions carry (bounded: m·ksub rows — the same class of
    * driver-side smallness as the IVF centroid table). */
  def collectCodebook(cb: DataFrame): Array[Array[Array[Float]]] =
    cb.select("sub", "code", "cvec").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))

  /** `round(x·10⁶)` fixed-point view of a float/double vector column —
    * exact longs, half away from zero (Spark `round` ≡ DuckDB `ROUND`
    * ≡ [[graft.expressions.Pq.quantize]], the proven oracle seam). */
  def q6(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Residual-PQ codebook: per-sub-space INTEGER codewords over the
    * `ksub` lowest-id rows' residual vectors (`rqCol`: array<long> of
    * length `dim`) — the [[pqCodebooks]] raw-slice no-averaging
    * convention lifted to fixed point, so the whole
    * assign → residual → encode → reconstruct cycle is exact-integer
    * and bit-replicable (`ann_pq_res_q`). Table: (sub, code,
    * qvec array<long>). */
  def pqResidualCodebooks(residuals: DataFrame, dim: Int, m: Int = 8,
                          ksub: Int = 16, idCol: String = "item_id",
                          rqCol: String = "rq"): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim must divide into $m sub-spaces")
    val dsub = dim / m
    val seeds = residuals.orderBy(idCol).limit(ksub)
      .select(col(idCol).as("__sid"), col(rqCol).as("__r"))
    val ranked = seeds.withColumn("code",
      (row_number().over(Window.orderBy("__sid")) - 1)) // ksub rows: fine
    val subs = residuals.sparkSession.range(0, m)
      .select(col("id").cast("int").as("sub"))
    ranked.crossJoin(broadcast(subs))
      .select(col("sub"), col("code"),
        slice(col("__r"), col("sub") * dsub + 1, lit(dsub)).as("qvec"))
  }

  /** Collect an INTEGER codebook table (sub, code, qvec array<long>) —
    * the [[collectCodebook]] twin for the residual tier. */
  def collectCodebookLong(cb: DataFrame): Array[Array[Array[Long]]] =
    cb.select("sub", "code", "qvec").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))

  /** Encode a corpus to (`idCol`, `codes array<int>`): 32× smaller than
    * 64 floats (m bytes of code space per vector; stored as ints for
    * parquet simplicity, dictionary-encoded to ~m bytes on disk). Code
    * assignment is exact-integer argmin (see [[graft.expressions.PqCodes]]). */
  def pqEncode(df: DataFrame, cb: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val qcb = graft.expressions.Pq.quantizeCodebook(collectCodebook(cb))
    df.select(col(idCol),
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.PqCodes(
          org.apache.spark.sql.GraftColumnBridge.expression(col(vecCol)),
          qcb)).as("codes"))
  }

  /** Lossy decode: (`idCol`, `embedding array<float>`) reconstructed
    * from codes — each element a verbatim codeword float. */
  def pqDecode(codes: DataFrame, cb: DataFrame,
               idCol: String = "vec_id"): DataFrame = {
    val cbArr = collectCodebook(cb)
    codes.select(col(idCol),
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.PqReconstruct(
          org.apache.spark.sql.GraftColumnBridge.expression(col("codes")),
          cbArr)).as("embedding"))
  }

  /** PQ top-k by asymmetric distance computation: raw queries against
    * the ENCODED corpus — the corpus pass reads only the codes column
    * and scores each candidate in m table adds (never reconstructing a
    * vector), so at 100 TB the scan is 32× lighter than the float
    * corpus and the per-candidate cost is independent of `dim`. Each
    * query precomputes its m·ksub dot-product LUT once
    * ([[graft.expressions.PqLut]]); the codeword-norm table rides the
    * scoring expression as one broadcast-with-the-task object. Output
    * contract matches [[bruteForceTopK]]; cosines are the PQ
    * approximation (recall vs exact is spec-asserted, and equality to
    * reconstruct-then-cosine is pinned to float tolerance). */
  def pqTopKAdc(queries: DataFrame, codes: DataFrame, cb: DataFrame, k: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val cbArr = collectCodebook(cb)
    val n2 = cbArr.map(_.map { cw =>
      var s = 0.0; var i = 0
      while (i < cw.length) { s += cw(i).toDouble * cw(i).toDouble; i += 1 }
      s
    })
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val q = queries.select(col(idCol).as("query_id"),
      bridge.column(graft.expressions.PqLut(
        bridge.expression(col(vecCol)), cbArr)).as("__lut"),
      sqrt(dot(col(vecCol), col(vecCol))).as("__qn"))
    val c = codes.select(col(idCol).as("item_id"), col("codes"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", round(bridge.column(graft.expressions.PqAdcCosine(
        bridge.expression(col("codes")), bridge.expression(col("__lut")),
        bridge.expression(col("__qn")), n2)), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** Embedding near-dup pairs: all pairs with cosine above `threshold`.
    * Brute-force form (oracle-friendly); [[cosinePairsLsh]] is the
    * scale path. */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(cosineFast(corpus.sparkSession, col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
