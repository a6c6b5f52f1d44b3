package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, GraphOps, ScalableWindow}

/** Corpus-curation operators a training-data pipeline runs AFTER scoring
  * and pair-finding: near-dup cluster resolution (pairs → one survivor per
  * cluster), deterministic train/val/test splits, sequence packing, and
  * per-source quota sampling. All four are oracle-checked against DuckDB.
  *
  * Determinism conventions: split assignment and sampling order hash with
  * `md5` of the STRING form of the id — both engines implement RFC-1321
  * md5 over identical bytes, so bucket assignments agree bit-for-bit.
  * At 100 TB every one of these is either a hash-partitioned aggregation,
  * a partitioned window, or the O(log n) component loop in
  * [[graft.ops.GraphOps]] — no global sorts, no driver materialization.
  */
object CurationOps {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** First `digits` md5 hex digits of the id as a uniform long — the ONE
    * place the engine's deterministic-hash convention lives (split
    * assignment, shuffle order, curation pipeline all derive from it). */
  private def hashLong(id: org.apache.spark.sql.Column, digits: Int) =
    conv(substring(md5(id.cast("string")), 1, digits), 16, 10).cast("long")

  /** 8-hex-digit hash reduced to a bucket in [0, mod). */
  private def hashBucket(id: org.apache.spark.sql.Column, mod: Int) =
    hashLong(id, 8) % mod

  /** 2^60 — the exclusive upper bound of the 15-hex-digit [[hashLong]]. */
  private val HashSpace = 1152921504606846976L
  /** floor(2^60 / 1e6): one part-per-million of the hash space. Integer, so
    * `ppm * PpmUnit` is the same exact threshold in Spark and DuckDB. */
  private val PpmUnit = 1152921504606L

  /** Deterministic weighted mixture sampling (temperature-style source
    * re-balancing): keep a document iff its 60-bit md5 hash falls below its
    * source's weight threshold — `hashLong(id) < weight_ppm · 2^60/10^6`.
    *
    * Weights are parts-per-million integers (exact in both engines; a
    * float `w · 2^60` could round differently per libm). `ppm ≥ 1e6` means
    * keep-everything and maps to the full hash space exactly. Acceptance
    * depends only on (id, its source's weight): rerun-stable, growth-stable
    * (adding docs never flips an existing doc's fate), resumable, and a
    * pure per-row projection — embarrassingly parallel at any scale. */
  /** Weight-ppm derived from a source id's numeric suffix ("srcNNN…" →
    * `(NNN % mod) * mulPpm + addPpm`), taking the UNBOUNDED suffix
    * (position 4 to end): a fixed-length cap would silently truncate a
    * 10-digit suffix and diverge from any oracle using `SUBSTR(source, 4)`.
    * Shared by `sample_mixture`/`sample_upweight` and their specs so the
    * convention can't fork. */
  def sourceSuffixPpm(mod: Int, mulPpm: Long, addPpm: Long): org.apache.spark.sql.Column =
    (col("source").substr(lit(4), length(col("source")))
      .cast("long") % mod) * mulPpm + addPpm

  def mixtureSample(docs: DataFrame, idCol: String,
                    weightPpm: org.apache.spark.sql.Column): DataFrame = {
    val thresh = when(weightPpm >= 1000000L, lit(HashSpace))
      .otherwise(weightPpm * lit(PpmUnit))
    docs.withColumn("weight_ppm", weightPpm.cast("long"))
      .filter(hashLong(col(idCol), 15) < thresh)
  }

  /** Deterministic weighted UP-sampling — the other half of temperature
    * re-balancing: weights may exceed 1, and a doc is REPEATED
    * `floor(w)` times plus one more iff its hash falls under the
    * fractional threshold (`n_rep = ⌊w⌋ + [hash(id) < frac(w)·2^60]`,
    * the epochs-style repetition of high-quality sources in LLM data
    * recipes). Same ppm-integer hash convention as [[mixtureSample]]
    * (w ≤ 1 degenerates to it, with a `rep` column of 1s). Pure per-row
    * projection + a bounded explode (≤ ⌈w_max⌉ rows per doc, a config
    * constant): no shuffle, rerun- and growth-stable. */
  def mixtureUpsample(docs: DataFrame, idCol: String,
                      weightPpm: org.apache.spark.sql.Column): DataFrame = {
    val w = weightPpm.cast("long")
    val base = floor(w / lit(1000000.0)).cast("long") // exact: ppm ≪ 2^53
    val extra = when(
      hashLong(col(idCol), 15) < (w % 1000000L) * lit(PpmUnit), 1L)
      .otherwise(0L)
    docs.withColumn("weight_ppm", w)
      .withColumn("__n_rep", base + extra)
      .filter(col("__n_rep") > 0)
      .withColumn("rep", explode(sequence(lit(1L), col("__n_rep"))))
      .drop("__n_rep")
  }

  val all: Seq[Q] = Seq(
    // Near-dup CLUSTER resolution: the exact-Jaccard pair graph (same
    // parameters as dedup_jaccard) resolved to connected components;
    // every document is assigned the min doc_id of its cluster (itself
    // when unpaired). The survivor set of the dedup pass is
    // cluster_id == doc_id. Oracle: the same pair SQL + a recursive
    // transitive closure.
    q(
      "dedup_clusters",
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |), k AS (
        |  SELECT doc_id, gram FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 64)
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n FROM k GROUP BY 1
        |), sh AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM sh JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |  WHERE CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) >= 0.5
        |), e AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |), comp AS (
        |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
        |)
        |SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val pairs = DedupOps.jaccardPairs(docs, w = 3, threshold = 0.5, maxDf = 64)
      GraphOps.clusterAssign(docs, "doc_id", pairs)
    },

    // Deterministic train/val/test assignment: md5-hash the doc id into
    // 100 buckets (90/5/5). Stable under reruns, re-partitioning and
    // corpus growth — a doc's split never depends on what else is in the
    // corpus. Pure per-row projection: embarrassingly parallel.
    q(
      "split_assign",
      """SELECT doc_id,
        |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) AS bucket,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      val b = hashBucket(col("doc_id"), 100)
      tDocs(s, dir).select(
        col("doc_id"),
        b.as("bucket"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
    },

    // Temperature re-balancing with weights DERIVED FROM THE CORPUS
    // (the production recipe — sample_mixture's weights are inputs;
    // here they come from the data): per-source keep-rate ∝ 1/√n so the
    // resampled source sizes flatten toward √n (α = 0.5 temperature
    // sampling), computed in exact integer arithmetic — ⌊√n⌋ is safe
    // cross-engine because IEEE sqrt is correctly rounded — and applied
    // through the shared md5-threshold convention. The per-source
    // weight table is corpus-bounded and broadcast; acceptance stays a
    // pure per-row projection.
    q(
      "sample_temperature",
      """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n_src,
        |    LEAST(1000000, 10 * CAST(FLOOR(SQRT(CAST(n_src AS DOUBLE))) AS BIGINT)
        |                   * 1000000 // n_src) AS weight_ppm
        |  FROM c),
        |k AS (
        |  SELECT d.doc_id, d.source, w.n_src, w.weight_ppm,
        |    CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
        |      AS UBIGINT) AS BIGINT) AS hk
        |  FROM documents d JOIN w USING (source))
        |SELECT source, n_src, weight_ppm, COUNT(*) AS n_kept
        |FROM k
        |WHERE weight_ppm >= 1000000 OR hk < weight_ppm * 1152921504606
        |GROUP BY 1, 2, 3""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val cnts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
        .withColumn("weight_ppm",
          least(lit(1000000L),
            expr("10 * cast(floor(sqrt(cast(n_src as double))) as bigint)" +
              " * 1000000 div n_src")))
      mixtureSample(docs.join(broadcast(cnts), "source"),
          "doc_id", col("weight_ppm"))
        .groupBy("source", "n_src", "weight_ppm")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("source")
    },

    // LEAKAGE-FREE split: near-duplicate documents must never straddle
    // train and test (a near-copy of a training doc in the eval set is
    // contamination), so the split hashes the CLUSTER id, not the doc
    // id — every member of a connected near-dup component lands in the
    // same split by construction. Composition of the registered
    // dedup_clusters and split_assign operators; the oracle chains the
    // same recursive transitive closure into the same md5 bucket
    // arithmetic over the cluster representative.
    q(
      "split_leakfree",
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |), k AS (
        |  SELECT doc_id, gram FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 64)
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n FROM k GROUP BY 1
        |), sh AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM sh JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |  WHERE CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) >= 0.5
        |), e AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |), comp AS (
        |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
        |), asg AS (
        |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM asg""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val pairs = DedupOps.jaccardPairs(docs, w = 3, threshold = 0.5, maxDf = 64)
      val b = hashBucket(col("cluster_id"), 100)
      GraphOps.clusterAssign(docs, "doc_id", pairs)
        .select(col("doc_id"), col("cluster_id"),
          when(b < 90, "train").when(b < 95, "val").otherwise("test")
            .as("split"))
        .orderBy("doc_id")
    },

    // Sequence packing (concat-then-chunk): documents in doc_id order are
    // concatenated into training sequences of a 512-token budget; a doc's
    // sequence id is its exclusive running token total DIV the budget.
    // The running total is the two-phase ScalableWindow prefix sum — no
    // single-partition window at any scale.
    q(
      "pack_sequences",
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER
        |    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS BIGINT), 0) // 512 AS seq_id
        |FROM tk""".stripMargin
    ) { (s, dir) =>
      val tk = tDocs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      ScalableWindow
        .prefixSumExclusive(tk, Seq("doc_id"), col("n_tokens"), "__cum")
        .select(col("doc_id"), col("n_tokens"),
          expr("__cum div 512").as("seq_id")) // integer div: float floor drifts past 2^53 cumulative tokens
    },

    // Length-SORTED batching — the padding-efficiency sibling of
    // pack_sequences: docs ordered globally by (token count DESC, id)
    // and cut into batches by running token budget, so each batch holds
    // similar-length docs and the padding bill (max·n − sum a trainer
    // actually pays for unpacked batches) stays small. The global order
    // and running sum both ride the two-phase ScalableWindow — at
    // 100 TB there is no single-partition sort anywhere in the plan.
    // The per-batch padded_tokens column IS the efficiency metric,
    // hash-pinned.
    q(
      "pack_batches",
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(CAST(SUM(n_tokens) OVER
        |      (ORDER BY n_tokens DESC, doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) // 512 AS batch_id
        |  FROM tk
        |)
        |SELECT batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
        |  CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
        |    AS padded_tokens
        |FROM b GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      val tk = tDocs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
        // descending token order through the ascending two-phase
        // machinery: negate the leading key (ties broken by id)
        .withColumn("__neg", -col("n_tokens"))
      ScalableWindow
        .prefixSumExclusive(tk, Seq("__neg", "doc_id"), col("n_tokens"),
          "__cum")
        .withColumn("batch_id", expr("__cum div 512"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("batch_tokens"),
          (max("n_tokens") * count(lit(1)) - sum("n_tokens"))
            .as("padded_tokens"))
        .orderBy("batch_id")
    },

    // The FULL curation run composed in one query: quality gate
    // (length + repetition) → near-dup CLUSTER dedup (survivors only,
    // via the connected-component assignment) → deterministic train
    // split → sequence packing. Every stage is the registered operator's
    // exact logic; the oracle chains the same stages as CTEs around the
    // recursive closure. This is the end-to-end shape a curation run
    // executes before training.
    q(
      "pipeline_dataprep",
      """WITH q AS (
        |  SELECT doc_id, text,
        |    LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n
        |  FROM documents
        |  WHERE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) >= 20
        |), d AS (
        |  SELECT MIN(doc_id) AS doc_id, MAX(n) AS n
        |  FROM q GROUP BY md5(text)
        |), c AS (
        |  SELECT doc_id, n,
        |    CASE WHEN n <= 30 THEN 1
        |         ELSE CAST(CEIL((n - 30) / 20.0) AS INT) + 1 END AS n_chunks
        |  FROM d
        |), s AS (
        |  SELECT *, CASE
        |    WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90 THEN 'train'
        |    WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 95 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM c
        |)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      // the session-4 tier composed end-to-end: token-count quality gate
      // → exact dedup (min doc_id per identical text) → RAG chunk count
      // (the text_chunk window math) → md5 split assignment (the
      // split_assign convention) → per-split corpus accounting. Every
      // stage is the oracle-gated operator; the composition itself is
      // what this query hash-checks.
      val toksN = size(split(trim(col("text")), "\\s+"))
      val q1 = tDocs(s, dir)
        .select(col("doc_id"), col("text"), toksN.as("n"))
        .filter(col("n") >= 20)
      val d = q1.groupBy(md5(col("text")))
        .agg(min("doc_id").as("doc_id"), max("n").as("n"))
      val c = d.withColumn("n_chunks",
        when(col("n") <= 30, lit(1)).otherwise(
          ceil((col("n") - 30).cast("double") / 20).cast("int") + 1))
      val b = hashBucket(col("doc_id"), 100)
      c.withColumn("split",
          when(b < 90, "train").when(b < 95, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chunks").cast("long").as("n_chunks"),
          sum("n").cast("long").as("n_tokens"))
    },

    q(
      "pipeline_curation",
      """WITH RECURSIVE gated AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE n_chars >= 150 AND (
        |    CASE WHEN LEN(STRING_SPLIT(text, ' ')) = 0 THEN 0.0
        |         ELSE 1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
        |                  / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) END) <= 0.5
        |), tk AS (
        |  SELECT doc_id,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM gated
        |), g AS (
        |  SELECT doc_id,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |), k AS (
        |  SELECT doc_id, gram FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 64)
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n FROM k GROUP BY 1
        |), sh AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM sh JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |  WHERE CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) >= 0.5
        |), e AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |), comp AS (
        |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
        |), surv AS (
        |  SELECT d.doc_id, d.text FROM gated d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |  WHERE COALESCE(c.cluster_id, d.doc_id) = d.doc_id
        |), tr AS (
        |  SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM surv
        |  WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) < 90
        |)
        |SELECT doc_id, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER
        |    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS BIGINT), 0) // 512 AS seq_id
        |FROM tr""".stripMargin
    ) { (s, dir) =>
      val toksCol = split(col("text"), " ", -1)
      val dupRatio = when(size(toksCol) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(toksCol)).cast("double") /
          size(toksCol).cast("double"))
      val gated = tDocs(s, dir)
        .filter(col("n_chars") >= 150 && dupRatio <= 0.5)
        .select("doc_id", "text")
      val pairs = DedupOps.jaccardPairs(gated, w = 3, threshold = 0.5, maxDf = 64)
      val surv = gated.join(
        GraphOps.clusterAssign(gated, "doc_id", pairs)
          .filter(col("doc_id") === col("cluster_id")).select("doc_id"),
        "doc_id")
      // checkpoint before the window: prefixSumExclusive's sample job,
      // carry aggregate and final join would otherwise each re-execute
      // the gate→pair→cluster→split upstream (their differing column
      // pruning defeats exchange reuse — the tfidf_terms lesson).
      // SIDE EFFECT: the eager checkpoint means merely BUILDING this
      // DataFrame executes the whole upstream and pins the result to
      // blocks from construction time — plan-only consumers (schema
      // inspection, .explain) pay a full run. Accepted: the registered
      // query's consumers all execute it, and a lazy persist would leave
      // the triple re-execution in the actual run.
      val train = surv.filter(hashBucket(col("doc_id"), 100) < 90)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
        .localCheckpoint(true)
      ScalableWindow
        .prefixSumExclusive(train, Seq("doc_id"), col("n_tokens"), "__cum")
        .select(col("doc_id"), col("n_tokens"),
          expr("__cum div 512").as("seq_id")) // integer div: float floor drifts past 2^53 cumulative tokens
    },

    // Global deterministic training-order shuffle: every doc gets a
    // stable position = its rank under the md5 hash order (hash as a
    // 60-bit integer so the range-bucketed two-phase row number applies;
    // doc_id breaks the astronomically-unlikely hash tie). Rerunnable,
    // resumable, and independent of input partitioning — the shuffled
    // read order a training run consumes.
    q(
      "shuffle_order",
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hk
        |  FROM documents)
        |SELECT doc_id, hk,
        |  ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS ord
        |FROM h""".stripMargin
    ) { (s, dir) =>
      val h = tDocs(s, dir).select(col("doc_id"),
        hashLong(col("doc_id"), 15).as("hk"))
      ScalableWindow.rowNumber(h, Seq("hk", "doc_id"), "ord")
        .select(col("doc_id"), col("hk"), col("ord"))
    },

    // Per-source quota sampling: a deterministic k-per-source downsample
    // (the domain-mixture rebalancing step). Rank by md5 inside each
    // source partition — a partitioned window, which scales by source
    // cardinality, not corpus size.
    q(
      "sample_per_source",
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      tDocs(s, dir)
        .select(col("doc_id"), col("source"),
          row_number().over(w).cast("long").as("rk"))
        .filter(col("rk") <= 5)
    },

    // Weighted mixture sampling: the soft counterpart of the hard quota
    // above — each source keeps a target FRACTION of its docs
    // (temperature-style re-balancing) instead of a fixed k. The weight is
    // derived from the source's numeric suffix ((n % 4 + 1)/4 → 0.25, 0.5,
    // 0.75, 1.0) so the query exercises the full weight range without a
    // hardcoded source list. Acceptance is the md5-threshold convention
    // shared with split_assign: hash(doc_id) under weight·2^60, exact
    // integer arithmetic in both engines.
    q(
      "sample_mixture",
      """SELECT doc_id, source, weight_ppm FROM (
        |  SELECT doc_id, source,
        |    (CAST(SUBSTR(source, 4) AS BIGINT) % 4 + 1) * 250000 AS weight_ppm,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hk
        |  FROM documents)
        |WHERE hk < CASE WHEN weight_ppm >= 1000000
        |                THEN 1152921504606846976
        |                ELSE weight_ppm * 1152921504606 END""".stripMargin
    ) { (s, dir) =>
      // unbounded suffix (substr from 4 to end), matching the oracle's
      // SUBSTR(source, 4) exactly — a fixed length cap would silently
      // diverge on sources with suffixes longer than the cap
      val ppm = sourceSuffixPpm(mod = 4, mulPpm = 250000L, addPpm = 250000L)
      mixtureSample(tDocs(s, dir), "doc_id", ppm)
        .select("doc_id", "source", "weight_ppm")
    },

    // Weighted UP-sampling: weights over 1 repeat documents (suffix-derived
    // (n % 3)·0.75 + 0.5 → 0.5, 1.25, 2.0 — exercising the sub-1, mixed,
    // and exact-integer classes). n_rep = floor(w) + one fractional-hash
    // extra; one output row per (doc, rep). Same md5-threshold integers as
    // sample_mixture, replicated exactly by the oracle.
    q(
      "sample_upweight",
      """WITH w AS (
        |  SELECT doc_id, source,
        |    (CAST(SUBSTR(source, 4) AS BIGINT) % 3) * 750000 + 500000 AS weight_ppm,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hk
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, source, weight_ppm,
        |    weight_ppm // 1000000 +
        |      CASE WHEN hk < (weight_ppm % 1000000) * 1152921504606
        |           THEN 1 ELSE 0 END AS n_rep
        |  FROM w
        |)
        |SELECT doc_id, source, weight_ppm,
        |  UNNEST(GENERATE_SERIES(1, n_rep)) AS rep
        |FROM n WHERE n_rep > 0""".stripMargin
    ) { (s, dir) =>
      // same unbounded-suffix convention as sample_mixture (oracle parity)
      val ppm = sourceSuffixPpm(mod = 3, mulPpm = 750000L, addPpm = 500000L)
      mixtureUpsample(tDocs(s, dir), "doc_id", ppm)
        .select("doc_id", "source", "weight_ppm", "rep")
    },

    // The curation FUNNEL report — per-stage survivor counts (total →
    // quality gate → prefix-dedup survivor → train split) as ONE
    // conditional aggregation: one scan, one partitioned window for the
    // per-prefix keeper, one aggregate. This is the shape a curation run
    // logs after every batch; counting each stage with separate queries
    // would re-scan the corpus per stage. Stages use registered-operator
    // logic (pipeline_curation's gate, dedup_prefix_sample's key,
    // split_assign's bucket).
    q(
      "curation_funnel",
      """WITH x AS (
        |  SELECT doc_id, text,
        |    (n_chars >= 150 AND (CASE WHEN LEN(STRING_SPLIT(text, ' ')) = 0 THEN 0.0
        |         ELSE 1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
        |                  / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) END) <= 0.5) AS gated
        |  FROM documents
        |), y AS (
        |  SELECT doc_id, gated,
        |    MIN(CASE WHEN gated THEN doc_id END)
        |      OVER (PARTITION BY SUBSTR(text, 1, 40)) AS m
        |  FROM x
        |), z AS (
        |  SELECT doc_id, gated, (gated AND doc_id = m) AS surv FROM y
        |)
        |SELECT COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        |  CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS n_surv,
        |  CAST(SUM(CASE WHEN surv AND
        |      CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) < 90
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train
        |FROM z""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toksCol = split(col("text"), " ", -1)
      val dupRatio = when(size(toksCol) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(toksCol)).cast("double") /
          size(toksCol).cast("double"))
      val w = Window.partitionBy(substring(col("text"), 1, 40))
      tDocs(s, dir)
        .withColumn("gated", col("n_chars") >= 150 && dupRatio <= 0.5)
        .withColumn("m",
          min(when(col("gated"), col("doc_id"))).over(w))
        .withColumn("surv", col("gated") && col("doc_id") === col("m"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("gated").cast("long")).as("n_gated"),
          sum(col("surv").cast("long")).as("n_surv"),
          sum((col("surv") && hashBucket(col("doc_id"), 100) < 90)
            .cast("long")).as("n_train"))
    }
  )
}
