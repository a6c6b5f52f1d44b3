package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over the `documents` table: exact
  * dedup, language histogram, token/char statistics, quality scoring.
  * Near-dup (MinHash/SimHash/Jaccard) lives in [[graft.ops]] with
  * ScalaTest-verified semantics; the SQL-expressible parts are here with
  * DuckDB oracles.
  */
object TextOps {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  val all: Seq[Q] = Seq(
    // REAL BPE training (BpeOps — Sennrich-style iterative pair merges
    // over the word-frequency dictionary, windows keyed by word, one-row
    // argmax per round). The oracle unrolls TWO full training steps in
    // SQL: pair counting via LEAD (overlaps included), argmax with the
    // (freq desc, left, right) tie-break, greedy left-to-right
    // non-overlapping replacement as gaps-and-islands with odd-rank
    // merge starts, and position renumbering. `tokens_after` folds the
    // whole post-merge dictionary state into the hash, so step 2's row
    // only matches if step 1's REPLACEMENT (not just its argmax) was
    // exactly right across every word.
    q(
      "bpe_merges",
      """WITH w0 AS (
        |  SELECT w AS word, COUNT(*) AS freq FROM (
        |    SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS w
        |    FROM documents)
        |  GROUP BY 1 ORDER BY freq DESC, word LIMIT 1000
        |), s0 AS (
        |  SELECT word, freq, i AS pos, substr(word, CAST(i + 1 AS INT), 1) AS sym
        |  FROM w0, UNNEST(range(length(word))) AS t(i)
        |), p1 AS (
        |  SELECT word, freq, pos, sym,
        |    LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b FROM s0
        |), c1 AS (
        |  SELECT sym AS a, b, CAST(SUM(freq) AS BIGINT) AS f
        |  FROM p1 WHERE b IS NOT NULL GROUP BY 1, 2
        |), b1 AS (SELECT a, b, f FROM c1 ORDER BY f DESC, a, b LIMIT 1
        |), m1 AS (
        |  SELECT p1.*, (sym = (SELECT a FROM b1) AND b = (SELECT b FROM b1)) AS isp
        |  FROM p1
        |), i1 AS (
        |  SELECT *, CASE WHEN isp THEN pos -
        |    ROW_NUMBER() OVER (PARTITION BY word, isp ORDER BY pos) END AS island
        |  FROM m1
        |), t1 AS (
        |  SELECT *, (isp AND ROW_NUMBER() OVER
        |    (PARTITION BY word, island ORDER BY pos) % 2 = 1) AS strt
        |  FROM i1
        |), u1 AS (
        |  SELECT word, freq, pos,
        |    CASE WHEN strt THEN sym || b ELSE sym END AS sym,
        |    COALESCE(LAG(strt) OVER (PARTITION BY word ORDER BY pos), FALSE)
        |      AS consumed
        |  FROM t1
        |), s1 AS (
        |  SELECT word, freq,
        |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos, sym
        |  FROM u1 WHERE NOT consumed
        |), p2 AS (
        |  SELECT word, freq, pos, sym,
        |    LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b FROM s1
        |), c2 AS (
        |  SELECT sym AS a, b, CAST(SUM(freq) AS BIGINT) AS f
        |  FROM p2 WHERE b IS NOT NULL GROUP BY 1, 2
        |), b2 AS (SELECT a, b, f FROM c2 ORDER BY f DESC, a, b LIMIT 1
        |), m2 AS (
        |  SELECT p2.*, (sym = (SELECT a FROM b2) AND b = (SELECT b FROM b2)) AS isp
        |  FROM p2
        |), i2 AS (
        |  SELECT *, CASE WHEN isp THEN pos -
        |    ROW_NUMBER() OVER (PARTITION BY word, isp ORDER BY pos) END AS island
        |  FROM m2
        |), t2 AS (
        |  SELECT *, (isp AND ROW_NUMBER() OVER
        |    (PARTITION BY word, island ORDER BY pos) % 2 = 1) AS strt
        |  FROM i2
        |), u2 AS (
        |  SELECT word, freq, pos,
        |    CASE WHEN strt THEN sym || b ELSE sym END AS sym,
        |    COALESCE(LAG(strt) OVER (PARTITION BY word ORDER BY pos), FALSE)
        |      AS consumed
        |  FROM t2
        |), s2 AS (
        |  SELECT word, freq,
        |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos, sym
        |  FROM u2 WHERE NOT consumed
        |)
        |SELECT 1 AS step, a AS lsym, b AS rsym, f AS pair_freq,
        |  (SELECT CAST(SUM(freq) AS BIGINT) FROM s1) AS tokens_after FROM b1
        |UNION ALL
        |SELECT 2, a, b, f,
        |  (SELECT CAST(SUM(freq) AS BIGINT) FROM s2) FROM b2""".stripMargin
    ) { (s, dir) =>
      graft.ops.BpeOps.train(tDocs(s, dir), s, topWords = 1000, merges = 2)
        .orderBy("step")
    },

    // Corpus tokenization with the TRAINED vocabulary (BpeOps
    // .encodeCorpus): the merge loop runs only over the bounded word
    // dictionary; the corpus pass is explode → broadcast-join the
    // segmentation → sum, no windows. The oracle re-derives the
    // segmented dictionary with the same two unrolled steps and joins
    // it declaratively — equal hashes prove the trained segmentation
    // and the corpus join agree end-to-end. Dictionary words only
    // (inner join): OOV coverage is tok_vocab's metric.
    q(
      "bpe_encode",
      """WITH w0 AS (
        |  SELECT w AS word, COUNT(*) AS freq FROM (
        |    SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS w
        |    FROM documents)
        |  GROUP BY 1 ORDER BY freq DESC, word LIMIT 1000
        |), s0 AS (
        |  SELECT word, freq, i AS pos, substr(word, CAST(i + 1 AS INT), 1) AS sym
        |  FROM w0, UNNEST(range(length(word))) AS t(i)
        |), p1 AS (
        |  SELECT word, freq, pos, sym,
        |    LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b FROM s0
        |), c1 AS (
        |  SELECT sym AS a, b, CAST(SUM(freq) AS BIGINT) AS f
        |  FROM p1 WHERE b IS NOT NULL GROUP BY 1, 2
        |), b1 AS (SELECT a, b, f FROM c1 ORDER BY f DESC, a, b LIMIT 1
        |), m1 AS (
        |  SELECT p1.*, (sym = (SELECT a FROM b1) AND b = (SELECT b FROM b1)) AS isp
        |  FROM p1
        |), i1 AS (
        |  SELECT *, CASE WHEN isp THEN pos -
        |    ROW_NUMBER() OVER (PARTITION BY word, isp ORDER BY pos) END AS island
        |  FROM m1
        |), t1 AS (
        |  SELECT *, (isp AND ROW_NUMBER() OVER
        |    (PARTITION BY word, island ORDER BY pos) % 2 = 1) AS strt
        |  FROM i1
        |), u1 AS (
        |  SELECT word, freq, pos,
        |    CASE WHEN strt THEN sym || b ELSE sym END AS sym,
        |    COALESCE(LAG(strt) OVER (PARTITION BY word ORDER BY pos), FALSE)
        |      AS consumed
        |  FROM t1
        |), s1 AS (
        |  SELECT word, freq,
        |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos, sym
        |  FROM u1 WHERE NOT consumed
        |), p2 AS (
        |  SELECT word, freq, pos, sym,
        |    LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b FROM s1
        |), c2 AS (
        |  SELECT sym AS a, b, CAST(SUM(freq) AS BIGINT) AS f
        |  FROM p2 WHERE b IS NOT NULL GROUP BY 1, 2
        |), b2 AS (SELECT a, b, f FROM c2 ORDER BY f DESC, a, b LIMIT 1
        |), m2 AS (
        |  SELECT p2.*, (sym = (SELECT a FROM b2) AND b = (SELECT b FROM b2)) AS isp
        |  FROM p2
        |), i2 AS (
        |  SELECT *, CASE WHEN isp THEN pos -
        |    ROW_NUMBER() OVER (PARTITION BY word, isp ORDER BY pos) END AS island
        |  FROM m2
        |), t2 AS (
        |  SELECT *, (isp AND ROW_NUMBER() OVER
        |    (PARTITION BY word, island ORDER BY pos) % 2 = 1) AS strt
        |  FROM i2
        |), u2 AS (
        |  SELECT word, freq, pos,
        |    CASE WHEN strt THEN sym || b ELSE sym END AS sym,
        |    COALESCE(LAG(strt) OVER (PARTITION BY word ORDER BY pos), FALSE)
        |      AS consumed
        |  FROM t2
        |), s2 AS (
        |  SELECT word, freq,
        |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos, sym
        |  FROM u2 WHERE NOT consumed
        |), segc AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub FROM s2 GROUP BY 1
        |), cw AS (
        |  SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
        |  FROM documents
        |)
        |SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS bpe_tokens
        |FROM cw JOIN segc USING (word) GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.ops.BpeOps
      val docs = tDocs(s, dir)
      val (_, syms) = BpeOps.trainFromSymbols(
        BpeOps.initialSymbols(BpeOps.wordDict(docs, 1000)), merges = 2)
      // the segmentation is dictionary-bounded (≤1000 rows): collect it
      // and free the pinned symbol table so repeated invocations leave
      // no executor-block debt behind (the a_rollup lesson)
      val seg = BpeOps.segmentCounts(syms)
        .as[(String, Long)].collect().toSeq.toDF("word", "n_sub")
      syms.unpersist()
      BpeOps.encodeCorpus(docs, seg).orderBy("doc_id")
    },

    // Exact dedup: group identical texts, keep min doc_id as the survivor.
    q(
      "dedup_exact",
      """SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin
    ) { (s, dir) =>
      tDocs(s, dir)
        .groupBy("text")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .select("keeper", "n_copies")
    },

    // Prefix-collapse dup clusters WITH the bounded membership sample:
    // documents sharing their leading 40 characters (the boilerplate /
    // mirrored-header collapse heuristic; the corpus has no full-text
    // dupes at gate SF, so the prefix key is what exercises the shape).
    // Reports the DedupOps.exactDupes contract — full n_copies + the K
    // smallest member ids (K=3) — under the oracle. The sample comes from
    // rank-then-filter: WindowGroupLimit caps every group at K rows
    // BEFORE the shuffle, so a crawl-scale viral prefix (billions of
    // copies) still contributes K ids, never its whole membership. It is
    // emitted as a comma-joined string (arrays don't cross the
    // parquet/DuckDB value-hash boundary canonically).
    q(
      "dedup_prefix_sample",
      """SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies,
        |  ARRAY_TO_STRING(LIST_SORT(LIST(doc_id))[1:3], ',') AS member_sample
        |FROM documents GROUP BY SUBSTR(text, 1, 40) HAVING COUNT(*) > 1""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = tDocs(s, dir)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("__pfx"))
      val dupes = docs.groupBy("__pfx")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
      val w = Window.partitionBy("__pfx").orderBy("doc_id")
      val sample = docs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .groupBy("__pfx")
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",") // bounded: input filtered to <= 3 rows per group
          .as("member_sample"))
      dupes.join(sample, "__pfx")
        .select("keeper", "n_copies", "member_sample")
    },

    // Language-ID histogram (the ground-truth label column; the heuristic
    // n-gram classifier is verified separately against this).
    q(
      "lang_hist",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      tDocs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    },

    // Repetition scoring: duplicate-token ratio per document — the
    // boilerplate/spam signal (degenerate repeated text scores near 1).
    q(
      "text_repetition",
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_distinct,
        |  CASE WHEN LEN(STRING_SPLIT(text, ' ')) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
        |                / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) END AS dup_ratio
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      tDocs(s, dir)
        .withColumn("__t", split(col("text"), " ", -1))
        .select(
          col("doc_id"),
          size(col("__t")).cast("long").as("n_tokens"),
          size(array_distinct(col("__t"))).cast("long").as("n_distinct"),
          when(size(col("__t")) === 0, lit(0.0))
            .otherwise(lit(1.0) -
              size(array_distinct(col("__t"))).cast("double") /
                size(col("__t")).cast("double")).as("dup_ratio"))
    },

    // Exact n-gram Jaccard near-dup pairs (inverted-index shape): the
    // Spark side joins xxhash64 gram hashes, the oracle joins the gram
    // strings — identical pairs barring 64-bit collisions. The stop-gram
    // guard (grams in >64 docs dropped from both sides of the ratio) is
    // ON and replicated in the oracle, so the skew protection the op
    // needs at crawl scale is itself hash-verified by the gate.
    q(
      "dedup_jaccard",
      """WITH tk AS (
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
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, n_shared,
        |  ROUND(CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared), 4) AS jaccard
        |FROM sh JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) >= 0.5""".stripMargin
    ) { (s, dir) =>
      graft.ops.DedupOps.jaccardPairs(tDocs(s, dir), w = 3,
        threshold = 0.5, maxDf = 64)
    },

    // Distinctive terms per source: tf-idf-shaped ranking with a PURE
    // INTEGER score tf·(N−df) — classic ln-idf would put a libm ln() in
    // the compare (not bit-identical across engines); the integer score
    // preserves the ranking intent and hashes exactly. Top-3 per source
    // via row_number, which the planner turns into a two-phase
    // WindowGroupLimit (per-source top-k BEFORE the shuffle).
    q(
      "tfidf_terms",
      """WITH tk AS (
        |  SELECT source,
        |    UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT source, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2
        |), n AS (SELECT COUNT(DISTINCT source) AS ns FROM documents)
        |SELECT source, term, tf, df, score, rk FROM (
        |  SELECT source, term, tf, df, tf * (ns - df) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY tf * (ns - df) DESC, term) AS rk
        |  FROM (
        |    SELECT source, term, tf,
        |      COUNT(*) OVER (PARTITION BY term) AS df
        |    FROM tf) CROSS JOIN n) WHERE rk <= 3""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // ONE tokenize+explode pass. A self-join formulation of df
      // (tf ⋈ tf.groupBy(term)) makes Catalyst re-derive the whole
      // scan+explode per branch (the branches prune different columns, so
      // their exchanges aren't canonically equal and nothing is reused —
      // measured: 3 corpus scans). Instead df is a count-over-window ON
      // the tf rows: one extra exchange keyed `term`, whose per-term
      // partitions are bounded by the SOURCE cardinality (tf is one row
      // per (source, term)), so even a stopword's window stays tiny. N is
      // a narrow source-only scan of documents (column-pruned parquet),
      // broadcast as a single row.
      val tf = tDocs(s, dir)
        .select(col("source"),
          explode(graft.ops.DedupOps.tokens(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      val withDf = tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      val ns = tDocs(s, dir).agg(countDistinct("source").as("ns"))
      val w = Window.partitionBy("source")
        .orderBy(col("score").desc, col("term"))
      withDf.crossJoin(broadcast(ns))
        .withColumn("score", col("tf") * (col("ns") - col("df")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("source", "term", "tf", "df", "score", "rk")
    },

    // Train/test n-gram decontamination: src19 plays the benchmark suite;
    // pairs sharing >= 3 distinct trigrams are contaminated. The Spark
    // path joins on xxhash64 gram hashes (the 100 TB shape); the oracle
    // joins the gram strings — identical pairs barring 64-bit collisions.
    q(
      "decontam_ngram",
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |)
        |SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM g tr JOIN g te ON tr.gram = te.gram
        |WHERE tr.source <> 'src19' AND te.source = 'src19'
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin
    ) { (s, dir) =>
      graft.ops.TextAnalysisOps.contamination(
        tDocs(s, dir), col("source") === "src19",
        w = 3, minShared = 3)
    },

    // The same decontamination sweep behind the bloom runtime filter: a
    // fixed-size sketch of the test-suite gram hashes prunes the train
    // gram stream BEFORE the join's shuffle — at 100 TB that stream is
    // the whole corpus and almost none of it joins. Blooms have no false
    // negatives and the exact join still runs, so the oracle is decontam
    // _ngram's verbatim.
    q(
      "decontam_bloom",
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |)
        |SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM g tr JOIN g te ON tr.gram = te.gram
        |WHERE tr.source <> 'src19' AND te.source = 'src19'
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin
    ) { (s, dir) =>
      graft.ops.TextAnalysisOps.contamination(
        tDocs(s, dir), col("source") === "src19",
        w = 3, minShared = 3, bloomGateBits = Some(1L << 21))
    },

    // End-to-end preprocessing pipeline in ONE declarative plan: length
    // gate -> exact-dedup survivor -> benchmark-decontamination anti-join
    // -> token count. The composition a real training-data run executes;
    // Catalyst sees the whole thing and optimizes across stages.
    q(
      "pipeline_e2e",
      """WITH keepers AS (
        |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        |), tk AS (
        |  SELECT doc_id, source,
        |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> LEN(x) > 0) AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 2),
        |      i -> ARRAY_TO_STRING(t[i:i+2], ' ')))) AS gram
        |  FROM tk WHERE LEN(t) >= 3
        |), contaminated AS (
        |  SELECT tr.doc_id AS train_doc
        |  FROM g tr JOIN g te ON tr.gram = te.gram
        |  WHERE tr.source <> 'src19' AND te.source = 'src19'
        |  GROUP BY tr.doc_id, te.doc_id HAVING COUNT(*) >= 3
        |)
        |SELECT d.doc_id,
        |  CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN keepers k ON d.doc_id = k.doc_id
        |WHERE d.n_chars BETWEEN 50 AND 5000 AND d.source <> 'src19'
        |  AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.train_doc = d.doc_id)""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val keepers = docs.groupBy("text")
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val contaminated = graft.ops.TextAnalysisOps.contamination(
          docs, col("source") === "src19", w = 3, minShared = 3)
        .select("train_doc").distinct()
      docs
        .filter(col("n_chars").between(50, 5000) && col("source") =!= "src19")
        .join(keepers, Seq("doc_id"))
        .join(contaminated, col("doc_id") === col("train_doc"), "left_anti")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
    },

    // Token counting + char length per document (whitespace tokenizer).
    q(
      "text_tokens",
      """SELECT doc_id, LENGTH(text) AS len_chars,
        |  LEN(STRING_SPLIT(text, ' ')) AS n_tokens
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      tDocs(s, dir).select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        size(split(col("text"), " ", -1)).as("n_tokens"))
    },

    // Vocabulary induction (the tokenizer-training primitive): top-V
    // tokens by corpus frequency with a deterministic tie-break, plus
    // the OOV rate that vocab leaves (ppm, integer division). No global
    // window anywhere: the top-V frame comes from a distributed top-k
    // (orderBy+limit → TakeOrderedAndProject, per-partition heaps), the
    // rank is a broadcast self-join over the ≤V-row result, and oov_ppm
    // is plain scalar-agg arithmetic (total_tf − top_tf). A crawl-scale
    // corpus has an unbounded unique-token tail; none of it ever
    // funnels through a single task here.
    q(
      "tok_vocab",
      """WITH t AS (
        |  SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(text), '\s+')) AS token
        |  FROM documents
        |), tc AS (
        |  SELECT token, COUNT(*) AS tf FROM t WHERE token <> '' GROUP BY 1
        |), rk AS (
        |  SELECT token, tf,
        |    ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rank
        |  FROM tc
        |), ov AS (
        |  SELECT CAST(SUM(CASE WHEN rank > 10 THEN tf ELSE 0 END) * 1000000
        |    // SUM(tf) AS BIGINT) AS oov_ppm FROM rk
        |)
        |SELECT token, tf, rank, (SELECT oov_ppm FROM ov) AS oov_ppm
        |FROM rk WHERE rank <= 10""".stripMargin
    ) { (s, dir) =>
      val tc = tDocs(s, dir)
        .select(explode(graft.ops.DedupOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
      // Distributed top-k: per-partition heaps, no global sort, no window.
      val top = tc.orderBy(desc("tf"), col("token")).limit(10)
      // Rank inside the bounded top frame = 1 + |rows strictly ahead|,
      // via a broadcast self-join (≤V×V on a tiny frame).
      val ahead = top.select(col("token").as("t2"), col("tf").as("tf2"))
      val rk = top.join(
          broadcast(ahead),
          col("tf2") > col("tf") ||
            (col("tf2") === col("tf") && col("t2") < col("token")),
          "left")
        .groupBy("token", "tf")
        .agg((count(col("t2")) + 1).cast("long").as("rank"))
      val ov = tc.agg(sum("tf").as("total_tf"))
        .crossJoin(broadcast(top.agg(sum("tf").as("top_tf"))))
        .select(expr(
          "cast((total_tf - top_tf) * 1000000 div total_tf as bigint)")
          .as("oov_ppm"))
      rk.crossJoin(broadcast(ov))
        .select(col("token"), col("tf"), col("rank"), col("oov_ppm"))
        .orderBy("rank")
    },

    // Conjunctive search through a REAL bucketed inverted index built
    // from 80% of the corpus + a 20% append (InvertedIndexOps): the
    // term filter is a bucket-pruned scan (SelectedBucketsCount
    // spec-asserted), the store never shuffles. The append is SUBMITTED
    // TWICE under one batch tag — the at-least-once redelivery an
    // orchestrator produces — so the replay guard runs inside the gate:
    // a doubled batch would double-count nothing here but WOULD flip
    // text_bm25's tf/df hash below. DuckDB answers the same query by
    // brute-force list_contains over the raw corpus — equal hashes
    // prove the index loses and invents nothing across build + append.
    q(
      "text_search",
      """SELECT doc_id FROM documents
        |WHERE list_contains(STRING_SPLIT_REGEX(LOWER(text), '\s+'), 'batch')
        |  AND list_contains(STRING_SPLIT_REGEX(LOWER(text), '\s+'), 'scan')
        |  AND list_contains(STRING_SPLIT_REGEX(LOWER(text), '\s+'), 'hash')""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-tidx")
      InvertedIndexOps.writeTextIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_text_idx", base)
      val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      InvertedIndexOps.appendToTextIndex(delta, s, "graft_text_idx",
        batchTag = Some("b1"))
      InvertedIndexOps.appendToTextIndex(delta, s, "graft_text_idx",
        batchTag = Some("b1")) // redelivery: must be a no-op
      InvertedIndexOps.searchAllTerms(
        s, "graft_text_idx", Seq("batch", "scan", "hash"))
        .orderBy("doc_id")
    },

    // Exact PHRASE search through a REAL positional index (one posting
    // per token occurrence with its position, bucketed by term, same
    // commit-ledger durability as the other index kinds; the 20%
    // append rides a replayed batch tag). The positional AND is pure
    // arithmetic — occurrence i of the phrase's i-th term maps to its
    // candidate start (pos − i) and a start holding all 3 offsets is a
    // match — so candidates are the phrase terms' posting mass, never
    // a position self-join. DuckDB brute-forces consecutive-token
    // windows over the raw corpus; equal hashes prove the positional
    // payload and the start-vote arithmetic exactly.
    q(
      "text_phrase",
      """WITH raw AS (
        |  SELECT doc_id, list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, UNNEST(GENERATE_SERIES(1, LEN(ts) - 2)) AS i, ts
        |  FROM raw WHERE LEN(ts) >= 3
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM st
        |WHERE ts[CAST(i AS INT)] = 'stream'
        |  AND ts[CAST(i + 1 AS INT)] = 'table'
        |  AND ts[CAST(i + 2 AS INT)] = 'hash'
        |GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-pidx")
      InvertedIndexOps.writePositionalIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_pos_idx", base)
      val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      InvertedIndexOps.appendToPositionalIndex(delta, s, "graft_pos_idx",
        batchTag = Some("b1"))
      InvertedIndexOps.appendToPositionalIndex(delta, s, "graft_pos_idx",
        batchTag = Some("b1")) // redelivery: doubled positions would
                               // double every n_matches
      InvertedIndexOps.searchPhrase(
        s, "graft_pos_idx", Seq("stream", "table", "hash"))
        .orderBy("doc_id")
    },

    // PROXIMITY (sloppy) phrase search over the same positional index:
    // the phrase's terms in ORDER within a span ≤ 6 tokens, n_matches =
    // distinct anchors beginning a valid chain. The index side is the
    // greedy-chain walk (for a fixed anchor the greedy next-position
    // choice minimizes the span, so "some chain fits" ⟺ "the greedy
    // chain fits") evaluated as array arithmetic inside one row per
    // candidate doc — no position self-join; DuckDB brute-forces the
    // ordered-chain EXISTENCE per anchor with non-equi joins. Equal
    // hashes pin the chain arithmetic, the span bound and the anchor
    // counting; the streamed append rides a replayed batch tag.
    q(
      "text_phrase_slop",
      """WITH raw AS (
        |  SELECT doc_id, list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
        |         ts[CAST(i + 1 AS INT)] AS t
        |  FROM raw, UNNEST(range(len(ts))) AS u(i)
        |), m AS (
        |  SELECT p0.doc_id, p0.pos AS a
        |  FROM tok p0
        |  JOIN tok p1 ON p1.doc_id = p0.doc_id AND p1.t = 'table'
        |    AND p1.pos > p0.pos AND p1.pos <= p0.pos + 6
        |  JOIN tok p2 ON p2.doc_id = p0.doc_id AND p2.t = 'hash'
        |    AND p2.pos > p1.pos AND p2.pos <= p0.pos + 6
        |  WHERE p0.t = 'stream'
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM m GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-pidx-slop")
      InvertedIndexOps.writePositionalIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_slop_idx", base)
      val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      InvertedIndexOps.appendToPositionalIndex(delta, s, "graft_slop_idx",
        batchTag = Some("b1"))
      InvertedIndexOps.appendToPositionalIndex(delta, s, "graft_slop_idx",
        batchTag = Some("b1")) // redelivery: doubled positions would
                               // double every chain count
      InvertedIndexOps.searchPhraseWindow(
        s, "graft_slop_idx", Seq("stream", "table", "hash"), maxSpan = 6)
        .orderBy("doc_id")
    },

    // BM25 ranked retrieval through a REAL scored index store (tf+dlen
    // postings bucketed by term, append-only corpus-stats rows) built
    // from 80% of the corpus + a 20% append. df comes off the pruned
    // postings scan, N/avgdl off the summed stats rows — so the hash
    // pins the index's tf/dlen payload, the stats-append arithmetic and
    // the scoring formula at once, while DuckDB recomputes everything
    // from the raw corpus. Contributions round(6), scores round(4):
    // wide enough for last-ulp libm LN divergence, tight for everything
    // else. Identical expression TREES on both sides — the constants
    // are written (1.2 + 1) not 2.2 because they differ in the last
    // double bit.
    q(
      "text_bm25",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN ('batch', 'scan', 'hash') GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM tf
        |  JOIN dfq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |)
        |SELECT doc_id, ROUND(SUM(c), 4) AS score,
        |  CAST(COUNT(*) AS BIGINT) AS matched
        |FROM sc GROUP BY 1
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-bm25")
      InvertedIndexOps.writeScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_bm25_idx", base)
      val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      // the append is submitted twice under one tag: a replayed batch
      // that actually landed would double tf/df/N and flip this hash
      InvertedIndexOps.appendToScoredIndex(delta, s, "graft_bm25_idx",
        batchTag = Some("b1"))
      InvertedIndexOps.appendToScoredIndex(delta, s, "graft_bm25_idx",
        batchTag = Some("b1"))
      InvertedIndexOps.searchBm25(
        s, "graft_bm25_idx", Seq("batch", "scan", "hash"), topK = 50)
    },

    // Batched BM25 retrieval — a whole query TABLE scored in one pass
    // over the index (the retrieval-eval / hard-negative-mining shape):
    // three queries with overlapping vocabularies, per-query top-20.
    // Spark routes them through searchBm25Batch's single pruned scan +
    // one per-query window; DuckDB recomputes every query's BM25 from
    // the raw corpus via a VALUES-driven join. Equal hashes pin that
    // batching changes nothing: per-term df is global (off the shared
    // scan), stats are shared, ranks are per-query.
    q(
      "text_bm25_multi",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), qq AS (
        |  SELECT * FROM (VALUES
        |    (0, 'batch'), (0, 'scan'), (0, 'hash'),
        |    (1, 'batch'),
        |    (2, 'scan'), (2, 'hash')) v(query_id, term)
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT term FROM qq) GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT qq.query_id, tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM qq
        |  JOIN tf USING (term) JOIN dfq ON dfq.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |), res AS (
        |  SELECT query_id, doc_id, ROUND(SUM(c), 4) AS score,
        |    CAST(COUNT(*) AS BIGINT) AS matched
        |  FROM sc GROUP BY 1, 2
        |)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank, score,
        |  matched
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rank
        |  FROM res
        |) WHERE rank <= 20""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      import s.implicits._
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-bm25-multi")
      InvertedIndexOps.writeScoredIndex(docs, s, "graft_bm25m_idx", base)
      val queries = Seq(
        (0L, Seq("batch", "scan", "hash")),
        (1L, Seq("batch")),
        (2L, Seq("scan", "hash"))).toDF("query_id", "terms")
      InvertedIndexOps.searchBm25Batch(queries, s, "graft_bm25m_idx",
        topK = 20)
        .orderBy("query_id", "rank")
    },

    // WAND-pruned batched BM25 under the oracle: queries mixing the
    // corpus's one RARE term ('dup', df ≈ 5%) with its stopwords
    // (df ≈ 75-80% — above the 0.5 classification threshold), so at
    // sf0.01 the pruned tier ENGAGES and is ACCEPTED (the dup-doc
    // candidates' k-th score clears the stopwords' summed upper bound),
    // plus one all-stopword query exercising the up-front full-plan
    // routing. DuckDB computes every query's BM25 by full evaluation —
    // equal hashes ARE the pruned ≡ unpruned proof on real data, scores
    // ranks and matched-counts included (the probe phase must add the
    // stopword contributions of every candidate exactly).
    q(
      "text_bm25_wand",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), qq AS (
        |  SELECT * FROM (VALUES
        |    (0, 'dup'), (0, 'the'), (0, 'data'),
        |    (1, 'dup'), (1, 'key'), (1, 'fast'), (1, 'scan'),
        |    (2, 'the'), (2, 'data')) v(query_id, term)
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT term FROM qq) GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT qq.query_id, tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM qq
        |  JOIN tf USING (term) JOIN dfq ON dfq.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |), res AS (
        |  SELECT query_id, doc_id, ROUND(SUM(c), 4) AS score,
        |    CAST(COUNT(*) AS BIGINT) AS matched
        |  FROM sc GROUP BY 1, 2
        |)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank, score,
        |  matched
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rank
        |  FROM res
        |) WHERE rank <= 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      import s.implicits._
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-bm25-wand")
      InvertedIndexOps.writeScoredIndex(docs, s, "graft_bm25w_idx", base)
      val queries = Seq(
        (0L, Seq("dup", "the", "data")),
        (1L, Seq("dup", "key", "fast", "scan")),
        (2L, Seq("the", "data"))).toDF("query_id", "terms")
      InvertedIndexOps.searchBm25Batch(queries, s, "graft_bm25w_idx",
        topK = 10)
        .orderBy("query_id", "rank")
    },

    // TIME-TRAVEL ranked search under the oracle: build 80%, append
    // 20% (capture that ledger seq), then DELETE every doc_id % 11 == 3
    // — and search AS OF the pre-delete commit. DuckDB computes BM25
    // over the FULL corpus (the delete must be invisible at that seq:
    // results, df, N and avgdl all roll back through the one
    // ledger-prefix filter). The text_bm25_del gate pins the CURRENT
    // read of the same shape, so together they prove one store serves
    // both timelines.
    q(
      "text_bm25_asof",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN ('batch', 'scan', 'hash') GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM tf
        |  JOIN dfq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |)
        |SELECT doc_id, ROUND(SUM(c), 4) AS score,
        |  CAST(COUNT(*) AS BIGINT) AS matched
        |FROM sc GROUP BY 1
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-bm25-asof")
      InvertedIndexOps.writeScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_bm25a_idx", base)
      // the append is double-submitted under one tag (the replay-in-gate
      // convention): a second landing would take seq 3, shift the
      // captured handle AND double the as-of corpus mass — either flips
      // this hash
      InvertedIndexOps.appendToScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), s,
        "graft_bm25a_idx", batchTag = Some("b1"))
      InvertedIndexOps.appendToScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), s,
        "graft_bm25a_idx", batchTag = Some("b1"))
      val at = InvertedIndexOps.currentLedgerSeq(s, "graft_bm25a_idx")
      InvertedIndexOps.deleteFromTextIndex(
        docs.filter(pmod(col("doc_id"), lit(11)) === 3).select("doc_id"),
        s, "graft_bm25a_idx")
      InvertedIndexOps.searchBm25(s, "graft_bm25a_idx",
        Seq("batch", "scan", "hash"), topK = 50, asOfSeq = Some(at))
    },

    // Right-to-be-forgotten through the SAME scored index lifecycle:
    // build 80% + tagged append 20%, then DELETE every doc_id % 11 == 3
    // (tombstones + one negative ledger row) and search. DuckDB computes
    // BM25 from scratch over the SURVIVORS only — equal hashes prove the
    // deleted docs left the results, the df counts, AND the corpus stats
    // (N, avgdl), i.e. the negative-ledger retraction is exact. The
    // delete is also submitted twice: a non-idempotent delete would
    // subtract the stats mass twice and flip every idf/avgdl input.
    q(
      "text_bm25_del",
      """WITH corpus AS (
        |  SELECT * FROM documents WHERE doc_id % 11 <> 3
        |), tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM corpus
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM corpus) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN ('batch', 'scan', 'hash') GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM tf
        |  JOIN dfq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |)
        |SELECT doc_id, ROUND(SUM(c), 4) AS score,
        |  CAST(COUNT(*) AS BIGINT) AS matched
        |FROM sc GROUP BY 1
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      import graft.ops.InvertedIndexOps
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-bm25-del")
      InvertedIndexOps.writeScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), s,
        "graft_bm25_del_idx", base)
      InvertedIndexOps.appendToScoredIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), s,
        "graft_bm25_del_idx", batchTag = Some("b1"))
      val doomed = docs.filter(pmod(col("doc_id"), lit(11)) === 3)
        .select("doc_id")
      InvertedIndexOps.deleteFromTextIndex(doomed, s, "graft_bm25_del_idx")
      InvertedIndexOps.deleteFromTextIndex(doomed, s, "graft_bm25_del_idx")
      // the physical reclaim runs MID-CHAIN (tombstoned postings gone,
      // ledger untouched) — the oracle doesn't change because a rebuild
      // must not change semantics
      InvertedIndexOps.rebuildTextIndex(s, "graft_bm25_del_idx",
        scratchDir("graft-bm25-del-rb"))
      InvertedIndexOps.searchBm25(
        s, "graft_bm25_del_idx", Seq("batch", "scan", "hash"), topK = 50)
    },

    // RAG-style chunking: 30-token windows, stride 20 (10-token overlap),
    // map-only (TextAnalysisOps.chunkDocuments — bounded explode, no
    // shuffle). DuckDB rebuilds every chunk string via list slicing; the
    // hash compare covers window math, the short last chunk, and the
    // exact reassembled chunk text.
    q(
      "text_chunk",
      """WITH tok AS (
        |  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS t,
        |    LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, t, n, UNNEST(GENERATE_SERIES(0,
        |    CASE WHEN n <= 30 THEN 0
        |         ELSE CAST(CEIL((n - 30) / 20.0) AS INT) END)) AS i
        |  FROM tok
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  CAST(LEAST(30, n - i * 20) AS BIGINT) AS n_chunk_tokens,
        |  ARRAY_TO_STRING(t[i * 20 + 1 : i * 20 + 30], ' ') AS chunk
        |FROM g""".stripMargin
    ) { (s, dir) =>
      graft.ops.TextAnalysisOps.chunkDocuments(
        tDocs(s, dir), chunkTokens = 30, strideTokens = 20)
    },

    // Span-level dedup: drop every 64-char chunk whose exact text repeats
    // anywhere in the corpus (the boilerplate-banner strip whole-document
    // dedup can't do), reassemble docs from surviving chunks. The corpus
    // has shared leading boilerplate (see dedup_prefix_sample), so this
    // bites for real. String chunk keys here so DuckDB replicates
    // exactly; the op doc notes the xxhash64-keyed production variant.
    q(
      "text_span_dedup",
      """WITH c AS (
        |  SELECT doc_id, i,
        |    SUBSTR(text, CAST(i AS INT) * 64 + 1, 64) AS chunk
        |  FROM (SELECT doc_id, text,
        |          UNNEST(GENERATE_SERIES(0, (STRLEN(text) - 1) // 64)) AS i
        |        FROM documents)
        |), d AS (
        |  SELECT doc_id, i, chunk, COUNT(*) OVER (PARTITION BY chunk) AS df
        |  FROM c
        |)
        |SELECT doc_id, STRING_AGG(chunk, '' ORDER BY i) AS cleaned,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept
        |FROM d WHERE df = 1 GROUP BY doc_id""".stripMargin
    ) { (s, dir) =>
      graft.ops.TextAnalysisOps.dropDuplicatedSpans(
        tDocs(s, dir), chunkChars = 64)
    },

    // PII redaction — the scrub pass every training-data pipeline runs
    // before anything else sees the text. The corpus is synthetic, so a
    // deterministic email + phone are woven in from doc_id ON BOTH SIDES
    // (Spark and oracle build the identical pre-redaction string); the
    // codegen'd regexp_replace/regexp_count then run for real and the
    // gate hash-compares the scrubbed text and the per-doc match counts.
    // Patterns stay in the Java∩RE2 common dialect (char classes, \d,
    // bounded repetition — no lookaround) so both engines agree.
    q(
      "text_redact",
      """WITH p AS (
        |  SELECT doc_id,
        |    SUBSTR(text, 1, 60) || ' contact u' || CAST(doc_id AS VARCHAR)
        |      || '@ex-' || CAST(doc_id % 7 AS VARCHAR) || '.com or 555-'
        |      || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii
        |  FROM documents
        |)
        |SELECT doc_id,
        |  REGEXP_REPLACE(
        |    REGEXP_REPLACE(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                   '<EMAIL>', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(pii,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(pii, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones
        |FROM p""".stripMargin
    ) { (s, dir) =>
      val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val phonePat = """\d{3}-\d{3}-\d{4}"""
      val pii = concat(
        substring(col("text"), 1, 60), lit(" contact u"),
        col("doc_id").cast("string"), lit("@ex-"),
        (col("doc_id") % 7).cast("string"), lit(".com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      tDocs(s, dir)
        .select(col("doc_id"), pii.as("__pii"))
        .select(
          col("doc_id"),
          regexp_replace(
            regexp_replace(col("__pii"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>").as("redacted"),
          regexp_count(col("__pii"), lit(emailPat)).as("n_emails"),
          regexp_count(col("__pii"), lit(phonePat)).as("n_phones"))
    },

    // Bigram LM training (the perplexity-filter model): counts from the
    // trusted slice (lang='en'), top 200 bigrams under a total-order
    // tie-break, each with its history count. c1 is derived FROM the
    // bigram table (c1 = Σ_w2 c2), so a single miscounted pair breaks
    // both columns. Spark builds bigrams in-row from the token array
    // (zero-shuffle transform); the oracle builds them with LEAD — two
    // formulations, one answer.
    q(
      "lm_train",
      """WITH toks AS (
        |  SELECT doc_id, lang, i AS pos, ws[CAST(i + 1 AS INT)] AS w
        |  FROM (SELECT doc_id, lang,
        |          regexp_extract_all(LOWER(text), '[a-z]+') AS ws
        |        FROM documents) d,
        |       UNNEST(range(len(ws))) AS t(i)
        |), big AS (
        |  SELECT doc_id, lang, w AS w1,
        |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM toks
        |), c2t AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM big WHERE w2 IS NOT NULL AND lang = 'en' GROUP BY 1, 2
        |), c1t AS (
        |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2t GROUP BY 1
        |)
        |SELECT c2t.w1 AS w1, w2, c2, c1
        |FROM c2t JOIN c1t ON c2t.w1 = c1t.w1
        |ORDER BY c2 DESC, w1, w2 LIMIT 200""".stripMargin
    ) { (s, dir) =>
      val m = graft.ops.LmOps.trainBigram(
        tDocs(s, dir).filter(col("lang") === "en"))
      m.bigrams.join(m.unigrams, "w1")
        .orderBy(desc("c2"), col("w1"), col("w2"))
        .limit(200)
        .select("w1", "w2", "c2", "c1")
    },

    // Per-document LM scoring: the integer sufficient statistics of the
    // add-one-smoothed cross-entropy (bigram count, OOV count, summed
    // bigram/history training counts) for EVERY document, including
    // bigram-less ones (zeros). The float avg_nll/ppl derived from
    // these is differentially spec-tested in LmSpec — here the exact
    // counts pin the tokenization, the bigram construction and both
    // model joins.
    q(
      "lm_score",
      """WITH toks AS (
        |  SELECT doc_id, lang, i AS pos, ws[CAST(i + 1 AS INT)] AS w
        |  FROM (SELECT doc_id, lang,
        |          regexp_extract_all(LOWER(text), '[a-z]+') AS ws
        |        FROM documents) d,
        |       UNNEST(range(len(ws))) AS t(i)
        |), big AS (
        |  SELECT doc_id, lang, w AS w1,
        |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM toks
        |), c2t AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM big WHERE w2 IS NOT NULL AND lang = 'en' GROUP BY 1, 2
        |), c1t AS (
        |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2t GROUP BY 1
        |), sc AS (
        |  SELECT b.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN c2t.c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_oov,
        |    CAST(SUM(COALESCE(c2t.c2, 0)) AS BIGINT) AS sum_c2,
        |    CAST(SUM(COALESCE(c1t.c1, 0)) AS BIGINT) AS sum_c1
        |  FROM big b
        |  LEFT JOIN c2t ON b.w1 = c2t.w1 AND b.w2 = c2t.w2
        |  LEFT JOIN c1t ON b.w1 = c1t.w1
        |  WHERE b.w2 IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  COALESCE(n_bigrams, 0) AS n_bigrams, COALESCE(n_oov, 0) AS n_oov,
        |  COALESCE(sum_c2, 0) AS sum_c2, COALESCE(sum_c1, 0) AS sum_c1
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val m = graft.ops.LmOps.trainBigram(docs.filter(col("lang") === "en"))
      graft.ops.LmOps.scoreDocs(docs, m)
        .select("doc_id", "n_bigrams", "n_oov", "sum_c2", "sum_c1")
    },

    // Feature-hash embedding (the hashing trick) END-TO-END under the
    // oracle: raw text → dim-16 signed-vote vectors → brute-force
    // cosine top-5 — the no-model text→vector bridge that lets the
    // whole ANN/vector-store tier run on a text corpus. Votes are
    // exact integers (md5-seamed hashes, the HashSeam convention), the
    // vectors replicate bit-for-bit in DuckDB, and the re-rank is the
    // proven rounded-cosine convention — so the hash pins bucketing,
    // sign arithmetic, zero-fill, the zero-vector drop, and the search.
    // Production uses xxhash64 (emb_hash below, rows-only, same
    // machinery through hashEmbedWith).
    q(
      "emb_hash_q",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS t
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(t), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v FROM h GROUP BY 1, 2
        |), e AS (
        |  SELECT d.doc_id, LIST(COALESCE(v.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT doc_id FROM tok) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN v ON v.doc_id = d.doc_id AND v.b = g.i
        |  GROUP BY 1
        |), ne AS (
        |  SELECT doc_id, emb FROM e
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT q.doc_id AS query_id, c.doc_id AS item_id,
        |    ROUND(list_cosine_similarity(q.emb::DOUBLE[], c.emb::DOUBLE[]), 4) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.doc_id
        |      ORDER BY ROUND(list_cosine_similarity(q.emb::DOUBLE[], c.emb::DOUBLE[]), 4) DESC, c.doc_id) AS rank
        |  FROM ne q JOIN ne c ON c.doc_id <> q.doc_id
        |  WHERE q.doc_id % 50 = 0
        |) WHERE rank <= 5""".stripMargin
    ) { (s, dir) =>
      import graft.ops.SimilarityOps
      val emb = SimilarityOps.hashEmbedMd5(tDocs(s, dir), dim = 16)
      SimilarityOps.bruteForceTopK(
        emb.filter(col("doc_id") % 50 === 0), emb, k = 5, idCol = "doc_id")
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // HYBRID retrieval (sparse + dense) under the oracle — the modern
    // RAG search shape, fusing the two tiers this engine already
    // gate-proves: each query is an 8-token snippet of a corpus doc
    // (the short-query reality — a whole-document query would drag
    // every hot term's full posting list through the contribution
    // join), scored by BM25 through searchBm25Batch's ONE shared scan
    // AND by cosine of the snippet's md5 hash-embedding, fused by
    // FIXED-POINT Reciprocal Rank Fusion (round(1e9/(60+rank)) longs —
    // exact integer sums, so the fusion is bit-replicable;
    // RetrievalOps). DuckDB recomputes both rank lists from the raw
    // corpus and fuses identically — equal hashes pin both retrievers'
    // ranks AND the fusion arithmetic end-to-end.
    q(
      "hybrid_rrf",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), snip AS (
        |  SELECT doc_id AS query_id, UNNEST(
        |    (list_filter(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
        |                 x -> x <> ''))[1:8]) AS term
        |  FROM documents WHERE doc_id % 50 = 0
        |), qt AS (
        |  SELECT DISTINCT query_id, term FROM snip
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM qt
        |  JOIN tf USING (term) JOIN dfq ON dfq.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |), bmr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY ROUND(SUM(c), 4) DESC, doc_id) AS rank
        |    FROM sc GROUP BY 1, 2
        |  ) WHERE rank <= 10
        |), h AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(term), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v FROM h GROUP BY 1, 2
        |), e AS (
        |  SELECT d.doc_id, LIST(COALESCE(v.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT doc_id FROM tok) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN v ON v.doc_id = d.doc_id AND v.b = g.i
        |  GROUP BY 1
        |), ne AS (
        |  SELECT doc_id, emb FROM e
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |), qh AS (
        |  SELECT query_id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(term), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM snip
        |), qv AS (
        |  SELECT query_id, b, CAST(SUM(s) AS BIGINT) AS v FROM qh GROUP BY 1, 2
        |), qe AS (
        |  SELECT d.query_id, LIST(COALESCE(qv.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT query_id FROM snip) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN qv ON qv.query_id = d.query_id AND qv.b = g.i
        |  GROUP BY 1
        |), qne AS (
        |  SELECT query_id, emb FROM qe
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |), dnr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT q.query_id, c.doc_id AS doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY ROUND(list_cosine_similarity(q.emb::DOUBLE[], c.emb::DOUBLE[]), 4) DESC,
        |        c.doc_id) AS rank
        |    FROM qne q JOIN ne c ON c.doc_id <> q.query_id
        |  ) WHERE rank <= 10
        |), pts AS (
        |  SELECT query_id, doc_id,
        |    CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) AS p FROM bmr
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) FROM dnr
        |), fused AS (
        |  SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS rrf_pts,
        |    CAST(COUNT(*) AS BIGINT) AS n_lists
        |  FROM pts GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, rank, rrf_pts, n_lists FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_pts DESC, doc_id) AS rank
        |  FROM fused
        |) WHERE rank <= 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.{DedupOps, InvertedIndexOps, RetrievalOps, SimilarityOps}
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-hybrid")
      InvertedIndexOps.writeScoredIndex(docs, s, "graft_hybrid_idx", base)
      // queries = 8-token snippets of every 50th doc (short-query shape)
      val snips = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id"),
          slice(DedupOps.tokens(col("text")), 1, 8).as("t8"))
      val bm = InvertedIndexOps.searchBm25Batch(
        snips.select(col("doc_id").as("query_id"), col("t8").as("terms")),
        s, "graft_hybrid_idx", topK = 10)
        .select("query_id", "doc_id", "rank")
      val emb = SimilarityOps.hashEmbedMd5(docs, dim = 16)
      val qemb = SimilarityOps.hashEmbedMd5(
        snips.select(col("doc_id"), array_join(col("t8"), " ").as("text")),
        dim = 16)
      val dense = SimilarityOps.bruteForceTopK(qemb, emb, k = 10,
        idCol = "doc_id")
        .select(col("query_id"), col("item_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      RetrievalOps.rrfFuse(Seq(bm, dense), topK = 10)
        .orderBy("query_id", "rank")
    },

    // THREE-list hybrid retrieval: BM25 + dense cosine + PROXIMITY
    // phrase (each query's first 3 snippet tokens, ordered within a
    // 6-token span) fused by the same fixed-point RRF — the full
    // modern retrieval stack (lexical, semantic, positional) in one
    // bit-replicable fusion, served off ONE unified index build (the
    // r15 layout: BM25 reads its tf/dlen columns, proximity explodes
    // the same rows' positions — one ingest, one ledger, one sidecar
    // where r14 built two whole stores). DuckDB recomputes ALL THREE
    // rank lists from the raw corpus and fuses identically.
    q(
      "hybrid_rrf3",
      """WITH raw AS (
        |  SELECT doc_id, list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '') AS ts
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, UNNEST(ts) AS term FROM raw
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY 1
        |), st AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS n,
        |         (SELECT COALESCE(SUM(dlen), 0) FROM dl) AS sd
        |), sn AS (
        |  SELECT doc_id, ts[1:8] AS t8, ts[1] AS t0, ts[2] AS t1,
        |         ts[3] AS t2
        |  FROM raw WHERE doc_id % 100 = 0 AND len(ts) >= 3
        |), snip AS (
        |  SELECT doc_id AS query_id, UNNEST(t8) AS term FROM sn
        |), qt AS (
        |  SELECT DISTINCT query_id, term FROM snip
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ROUND(LN(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((tf.tf * (1.2 + 1)) /
        |       (tf.tf + 1.2 * (0.25 + (0.75 * dl.dlen) /
        |         (CAST(st.sd AS DOUBLE) / CAST(st.n AS DOUBLE))))), 6) AS c
        |  FROM qt
        |  JOIN tf USING (term) JOIN dfq ON dfq.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |), bmr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY ROUND(SUM(c), 4) DESC, doc_id) AS rank
        |    FROM sc GROUP BY 1, 2
        |  ) WHERE rank <= 10
        |), h AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(term), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v FROM h GROUP BY 1, 2
        |), e AS (
        |  SELECT d.doc_id, LIST(COALESCE(v.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT doc_id FROM tok) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN v ON v.doc_id = d.doc_id AND v.b = g.i
        |  GROUP BY 1
        |), ne AS (
        |  SELECT doc_id, emb FROM e
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |), qh AS (
        |  SELECT query_id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(term), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM snip
        |), qv AS (
        |  SELECT query_id, b, CAST(SUM(s) AS BIGINT) AS v FROM qh GROUP BY 1, 2
        |), qe AS (
        |  SELECT d.query_id, LIST(COALESCE(qv.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT query_id FROM snip) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN qv ON qv.query_id = d.query_id AND qv.b = g.i
        |  GROUP BY 1
        |), qne AS (
        |  SELECT query_id, emb FROM qe
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |), dnr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT q.query_id, c.doc_id AS doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY ROUND(list_cosine_similarity(q.emb::DOUBLE[], c.emb::DOUBLE[]), 4) DESC,
        |        c.doc_id) AS rank
        |    FROM qne q JOIN ne c ON c.doc_id <> q.query_id
        |  ) WHERE rank <= 10
        |), ptok AS (
        |  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
        |         ts[CAST(i + 1 AS INT)] AS t
        |  FROM raw, UNNEST(range(len(ts))) AS u(i)
        |), pm AS (
        |  SELECT q.doc_id AS query_id, p0.doc_id, p0.pos AS a
        |  FROM sn q
        |  JOIN ptok p0 ON p0.t = q.t0
        |  JOIN ptok p1 ON p1.doc_id = p0.doc_id AND p1.t = q.t1
        |    AND p1.pos > p0.pos AND p1.pos <= p0.pos + 6
        |  JOIN ptok p2 ON p2.doc_id = p0.doc_id AND p2.t = q.t2
        |    AND p2.pos > p1.pos AND p2.pos <= p0.pos + 6
        |  GROUP BY 1, 2, 3
        |), pnm AS (
        |  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS nm
        |  FROM pm GROUP BY 1, 2
        |), phr AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY nm DESC, doc_id) AS rank
        |    FROM pnm
        |  ) WHERE rank <= 10
        |), pts AS (
        |  SELECT query_id, doc_id,
        |    CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) AS p FROM bmr
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) FROM dnr
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) FROM phr
        |), fused AS (
        |  SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS rrf_pts,
        |    CAST(COUNT(*) AS BIGINT) AS n_lists
        |  FROM pts GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, rank, rrf_pts, n_lists FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_pts DESC, doc_id) AS rank
        |  FROM fused
        |) WHERE rank <= 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.{DedupOps, InvertedIndexOps, RetrievalOps, SimilarityOps}
      val docs = tDocs(s, dir)
      val base = scratchDir("graft-hybrid3")
      InvertedIndexOps.writeScoredIndex(docs, s, "graft_h3_idx", base)
      val snips = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id"),
          slice(DedupOps.tokens(col("text")), 1, 8).as("t8"))
        .filter(size(col("t8")) >= 3)
      // the two eager retrievers are independent read-only searches of
      // the just-built index — run them concurrently so one search's
      // driver-side orchestration (term probes, bounded checkpoints)
      // overlaps the other's job tails (results are localCheckpointed
      // bounded frames either way; the fusion below is unchanged)
      var bm: org.apache.spark.sql.DataFrame = null
      var ph: org.apache.spark.sql.DataFrame = null
      graft.util.Par.run(
        () => bm = InvertedIndexOps.searchBm25Batch(
          snips.select(col("doc_id").as("query_id"), col("t8").as("terms")),
          s, "graft_h3_idx", topK = 10)
          .select("query_id", "doc_id", "rank"),
        () => ph = InvertedIndexOps.searchPhraseWindowBatch(
          snips.select(col("doc_id").as("query_id"),
            slice(col("t8"), 1, 3).as("terms")),
          s, "graft_h3_idx", topK = 10, maxSpan = 6)
          .select("query_id", "doc_id", "rank"))
      val emb = SimilarityOps.hashEmbedMd5(docs, dim = 16)
      val qemb = SimilarityOps.hashEmbedMd5(
        snips.select(col("doc_id"), array_join(col("t8"), " ").as("text")),
        dim = 16)
      val dense = SimilarityOps.bruteForceTopK(qemb, emb, k = 10,
        idCol = "doc_id")
        .select(col("query_id"), col("item_id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      RetrievalOps.rrfFuse(Seq(bm, dense, ph), topK = 10)
        .orderBy("query_id", "rank")
    },

    // WEIGHTED RRF under the oracle — the hybrid tuning knob (a
    // lexical-heavy stack weighs BM25 2x, etc.). Weights become exact
    // ppm integers multiplied into the fixed-point contributions, so
    // the weighted fusion stays bit-replicable. The two rank lists are
    // cheap deterministic windows (length-ranked and id-ranked docs per
    // language, capped at 20 — retriever outputs are top-k-bounded by
    // contract), isolating the WEIGHTED-FUSION arithmetic from any
    // corpus structure; DuckDB recomputes lists, weights and fusion.
    q(
      "rrf_weighted",
      """WITH l1 AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT lang AS query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id) AS rank
        |    FROM documents
        |  ) WHERE rank <= 20
        |), l2 AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT lang AS query_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rank
        |    FROM documents
        |  ) WHERE rank <= 20
        |), pts AS (
        |  SELECT query_id, doc_id,
        |    2000000 * CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) AS p FROM l1
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    500000 * CAST(ROUND(1e9 / (60 + rank)) AS BIGINT) FROM l2
        |), fused AS (
        |  SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS rrf_pts,
        |    CAST(COUNT(*) AS BIGINT) AS n_lists
        |  FROM pts GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, rank, rrf_pts, n_lists FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_pts DESC, doc_id) AS rank
        |  FROM fused
        |) WHERE rank <= 10""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.ops.RetrievalOps
      val docs = tDocs(s, dir)
      val l1 = docs.select(col("lang").as("query_id"), col("doc_id"),
          row_number().over(
            Window.partitionBy("lang")
              .orderBy(desc("n_chars"), col("doc_id"))).cast("long").as("rank"))
        .filter(col("rank") <= 20)
      val l2 = docs.select(col("lang").as("query_id"), col("doc_id"),
          row_number().over(
            Window.partitionBy("lang").orderBy("doc_id"))
            .cast("long").as("rank"))
        .filter(col("rank") <= 20)
      RetrievalOps.rrfFuseWeighted(Seq((l1, 2.0), (l2, 0.5)), topK = 10)
        .orderBy("query_id", "rank")
    },

    // The production hasher (xxhash64 buckets/signs — rows-only: no
    // DuckDB xxhash64; machinery oracle-gated by emb_hash_q above).
    Q("emb_hash", (s, dir) => {
      import graft.ops.SimilarityOps
      val emb = SimilarityOps.hashEmbed(tDocs(s, dir), dim = 64)
      SimilarityOps.bruteForceTopK(
        emb.filter(col("doc_id") % 50 === 0), emb, k = 5, idCol = "doc_id")
        .orderBy("query_id", "rank")
    }, None),

    // The cross-tier capstone: RAW TEXT through the persisted IVF
    // vector store — hash-embed the corpus, write a real store (seed
    // centroids, the ann_inc_q conventions), probe-pruned search.
    // DuckDB composes the two proven pieces (emb_hash_q's exact-integer
    // embeddings, ann_inc_q's declarative assignment/probe/re-rank);
    // equal hashes prove a text corpus can ride the entire vector tier
    // with no external embedder and no accuracy mystery at any seam.
    q(
      "emb_hash_store_q",
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), x -> x <> '')) AS t
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        |    CASE WHEN CAST(concat('0x', substr(md5(t), 9, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v FROM h GROUP BY 1, 2
        |), e AS (
        |  SELECT d.doc_id, LIST(COALESCE(v.v, 0) ORDER BY g.i) AS emb
        |  FROM (SELECT DISTINCT doc_id FROM tok) d
        |  CROSS JOIN GENERATE_SERIES(0, 15) AS g(i)
        |  LEFT JOIN v ON v.doc_id = d.doc_id AND v.b = g.i
        |  GROUP BY 1
        |), ne AS (
        |  SELECT doc_id, emb FROM e
        |  WHERE list_sum(list_transform(emb, x -> x * x)) > 0
        |), cseeds AS (
        |  SELECT doc_id AS cid, emb AS cvec FROM ne ORDER BY doc_id LIMIT 8
        |), scored AS (
        |  SELECT ne.doc_id, s.cid,
        |    ROW_NUMBER() OVER (PARTITION BY ne.doc_id ORDER BY
        |      ROUND(list_cosine_similarity(ne.emb::DOUBLE[], s.cvec::DOUBLE[]), 6) DESC,
        |      s.cid) AS rk
        |  FROM ne CROSS JOIN cseeds s
        |), asg AS (
        |  SELECT doc_id AS item_id, cid FROM scored WHERE rk = 1
        |), probes AS (
        |  SELECT doc_id AS query_id, cid FROM scored
        |  WHERE doc_id % 50 = 0 AND rk <= 4
        |), cand AS (
        |  SELECT p.query_id, a.item_id FROM probes p JOIN asg a ON a.cid = p.cid
        |  WHERE a.item_id <> p.query_id
        |)
        |SELECT query_id, item_id, rank, cos FROM (
        |  SELECT c.query_id, c.item_id,
        |    ROUND(list_cosine_similarity(q.emb::DOUBLE[], i.emb::DOUBLE[]), 4) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
        |      ROUND(list_cosine_similarity(q.emb::DOUBLE[], i.emb::DOUBLE[]), 4) DESC,
        |      c.item_id) AS rank
        |  FROM cand c JOIN ne q ON q.doc_id = c.query_id
        |              JOIN ne i ON i.doc_id = c.item_id
        |) WHERE rank <= 5""".stripMargin
    ) { (s, dir) =>
      import graft.ops.{SimilarityOps, VectorStoreOps}
      val emb = SimilarityOps.hashEmbedMd5(tDocs(s, dir), dim = 16)
        .localCheckpoint(true) // one derivation feeds store build + queries
      val base = scratchDir("graft-vstore-hash")
      val cents = emb.orderBy("doc_id").limit(8)
        .select(col("doc_id").as("cid"),
          col("embedding").cast("array<double>").as("cvec"))
      VectorStoreOps.writeVectorStore(emb, s, base, cents,
        idCol = "doc_id", assignRound = Some(6))
      VectorStoreOps.searchStore(
        emb.filter(col("doc_id") % 50 === 0), s, base, k = 5, nprobe = 4,
        idCol = "doc_id", probeRound = Some(6))
        .orderBy("query_id", "rank")
    }
  )
}
