package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality / language / tokenization analysis for training-data
  * pipelines, all as codegen'd native expressions over the `documents`
  * schema (doc_id, text, lang, source, n_chars).
  */
object TextAnalysisOps {

  /** Tiny deterministic stopword profiles for the n-gram/stopword
    * language-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "en", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不", "我", "这", "他")
  )
  val Langs: Seq[String] = Stopwords.keys.toSeq.sorted // deterministic order

  private def toks(text: Column): Column = DedupOps.tokens(text)

  /** Codegen'd stopword-hit count over a token array (one hash-probe loop
    * per row — the HOF form `size(filter(...))` is CodegenFallback,
    * interpreted per row per profile; see
    * [[graft.expressions.StopwordHits]]). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.StopwordHits(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), words))

  /** Stopword-hit count for one language over an already-staged token
    * array column (counts occurrences, not types). The input MUST be a
    * plain attribute when scored for several languages: Catalyst inlines
    * single-use aliases, so an expression tree would re-tokenize per
    * language (the round-1 `lang_id` 16 s offender). */
  def langScoreFromToks(toks: Column, lang: String): Column =
    stopwordHits(toks, Stopwords(lang))

  /** Single-language convenience form (inline tokenization is fine when
    * the tree is evaluated once). */
  def langScore(text: Column, lang: String): Column =
    langScoreFromToks(toks(text), lang)

  /** Predicted language = argmax over profiles of a STAGED token column;
    * ties break to the alphabetically-first language (deterministic,
    * oracle-matchable). */
  def langIdFromToks(toks: Column): Column = {
    // greatest over (score, reverse-alpha marker, lang) structs picks max
    // score; on ties the struct comparison prefers the LAST language
    // alphabetically, so negate: compare on (score, negIdx).
    val structs = Langs.zipWithIndex.map { case (l, i) =>
      struct(langScoreFromToks(toks, l).as("s"), lit(-i).as("negIdx"),
        lit(l).as("lang"))
    }
    greatest(structs: _*).getField("lang")
  }

  /** Small-input/test convenience: tokenizes inline — 5× per row. Stage
    * tokens and use [[langIdFromToks]] on real data. */
  def langId(text: Column): Column = langIdFromToks(toks(text))

  /** Per-document quality metrics + a composite score in [0,1]:
    * length band, punctuation density, digit density, mean token length,
    * stopword(en) ratio — the classic heuristics
    * (Gopher/C4-style rules re-expressed as columns). */
  def qualityMetrics(text: Column): Seq[(String, Column)] =
    qualityMetricsFromToks(text, toks(text))

  /** Same metrics over a STAGED token column (the token array is referenced
    * by three metrics; an inline tree would tokenize 3× per row). */
  def qualityMetricsFromToks(text: Column, t: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTok = size(t)
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]+", ""))
    val digits = length(regexp_replace(text, "[^0-9]+", ""))
    // sum of token lengths == length of the separator-less concatenation —
    // ConcatWs is codegen'd where the `aggregate(...)` HOF fold is
    // interpreted per row
    val meanTokLen = when(nTok > 0,
      length(concat_ws("", t)).cast("double") / nTok)
      .otherwise(0.0)
    val swRatio = when(nTok > 0,
      stopwordHits(t, Stopwords("en")).cast("double") / nTok)
      .otherwise(0.0)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "punct_ratio" -> round(punct.cast("double") / greatest(nChars, lit(1)), 6),
      "digit_ratio" -> round(digits.cast("double") / greatest(nChars, lit(1)), 6),
      "mean_tok_len" -> round(meanTokLen, 6),
      "stopword_ratio" -> round(swRatio, 6)
    )
  }

  /** Composite quality score: fraction of passed heuristic gates. */
  def qualityScore(text: Column): Column =
    qualityScoreFromToks(text, toks(text))

  def qualityScoreFromToks(text: Column, t: Column): Column = {
    val m = qualityMetricsFromToks(text, t).toMap
    val gates = Seq(
      m("n_tokens").between(10, 100000),
      m("mean_tok_len").between(2.0, 12.0),
      m("punct_ratio") < 0.3,
      m("digit_ratio") < 0.3,
      m("stopword_ratio") > 0.0)
    gates.map(g => when(g, 1.0).otherwise(0.0)).reduce(_ + _) / gates.size
  }

  /** BPE-ish subword-boundary token count: alpha runs, digit runs, and
    * single non-alnum marks — the standard pre-tokenizer split. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** 64-bit content fingerprint of the whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace-collapsed lower-cased text (stage as its own column before
    * feeding [[minGramFromNorm]] — it is referenced per k-gram). */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Winnowing-style robust fingerprint: min xxhash64 over character
    * k-grams — a single codegen'd pass (see
    * [[graft.expressions.MinGramHash]]; the interpreted HOF form below is
    * its differential reference). */
  def minGramFromNorm(norm: Column, k: Int = 8): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinGramHash(
        org.apache.spark.sql.GraftColumnBridge.expression(norm), k))

  /** Interpreted HOF reference formulation (spec differential only). */
  def minGramFromNormHof(norm: Column, k: Int = 8): Column =
    when(length(norm) >= k,
      array_min(transform(sequence(lit(1), length(norm) - (k - 1)),
        i => xxhash64(norm.substr(i, lit(k))))))
      .otherwise(xxhash64(norm))

  /** md5 twin of [[minGramFromNorm]] — the oracle-shared fingerprint
    * (lexicographic min of the k-gram md5 hex digests), one codegen'd
    * pass (see [[graft.expressions.MinGramMd5]]). */
  def minGramMd5FromNorm(norm: Column, k: Int = 8): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinGramMd5(
        org.apache.spark.sql.GraftColumnBridge.expression(norm), k))

  /** Interpreted HOF reference formulation (spec differential only). */
  def minGramMd5FromNormHof(norm: Column, k: Int = 8): Column =
    when(length(norm) >= k,
      array_min(transform(sequence(lit(1), length(norm) - (k - 1)),
        i => md5(norm.substr(i, lit(k))))))
      .otherwise(md5(norm))

  /** Convenience single-expression form for small inputs/tests. */
  def minGramFingerprint(text: Column, k: Int = 8): Column =
    minGramFromNorm(normalized(text), k)

  /** Train/test decontamination sweep: documents sharing ≥ `minShared`
    * distinct `w`-token n-grams with any test-set document are flagged as
    * (train_doc, test_doc, n_shared) pairs — the standard benchmark-
    * contamination check run before training (real pipelines use w of
    * 8-13; the registered query uses 3 on the synthetic corpus).
    *
    * Scale shape: grams are xxhash64'd (8-byte join keys, no string
    * shuffles), de-duplicated per document BEFORE the join (bounds rows at
    * docs × distinct-grams), and the join is an equi-join on the hash.
    * No broadcast hint by default: the test side is whatever `isTest`
    * selects — often a fixed fraction of the corpus, which grows with the
    * data — so pinning it to every executor's heap is an OOM at scale.
    * Catalyst's size stats + AQE broadcast it automatically when it is
    * genuinely benchmark-suite-sized; pass `broadcastTest = true` only
    * when the caller KNOWS the test side is small and the optimizer can't
    * see it (e.g. behind a non-reporting source). Docs shorter than `w`
    * tokens can't carry a full n-gram and are skipped. */
  def contamination(docs: DataFrame, isTest: Column, w: Int = 8,
                    minShared: Long = 3,
                    broadcastTest: Boolean = false,
                    bloomGateBits: Option[Long] = None): DataFrame = {
    val staged = docs
      .withColumn("__t", DedupOps.tokens(col("text")))
      .filter(size(col("__t")) >= w)
      .withColumn("__is_test", isTest)
    // distinct gram hashes in one codegen'd pass (WordGramHashes) — the
    // interpreted shingle-string HOF chain only ever fed xxhash64 anyway
    val grams = staged.select(col("doc_id"), col("__is_test"),
      explode(DedupOps.gramHashes(col("__t"), w)).as("__h"))
    val test = grams.filter(col("__is_test"))
      .select(col("doc_id").as("test_doc"), col("__h"))
    val train0 = grams.filter(!col("__is_test"))
      .select(col("doc_id").as("train_doc"), col("__h"))
    // Optional bloom gate (the runtime-filter pattern, RuntimeFilterOps):
    // at 100 TB the train side is the whole corpus's gram stream and the
    // test side a fixed benchmark suite — almost no train gram joins. One
    // fixed-size sketch of the test hashes kills non-matching train grams
    // BEFORE the join's exchange; false positives just ride into the
    // exact join, so the result (and the oracle) is unchanged.
    val train = bloomGateBits.fold(train0) { bits =>
      RuntimeFilterOps.bloomPrune(train0, "__h", test, "__h",
        expectedItems = bits / 8, numBits = bits)
    }
    train.join(if (broadcastTest) broadcast(test) else test, Seq("__h"))
      .groupBy("train_doc", "test_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Span-level (sub-document) dedup: drop every fixed-width chunk whose
    * exact text occurs more than once ANYWHERE in the corpus, and stitch
    * each document back together from its surviving chunks. This is the
    * boilerplate/banner strip pass — whole-document dedup never catches a
    * shared header pasted into a million otherwise-distinct pages; span
    * granularity does, without discarding the distinct remainder.
    *
    * Shape: one chunk explode (×len/chunkChars), a count-over-window on
    * the chunk value for df (one shuffle; reuses the tf-idf lesson — a
    * groupBy+join-back would shuffle the same bytes twice), then one
    * per-doc reassembly. Chunk keys here are the strings themselves so
    * the DuckDB twin can replicate exactly; at corpus scale the window
    * key would be `xxhash64(chunk)` (8-byte shuffle keys) with the same
    * plan, and a viral chunk's hot partition is count-only state — no
    * list accumulates on it. Docs whose every chunk is boilerplate drop
    * out entirely (nothing left to keep).
    */
  def dropDuplicatedSpans(docs: DataFrame, chunkChars: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = docs
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          expr(s"(length(text) - 1) div $chunkChars"))).as("__i"),
        col("text"))
      .select(col("doc_id"), col("__i"),
        expr(s"substring(text, cast(__i * $chunkChars + 1 as int), $chunkChars)")
          .as("__chunk"))
    chunks
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("__chunk")))
      .filter(col("__df") === 1)
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__i"), col("__chunk")))), // bounded: ≤ ceil(len/chunkChars) chunks per doc — explode of the doc's own grid
            s => s.getField("__chunk")), "").as("cleaned"),
        count(lit(1)).as("n_kept"))
  }

  /** RAG/context-window chunking: fixed token windows of `chunkTokens`
    * advancing by `strideTokens` (overlap = chunk − stride). Pure
    * per-row projection + a bounded explode (≤ ⌈len/stride⌉ chunks per
    * doc) — no shuffle at all; at 100 TB this is a map-only pass.
    * Chunk count = 1 for docs at or under the window, else
    * ⌈(n − chunk)/stride⌉ + 1 (every token covered, last chunk may be
    * short — `n_chunk_tokens` carries its true length). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, strideTokens: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(strideTokens > 0 && chunkTokens >= strideTokens,
      "need 0 < strideTokens <= chunkTokens")
    // empty-safe: split("") yields [""], which would count as one phantom
    // token and emit a 1-token chunk for empty/whitespace-only docs
    val toksC = array_remove(split(trim(col(textCol)), "\\s+"), "")
    docs
      .select(col(idCol), toksC.as("__t"), size(toksC).as("__n"))
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, lit(1)).otherwise(
          ceil((col("__n") - chunkTokens).cast("double") / strideTokens)
            .cast("int") + 1))
      .select(col(idCol), col("__t"), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("__i"))
      .select(
        col(idCol),
        col("__i").cast("long").as("chunk_id"),
        least(lit(chunkTokens), col("__n") - col("__i") * strideTokens)
          .cast("long").as("n_chunk_tokens"),
        array_join(
          slice(col("__t"), col("__i") * strideTokens + 1, lit(chunkTokens)),
          " ").as("chunk"))
  }
}
