package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the CCNet/Gopher-style
  * "perplexity filter" stage of a training-data pipeline: train an
  * n-gram LM on a trusted slice (e.g. one curated source or language),
  * score every document's cross-entropy under it, and keep the docs the
  * model finds natural. At 100 TB this is the standard cheap proxy for
  * "looks like quality text" that runs before any neural scorer.
  *
  * Spark-first shape, chosen for the scale posture:
  *  - Bigrams are built INSIDE the row from the token array
  *    (`transform` over an index sequence — codegen'd, zero shuffle),
  *    never via a per-token window: a window would shuffle every token
  *    of the corpus on `doc_id` just to apply LEAD.
  *  - Documents pre-aggregate to DISTINCT (doc, bigram) rows with
  *    multiplicities before touching the model (map-side combinable;
  *    natural-language repetition makes this a real reduction), so the
  *    model join moves one row per distinct bigram per doc, not one per
  *    token.
  *  - The model is two count tables keyed by bigram/unigram — Zipf
  *    keeps them vocabulary-sized, so AQE typically broadcasts them;
  *    nothing requires it.
  *
  * Smoothing is add-one over the training vocabulary:
  * `P(w2|w1) = (c2 + 1) / (c1 + V)` with `c2` the bigram count, `c1`
  * the count of `w1` as a bigram HISTORY (so `c1 = Σ_w2 c2`, an exact
  * identity the spec pins) and `V` the distinct training token count.
  * Unseen histories degrade to `1/V`. The per-doc INTEGER sufficient
  * statistics (`n_bigrams`, `n_oov`, `sum_c2`, `sum_c1`) are the
  * hash-exact oracle surface (`lm_train`/`lm_score`); the float
  * cross-entropy derived from them is differentially spec-tested
  * (LmSpec) like the other float paths (ANN recall, quantization).
  */
object LmOps {

  /** Trained model: bigram counts, history counts, training vocab size. */
  final case class LmModel(bigrams: DataFrame, unigrams: DataFrame, vocab: Long)

  /** Lower-cased alpha tokens — the repo-wide tokenization convention
    * (same regex the BPE and token-count oracles use). */
  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("__ws",
      expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))

  /** One row per adjacent token pair, built in-row (no shuffle). */
  private[ops] def bigrams(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(expr(
        """transform(
          |  slice(sequence(0, size(__ws)), 1, greatest(size(__ws) - 1, 0)),
          |  i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))""".stripMargin))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))

  /** Train on `train` (already filtered to the trusted slice): two hash
    * aggregations and one distinct-count action. */
  def trainBigram(train: DataFrame): LmModel = {
    val bg = bigrams(train).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c2"))
    val ug = bg.groupBy("w1").agg(sum("c2").as("c1"))
    val v = withTokens(train)
      .select(explode(col("__ws")).as("w")).distinct().count()
    LmModel(bg, ug, v)
  }

  /** Per-document scores: one row per input doc (docs without bigrams
    * score zero counts and a null cross-entropy).
    *
    * Columns: `n_bigrams`, `n_oov` (bigrams unseen in training),
    * `sum_c2`, `sum_c1` (exact longs — the oracle surface), and the
    * float `avg_nll` (mean negative log-likelihood per bigram, add-one
    * smoothed) with `ppl = exp(avg_nll)`. */
  def scoreDocs(docs: DataFrame, model: LmModel): DataFrame = {
    // distinct (doc, bigram) with multiplicity before the join
    val perDoc = bigrams(docs).groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("k"))
    val joined = perDoc
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams, Seq("w1"), "left")
    val c2 = coalesce(col("c2"), lit(0L))
    val c1 = coalesce(col("c1"), lit(0L))
    val scored = joined.groupBy("doc_id").agg(
      sum(col("k")).as("n_bigrams"),
      sum(when(col("c2").isNull, col("k")).otherwise(lit(0L))).as("n_oov"),
      sum(col("k") * c2).as("sum_c2"),
      sum(col("k") * c1).as("sum_c1"),
      sum(col("k") * (log(c2 + lit(1.0)) - log(c1 + lit(model.vocab.toDouble))))
        .as("__ll"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sum_c2"), lit(0L)).as("sum_c2"),
        coalesce(col("sum_c1"), lit(0L)).as("sum_c1"),
        (-col("__ll") / col("n_bigrams")).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }

  /** Keep documents the model scores at or below `maxAvgNll` (docs with
    * no bigrams carry no evidence and are dropped — a quality gate
    * cannot vouch for what it cannot score). */
  def filterByNll(docs: DataFrame, model: LmModel,
                  maxAvgNll: Double): DataFrame =
    docs.join(
      scoreDocs(docs, model)
        .filter(col("avg_nll").isNotNull && col("avg_nll") <= maxAvgNll)
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
}
