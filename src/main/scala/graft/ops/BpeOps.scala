package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** REAL byte-pair-encoding training (Sennrich et al. 2016's algorithm —
  * the iterative pair-merge loop, not a regex approximation like the
  * `tok_bpe` token splitter) as a distributed Spark job.
  *
  * Scale posture: BPE trains on the WORD-FREQUENCY DICTIONARY, not the
  * corpus — a petabyte of text first aggregates to its vocabulary
  * (`groupBy(word).count`, map-side combinable), and every training
  * iteration then runs windows partitioned by `word` over the exploded
  * symbol table (|dictionary| × avg word length rows, corpus-size-free).
  * The per-iteration argmax collects exactly ONE row to the driver.
  *
  * Merge semantics (pinned by the `bpe_merges` oracle and BpeSpec):
  *  - pair frequencies count every ADJACENT OCCURRENCE weighted by word
  *    frequency (overlaps included: "aaa" contributes 2 to (a,a));
  *  - the best pair is (count desc, left asc, right asc) — a total
  *    order, so training is deterministic across engines;
  *  - replacement is greedy LEFT-TO-RIGHT NON-OVERLAPPING: in a run of
  *    k consecutive best-pair positions (only possible when left=right)
  *    positions 1,3,5,… of the run merge — expressed as gaps-and-islands
  *    over the position table, no sequential scan.
  *
  * Each round is 3 `word`-keyed window passes + one dictionary-sized
  * aggregate; lineage is cut per round (the symbol table is replaced,
  * so plans never stack across iterations).
  */
object BpeOps {

  /** `(word, freq)` dictionary: lowercased ASCII-letter runs, top
    * `topWords` by (freq desc, word) — the deterministic vocabulary
    * slice training runs on. */
  def wordDict(docs: DataFrame, topWords: Int,
               textCol: String = "text"): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(topWords)

  /** Explode the dictionary to `(word, freq, pos, sym)` — one row per
    * character occurrence, the state the merge loop rewrites. */
  def initialSymbols(dict: DataFrame): DataFrame =
    dict.select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("pos"))
      .withColumn("sym", expr("substring(word, pos + 1, 1)"))

  /** One learned merge: `(step, lsym, rsym, pair_freq, tokens_after)`.
    * `tokens_after` is the freq-weighted symbol count of the dictionary
    * after applying the merge — it folds the ENTIRE post-merge state
    * into the result, so an oracle hash-match on it proves the
    * replacement pass, not just the argmax. */
  final case class Merge(step: Int, lsym: String, rsym: String,
                         pairFreq: Long, tokensAfter: Long)

  /** Run `merges` training iterations over `syms`; returns the learned
    * merge table and the final symbol table. */
  def trainFromSymbols(syms0: DataFrame, merges: Int): (Seq[Merge], DataFrame) = {
    val byPos = Window.partitionBy("word").orderBy("pos")
    var syms = syms0.localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false // every word reduced to one symbol: nothing to merge
    while (step <= merges && !exhausted) {
      val pairs = syms.withColumn("b", lead("sym", 1).over(byPos))
      val bestOpt: Option[Row] = pairs.filter(col("b").isNotNull)
        .groupBy(col("sym").as("a"), col("b"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1).collect().headOption
      if (bestOpt.isEmpty) { exhausted = true }
      else {
      val best = bestOpt.get
      val (ba, bb, bf) = (best.getString(0), best.getString(1), best.getLong(2))
      val marked = pairs.withColumn("isp",
        col("sym") === lit(ba) && col("b") === lit(bb))
      // gaps-and-islands: consecutive best-pair positions form one
      // island; within it ranks 1,3,5,… are the greedy merge starts
      val island = marked.withColumn("island",
        when(col("isp"), col("pos") -
          row_number().over(Window.partitionBy("word", "isp").orderBy("pos"))))
      val started = island.withColumn("start",
        col("isp") &&
          row_number().over(Window.partitionBy("word", "island").orderBy("pos"))
            % 2 === 1)
      val next = started
        .withColumn("consumed",
          coalesce(lag("start", 1).over(byPos), lit(false)))
        .filter(!col("consumed"))
        .withColumn("sym",
          when(col("start"), concat(col("sym"), col("b")))
            .otherwise(col("sym")))
        .withColumn("pos", row_number().over(byPos) - 1)
        .select("word", "freq", "pos", "sym")
      // replace the state and cut: the old round's blocks are freed once
      // the new round is pinned (same discipline as pageRankFixedPoint)
      val prev = syms
      syms = next.localCheckpoint(true)
      prev.unpersist()
      val tokensAfter = syms.agg(sum("freq")).head().getLong(0)
      out += Merge(step, ba, bb, bf, tokensAfter)
      step += 1
      }
    }
    (out.result(), syms)
  }

  /** End-to-end: dictionary → `merges` learned merges as a DataFrame
    * `(step, lsym, rsym, pair_freq, tokens_after)`. */
  def train(docs: DataFrame, spark: SparkSession, topWords: Int,
            merges: Int, textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val (learned, syms) = trainFromSymbols(
      initialSymbols(wordDict(docs, topWords, textCol)), merges)
    syms.unpersist()
    learned.map(m => (m.step, m.lsym, m.rsym, m.pairFreq, m.tokensAfter))
      .toDF("step", "lsym", "rsym", "pair_freq", "tokens_after")
  }

  /** Per-word subword counts after the merges already applied to a
    * trained symbol table: `(word, n_sub)` — the segmentation lookup the
    * corpus encode joins against. */
  def segmentCounts(trainedSyms: DataFrame): DataFrame =
    trainedSyms.groupBy("word").agg(count(lit(1)).as("n_sub"))

  /** Distributed corpus encode — how 100 TB gets tokenized with a
    * trained vocabulary: the iterative merge loop runs only over the
    * (bounded) word DICTIONARY; the corpus then BROADCAST-joins its
    * exploded words to the resulting `(word, n_sub)` segmentation, so
    * the corpus-sized pass is one map-side join + aggregate, no windows
    * and no per-row merge loop. Words outside the trained dictionary
    * are dropped (inner join) — the caller's vocab-coverage contract,
    * measured separately by `tok_vocab`'s OOV rate. Returns
    * `(doc_id, bpe_tokens)`. */
  def encodeCorpus(docs: DataFrame, seg: DataFrame,
                   textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .join(broadcast(seg), "word")
      .groupBy("doc_id").agg(sum("n_sub").as("bpe_tokens"))

  /** Segment a word with a learned merge list (applied in order — the
    * standard BPE encode): returns the symbol sequence. Driver-side
    * single-word helper used by specs; the distributed encode is the
    * same loop over a symbol table. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var symsW = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val outW = Vector.newBuilder[String]
      var i = 0
      while (i < symsW.length) {
        if (i + 1 < symsW.length && symsW(i) == a && symsW(i + 1) == b) {
          outW += (a + b); i += 2
        } else { outW += symsW(i); i += 1 }
      }
      symsW = outW.result()
    }
    symsW
  }
}
