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
    // Exact dedup: group identical texts, keep min doc_id as the survivor.
    q(
      "dedup_exact",
      """SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .select("keeper", "n_copies")
    },

    // Language-ID histogram (the ground-truth label column; the heuristic
    // n-gram classifier is verified separately against this).
    q(
      "lang_hist",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    },

    // Token counting + char length per document (whitespace tokenizer).
    q(
      "text_tokens",
      """SELECT doc_id, LENGTH(text) AS len_chars,
        |  LEN(STRING_SPLIT(text, ' ')) AS n_tokens
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        size(split(col("text"), " ", -1)).as("n_tokens"))
    }
  )
}
