package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lexical retrieval + hybrid fusion (the Spark-first form of the
  * reference's full-text search surface, tools/aisearch.py:161-212:
  * `search_text` with SearchMode.ALL, filter, top).
  *
  * [[bm25TopK]] is Robertson/Spärck-Jones BM25 over whitespace terms with
  * AND semantics (every query term must appear — SearchMode.ALL); the
  * corpus side is one tokenize scan + one (doc, term) aggregation, the
  * query side is a |terms|-row broadcast, and the result is a bounded
  * top-k (TakeOrderedAndProject, no global sort). [[rrfFuse]] merges any
  * two rankings by reciprocal-rank fusion — the standard hybrid
  * (lexical + vector) combiner.
  */
object Search {

  /** BM25 top-k with AND semantics. Scores are rounded to 4 dp so an
    * independent engine reproduces them bit-for-bit.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val toks = docs.select(col(idCol).as("id"),
      explode(filter(split(trim(col(textCol)), " "), t => length(t) > 0)).as("term"))
    val lens = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qTerms = queryTerms.distinct
    val tf = toks.filter(col("term").isin(qTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), Seq("term"))
      .join(lens, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w", col("idf") * (col("tf") * (lit(k1) + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("w")), 4).as("bm25"),
        count(lit(1)).as("matched"))
      .filter(col("matched") === qTerms.size) // SearchMode.ALL
      .drop("matched")
    scored.orderBy(col("bm25").desc, col("id")).limit(k)
  }

  /** Reciprocal-rank fusion of two rankings (id, scoreA) and (id, scoreB):
    * rrf(id) = Σ 1/(c + rank_side(id)), missing side contributes 0.
    * Deterministic: ranks break ties by id. Inputs are the per-ranker
    * TOP-K candidate lists (≤ k rows each), so the unpartitioned ranking
    * windows below see bounded input — never hand this whole corpora.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, scoreACol: String,
      scoreBCol: String, k: Int, c: Int = 60): DataFrame = {
    def ranked(df: DataFrame, score: String, rankName: String) =
      df.withColumn(rankName,
        row_number().over(Window.orderBy(col(score).desc, col(idCol))))
        .select(col(idCol), col(rankName))
    val ra = ranked(a, scoreACol, "rank_a")
    val rb = ranked(b, scoreBCol, "rank_b")
    ra.join(rb, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        when(col("rank_a").isNotNull, lit(1.0) / (lit(c) + col("rank_a"))).otherwise(lit(0.0)) +
        when(col("rank_b").isNotNull, lit(1.0) / (lit(c) + col("rank_b"))).otherwise(lit(0.0)), 6))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
