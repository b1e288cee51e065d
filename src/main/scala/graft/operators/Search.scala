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
    *
    * One tokenize scan total: document length and the per-query-term
    * frequencies come out of a SINGLE conditional aggregation (|terms| is
    * query-sized, so the extra agg columns are a handful), and the global
    * stats (N, avgdl, per-term df) reduce from that per-doc table, not
    * from another pass over the corpus.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val qTerms = queryTerms.distinct
    val toks = docs.select(col(idCol).as("id"),
      explode(filter(split(trim(col(textCol)), " "), t => length(t) > 0)).as("term"))
    val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
      count(when(col("term") === t, 1)).as(s"tf_$i")
    }
    val perDoc = toks.groupBy(col("id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      qTerms.indices.map(i =>
        count(when(col(s"tf_$i") > 0, 1)).cast("long").as(s"df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val withStats = perDoc.crossJoin(broadcast(stats))
    val w = qTerms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0))
      idf * (tf * (lit(k1) + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    val allMatch = qTerms.indices.map(i => col(s"tf_$i") > 0).reduce(_ && _)
    withStats
      .filter(allMatch) // SearchMode.ALL
      .select(col("id"), round(w, 4).as("bm25"))
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)
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

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) — the diversification pass a RAG retriever runs between
    * top-N retrieval and the context window: greedily select k
    * candidates maximizing λ·sim(q,d) − (1−λ)·max_{s∈selected} cos(d,s),
    * so near-duplicate passages don't crowd out coverage.
    *
    * Scale shape: `candidates` is the OUTPUT of a bounded top-N
    * retrieval per query — (queryId, id, vec, sim) rows, ≤ maxCandidates
    * per query — so the inherently sequential greedy runs inside one
    * executor task per query via groupByKey/mapGroups, and the operator
    * distributes ACROSS queries (the batch-retrieval axis a serving
    * pipeline actually scales on). Deterministic: ties break on id; the
    * per-group candidate cap keeps by (sim desc, id). Emits
    * (query_id, rank, id, mmr_score@4dp), rank 0-based in selection
    * order; the first pick's penalty term is zero by convention.
    */
  def mmrRerank(candidates: DataFrame, queryCol: String, idCol: String,
      vecCol: String, simCol: String, k: Int, lambda: Double,
      maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0 && maxCandidates >= 1)
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("query_id", LongType), StructField("rank", IntegerType),
      StructField("id", LongType), StructField("mmr_score", DoubleType)))
    val norm = candidates
      .filter(col(vecCol).isNotNull && col(simCol).isNotNull) // null rows can't rank
      .select(
        col(queryCol).cast("long").as("q"), col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"), col(simCol).cast("double").as("sim"))
    norm.groupByKey(r => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (q: Long, rows: Iterator[Row]) =>
        val cand = rows.map(r => (r.getLong(1),
            r.getSeq[Float](2).toArray, r.getDouble(3)))
          .toArray.sortBy { case (id, _, sim) => (-sim, id) }
          .take(maxCandidates)
        val n = cand.length
        val picked = new Array[Boolean](n)
        // running max cos to the selected set, updated per pick — the
        // greedy is O(k·n) dot products, bounded by maxCandidates
        val maxSel = new Array[Double](n)
        val out = Seq.newBuilder[Row]
        var rank = 0
        while (rank < math.min(k, n)) {
          var best = -1
          var bestScore = Double.MinValue
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val s = lambda * cand(i)._3 -
                (if (rank == 0) 0.0 else (1 - lambda) * maxSel(i))
              if (s > bestScore + 1e-15 ||
                  (math.abs(s - bestScore) <= 1e-15 && best >= 0 && cand(i)._1 < cand(best)._1)) {
                bestScore = s; best = i
              }
            }
            i += 1
          }
          picked(best) = true
          out += Row(q, rank, cand(best)._1,
            math.rint(bestScore * 10000) / 10000)
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val c = Dedup.cosine(cand(j)._2, cand(best)._2)
              if (c > maxSel(j)) maxSel(j) = c
            }
            j += 1
          }
          rank += 1
        }
        out.result()
      }(Encoders.row(outSchema))
  }
}
