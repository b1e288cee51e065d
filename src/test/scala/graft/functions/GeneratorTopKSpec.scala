package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.SplitParams
import graft.pipeline.Chunkers

/** The native chunk_document Generator must agree exactly with the
  * UDF+explode chunking path (same shared splitter), and the TopKByScore
  * aggregator must agree with the window-sort formulation it replaces.
  */
class GeneratorTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunk_document generator matches the UDF chunking path") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, ("alpha beta gamma delta " * 40).trim, "txt"),
      (2L, "# h1\n\n" + ("one two three. " * 30).trim + "\n\n## h2\n\n" +
        ("four five six. " * 30).trim, "md"),
      (3L, "", "txt"),
      (4L, "short", "txt")).toDF("doc_id", "text", "ext")
    docs.createOrReplaceTempView("gen_docs")

    val viaGenerator = spark.sql(
      """SELECT doc_id, c.chunk_id, c.content, c.n_tokens
        |FROM gen_docs LATERAL VIEW chunk_document(text, ext, 32, 4, 1) c
        |ORDER BY doc_id, chunk_id""".stripMargin).collect()

    val p = SplitParams(maxTokens = 32, overlapTokens = 4, minChunkTokens = 1)
    val viaUdf = docs.collect().toSeq.flatMap { r =>
      Chunkers.chunkText(r.getString(1), r.getString(2), p)
        .filter(c => p.tokenizer.count(c) >= 1)
        .zipWithIndex.map { case (c, i) => (r.getLong(0), i, c, p.tokenizer.count(c)) }
    }.sortBy(t => (t._1, t._2))

    assert(viaGenerator.length == viaUdf.length)
    viaGenerator.toSeq.zip(viaUdf).foreach { case (g, u) =>
      assert((g.getLong(0), g.getInt(1), g.getString(2), g.getInt(3)) == u)
    }
  }

  test("GraftExtensions builders construct the injected expressions") {
    // the injection callback must accept the extension point without error…
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // …and the same builders it registers must yield working expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val gen = ChunkDocument(Seq(Literal("a b c"), Literal("txt"),
      Literal(32), Literal(4), Literal(1)))
    assert(gen.elementSchema.fieldNames.toSeq == Seq("chunk_id", "content", "n_tokens"))
    assert(gen.eval(null).iterator.nonEmpty)
  }

  test("TopKByScore reduce/merge invariants hold on random inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = Gen.zip(Gen.choose(0L, 50L), Gen.choose(-100.0, 100.0))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAllNoShrink(Gen.listOf(rowGen), Gen.choose(1, 5)) { (rows, k) =>
        val agg = new TopKByScore(k)
        val naive = rows.sortBy { case (id, s) => (-s, id) }.take(k)
        // sequential reduce
        val reduced = rows.foldLeft(agg.zero)(agg.reduce)
        // arbitrary split + merge (partial aggregation path)
        val (l, r) = rows.splitAt(rows.length / 2)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        agg.finish(reduced) == naive && agg.finish(merged) == naive &&
          reduced.length <= k && merged.length <= k
      })
    assert(res.passed, res.status.toString)
  }

  test("TopKByScore agrees with the window row_number formulation") {
    import spark.implicits._
    val topk = udaf(new TopKByScore(3))
    val orders = graft.Tables.load(spark, TestSpark.sf, "orders")

    val viaAgg = orders.groupBy($"o_custkey")
      .agg(topk($"o_orderkey", $"o_totalprice").as("top"))
      .select($"o_custkey", posexplode($"top").as(Seq("rank", "p")))
      .select($"o_custkey", ($"rank" + 1).as("rank"),
        $"p._1".as("o_orderkey"), $"p._2".as("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(viaAgg == viaWindow)
  }
}
