package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Paragraph-granularity dedup (corpus-wide and ingest-time) and the
  * Bloom anti-join short-circuit behind the ingest path.
  */
class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // paragraphs = '|'-separated segments (tests control boundaries exactly)
  private val paras = split(col("text"), "\\|")

  test("corpus pass keeps the (min id, min p_idx) instance and rebuilds in order") {
    val docs = Seq(
      (1L, "boiler|alpha|beta"),
      (2L, "boiler|gamma"),
      (3L, "delta|boiler|alpha")
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateParagraphs(docs, "doc_id", paras, "|")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == (3L, "boiler|alpha|beta"))
    assert(got(2L) == (1L, "gamma"))
    assert(got(3L) == (1L, "delta"))
  }

  test("a document whose every paragraph is claimed elsewhere disappears") {
    val docs = Seq((1L, "a|b"), (2L, "a|b")).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateParagraphs(docs, "doc_id", paras, "|")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("carryCols ride through unchanged and never decide a keeper") {
    val docs = Seq(
      (1L, "boiler|alpha|beta", "en", 10L),
      (2L, "boiler|gamma", "de", 20L),
      (3L, "delta|boiler|alpha", "zz", 30L) // carry sorts OPPOSITE to id
    ).toDF("doc_id", "text", "lang", "w")
    val base = Dedup.dropDuplicateParagraphs(docs, "doc_id", paras, "|")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val carried = Dedup.dropDuplicateParagraphs(docs, "doc_id", paras, "|",
        carryCols = Seq("lang", "w"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    // identical dedup outcome (keeper choice unaffected by carried fields)
    assert(base.keySet == carried.keySet)
    base.foreach { case (id, (n, text)) =>
      assert((carried(id)._1, carried(id)._2) == ((n, text))) }
    // carried values are the source row's own
    assert(carried(1L)._3 == "en" && carried(1L)._4 == 10L)
    assert(carried(3L)._3 == "zz" && carried(3L)._4 == 30L)
  }

  test("bloomAntiJoin equals the exact anti-join on real corpus fingerprints") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .select($"doc_id", md5($"text").as("_fp"))
    val filterSide = docs.filter($"doc_id" % 7 === 0).select($"_fp")
    val got = Scale.bloomAntiJoin(docs, filterSide, "_fp", expectedKeys = 1000L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.join(filterSide, Seq("_fp"), "left_anti")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("ingest pass drops indexed paragraphs and keeps one copy of in-batch dups") {
    val incoming = Seq(
      (10L, "known|fresh1"),
      (11L, "fresh2|fresh1"), // fresh1 again: in-batch dup, 10 owns it
      (12L, "known")          // fully known doc contributes nothing
    ).toDF("doc_id", "text")
    val index = Seq("known").toDF("p_text").select(md5($"p_text").as("_fp"))
    val got = Dedup.ingestNovelParagraphs(incoming, "doc_id", paras, index,
        expectedKeys = 100L)
      .select($"id", $"p_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "fresh1"), (11L, "fresh2")))
  }

  test("CDC chunks + ingest dedup: re-ingesting an edited doc indexes only the edit") {
    // the version-resilience story end to end: v2 of a document shares
    // most CDC chunks with v1, so the ingest path stores only the chunks
    // the edit actually touched — with fixed-size windows every chunk
    // after the edit would be "novel" and the index would double
    val spark2 = spark
    import spark2.implicits._
    val base = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .select($"text").limit(8).collect().map(_.getString(0)).mkString(" ")
    val cdcUdf = udf((t: String) => graft.core.Cdc.chunks(t))
    val cdcParas = cdcUdf(col("text"))

    val v1 = Seq((1L, base)).toDF("doc_id", "text")
    val index0 = spark.emptyDataFrame.select(lit("").as("_fp")).filter(lit(false))
    val novel1 = Dedup.ingestNovelParagraphs(v1, "doc_id", cdcParas, index0, 1000L)
    val nV1 = novel1.count()

    val v2 = Seq((2L, base.substring(0, base.length / 2) + " EDITED " +
      base.substring(base.length / 2))).toDF("doc_id", "text")
    val novel2 = Dedup.ingestNovelParagraphs(v2, "doc_id", cdcParas,
      novel1.select($"_fp"), 1000L)
    val nV2 = novel2.count()
    assert(nV1 >= 6, s"fixture should produce several chunks, got $nV1")
    assert(nV2 <= 3, s"one interior edit must index at most ~3 chunks, got $nV2 of $nV1")
  }

  test("ingest result fingerprints can extend the index (second batch sees them)") {
    val b1 = Seq((1L, "p1|p2")).toDF("doc_id", "text")
    val index0 = spark.emptyDataFrame.select(lit("").as("_fp")).filter(lit(false))
    val novel1 = Dedup.ingestNovelParagraphs(b1, "doc_id", paras, index0, 100L)
    val index1 = novel1.select($"_fp")
    val b2 = Seq((2L, "p2|p3")).toDF("doc_id", "text")
    val novel2 = Dedup.ingestNovelParagraphs(b2, "doc_id", paras, index1, 100L)
      .select($"p_text").collect().map(_.getString(0)).toSet
    assert(novel2 == Set("p3"), "p2 was indexed by batch 1")
  }
}
