package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The incremental near-dup ingest gate: batch-only signing, Bloom-gated
  * band probe of a persisted index, signature verify, within-batch
  * clustering with min-id representatives — and the state-carry contract
  * (append survivors' signatures → re-ingest yields nothing).
  */
class IngestNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // distinct enough that unrelated rows never collide in a band
  private def prose(seed: String): String =
    (1 to 40).map(i => s"$seed word$i token${i * 7}").mkString(" ")

  private val corpus = df(
    1L -> prose("alpha"), 2L -> prose("beta"), 3L -> prose("gamma"))
  private val indexSigs =
    Dedup.minhashSignatures(corpus, "doc_id", "text").localCheckpoint(true)
  private val indexBands = Dedup.minhashBandIndex(indexSigs).localCheckpoint(true)

  test("novel batch passes whole; near-dups of indexed docs drop") {
    val batch = df(
      10L -> prose("alpha"),              // exact dup of indexed 1
      11L -> (prose("beta") + " tail"),   // near-dup of indexed 2
      12L -> prose("delta"),              // novel
      13L -> prose("epsilon"))            // novel
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(12L, 13L))
  }

  test("within-batch near-dup cluster keeps only its min-id representative") {
    val batch = df(
      20L -> prose("zeta"),
      21L -> (prose("zeta") + " extra"),  // near-dup of 20 (same batch)
      22L -> prose("eta"))
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(20L, 22L))
  }

  test("a batch cluster touching the index drops whole — the index copy is the representative") {
    val batch = df(
      30L -> (prose("gamma") + " tweak"), // near-dup of indexed 3
      31L -> (prose("gamma") + " tweak more")) // near-dup of 30 (chained)
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    assert(out.isEmpty, "cluster connected to indexed content must not survive")
  }

  test("empty index: pure within-batch dedup, everything else survives") {
    val batch = df(
      40L -> prose("theta"), 41L -> prose("theta"), 42L -> prose("iota"))
    val empty = indexSigs.limit(0)
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      empty, Dedup.minhashBandIndex(empty), threshold = 0.5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(40L, 42L))
  }

  test("idempotence: appending survivors' signatures makes a re-ingest yield zero") {
    val batch = df(
      50L -> prose("kappa"), 51L -> (prose("kappa") + " variant"),
      52L -> prose("lambda"))
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    val survivorSigs = Dedup.minhashSignatures(out, "doc_id", "text")
    val sigs2 = indexSigs.unionByName(survivorSigs).localCheckpoint(true)
    val bands2 = Dedup.minhashBandIndex(sigs2)
    val again = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      sigs2, bands2, threshold = 0.5)
    assert(again.isEmpty,
      s"re-ingest must be empty, got ${again.collect().mkString(",")}")
  }

  test("persisted Bloom state: prebuilt + merged blooms gate identically") {
    val batch = df(
      80L -> prose("alpha"),              // dup of indexed 1
      81L -> prose("omicron"))            // novel
    val bloom = Dedup.buildBandBloom(indexBands)
    val viaBloom = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5, bandBloom = Some(bloom))
    assert(viaBloom.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(81L))
    // carry the state forward WITHOUT rebuilding: merge the delta bands'
    // bloom (same layout params), then the appended content gates too
    val survivorSigs = Dedup.minhashSignatures(viaBloom, "doc_id", "text")
    val deltaBands = Dedup.minhashBandIndex(survivorSigs)
    bloom.mergeInPlace(Dedup.buildBandBloom(deltaBands))
    val sigs2 = indexSigs.unionByName(survivorSigs)
    val bands2 = indexBands.unionByName(deltaBands)
    val again = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      sigs2, bands2, threshold = 0.5, bandBloom = Some(bloom))
    assert(again.isEmpty)
  }

  test("survivors are pairwise below threshold (no surviving candidate pair)") {
    val batch = df((60L to 75L).map(i => i -> prose(s"m$i")): _*)
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    val survivorSigs = Dedup.minhashSignatures(out, "doc_id", "text")
    assert(Dedup.minhashPairsFromSigs(survivorSigs, 0.5).isEmpty)
  }
}
