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

  test("WithSigs: same survivors, sigs equal a re-sign of them (no second pass)") {
    val batch = df(
      10L -> prose("alpha"),              // drops against the index
      12L -> prose("delta"),              // novel
      14L -> (prose("delta") + " tail"),  // within-batch dup of 12
      13L -> prose("epsilon"))            // novel
    val r = Dedup.ingestNovelDocumentsWithSigs(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    val plain = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    assert(r.rows.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    def sigMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toSeq).toMap
    assert(sigMap(r.sigs.select("id", "sig")) ==
      sigMap(Dedup.minhashSignatures(r.rows, "doc_id", "text")
        .select("id", "sig")),
      "survivor sigs must be exactly what re-signing the survivors yields")
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

  private def vdf(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // unit vectors: e(i) is orthogonal to e(j); tilt(i, eps) is e(i) nudged
  // toward e(i+1) — cosine with e(i) ≈ 1/sqrt(1+eps²) ≈ 1
  private def e(i: Int, dim: Int = 8): Seq[Float] =
    Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
  private def tilt(i: Int, eps: Float, dim: Int = 8): Seq[Float] =
    Seq.tabulate(dim)(j =>
      if (j == i) 1.0f else if (j == (i + 1) % dim) eps else 0.0f)

  test("embedding gate: near-dups of indexed vectors drop, orthogonal ones survive") {
    val corpus = vdf(1L -> e(0), 2L -> e(1))
    val sk = Dedup.embeddingSketches(corpus, "vec_id", "embedding",
      bands = 8, rowsPerBand = 4).localCheckpoint(true)
    val bandsIdx = Dedup.embeddingBandIndex(sk)
    val batch = vdf(
      10L -> tilt(0, 0.05f), // near-dup of indexed 1
      11L -> e(2),           // orthogonal to everything indexed
      12L -> tilt(2, 0.05f)) // within-batch near-dup of 11
    val out = Dedup.ingestNovelEmbeddings(batch, "vec_id", "embedding",
      sk, bandsIdx, minCosine = 0.9, bands = 8, rowsPerBand = 4)
    assert(out.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(11L))
  }

  test("embedding gate idempotence: appended sketches absorb a re-ingest") {
    val corpus = vdf(1L -> e(0))
    val sk = Dedup.embeddingSketches(corpus, "vec_id", "embedding",
      bands = 8, rowsPerBand = 4).localCheckpoint(true)
    val batch = vdf(20L -> e(3), 21L -> e(4))
    val out = Dedup.ingestNovelEmbeddings(batch, "vec_id", "embedding",
      sk, Dedup.embeddingBandIndex(sk), minCosine = 0.9,
      bands = 8, rowsPerBand = 4)
    assert(out.count() == 2)
    val sk2 = sk.unionByName(Dedup.embeddingSketches(out, "vec_id", "embedding",
      bands = 8, rowsPerBand = 4)).localCheckpoint(true)
    val again = Dedup.ingestNovelEmbeddings(batch, "vec_id", "embedding",
      sk2, Dedup.embeddingBandIndex(sk2), minCosine = 0.9,
      bands = 8, rowsPerBand = 4)
    assert(again.isEmpty)
  }

  test("soundness on the real corpus: every dropped doc has a witness at threshold") {
    // even doc_ids indexed, odd ingested — then every batch doc the gate
    // dropped must have SOME partner (indexed doc or fellow batch doc) at
    // estimated Jaccard ≥ threshold, verified brute-force from the raw
    // signatures: the gate may lose recall (LSH), but it must never drop
    // without a witness
    val docs = spark.read.parquet(s"${graft.TestSpark.sf}/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val threshold = 0.5
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text").localCheckpoint(true)
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      sigs, Dedup.minhashBandIndex(sigs), threshold = threshold)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.functions.Hashing.minhashSignature(r.getString(1)))
    val dropped = all.filter { case (id, _) => id % 2 == 1 && !kept.contains(id) }
    assert(dropped.nonEmpty, "corpus should produce at least one drop at 0.5")
    dropped.foreach { case (id, sig) =>
      val witness = all.exists { case (oid, osig) =>
        oid != id && graft.functions.Hashing.estimatedJaccard(sig, osig) >= threshold
      }
      assert(witness, s"doc $id dropped without any partner at >= $threshold")
    }
  }

  test("survivors are pairwise below threshold (no surviving candidate pair)") {
    val batch = df((60L to 75L).map(i => i -> prose(s"m$i")): _*)
    val out = Dedup.ingestNovelDocuments(batch, "doc_id", "text",
      indexSigs, indexBands, threshold = 0.5)
    val survivorSigs = Dedup.minhashSignatures(out, "doc_id", "text")
    assert(Dedup.minhashPairsFromSigs(survivorSigs, 0.5).isEmpty)
  }
}
