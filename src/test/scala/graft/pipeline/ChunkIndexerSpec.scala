package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.SplitParams

class ChunkIndexerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunkDocuments: ordered ids, monotonic offsets, unique keys (W1/W3/X3)") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("alpha beta gamma " * 40).trim, "s1"),
      (2L, "tiny", "s1")
    ).toDF("doc_id", "text", "source")
    val p = SplitParams(maxTokens = 16, overlapTokens = 2, minChunkTokens = 1)
    val out = Chunkers.chunkDocuments(docs, "doc_id", "text", None, p).cache()
    val d1 = out.filter($"doc_id" === 1L).orderBy($"chunk_id").collect()
    assert(d1.length > 1)
    assert(d1.map(_.getAs[Int]("chunk_id")).toSeq == d1.indices.toSeq)
    val offsets = d1.map(_.getAs[Long]("chunk_offset"))
    assert(offsets.toSeq == offsets.sorted.toSeq)
    assert(offsets.head == 0L)
    val keys = out.select("chunk_key").as[String].collect()
    assert(keys.distinct.length == keys.length)
    assert(keys.forall(_.matches(".*-c\\d{5}")))
  }

  test("buildChunkIndex end-to-end at sf0.001: embedded, keyed, complete") {
    import spark.implicits._
    val idx = ChunkIndexer.buildChunkIndex(spark, TestSpark.sf).cache()
    assert(idx.count() > 0)
    // every source document is represented
    val nDocs = graft.Tables.load(spark, TestSpark.sf, "documents").count()
    assert(idx.select("parent_id").distinct().count() == nDocs)
    // vectors are unit-norm (hashing embedder)
    val badNorm = idx.select(graft.functions.GraftFunctions.l2norm_f32($"contentVector").as("n"))
      .filter(abs($"n" - 1.0) > 1e-4 && $"n" =!= 0.0).count()
    assert(badNorm == 0)
  }

  test("replaceParents: idempotent keyed replace (K2/K3)") {
    import spark.implicits._
    val index = ChunkIndexer.buildChunkIndex(spark, TestSpark.sf).cache()
    val before = index.count()
    // simulate re-chunking parent 0 with fewer chunks
    val newChunks = index.filter($"parent_id" === 0L).limit(1)
      .withColumn("content", lit("replacement chunk"))
    val replaced = ChunkIndexer.replaceParents(index, newChunks).cache()
    val othersBefore = index.filter($"parent_id" =!= 0L).count()
    assert(replaced.filter($"parent_id" === 0L).count() == 1)
    assert(replaced.filter($"parent_id" =!= 0L).count() == othersBefore)
    // idempotent: replacing again with the same chunks changes nothing
    val again = ChunkIndexer.replaceParents(replaced, newChunks)
    assert(again.count() == replaced.count())
    assert(before >= replaced.count())
  }

  test("purgeMissing drops index rows whose parent vanished (J2)") {
    import spark.implicits._
    val index = ChunkIndexer.buildChunkIndex(spark, TestSpark.sf).cache()
    val live = graft.Tables.load(spark, TestSpark.sf, "documents")
      .filter($"doc_id" % 2 === 0).select($"doc_id".as("parent_id"))
    val purged = ChunkIndexer.purgeMissing(index, live)
    assert(purged.filter($"parent_id" % 2 =!= 0).count() == 0)
    assert(purged.select("parent_id").distinct().count() == live.count())
  }

  test("incremental semantics: unchanged re-run replaces nothing new (§5.4)") {
    import spark.implicits._
    val index1 = ChunkIndexer.buildChunkIndex(spark, TestSpark.sf)
    val index2 = ChunkIndexer.buildChunkIndex(spark, TestSpark.sf)
    // deterministic keys → identical ids
    val diff = index1.select("id").except(index2.select("id")).count()
    assert(diff == 0)
    assert(index1.count() == index2.count())
  }

  test("embed input is capped at maxEmbedTokens; stored content is untouched") {
    import spark.implicits._
    // record what the service was asked to embed via an accumulator
    // (the embedder closure is serialized into the task)
    val sentTokens = spark.sparkContext.collectionAccumulator[Int]("sentTokens")
    val spy = new graft.services.Embedder {
      override def dim: Int = 4
      override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
        texts.map { t =>
          sentTokens.add(graft.core.RegexTokenizer.count(t))
          Array.fill(4)(0.5f)
        }
    }
    val long = ("tok " * 50).trim // 50 tokens
    val chunks = Seq((1L, long)).toDF("doc_id", "content").coalesce(1)
    val out = ChunkIndexer.embedChunks(chunks, "content", spy, maxEmbedTokens = 8)
    val row = out.collect().head
    // stored content keeps every token; the service saw at most 8
    assert(row.getString(1) == long)
    import scala.jdk.CollectionConverters._
    val sent = sentTokens.value.asScala.toSeq
    assert(sent.nonEmpty && sent.forall(_ <= 8),
      s"embed input exceeded the cap: $sent")
  }
}
