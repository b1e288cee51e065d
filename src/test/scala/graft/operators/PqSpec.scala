package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** Product quantization pinned on the real embeddings table: codebook
  * geometry, code-width/range invariants, ADC approximation quality, and
  * end-to-end recall of the two-stage search against brute force.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")
  private lazy val probe = emb.filter($"vec_id" === 1L)
    .select($"embedding").head().getSeq[Float](0).toArray
  private lazy val book = Similarity.trainPq(spark, emb, "vec_id", "embedding",
    subspaces = 8, codesPerSub = 16, iters = 2)
  private lazy val codes = Similarity.encodePq(spark, emb, "vec_id", "embedding", book)

  test("codebook geometry: 8 subspaces x 16 codes x 8 dims") {
    assert(book.subspaces == 8 && book.subDim == 8)
    assert(book.centroids.length == 8)
    book.centroids.foreach { sub =>
      assert(sub.length == 16)
      sub.foreach(c => assert(c.length == 8))
    }
  }

  test("codes: 8 bytes per vector, every byte a valid centroid id") {
    val rows = codes.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val cs = r.getAs[Array[Byte]]("pq_codes")
      assert(cs.length == 8)
      cs.foreach(b => assert((b & 0xff) < 16))
    }
  }

  test("encoding is deterministic across invocations") {
    val a = codes.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = Similarity.encodePq(spark, emb, "vec_id", "embedding", book)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a == b)
  }

  test("two-stage PQ search recovers most of the exact top-10") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .select($"vec_id").as[Long].collect().toSet
    val got = Similarity.searchPq(spark, codes, emb, "vec_id", "embedding",
        book, probe, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(got.size == 10)
    assert((exact & got).size >= 6, s"recall ${(exact & got).size}/10")
  }

  test("training reduces quantization error vs the untrained init") {
    // reconstruction MSE of the trained book must not exceed the init's
    def mse(b: Similarity.PqCodebook): Double = {
      val cs = Similarity.encodePq(spark, emb, "vec_id", "embedding", b)
      emb.join(cs, "vec_id").select($"embedding", $"pq_codes").collect().map { r =>
        val v = r.getSeq[Float](0).toArray
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        val u = v.map(x => if (n > 0) (x / n) else 0.0)
        val code = r.getAs[Array[Byte]](1)
        var e = 0.0
        for (sc <- 0 until b.subspaces; i <- 0 until b.subDim) {
          val d = u(sc * b.subDim + i) - b.centroids(sc)(code(sc) & 0xff)(i)
          e += d * d
        }
        e
      }.sum
    }
    val init = Similarity.trainPq(spark, emb, "vec_id", "embedding",
      subspaces = 8, codesPerSub = 16, iters = 0)
    assert(mse(book) <= mse(init) * 1.0001)
  }
}
