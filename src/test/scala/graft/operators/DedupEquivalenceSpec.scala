package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{GraftFunctions, Hashing}

/** The distributed LSH pair generation must find EXACTLY the pairs a naive
  * driver-side reference finds: for every pair, if any band/chunk collides
  * and the verifier passes, the pair appears once — regardless of how many
  * buckets it collides in or which band "owns" the scoring.
  */
class DedupEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic corpus with duplicate clusters and near-dups
  private def corpus: Seq[(Long, String)] = {
    val bases = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away today",
      "spark structured streaming processes unbounded data with watermarks",
      "minhash signatures estimate jaccard similarity between shingled sets",
      "completely unrelated text about cooking pasta with tomato sauce")
    (0L until 60L).map { i =>
      val base = bases((i % 4).toInt)
      val text =
        if (i < 40) base // ten exact copies of each base
        else if (i < 50) base + s" extra token${i}" // near-dups
        else s"unique document number $i with its own random words ${i * 7}"
      (i, text * 3)
    }
  }

  test("minhashNearDupPairs matches the naive all-pairs reference exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val threshold = 0.5
    val docs = corpus.toDF("doc_id", "text")

    val got = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sigs = corpus.map { case (id, t) => id -> Hashing.minhashSignature(t) }.toMap
    val bands = sigs.map { case (id, s) => id -> Hashing.bandHashes(s) }
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      collide = bands(a).lazyZip(bands(b)).exists(_ == _)
      if collide && Hashing.estimatedJaccard(sigs(a), sigs(b)) >= threshold
    } yield (a, b)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("minhash pairs over the real documents table match the naive reference") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val threshold = 0.5
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val got = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val sigs = local.map { case (id, t) => id -> Hashing.minhashSignature(t) }.toMap
    val bands = sigs.map { case (id, s) => id -> Hashing.bandHashes(s) }
    val idsSorted = local.map(_._1).sorted
    val expected = (for {
      a <- idsSorted; b <- idsSorted if a < b
      if bands(a).lazyZip(bands(b)).exists(_ == _)
      if Hashing.estimatedJaccard(sigs(a), sigs(b)) >= threshold
    } yield (a, b)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("embeddingNearDupPairs matches the naive all-pairs reference exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val minCos = 0.9

    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCosine = minCos)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    // naive reference: same hyperplane sketch via the library's own vectors,
    // recomputed here from first principles (seeded ±1 planes)
    val dim = local.head._2.length
    val signs = Array.tabulate(16)(p => Array.tabulate(dim)(i =>
      if ((Hashing.hash64(s"$p:$i") & 1L) == 1L) 1.0f else -1.0f))
    def sketch(v: Array[Float]): Long = {
      var bits = 0L
      for (p <- 0 until 16) {
        var d = 0.0
        var i = 0
        while (i < v.length) { d += v(i) * signs(p)(i); i += 1 }
        if (d > 0) bits |= (1L << p)
      }
      bits
    }
    def cosine(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val buckets = local.map { case (id, v) => (id, sketch(v)) }.toMap
    val idsSorted = local.map(_._1).sorted
    val expected = (for {
      a <- idsSorted; b <- idsSorted if a < b
      if buckets(a) == buckets(b)
      if cosine(local.toMap.apply(a), local.toMap.apply(b)) >= minCos
    } yield (a, b)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("simhashNearDupPairs matches the naive all-pairs reference exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = corpus.toDF("doc_id", "text")
    val maxHamming = 3

    val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = maxHamming)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val shs = corpus.map { case (id, t) => id -> Hashing.simhash64(t) }.toMap
    def chunkMatch(a: Long, b: Long): Boolean =
      (0 until 4).exists(c => ((a >>> (c * 16)) & 0xffffL) == ((b >>> (c * 16)) & 0xffffL))
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      if chunkMatch(shs(a), shs(b)) && Hashing.hammingDistance(shs(a), shs(b)) <= maxHamming
    } yield (a, b)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }
}
