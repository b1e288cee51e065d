package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
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

  // first-principles mirror of the banded hyperplane sketch (band bd = the
  // r sign bits of hyperplanes [bd·r, (bd+1)·r), planes seeded by hash64)
  private def refBandSketches(v: Array[Float], bands: Int, r: Int): Array[Long] = {
    val dim = v.length
    Array.tabulate(bands) { bd =>
      var bits = 0L
      for (rr <- 0 until r) {
        val p = bd * r + rr
        var d = 0.0
        var i = 0
        while (i < v.length) {
          d += v(i) * (if ((Hashing.hash64(s"$p:$i") & 1L) == 1L) 1.0f else -1.0f)
          i += 1
        }
        if (d > 0) bits |= (1L << rr)
      }
      bits
    }
  }

  private def cosine(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  test("embeddingNearDupPairs matches the naive all-pairs banded reference exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val minCos = 0.9

    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCosine = minCos)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    val sks = local.map { case (id, v) => id -> refBandSketches(v, 8, 8) }.toMap
    val vecs = local.toMap
    val idsSorted = local.map(_._1).sorted
    val expected = (for {
      a <- idsSorted; b <- idsSorted if a < b
      if sks(a).lazyZip(sks(b)).exists(_ == _) // any colliding band
      if cosine(vecs(a), vecs(b)) >= minCos
    } yield (a, b)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("banded embedding LSH finds every pair seeded AT the cos 0.95 decision boundary") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = 64
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 20 pairs at cos ∈ [0.95, 0.97]: w = c·v + sqrt(1−c²)·u⊥ — the regime a
    // single wide sketch misses ~4 times out of 5 (the round-2 defect)
    val rows = (0 until 20).flatMap { p =>
      // 0.9505 floor: a pair seeded exactly at 0.95 can land a hair below
      // the threshold after float32 rounding and drop out of the truth set
      val c = 0.9505 + 0.001 * p
      val v = unit()
      val raw = unit()
      val dotRV = raw.lazyZip(v).map((a, b) => a.toDouble * b).sum
      val uRaw = raw.lazyZip(v).map((a, b) => (a - dotRV * b).toFloat)
      val un = math.sqrt(uRaw.map(x => x.toDouble * x).sum).toFloat
      val u = uRaw.map(_ / un)
      val w = v.lazyZip(u).map((a, b) => (c * a + math.sqrt(1 - c * c) * b).toFloat)
      Seq((p.toLong * 2, v.toSeq), (p.toLong * 2 + 1, w.toSeq))
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    val truePairs = (for {
      (a, va) <- rows; (b, vb) <- rows if a < b
      if cosine(va.toArray, vb.toArray) >= 0.95
    } yield (a, b)).toSet
    assert(truePairs.size >= 20, s"construction broke: only ${truePairs.size} true pairs")

    val got = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", minCosine = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truePairs -- got
    assert(missed.isEmpty, s"LSH missed boundary pairs: $missed")
  }

  test("hot buckets keep rep-connectivity while normal buckets stay exhaustive") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // a mega-cluster of 12 mutual near-dups (every band collides → every
    // bucket oversized at cap 4) plus a normal 3-member near-dup group:
    // the contract under skew is CONNECTIVITY for the hot cluster (star
    // edges via the min-id representative, not the full pair list) and
    // EXACT all-pairs output for clusters below the cap
    val mega = (0L until 12L).map(i =>
      (i, ("the quick brown fox jumps over the lazy dog again and again " * 5) + s"v$i"))
    val small = (100L until 103L).map(i =>
      (i, ("structured streaming joins watermarked sources with state " * 5) + s"n$i"))
    val docs = (mega ++ small).toDF("doc_id", "text")

    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // hot cluster: every member reachable from the representative (id 0)
    val megaEdges = pairs.filter { case (a, b) => a < 100 && b < 100 }
    val reachable = {
      var seen = Set(0L)
      var grew = true
      while (grew) {
        val next = seen ++ megaEdges.collect {
          case (a, b) if seen(a) => b
          case (a, b) if seen(b) => a
        }
        grew = next.size > seen.size
        seen = next
      }
      seen
    }
    assert(reachable == mega.map(_._1).toSet,
      s"hot cluster lost connectivity: reachable=$reachable")

    // normal group: exhaustive pairs, exactly as all-pairs LSH semantics say
    val smallPairs = pairs.filter { case (a, b) => a >= 100 && b >= 100 }
    val expectedSmall = (for {
      a <- small.map(_._1); b <- small.map(_._1) if a < b
      sa = Hashing.minhashSignature(small.find(_._1 == a).get._2)
      sb = Hashing.minhashSignature(small.find(_._1 == b).get._2)
      if Hashing.bandHashes(sa).lazyZip(Hashing.bandHashes(sb)).exists(_ == _)
      if Hashing.estimatedJaccard(sa, sb) >= 0.5
    } yield (a, b)).toSet
    assert(smallPairs == expectedSmall,
      s"missing=${expectedSmall -- smallPairs} spurious=${smallPairs -- expectedSmall}")
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
