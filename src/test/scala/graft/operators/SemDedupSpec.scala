package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SemDeDup: k-means-bounded within-cluster semantic pruning. The survivor
  * set must equal the greedy min-id maximal-independent-set reference when
  * clustering is degenerate (k = 1), drop planted near-duplicates without
  * losing distinct docs, and be invariant across runs.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** A deterministic unit-ish vector from a seed; `jitter` rotates it a hair
    * so cos(base, jitter(base)) ≈ 1 − ε (well above any dedup threshold). */
  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(i => math.sin(seed * 31 + i * 7).toFloat)
  private def jitter(v: Seq[Float], eps: Float): Seq[Float] =
    v.zipWithIndex.map { case (x, i) => x + eps * (if (i % 2 == 0) 1 else -1) * 0.01f }

  private def corpus() = {
    // 5 distinct directions; docs 100+i / 200+i / 300+i are jittered copies
    // of direction i (3-member dup groups), ids 0-4 are the originals
    val base = (0 until 5).map(i => (i.toLong, vec(i + 1)))
    val dups = (0 until 5).flatMap(i => Seq(
      (100L + i, jitter(vec(i + 1), 1f)),
      (200L + i, jitter(vec(i + 1), 2f)),
      (300L + i, jitter(vec(i + 1), 3f))))
    (base ++ dups).toDF("id", "vec")
  }

  /** Driver-side reference: greedy by ascending id over ALL pairs. */
  private def naiveSurvivors(rows: Seq[(Long, Seq[Float])], tau: Double): Set[Long] = {
    def unit(v: Seq[Float]): Array[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => if (n > 0) x / n else 0.0).toArray
    }
    val sorted = rows.sortBy(_._1).map { case (id, v) => (id, unit(v)) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    for ((id, u) <- sorted)
      if (!kept.exists { case (_, k) => k.zip(u).map { case (a, b) => a * b }.sum >= tau })
        kept += ((id, u))
    kept.map(_._1).toSet
  }

  test("k=1 equals the driver-side greedy reference exactly") {
    val df = corpus()
    val got = Dedup.semDedupSurvivors(spark, df, "id", "vec", nClusters = 1,
      minCosine = 0.95).select($"id").collect().map(_.getLong(0)).toSet
    val want = naiveSurvivors(
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq, 0.95)
    assert(got == want)
    assert(got == Set(0L, 1L, 2L, 3L, 4L), "one min-id survivor per dup group")
  }

  test("clustered run still drops every planted duplicate and keeps all originals") {
    // planted dups are near-identical (cos ≈ 1) so they land in the same
    // k-means cell as their original regardless of centroid jitter
    val got = Dedup.semDedupSurvivors(spark, corpus(), "id", "vec",
      nClusters = 4, minCosine = 0.95).select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("distinct docs are untouched at a high threshold") {
    val df = (0 until 12).map(i => (i.toLong, vec(i * 97 + 13))).toDF("id", "vec")
    val got = Dedup.semDedupSurvivors(spark, df, "id", "vec", nClusters = 3,
      minCosine = 0.999).count()
    assert(got == 12L)
  }

  test("deterministic across runs") {
    val a = Dedup.semDedupSurvivors(spark, corpus(), "id", "vec", 4, 0.95)
      .select($"id").collect().map(_.getLong(0)).toSet
    val b = Dedup.semDedupSurvivors(spark, corpus(), "id", "vec", 4, 0.95)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("maxClusterSize caps the greedy scan and keeps the tail unconditionally") {
    val df = corpus()
    val got = Dedup.semDedupSurvivors(spark, df, "id", "vec", nClusters = 1,
      minCosine = 0.95, maxClusterSize = 6).select($"id")
      .collect().map(_.getLong(0)).toSet
    // first 6 ids (0-4, 100) greedy-prune to {0..4}; ids beyond the cap all survive
    val tail = df.collect().map(_.getLong(0)).sorted.drop(6).toSet
    assert(got == Set(0L, 1L, 2L, 3L, 4L) ++ tail)
  }
}
