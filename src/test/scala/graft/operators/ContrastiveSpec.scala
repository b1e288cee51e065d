package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contrastive triplet mining on planted clusters: positives pair within
  * clusters only, negatives verify below the ceiling, the margin holds on
  * every triplet, and mining is deterministic.
  */
class ContrastiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two tight clusters (ids 0-9 around e1, ids 10-19 around e2) plus
    * orthogonal noise rows — within-cluster cosine ≈ 1, across ≈ 0.
    */
  private def planted() = {
    val dim = 64
    def vec(axis: Int, id: Long): Array[Float] = {
      val v = new Array[Float](dim)
      v(axis) = 1f
      v(40 + (id % 3).toInt) = 0.05f // tiny per-id jitter, off every main axis
      v
    }
    val rows =
      (0L until 10L).map(i => (i, vec(0, i))) ++
      (10L until 20L).map(i => (i, vec(1, i))) ++
      // noise rows on UNIQUE axes — no accidental positive pairs
      (20L until 40L).map(i => (i, vec(2 + (i - 20).toInt, i)))
    rows.toDF("vec_id", "embedding")
  }

  test("positives stay within clusters; every triplet honors the margins") {
    val t = Similarity.contrastiveTriplets(planted(), "vec_id", "embedding",
      posMin = 0.9, negMax = 0.5, negBuckets = 16).collect()
    assert(t.nonEmpty, "planted clusters must yield triplets")
    t.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a / 10 == p / 10 && a < 20 && p < 20,
        s"positive pair ($a,$p) must come from one planted cluster")
      assert(Set(a, p, n).size == 3)
      assert(r.getDouble(3) >= 0.9 && r.getDouble(4) <= 0.5)
      assert(r.getDouble(3) > r.getDouble(4))
    }
  }

  test("anchors come from the clusters only and mining is deterministic") {
    val t1 = Similarity.contrastiveTriplets(planted(), "vec_id", "embedding",
      posMin = 0.9, negMax = 0.5, negBuckets = 16)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(t1.nonEmpty)
    // noise rows have no positive partner, so they can never anchor
    // (per-triplet negative filtering MAY drop one orientation of a
    // cluster pair — that asymmetry is by design, not a bug)
    assert(t1.forall(_.head.asInstanceOf[Long] < 20))
    val t2 = Similarity.contrastiveTriplets(planted(), "vec_id", "embedding",
      posMin = 0.9, negMax = 0.5, negBuckets = 16)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(t1.sameElements(t2))
  }

  test("an accidental near negative is dropped, not emitted") {
    // negatives are verified: force every bucket representative to be a
    // cluster-0 member (ids 0..9 fill all buckets when they are the only
    // rows with small ids) and check no cluster-0 anchor emits a
    // same-cluster negative
    val t = Similarity.contrastiveTriplets(planted(), "vec_id", "embedding",
      posMin = 0.9, negMax = 0.5, negBuckets = 4).collect()
    t.filter(_.getLong(0) < 10).foreach { r =>
      assert(r.getLong(2) >= 10 || r.getDouble(4) <= 0.5,
        s"near negative must verify below the ceiling: $r")
    }
  }
}
