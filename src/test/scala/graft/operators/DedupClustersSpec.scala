package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Connected-components dedup: distributed min-label propagation vs a
  * driver-side union-find reference, and the end-to-end survivor rule.
  */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("label propagation crosses a long chain (diameter > 1 round), both paths") {
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L)
    // driverEdgeCap = 0 forces the distributed relax+jump loop; the
    // default takes the driver union-find fast path — labels must agree
    Seq(0L, 200000L).foreach { cap =>
      val got = Dedup.nearDupClusters(ids, pairs, driverEdgeCap = cap).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"cap=$cap")
    }
  }

  test("pair endpoints outside ids never become labels or output rows") {
    // pairs mined before a filter may reference dropped docs: vertex 2 is
    // absent from ids, so it must not label the {5,6} cluster (labels
    // outside ids would make keepRepresentatives drop the whole cluster)
    val ids = Seq(5L, 6L).toDF("id")
    val pairs = Seq((2L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    Seq(0L, 200000L).foreach { cap =>
      val got = Dedup.nearDupClusters(ids, pairs, driverEdgeCap = cap).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(5L -> 5L, 6L -> 5L), s"cap=$cap")
    }
  }

  test("pointer jumping converges a 60-node chain in O(log n) rounds") {
    // plain one-hop propagation would need ~60 rounds; relax+jump needs ~7
    val ids = (1L to 60L).toDF("id")
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // cap 0: the distributed loop must converge within the round budget
    val got = Dedup.nearDupClusters(ids, pairs, maxRounds = 10,
      driverEdgeCap = 0L).collect()
    assert(got.forall(_.getLong(1) == 1L), "entire chain must label to the min id")
  }

  test("distributed clusters equal driver-side union-find on the real corpus") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val cand = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.3)
    val verified = Dedup.verifyJaccard(cand, docs, "doc_id", "text", threshold = 0.4)
      .select($"id_a", $"id_b")
    val pairs = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain verified near-dups for this test")

    // driver-side union-find reference
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docs.select($"doc_id")
    // both the distributed loop (cap 0) and the fast path must reproduce
    // the reference union-find labels exactly
    Seq(0L, 200000L).foreach { cap =>
      val got = Dedup.nearDupClusters(ids, verified, driverEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.foreach { case (id, cluster) =>
        assert(cluster == find(id), s"cap=$cap doc $id: got $cluster want ${find(id)}")
      }
    }
  }

  test("embedding-space removal keeps one representative per cosine cluster") {
    val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
    val kept = Dedup.dropEmbeddingNearDuplicates(emb, "vec_id", "embedding",
      minCosine = 0.4, bands = 8, rowsPerBand = 4)
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, bands = 8, rowsPerBand = 4)
    val clusters = Dedup.nearDupClusters(emb.select($"vec_id"), pairs)
    assert(kept.count() == clusters.select($"cluster").distinct().count())
    assert(kept.count() < emb.count(), "threshold 0.4 must merge something on this corpus")
  }

  test("dropNearDuplicates keeps exactly one representative per cluster") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      candidateThreshold = 0.3, jaccardThreshold = 0.4)
    val cand = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.3)
    val verified = Dedup.verifyJaccard(cand, docs, "doc_id", "text", threshold = 0.4)
    val clusters = Dedup.nearDupClusters(docs.select($"doc_id"), verified)
    val nClusters = clusters.select($"cluster").distinct().count()
    assert(kept.count() == nClusters, "one survivor per component (incl. singletons)")
    // survivors are exactly the min-id representatives
    val keptIds = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    val reps = clusters.filter($"id" === $"cluster").collect().map(_.getLong(0)).toSet
    assert(keptIds == reps)
  }
}
