package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Hashing

/** Winnowing fingerprints (Hashing.winnowFingerprints) and the
  * shared-substring pair operator built on them (Dedup.winnowNearDupPairs).
  * The algorithm's published guarantees are the contract: every shared
  * substring of length ≥ w+k−1 yields a shared fingerprint, and selection
  * density is at least one fingerprint per w consecutive k-gram hashes.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fingerprints are deterministic, sorted, distinct") {
    val t = "the quick brown fox jumps over the lazy dog" * 4
    val a = Hashing.winnowFingerprints(t)
    val b = Hashing.winnowFingerprints(t)
    assert(a.sameElements(b))
    assert(a.sameElements(a.distinct.sorted))
    assert(a.nonEmpty)
  }

  test("empty and sub-k texts still fingerprint (whole-text hash)") {
    assert(Hashing.winnowFingerprints("").isEmpty)
    assert(Hashing.winnowFingerprints("ab", k = 8).length == 1)
    // identical short texts agree, different ones disagree
    assert(Hashing.winnowFingerprints("ab").sameElements(Hashing.winnowFingerprints("ab")))
    assert(!Hashing.winnowFingerprints("ab").sameElements(Hashing.winnowFingerprints("cd")))
  }

  test("guarantee: a shared substring of length ≥ w+k−1 shares a fingerprint") {
    val k = 8; val w = 16
    val shared = "zqxjkvbw pmdhtfng ylrcwsze" // 26 chars ≥ w+k−1 = 23, distinctive
    // embed the same passage in two otherwise-unrelated documents, at
    // different offsets; repeat across enough host pairs to rule out luck
    (1 to 10).foreach { i =>
      val a = s"first host document number $i padding words before " + shared + " tail a"
      val b = s"completely different preamble $i " + shared + " and another ending here b"
      val fa = Hashing.winnowFingerprints(a, k, w).toSet
      val fb = Hashing.winnowFingerprints(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint for host pair $i")
    }
  }

  test("density: selection count is at least hashes/w") {
    val k = 8; val w = 16
    val t = (1 to 120).map(i => s"word$i").mkString(" ")
    val norm = graft.core.TextKeys.normalizeForFingerprint(t)
    val nHashes = norm.length - k + 1
    val fps = Hashing.winnowFingerprints(t, k, w)
    // distinct values can collapse repeated selections, but a text of
    // all-unique words selects roughly one per window step
    assert(fps.length >= nHashes / w,
      s"${fps.length} fingerprints for $nHashes hashes (w=$w)")
  }

  test("winnowNearDupPairs finds planted passage copies and skips unrelated docs") {
    import spark.implicits._
    val passage = "the stolen benchmark paragraph that appears verbatim in both documents"
    val docs = Seq(
      (0L, "intro alpha " + passage + " closing words one"),
      (1L, "totally different opening " + passage + " different tail"),
      (2L, "independent document about cooking pasta with fresh tomato sauce basil"),
      (3L, "another unrelated file on spark shuffle partitions and query planning")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDupPairs(docs, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("hot fingerprints beyond maxDocsPerFp drop out of the pair join") {
    import spark.implicits._
    // every doc shares one long boilerplate sentence; only 0/1 also share
    // real content. Interior boilerplate fingerprints select identically
    // in all 10 docs (df=10); selections near the per-doc boundary can
    // still pair a few docs, so the assertion targets the cap MECHANISM:
    // uncapped, boilerplate alone links every pair; capped, the all-doc
    // fingerprints vanish while the planted (0,1) content pair survives.
    val boiler = "standard corporate disclaimer appended to every single document" +
      " for compliance reasons and retained in each revision of the archive"
    val real = "meaningful shared analytical content that matters for detection"
    val docs = ((0L to 1L).map(i => (i, real + s" unique$i " + boiler)) ++
      (2L to 9L).map(i => (i, s"unrelated body $i ${i * 31} " + boiler))).toDF("doc_id", "text")
    def pairsWithCap(cap: Int): Set[(Long, Long)] =
      Dedup.winnowNearDupPairs(docs, "doc_id", "text", minShared = 2, maxDocsPerFp = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsWithCap(1000)
    val capped = pairsWithCap(5)
    assert(uncapped.size == 45, s"boilerplate should link all C(10,2) pairs, got $uncapped")
    assert(capped.contains((0L, 1L)))
    assert(capped.subsetOf(uncapped) && capped.size < uncapped.size / 2,
      s"cap should drop the boilerplate-only pairs, kept $capped")
  }
}
