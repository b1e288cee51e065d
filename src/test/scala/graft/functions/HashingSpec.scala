package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite {
  private val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
  private val nearDup = "the quick brown fox jumps over the lazy dog and keeps running very far away"
  private val other = "completely different content about spark query engines and shuffles"

  test("minhash signature: fixed length, deterministic") {
    val s1 = Hashing.minhashSignature(base)
    assert(s1.length == Hashing.NumPerm)
    assert(s1.sameElements(Hashing.minhashSignature(base)))
  }

  test("estimated jaccard: self=1, near-dup high, unrelated low") {
    val sb = Hashing.minhashSignature(base)
    assert(Hashing.estimatedJaccard(sb, sb) == 1.0)
    val near = Hashing.estimatedJaccard(sb, Hashing.minhashSignature(nearDup))
    val far = Hashing.estimatedJaccard(sb, Hashing.minhashSignature(other))
    assert(near > 0.5, s"near-dup est=$near")
    assert(far < 0.2, s"unrelated est=$far")
    assert(near > far)
  }

  test("band hashes: equal signatures share all bands; near-dups share some") {
    val sb = Hashing.minhashSignature(base)
    val bn = Hashing.bandHashes(Hashing.minhashSignature(nearDup))
    val bo = Hashing.bandHashes(Hashing.minhashSignature(other))
    val bb = Hashing.bandHashes(sb)
    assert(bb.length == Hashing.Bands)
    assert(bb.sameElements(Hashing.bandHashes(sb)))
    val sharedNear = bb.zip(bn).count { case (x, y) => x == y }
    val sharedFar = bb.zip(bo).count { case (x, y) => x == y }
    assert(sharedNear > 0, "LSH would miss an obvious near-dup")
    assert(sharedFar == 0)
  }

  test("simhash: near-dups within small hamming distance") {
    val h1 = Hashing.simhash64(base)
    val h2 = Hashing.simhash64(nearDup)
    val h3 = Hashing.simhash64(other)
    assert(Hashing.hammingDistance(h1, h1) == 0)
    assert(Hashing.hammingDistance(h1, h2) < Hashing.hammingDistance(h1, h3))
    assert(Hashing.hammingDistance(h1, h2) <= 12)
  }

  test("exact ngram jaccard brackets the estimate") {
    val exact = Hashing.ngramJaccard(base, nearDup)
    assert(exact > 0.5 && exact < 1.0)
    assert(Hashing.ngramJaccard(base, base) == 1.0)
    assert(Hashing.ngramJaccard("", "") == 1.0)
  }
}
