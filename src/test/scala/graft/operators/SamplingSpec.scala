package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sampling operators pinned against naive in-memory recomputations: the
  * distributed formulation must reproduce the exact row set a single-pass
  * local implementation produces (determinism is the operator's contract).
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hash(id: Long): Long = (id * 2654435761L) % 4294967296L

  private val corpus: Seq[(Long, String, Long)] =
    (0L until 200L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
      (hash(i * 7) % 90) + 10)) // 10..99 "tokens", deterministic

  private lazy val df = corpus.toDF("doc_id", "lang", "n_tokens")

  test("packSequences matches a local cumulative scan") {
    val got = Sampling.packSequences(df, "lang", "doc_id", "n_tokens", 100)
      .select("lang", "doc_id", "start_offset", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val expected = corpus.groupBy(_._2).flatMap { case (lang, rows) =>
      var off = 0L
      rows.sortBy(_._1).map { case (id, _, n) =>
        val r = (lang, id) -> (off, off / 100)
        off += n
        r
      }
    }.toMap
    assert(got == expected)
    // every doc's start offset falls inside its sequence's window
    got.values.foreach { case (off, seq) =>
      assert(off / 100 == seq)
    }
  }

  test("packSequences: first doc of each stratum starts at offset 0, seq 0") {
    val firsts = Sampling.packSequences(df, "lang", "doc_id", "n_tokens", 100)
      .groupBy($"lang").agg(min_by(struct($"start_offset", $"seq_id"), $"doc_id").as("f"))
      .select($"f.start_offset", $"f.seq_id").collect()
    firsts.foreach(r => assert(r.getLong(0) == 0L && r.getLong(1) == 0L))
  }

  test("packGreedyIntact matches the sequential greedy recurrence") {
    val budget = 100
    val got = Sampling.packGreedyIntact(df, "lang", "doc_id", "n_tokens", budget)
      .select("lang", "doc_id", "bin_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = corpus.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      var bin = 0L; var binTokens = 0L; var started = false
      rows.sortBy(_._1).map { case (id, _, n) =>
        if (!started) { started = true; binTokens = n }
        else if (binTokens + n > budget) { bin += 1; binTokens = n }
        else binTokens += n
        (lang, id) -> bin
      }
    }.toMap
    assert(got == expected)
  }

  test("packGreedyIntact: oversized doc gets its own bin, packing continues") {
    val rows = Seq((1L, "en", 40L), (2L, "en", 250L), (3L, "en", 40L),
      (4L, "en", 50L), (5L, "en", 20L)).toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.packGreedyIntact(rows, "lang", "doc_id", "n_tokens", 100)
      .select("doc_id", "bin_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 40 | 250 | 40+50 | 20? -> 40+50 = 90, +20 = 110 > 100 -> new bin
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
  }

  test("packGreedyIntact: bins never exceed budget unless singleton") {
    val agg = Sampling.packGreedyIntact(df, "lang", "doc_id", "n_tokens", 100)
      .groupBy("lang", "bin_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("c"))
      .collect()
    agg.foreach { r =>
      assert(r.getLong(2) <= 100 || r.getLong(3) == 1L,
        s"bin over budget with >1 doc: $r")
    }
  }

  test("balancedSample keeps exactly the rows the keep rule admits") {
    val got = Sampling.balancedSample(df, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val counts = corpus.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = counts.values.min
    val expected = corpus.collect {
      case (id, lang, _) if hash(id) % counts(lang) < nMin => id
    }.toSet
    assert(got == expected)
    // balance: every stratum lands within a loose band of n_min
    val perLang = corpus.filter(c => expected(c._1)).groupBy(_._2).view.mapValues(_.size).toMap
    perLang.values.foreach(n => assert(n > 0 && n <= counts.values.min * 2))
  }

  test("reservoirPerKey is the deterministic bottom-k by (hash, id)") {
    val k = 5
    val got = Sampling.reservoirPerKey(df, "lang", "doc_id", k)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = corpus.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.map(_._1).sortBy(id => (hash(id), id)).take(k).map(lang -> _)
    }.toSet
    assert(got == expected)
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("temperatureWeights: sums to 1, alpha=1 gives natural proportions") {
    val w5 = Sampling.temperatureWeights(df, "lang", 0.5)
      .select("lang", "weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(w5.values.sum - 1.0) < 1e-12)
    val counts = corpus.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val z = counts.values.map(math.sqrt).sum
    counts.foreach { case (lang, n) =>
      assert(math.abs(w5(lang) - math.sqrt(n) / z) < 1e-12)
    }
    val w1 = Sampling.temperatureWeights(df, "lang", 1.0)
      .select("lang", "weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = counts.values.sum
    counts.foreach { case (lang, n) =>
      assert(math.abs(w1(lang) - n / total) < 1e-12)
    }
    // alpha=0.5 upweights the smallest stratum relative to natural
    val smallest = counts.minBy(_._2)._1
    assert(w5(smallest) > w1(smallest))
  }

  test("groupedSplit: a group never straddles splits; bands respect per-mille edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val split = Sampling.groupedSplit(docs, "source", valPerMille = 150,
      testPerMille = 150)
    // leakage check: every source maps to exactly one split
    val perSource = split.groupBy($"source")
      .agg(countDistinct($"split").as("k")).collect()
    perSource.foreach(r => assert(r.getLong(1) == 1L,
      s"source ${r.getString(0)} straddles splits"))
    // all three labels valid; extreme bands behave
    val labels = split.select($"split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
    val allTrain = Sampling.groupedSplit(docs, "source", 0, 0)
      .select($"split").distinct().collect().map(_.getString(0)).toSet
    assert(allTrain == Set("train"))
    // deterministic
    val again = Sampling.groupedSplit(docs, "source", 150, 150)
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("epochShuffle: every (epoch, shard) covers the corpus once; orders differ by epoch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .select($"doc_id")
    val n = docs.count()
    val shuffled = Sampling.epochShuffle(docs, "doc_id", epochs = 2, nShards = 4)
    // partition: each epoch holds every doc exactly once
    val perEpoch = shuffled.groupBy($"epoch")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("nd")).collect()
    assert(perEpoch.length == 2)
    perEpoch.foreach(r => assert(r.getLong(1) == n && r.getLong(2) == n))
    // positions are dense 1..k within each shard
    val dense = shuffled.groupBy($"epoch", $"shard")
      .agg(count(lit(1)).as("k"), max($"pos").as("mx"), min($"pos").as("mn"))
      .collect()
    dense.foreach { r =>
      assert(r.getInt(4) == 1, "positions must start at 1")
      assert(r.getInt(3).toLong == r.getLong(2), "positions must be dense 1..k")
    }
    // the two epochs order the corpus differently
    val orders = shuffled.groupBy($"epoch")
      .agg(sum($"pos" * $"doc_id").as("chk")).collect()
      .map(r => r.getLong(1)).toSet
    assert(orders.size == 2, "epoch permutations must differ")
    // and not merely by relabeling shards: docs sharing a shard in epoch 0
    // must scatter across several shards in epoch 1 (an affine epoch salt
    // fails this — it maps each epoch-0 shard onto exactly one epoch-1 shard)
    val e0 = shuffled.filter($"epoch" === 0).select($"doc_id", $"shard".as("s0"))
    val e1 = shuffled.filter($"epoch" === 1).select($"doc_id", $"shard".as("s1"))
    val fanout = e0.join(e1, "doc_id").groupBy($"s0")
      .agg(countDistinct($"s1").as("nd")).collect().map(_.getLong(1))
    assert(fanout.forall(_ > 1), s"epoch-1 shards must not be a relabeling of epoch-0 shards: $fanout")
    // deterministic across runs
    val again = Sampling.epochShuffle(docs, "doc_id", 2, 4)
      .groupBy($"epoch").agg(sum($"pos" * $"doc_id").as("chk")).collect()
      .map(r => r.getLong(1)).toSet
    assert(again == orders)
  }

  test("singleEpochShuffle matches the exploded form's epoch without materializing the others") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .select($"doc_id")
    val exploded = Sampling.epochShuffle(docs, "doc_id", epochs = 4, nShards = 4)
    // epoch 0 AND a later epoch: the single form must reproduce (shard,
    // pos) exactly for any index, not just the base case
    for (e <- Seq(0, 3)) {
      val want = exploded.filter($"epoch" === e)
        .select($"doc_id", $"shard", $"pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
      val got = Sampling.singleEpochShuffle(docs, "doc_id", e, nShards = 4)
        .select($"doc_id", $"shard", $"pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
      assert(got.sameElements(want), s"epoch $e diverges from the exploded form")
    }
  }

  test("upsampleByWeight: floor copies + hash Bernoulli, rep indexes 1..n") {
    val docs = (0L until 400L).toDF("doc_id")
    val out = Sampling.upsampleByWeight(docs, "doc_id", lit(2.5))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"), max($"rep").as("mx"),
        min($"rep").as("mn")).collect()
    assert(out.length == 400) // w >= 1: every doc survives
    out.foreach { r =>
      val id = r.getLong(0); val n = r.getLong(1)
      val expected = 2 + (if ((id * 2654435761L) % 4294967296L % 1000000L < 500000L) 1 else 0)
      assert(n == expected, s"doc $id copies $n != $expected")
      assert(r.getLong(3) == 1L && r.getLong(2) == n) // rep is 1..n
    }
    // expectation: total within a few percent of 400·2.5
    val total = out.map(_.getLong(1)).sum
    assert(math.abs(total - 1000) < 60, s"total $total far from 1000")
    // w < 1 degrades to Bernoulli downsampling: no duplicates, some drops
    val down = Sampling.upsampleByWeight(docs, "doc_id", lit(0.25)).collect()
    assert(down.length < 400 && down.length > 40)
    assert(down.map(_.getLong(0)).distinct.length == down.length)
    // exact-integer weights never take the Bernoulli branch
    assert(Sampling.upsampleByWeight(docs, "doc_id", lit(3.0)).count() == 1200)
    // deterministic under repartitioning
    val a = Sampling.upsampleByWeight(docs.repartition(7), "doc_id", lit(1.5))
      .groupBy($"doc_id").count().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Sampling.upsampleByWeight(docs.repartition(2), "doc_id", lit(1.5))
      .groupBy($"doc_id").count().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }
}
