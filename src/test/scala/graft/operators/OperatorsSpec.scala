package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.GraftFunctions

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact dedup finds planted duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text here"), (2L, "same text here"),
      (3L, "unique text"), (4L, "same text here")
    ).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").filter($"n" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n") == 3)
    assert(groups.head.getAs[Long]("keeper") == 1L)
    assert(Dedup.dropExactDuplicates(df, "doc_id", "text").count() == 2)
  }

  test("minhash LSH surfaces planted near-duplicates and skips unrelated") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "CHANGED" else s"word$i").mkString(" ")
    val far = (100 to 140).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(df, "doc_id", "text", threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val verified = Dedup.verifyJaccard(
      Dedup.minhashNearDupPairs(df, "doc_id", "text", threshold = 0.3),
      df, "doc_id", "text", threshold = 0.5).collect()
    assert(verified.length == 1)
    assert(verified.head.getAs[Double]("jaccard") > 0.8)
  }

  test("simhash pigeonhole join finds hamming-close pairs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val df = Seq((1L, base), (2L, near), (3L, "something else entirely short")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("brute-force top-k is exact and ordered") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val probe = emb.filter($"vec_id" === 0L).select("embedding").head().getSeq[Float](0).toArray
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 5).collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("vec_id") == 0L) // self-similarity = 1.0
    val sims = top.map(_.getAs[Double]("sim"))
    assert(sims.toSeq == sims.sorted.reverse.toSeq)
  }

  test("IVF ANN reaches decent recall vs brute force") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val probe = emb.filter($"vec_id" === 0L).select("embedding").head().getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.buildIvf(spark, emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(ivf.assignments.select("cell").distinct().count() > 1)
    val approx = Similarity.searchIvf(ivf, probe, nprobe = 3, k = 10)
      .select("id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / 10
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("int8 quantized two-stage search reproduces the exact top-k") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val probe = emb.filter($"vec_id" === 0L).select("embedding").head().getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSet
    val quant = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // codes are ¼ the float payload: one byte per dimension
    val dims = quant.join(emb, Seq("vec_id"))
      .select(length($"codes") === size($"embedding")).as[Boolean].collect()
    assert(dims.forall(identity))
    val approx = Similarity.searchQuantized(quant, emb, "vec_id", "embedding", probe, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / 10
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("topKPerProbe ranks within each probe") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings").limit(200).cache()
    val probes = emb.filter($"vec_id" < 3).select($"vec_id".as("pid"), $"embedding".as("pvec"))
    val out = Similarity.topKPerProbe(probes, "pid", "pvec", emb, "vec_id", "embedding", 4)
    val got = out.groupBy("probe_id").agg(count(lit(1)).as("n")).collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("n") == 4))
    // rank 1 of each probe is itself
    val self = out.filter($"rank" === 1).select("probe_id", "vec_id").collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("mega-cluster buckets star-expand instead of silently dropping pairs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 200 identical docs share every LSH bucket; with maxBucketSize=50 the
    // bucket exceeds the full-expansion cap — star expansion must still
    // connect every member to the cluster representative (min id)
    val docs = (0L until 200L).map(i => (i, "the same exact text repeated " * 10))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", threshold = 0.9, maxBucketSize = 50)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1L until 200L).map(j => (0L, j)).toSet,
      s"expected 199 star pairs from the representative, got ${got.size}")
  }

  test("language id heuristic: clear-cut samples") {
    assert(graft.functions.LangId.detect("the cat and the dog are in the house") == "en")
    assert(graft.functions.LangId.detect("el perro y el gato en la casa por la noche") == "es")
    assert(graft.functions.LangId.detect("der Hund und die Katze sind nicht im Haus") == "de")
    assert(graft.functions.LangId.detect("le chien et le chat dans la maison pour la nuit") == "fr")
    assert(graft.functions.LangId.detect("这是一个中文句子没有空格") == "zh")
    assert(graft.functions.LangId.detect("") == "und")
  }
}
