package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.GraftFunctions

/** 1-bit binary-quantization tier: code layout (mean-thresholded sign
  * bits, LSB-first packing, ceil(dim/8) bytes), the asymmetric kernel
  * against a Scala reference, build determinism, and the keystone
  * equality — full fan-out search reproduces brute-force top-k
  * row-for-row, with a recall floor at the shipped rerank factor.
  */
class BinaryAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
  private lazy val index =
    Similarity.quantizeBinary(emb, "vec_id", "embedding")
  private lazy val codes = index.codes.localCheckpoint(true)

  private def vecOf(rows: Array[(Long, Seq[Float])]): Map[Long, Array[Float]] =
    rows.map { case (id, v) => id -> v.toArray }.toMap

  test("codes are ceil(dim/8) bytes; bit i = (v_i > corpus mean_i), LSB-first") {
    val vecs = vecOf(emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Float])].collect())
    val dim = vecs.values.head.length
    // recompute the per-dimension means independently
    val means = Array.tabulate(dim)(i =>
      (vecs.values.map(_(i).toDouble).sum / vecs.size).toFloat)
    index.means.zip(means).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4f) }
    val got = codes.as[(Long, Array[Byte])].collect().toMap
    assert(got.size == vecs.size, "node conservation")
    got.foreach { case (id, bits) =>
      assert(bits.length == (dim + 7) / 8, "storage claim: ceil(dim/8) bytes")
      val v = vecs(id)
      (0 until dim).foreach { i =>
        val bit = (bits(i >> 3) & (1 << (i & 7))) != 0
        assert(bit == (v(i) > index.means(i)),
          s"vec $id bit $i disagrees with the mean threshold")
      }
    }
  }

  test("binary_dot_f32 rejects any probe the code width can't have encoded") {
    def scoreOf(probe: Array[Float]): Double =
      Seq((1L, Array[Byte](0x0f, 0x33))).toDF("id", "bits")
        .withColumn("a", GraftFunctions.binary_dot_f32($"bits", typedLit(probe)))
        .select($"a").head().getDouble(0)
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    def mustReject(probe: Array[Float]): Unit = {
      val e = intercept[Exception](scoreOf(probe))
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("disagree on dimension")),
        s"wanted a dimension-mismatch error for dim ${probe.length}, got: $e")
    }
    // a 2-byte code encodes 9..16 dims exactly. Wider: zero padding bits
    // would read as −qᵢ. Shorter than 9: the probe provably came from a
    // different-dimension model and would silently score a prefix.
    mustReject(Array.fill(17)(1.0f))
    mustReject(Array.fill(8)(1.0f))
    // the last-partial-byte range is legitimate (padding ambiguity only)
    val ok = scoreOf(Array.fill(16)(1.0f))
    // bits 0-3 and 8,9,12,13 set: 8 positive, 8 negative → 0.0
    assert(math.abs(ok) < 1e-12)
    assert(math.abs(scoreOf(Array.fill(9)(1.0f)) - 1.0) < 1e-12,
      "9-dim probe over a 2-byte code: bits 0-3,8 set -> 5 pos, 4 neg = +1")
  }

  test("binary_dot_f32 equals the Scala reference sum") {
    val probe = emb.filter($"vec_id" === 7)
      .select($"embedding").head().getSeq[Float](0).toArray
    val vecs = vecOf(emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Float])].collect())
    val got = codes
      .withColumn("a", GraftFunctions.binary_dot_f32($"bits", typedLit(probe)))
      .select($"id", $"a").as[(Long, Double)].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = v.indices.map { i =>
        val q = probe(i).toDouble
        if (v(i) > index.means(i)) q else -q
      }.sum
      assert(math.abs(got(id) - want) < 1e-9, s"kernel mismatch for $id")
    }
  }

  test("the build is deterministic — a rebuild is byte-identical") {
    val again = Similarity.quantizeBinary(emb, "vec_id", "embedding")
    def flat(ix: Similarity.BinaryIndex) = ix.codes
      .as[(Long, Array[Byte])].collect().map(t => (t._1, t._2.toSeq)).sortBy(_._1).toSeq
    assert(flat(index).map(t => (t._1, t._2)) ==
      again.codes.as[(Long, Array[Byte])].collect()
        .map(t => (t._1, t._2.toSeq)).sortBy(_._1).toSeq)
    assert(index.means.toSeq == again.means.toSeq)
  }

  test("full fan-out: rerankFactor covering the corpus reproduces brute-force top-k") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = top(Similarity.searchBinaryBatch(index, emb, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 5, rerankFactor = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5).withColumnRenamed("vec_id", "id"))
    assert(got.sameElements(exact))
  }

  test("recall@10 at the shipped rerank factor clears the floor") {
    val probes = emb.filter($"vec_id" % 199 === 0)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val k = 10
    val got = Similarity.searchBinaryBatch(index, emb, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k = k, rerankFactor = 8)
      .select($"probe_id", $"id").as[(Long, Long)].collect().toSet
    val exact = Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
        emb, "vec_id", "embedding", k = k)
      .select($"probe_id", $"vec_id".cast("long")).as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.7, f"recall@10 $recall%.3f under the 1-bit tier's floor")
    // every probe present, exactly k rows each
    val perProbe = got.groupBy(_._1).map(_._2.size).toSet
    assert(perProbe == Set(k))
  }
}
