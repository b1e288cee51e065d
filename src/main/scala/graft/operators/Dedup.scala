package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{GraftFunctions, Hashing}

/** Deduplication operators for large-scale text corpora.
  *
  * Exact dedup is a hash-groupBy; near-dup families (MinHash+LSH, SimHash)
  * follow the standard public constructions (Broder 1997; Charikar 2002;
  * banding per Mining of Massive Datasets ch.3). All are expressed as
  * shuffle-on-bucket joins — no driver-side pair enumeration — so candidate
  * generation stays O(n·bands) and only same-bucket pairs are compared:
  * the shape that survives 100 TB (identical-content skew is bounded by
  * per-bucket pair expansion, mitigated by `maxBucketSize`).
  */
object Dedup {

  /** Exact duplicate groups by content hash; `keeper` = min id per group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** Rows surviving exact dedup (first id per identical content wins). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  private val bandsUdf = udf((sig: Seq[Long]) => Hashing.bandHashes(sig.toArray))
  private val estJaccardUdf =
    udf((a: Seq[Long], b: Seq[Long]) => Hashing.estimatedJaccard(a.toArray, b.toArray))
  private val hammingUdf = udf((a: Long, b: Long) => Hashing.hammingDistance(a, b))

  /** id → MinHash signature (64 perms over word-3-gram shingles). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), GraftFunctions.minhash(col(textCol)).as("sig"))

  /** In-bucket pair expansion: members (id, sig) → ordered unique pairs.
    * Bounded by maxBucketSize upstream, so the O(n²) stays per-bucket-local.
    */
  private val bucketPairsUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
    val n = members.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Long], Seq[Long])]
    var i = 0
    while (i < n) {
      val ia = members(i).getLong(0)
      val sa = members(i).getSeq[Long](1)
      var j = i + 1
      while (j < n) {
        val ib = members(j).getLong(0)
        val sb = members(j).getSeq[Long](1)
        if (ia < ib) out += ((ia, ib, sa, sb))
        else if (ib < ia) out += ((ib, ia, sb, sa))
        j += 1
      }
      i += 1
    }
    out.toSeq
  })

  /** Near-duplicate candidate pairs via MinHash banding (16 bands × 4 rows),
    * verified by estimated Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard).
    *
    * Shape: signatures are computed ONCE (single scan), buckets are built by
    * one groupBy shuffle, and pairs are expanded inside buckets — no
    * self-join (which would recompute the signature UDF on both sides) and
    * no window pass. Oversized buckets (degenerate collisions / identical
    * boilerplate) are dropped, which both guards skew at scale and bounds
    * the per-bucket pair expansion.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).cast("long").as("id"),
      GraftFunctions.minhash(col(textCol)).as("sig"))
    val bands = sigs
      .select(col("id"), col("sig"), posexplode(bandsUdf(col("sig"))).as(Seq("band", "bh")))
    bands.groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(bucketPairsUdf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("sig_a"), col("p._4").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccardUdf(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  private val bucketPairsLongUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
    val n = members.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var i = 0
    while (i < n) {
      val ia = members(i).getLong(0)
      val sa = members(i).getLong(1)
      var j = i + 1
      while (j < n) {
        val ib = members(j).getLong(0)
        val sb = members(j).getLong(1)
        if (ia < ib) out += ((ia, ib, sa, sb))
        else if (ib < ia) out += ((ib, ia, sb, sa))
        j += 1
      }
      i += 1
    }
    out.toSeq
  })

  /** SimHash near-dup pairs: 64-bit sketch, pigeonhole blocking (4×16-bit
    * chunks — any pair within hamming ≤ 3 shares a chunk), hamming verify.
    * Same one-scan bucket-aggregate shape as MinHash LSH: the sketch UDF
    * runs once per row and pairs expand inside bounded buckets.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val sk = df.select(col(idCol).cast("long").as("id"),
      GraftFunctions.simhash(col(textCol)).as("sh"))
    val chunks = sk.select(col("id"), col("sh"), explode(array((0 until 4).map { i =>
      struct(lit(i).as("ci"), (shiftrightunsigned(col("sh"), i * 16) % 65536).as("cv"))
    }: _*)).as("c")).select(col("id"), col("sh"), col("c.ci"), col("c.cv"))
    chunks.groupBy(col("ci"), col("cv"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(bucketPairsLongUdf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("sh_a"), col("p._4").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingUdf(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private val jaccardUdf = udf((a: String, b: String) => Hashing.ngramJaccard(a, b))

  /** Exact n-gram Jaccard verification of candidate pairs: joins the texts
    * back (broadcast when small) and computes the true similarity.
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val t = docs.select(col(idCol).as("_vid"), col(textCol).as("_vtext"))
    pairs
      .join(t.withColumnRenamed("_vid", "id_a").withColumnRenamed("_vtext", "text_a"), Seq("id_a"))
      .join(t.withColumnRenamed("_vid", "id_b").withColumnRenamed("_vtext", "text_b"), Seq("id_b"))
      .withColumn("jaccard", round(jaccardUdf(col("text_a"), col("text_b")), 4))
      .filter(col("jaccard") >= threshold)
      .drop("text_a", "text_b")
  }

  // Deterministic ±1 hyperplane components, cached per (planes, dim) so the
  // per-row sketch is a pure dot-product loop (no hashing in the hot path).
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Float]]]()
  private def planeSigns(planes: Int, dim: Int): Array[Array[Float]] =
    signCache.computeIfAbsent((planes, dim), _ =>
      Array.tabulate(planes)(p => Array.tabulate(dim)(i =>
        if ((Hashing.hash64(p + ":" + i) & 1L) == 1L) 1.0f else -1.0f)))

  private val bucketPairsVecUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
    val n = members.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Float], Seq[Float])]
    var i = 0
    while (i < n) {
      val ia = members(i).getLong(0)
      val va = members(i).getSeq[Float](1)
      var j = i + 1
      while (j < n) {
        val ib = members(j).getLong(0)
        val vb = members(j).getSeq[Float](1)
        if (ia < ib) out += ((ia, ib, va, vb))
        else if (ib < ia) out += ((ib, ia, vb, va))
        j += 1
      }
      i += 1
    }
    out.toSeq
  })

  /** Embedding-cosine near-duplicates via random-hyperplane LSH buckets
    * (16 sign bits, seeded), verified with the native cosine expression.
    * One scan computes the sketches; pairs expand inside bounded buckets.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, planes: Int = 16, maxBucketSize: Int = 1000): DataFrame = {
    val sketch = udf((v: Seq[Float]) => {
      val signs = planeSigns(planes, v.length)
      val arr = v.toArray
      var bits = 0L
      var p = 0
      while (p < planes) {
        val row = signs(p)
        var dotv = 0.0
        var i = 0
        while (i < arr.length) { dotv += arr(i) * row(i); i += 1 }
        if (dotv > 0) bits |= (1L << p)
        p += 1
      }
      bits
    })
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", sketch(col("vec")))
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(bucketPairsVecUdf(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        col("p._3").as("vec_a"), col("p._4").as("vec_b"))
      .withColumn("cos", GraftFunctions.cosine_f32(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
