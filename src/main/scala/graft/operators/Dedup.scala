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

  /** Near-duplicate candidate pairs via MinHash banding (16 bands × 4 rows),
    * verified by estimated Jaccard ≥ threshold. Returns (id_a, id_b, est_jaccard).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol)
    val bands = sigs
      .select(col("id"), col("sig"), posexplode(bandsUdf(col("sig"))).as(Seq("band", "bh")))
    // skew guard: drop degenerate buckets (e.g., empty-text hash collisions)
    val sized = bands.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bucket_n") <= maxBucketSize)
    val a = sized.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccardUdf(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit sketch, pigeonhole block join (4×16-bit
    * chunks — any pair within hamming ≤ 3 shares a chunk), hamming verify.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"), GraftFunctions.simhash(col(textCol)).as("sh"))
    val chunks = sk.select(col("id"), col("sh"), explode(array((0 until 4).map { i =>
      struct(lit(i).as("ci"), (shiftrightunsigned(col("sh"), i * 16) % 65536).as("cv"))
    }: _*)).as("c")).select(col("id"), col("sh"), col("c.ci"), col("c.cv"))
    val a = chunks.select(col("ci"), col("cv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("ci"), col("cv"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
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

  /** Embedding-cosine near-duplicates via random-hyperplane LSH buckets
    * (16 sign bits, seeded), verified with the native cosine expression.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, planes: Int = 16): DataFrame = {
    val sketch = udf((v: Seq[Float]) => {
      var bits = 0L
      var p = 0
      while (p < planes) {
        var dotv = 0.0
        var i = 0
        while (i < v.length) {
          // deterministic pseudo-random plane component from (p, i)
          val h = Hashing.hash64(p + ":" + i)
          dotv += v(i) * (if ((h & 1L) == 1L) 1.0 else -1.0)
          i += 1
        }
        if (dotv > 0) bits |= (1L << p)
        p += 1
      }
      bits
    })
    val sk = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", sketch(col("vec")))
    val a = sk.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = sk.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", GraftFunctions.cosine_f32(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
