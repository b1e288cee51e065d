package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew study (VERDICT r9 next-round #3): SCALING.md replicates the
  * corpus uniformly, so the skew guards (LSH bucket caps, fingerprint
  * caps, partition pruning) had never been measured under a HOT key.
  * This probe plants the classic pathologies at ~10% of the corpus and
  * times each guarded family against its uniform baseline:
  *
  *  - boilerplate text: every 10th document's text replaced by ONE
  *    identical paragraph — the "cookie banner" corpus. Drives d2
  *    (one mega LSH bucket in every band), d7 (hot winnowing
  *    fingerprints), d11 (one hot paragraph md5 in the keeper groupBy).
  *  - hot partition: a partitioned-upsert batch whose every row lands in
  *    ONE hash bucket, vs the same row count spread across all buckets.
  *
  * Pass = no skewed run exceeds 2x its uniform time (SCALING.md skew
  * rows). Env: SPARK_GRAFT_SKEW_BASE (default sf0.1),
  * SPARK_GRAFT_SKEW_OUT (default /tmp/graft_skew), SPARK_GRAFT_REPS.
  */
object SkewProbe {

  private val Boilerplate = Seq.fill(20)(
    "please accept our cookie consent terms and continue to the site")
    .mkString(" ")

  private def buildSkewDir(spark: SparkSession, base: String, out: String): String = {
    val dir = s"$out/skew10"
    val done = new java.io.File(s"$dir/_SKEW_OK")
    if (done.exists()) return dir
    val docs = Tables.load(spark, base, "documents")
      .withColumn("text",
        when(col("doc_id") % 10 === 0, lit(Boilerplate)).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    done.getParentFile.mkdirs(); done.createNewFile()
    dir
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SKEW_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SKEW_OUT", "/tmp/graft_skew")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val skewDir = buildSkewDir(spark, base, out)

    def time(thunk: () => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to reps) {
        System.gc()
        val t0 = System.nanoTime()
        rows = thunk()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }

    val textQueries = Seq("d2_minhash_pairs", "d7_winnow_pairs", "d11_paragraph_dedup")
    val rows = textQueries.map { q =>
      val fn = SparkEntry.queries(q)
      val (tu, ru) = time(() => fn(spark, base).count())
      val (ts, rs) = time(() => fn(spark, skewDir).count())
      (q, tu, ts, ru, rs)
    }

    // k7 hot partition: same update count, one bucket vs all buckets
    val docs = Tables.load(spark, base, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val nB = 16
    def upsertTimed(updates: DataFrame): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val root = java.nio.file.Files.createTempDirectory("graft-skew-k7").toString
        graft.pipeline.PartitionedUpsert.writeInitial(docs, root, "doc_id", nB)
        System.gc()
        val t0 = System.nanoTime()
        graft.pipeline.PartitionedUpsert.upsertByKey(spark, root, updates, "doc_id", nB)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    val hotBucket = graft.pipeline.PartitionedUpsert.bucketOf($"doc_id", nB) === 3
    val hotUpdates = docs.filter(hotBucket)
      .withColumn("n_chars", $"n_chars" + 1000L).localCheckpoint(true)
    val nHot = hotUpdates.count()
    // uniform control: the SAME number of updates spread over all buckets
    val spreadUpdates = docs.orderBy($"doc_id").limit(nHot.toInt)
      .withColumn("n_chars", $"n_chars" + 1000L).localCheckpoint(true)
    val tSpread = upsertTimed(spreadUpdates)
    val tHot = upsertTimed(hotUpdates)

    println(f"SKEW ${"query"}%-22s uniform  skewed   ratio  rows_u -> rows_s")
    rows.foreach { case (q, tu, ts, ru, rs) =>
      println(f"SKEW $q%-22s $tu%-8.2f $ts%-8.2f ${ts / tu}%-6.2f $ru%d -> $rs%d")
    }
    println(f"SKEW k7_upsert_hot_bucket  $tSpread%-8.2f $tHot%-8.2f ${tHot / tSpread}%-6.2f $nHot updates")
    spark.stop()
  }
}
