package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling study: replicate the sf0.1 tables to 2×/4×/8× scratch parquet and
  * time one representative query per operator family at each scale, so
  * "would this hold at 100× the data" is measured, not asserted (SCALING.md
  * records the findings).
  *
  * Replication preserves workload CHARACTER rather than just row count:
  *   - keys (doc_id, vec_id, event_id, order keys…) are shifted per replica
  *     so cardinalities scale with the data;
  *   - document text is replica-salted at the WORD level (every token gets a
  *     per-replica suffix), so replicas share no shingles — the near-dup/
  *     dup-pair population grows linearly with scale, exactly like a real
  *     corpus, instead of quadratically like naive copy-paste replication
  *     (every doc near-identical to its clones) would make it;
  *   - embeddings are deterministically perturbed per replica (hash-seeded
  *     epsilon on one dimension) so vectors stay distinct and ANN cell
  *     occupancy scales.
  *
  * Env:
  *   SPARK_GRAFT_SCALES      comma ints, default "1,2,4,8"
  *   SPARK_GRAFT_SCALE_BASE  source sf dir, default /root/testdata/sf0.1
  *   SPARK_GRAFT_SCALE_OUT   scratch root, default /tmp/graft_scale
  *   SPARK_GRAFT_SCALE_QS    comma query names, default the family heads
  */
object ScaleProbe {
  private val DefaultQueries = Seq(
    "q01_pricing_summary", // TPC-H agg (lineitem)
    "j5_dim_join_revenue", // dim join (orders×customer×nation)
    "d1_dedup_exact",      // hash-groupBy dedup
    "d2_minhash_pairs",    // MinHash LSH
    "d3_simhash_pairs",    // SimHash pigeonhole
    "d7_winnow_pairs",     // winnowing inverted index
    "d8_neardup_survivors",// LSH→verify→CC end-to-end
    "d13_corpus_overlap",  // mergeable sketches
    "t2_quality_scores",   // per-doc quality
    "t5_bpe_tokens",       // BPE token counts
    "t10_dsir_weights",    // DSIR histograms
    "v2_knn_top10",        // brute-force knn
    "v5_ann_ivf_recall",   // IVF ANN build+probe
    "sp5_greedy_pack",     // sequence packing
    "c7_chunk_recursive",  // recursive chunker
    "st1_gap_sessions",    // sessionization window
    "t13_bigram_ppl",      // bigram LM train (ref shuffle) + broadcast score
    "t14_filter_config",   // declarative filter scan
    "m10_video_frames",    // AVI container decode + frame explode
    "m13_mp4_keyframes",   // MP4 sample-table walk
    "k8_compaction"        // small-file compaction rewrite
  )

  /** One replica of every table, keys shifted, text salted, vectors nudged. */
  private def replica(spark: SparkSession, base: String, r: Int): Map[String, DataFrame] = {
    val salt = if (r == 0) "" else s"·$r" // middle-dot suffix: survives word tokenization
    def t(n: String) = Tables.load(spark, base, n)
    val docs0 = t("documents")
    val docs =
      if (r == 0) docs0
      else docs0
        .withColumn("doc_id", col("doc_id") + lit(r * 1000000L))
        // word-level salt: same token count / lengths ± salt, zero shared shingles
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1$salt"))
        .withColumn("n_chars", length(col("text")))
    val emb0 = t("embeddings")
    val emb =
      if (r == 0) emb0
      else emb0
        .withColumn("vec_id", col("vec_id") + lit(r * 1000000L))
        .withColumn("embedding",
          transform(col("embedding"), (v, i) =>
            when(i === (lit(r) % size(col("embedding"))),
              v + (pmod(col("vec_id") * 2654435761L, lit(1000)).cast("float") - 500f) / 500000f)
              .otherwise(v).cast("float"))) // keep array<float> — the arithmetic promotes to double
    val ev0 = t("events")
    val ev =
      if (r == 0) ev0
      else ev0
        .withColumn("event_id", col("event_id") + lit(r * 100000000L))
        .withColumn("user_id", col("user_id") + lit(r * 1000000L))
    def shifted(n: String, keys: Seq[String], by: Long): DataFrame =
      keys.foldLeft(t(n))((df, k) => df.withColumn(k, col(k) + lit(by)))
    val off = r * 100000000L
    Map(
      "documents" -> docs,
      "embeddings" -> emb,
      "events" -> ev,
      "lineitem" -> shifted("lineitem", Seq("l_orderkey"), off),
      "orders" -> shifted("orders", Seq("o_orderkey"), off),
      // dims stay fixed (realistic: dimensions don't scale with facts)
      "customer" -> t("customer"),
      "supplier" -> t("supplier"),
      "part" -> t("part"),
      "nation" -> t("nation"),
      "region" -> t("region")
    )
  }

  // dims don't scale with facts — one copy regardless of k (replicating
  // them would duplicate keys and multiply every join's fan-out by k)
  private val FixedDims = Set("customer", "supplier", "part", "nation", "region")

  private def buildScaleDir(spark: SparkSession, base: String, out: String, k: Int): String = {
    val dir = s"$out/x$k"
    val done = new java.io.File(s"$dir/_SCALE_OK")
    if (done.exists()) return dir
    Tables.names.foreach { n =>
      val reps = if (FixedDims(n)) 1 else k
      val parts = (0 until reps).map(r => replica(spark, base, r)(n))
      val df = parts.reduce(_.unionByName(_))
      // single parquet FILE per table (queries read "$dir/<name>.parquet");
      // coalesce to a handful of row groups — small enough data either way
      df.coalesce(math.max(1, k / 2))
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    done.getParentFile.mkdirs(); done.createNewFile()
    dir
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_scale")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val qnames = sys.env.get("SPARK_GRAFT_SCALE_QS")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val dirs: Map[Int, String] = scales.map { k =>
      k -> (if (k == 1) base else buildScaleDir(spark, base, out, k))
    }.toMap
    println(s"SCALE dirs ready: $dirs")

    // rows: query -> scale -> (seconds, result rows)
    val results = for (q <- qnames) yield {
      val fn = SparkEntry.queries(q)
      val per = for (k <- scales) yield {
        val d = dirs(k)
        try { fn(spark, d).count() } catch { case t: Throwable =>
          System.err.println(s"[scale] warm $q x$k: $t") } // warm
        System.gc()
        val t0 = System.nanoTime()
        val n = try fn(spark, d).count() catch { case t: Throwable =>
          System.err.println(s"[scale] $q x$k threw: $t"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc()
        k -> (sec, n)
      }
      q -> per.toMap
    }

    println(f"${"query"}%-24s " + scales.map(k => f"x$k%-8d").mkString +
      " slope(last)  rows@max")
    for ((q, per) <- results) {
      val times = scales.map(k => per(k)._1)
      val slope =
        if (scales.size >= 2 && times.forall(_ > 0)) {
          val (k1, k2) = (scales(scales.size - 2), scales.last)
          math.log(times.last / times(times.size - 2)) / math.log(k2.toDouble / k1)
        } else Double.NaN
      println(f"$q%-24s " + times.map(t => f"$t%-8.2f").mkString +
        f" $slope%10.2f  ${per(scales.last)._2}%d")
    }
    spark.stop()
  }
}
