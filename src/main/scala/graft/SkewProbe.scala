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

  /** Batch-ANN probe-axis skew (VERDICT r10 next-round #1) — the one
    * bucketed family the r10 study didn't cover. Two plants over a
    * replicated sf embedding corpus:
    *
    *  - MEGA-PROBE: half the corpus replaced by ONE repeated vector, so
    *    the probe pointing at it owns ~50% of all candidate rows (the
    *    shape that serialized on one task under the retired r10
    *    `repartition(probe_id)` layout in searchIvfPqBatch).
    *  - HOT PROBES: 90% of a 64-probe batch is that same vector —
    *    concentrates the candidate equi-join on one cell key.
    *
    * Timed (index builds + fixtures localCheckpointed OUTSIDE the timed
    * region): searchIvfBatch (v15), searchIvfPqBatch in both the r11
    * default (no candidate shuffle) and the retired repartition(probe_id)
    * layout, and lshSearchBatch. Pass bar: no skewed run of a shipped
    * path exceeds 2x its uniform time.
    */
  private def runAnnStudy(spark: SparkSession, base: String, reps: Int,
      time: (() => Long) => (Double, Long)): Unit = {
    import spark.implicits._
    import graft.operators.Similarity
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, base, "embeddings")
      .select($"vec_id", $"embedding")
    // Replicate until candidate SCORING (not the per-stage scheduler
    // floor) is the dominant cost — at R=16 every ratio reads 1.0 because
    // a 0.7s floor hides a <50ms scoring stage. R=256 → 512k vectors at
    // sf0.1; the mega cell then holds ~460k candidate rows.
    val R = sys.env.getOrElse("SPARK_GRAFT_SKEW_ANN_R", "256").toInt
    val repC = (0 until R).map(i => emb.select(
        ($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"), $"embedding"))
      .reduce(_.unionByName(_))
    val corpusU = repC.repartition(32).localCheckpoint(true)
    val v0 = emb.orderBy($"vec_id").select($"embedding")
      .head().getSeq[Float](0).toArray
    // 90% clone share: the mega-probe's cells own ~0.9 of the corpus, the
    // worst case short of a constant column
    val corpusS = repC.withColumn("embedding",
        when($"vec_id" % 10 =!= 0, typedLit(v0.toSeq)).otherwise($"embedding"))
      .repartition(32).localCheckpoint(true)

    def mkProbes(hot: Int, total: Int) = {
      val distinct = emb.filter($"vec_id" < (total - hot))
        .select($"vec_id".cast("long").as("probe_id"),
          $"embedding".as("probe_vec"))
      val hotDf = spark.range(hot)
        .select(($"id" + 1000L).as("probe_id"),
          typedLit(v0.toSeq).cast("array<float>").as("probe_vec"))
      distinct.unionByName(hotDf).localCheckpoint(true)
    }
    val probesU = mkProbes(0, 64)
    val probesHot = mkProbes(58, 64)

    val ivfU = Similarity.buildIvf(spark, corpusU, "vec_id", "embedding", 16, 2)
    val ivfS = Similarity.buildIvf(spark, corpusS, "vec_id", "embedding", 16, 2)
    val pqU = Similarity.buildIvfPq(spark, corpusU, "vec_id", "embedding",
      16, 16, 16, 2, 2)
    val pqS = Similarity.buildIvfPq(spark, corpusS, "vec_id", "embedding",
      16, 16, 16, 2, 2)

    case class Case(name: String, uni: () => Long, skew: () => Long)
    def v15(ix: Similarity.IvfIndex, p: org.apache.spark.sql.DataFrame)() =
      Similarity.searchIvfBatch(ix, p, "probe_id", "probe_vec", 4, 10).count()
    def v16(ix: Similarity.IvfPqIndex, c: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.DataFrame, oldLayout: Boolean)() =
      Similarity.searchIvfPqBatch(spark, ix, c, "vec_id", "embedding",
        p, "probe_id", "probe_vec", 4, 8,
        repartitionByProbe = oldLayout).count()
    def lsh(c: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.DataFrame)() =
      Similarity.lshSearchBatch(c, "vec_id", "embedding",
        p, "probe_id", "probe_vec", 10).count()

    val cases = Seq(
      Case("ann_v15_mega_probe", v15(ivfU, probesU), v15(ivfS, probesU)),
      Case("ann_v15_hot_probes", v15(ivfU, probesU), v15(ivfU, probesHot)),
      Case("ann_v16_mega_probe", v16(pqU, corpusU, probesU, false),
        v16(pqS, corpusS, probesU, false)),
      Case("ann_v16_hot_probes", v16(pqU, corpusU, probesU, false),
        v16(pqU, corpusU, probesHot, false)),
      Case("ann_v16_mega_R10LAYOUT", v16(pqU, corpusU, probesU, true),
        v16(pqS, corpusS, probesU, true)),
      Case("ann_lsh_mega_probe", lsh(corpusU, probesU), lsh(corpusS, probesU)),
      Case("ann_lsh_hot_probes", lsh(corpusU, probesU), lsh(corpusU, probesHot)))
    println(f"SKEW ${"case"}%-24s uniform  skewed   ratio  rows_u -> rows_s")
    cases.foreach { c =>
      val (tu, ru) = time(c.uni)
      val (ts, rs) = time(c.skew)
      println(f"SKEW ${c.name}%-24s $tu%-8.2f $ts%-8.2f ${ts / tu}%-6.2f $ru%d -> $rs%d")
    }
  }

  /** Graph-ANN cell-axis skew (round 12) — the build surface the v18/v19
    * tiers added: `buildGraphPerCell` hands ONE task a whole cell's
    * single-threaded HNSW construction, so a mega-cell (clumped corpora
    * concentrate k-means mass; 90 % forced share here) serializes the
    * build. The plant forges 90 % of ASSIGNMENTS into one cell while
    * keeping natural vectors (clone vectors would degenerate the graph
    * itself and measure the wrong thing). Cases: the unsliced pathology,
    * the `maxSegmentSize` mitigation (hash-sliced sub-segments, each its
    * own build task), and the routed-search side over both layouts.
    * Bar: the MITIGATED build and search stay ≤ 2x their uniform
    * baselines; the unsliced row is the documented pathology.
    */
  private def runGraphStudy(spark: SparkSession, base: String, reps: Int,
      time: (() => Long) => (Double, Long)): Unit = {
    import spark.implicits._
    import graft.operators.{GraphAnn, Similarity}
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, base, "embeddings")
      .select($"vec_id", $"embedding")
    // R=32 -> 64k vectors at sf0.1: big enough that a 58k-node
    // single-task build dwarfs scheduler floors, small enough to rep
    val R = sys.env.getOrElse("SPARK_GRAFT_SKEW_GRAPH_R", "32").toInt
    val corpus = (0 until R).map(i => emb.select(
        ($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"), $"embedding"))
      .reduce(_.unionByName(_))
      .repartition(32).localCheckpoint(true)
    val n = corpus.count()
    val ivf = Similarity.buildIvf(spark, corpus, "vec_id", "embedding", 16, 2)
    val asgU = ivf.assignments.localCheckpoint(true)
    val hot = 0
    val asgS = asgU.withColumn("cell",
        when($"id" % 10 =!= 0, lit(hot)).otherwise($"cell"))
      .localCheckpoint(true)
    val cap = ((n + 31) / 32).toInt // target 32-way slice parallelism
    val efC = 32
    def build(asg: org.apache.spark.sql.DataFrame, maxSeg: Int)() =
      GraphAnn.buildGraphPerCell(spark, asg, m = 8, efConstruction = efC,
        maxSegmentSize = maxSeg).count()
    val probes = emb.filter($"vec_id" < 64)
      .select($"vec_id".cast("long").as("probe_id"),
        $"embedding".as("probe_vec")).localCheckpoint(true)
    def mkGraph(asg: org.apache.spark.sql.DataFrame, maxSeg: Int) =
      GraphAnn.buildGraphPerCell(spark, asg, m = 8, efConstruction = efC,
        maxSegmentSize = maxSeg).localCheckpoint(true)
    lazy val gU = mkGraph(asgU, Int.MaxValue)
    lazy val gS = mkGraph(asgS, Int.MaxValue)
    lazy val gSsliced = mkGraph(asgS, cap)
    def search(g: org.apache.spark.sql.DataFrame)() =
      GraphAnn.searchGraphRouted(g, ivf.centroids, probes,
        "probe_id", "probe_vec", nprobe = 4, k = 10, ef = 48).count()
    case class Case(name: String, uni: () => Long, skew: () => Long)
    val cases = Seq(
      Case("graph_build_mega_cell", build(asgU, Int.MaxValue),
        build(asgS, Int.MaxValue)),
      Case("graph_build_mega_sliced", build(asgU, Int.MaxValue),
        build(asgS, cap)),
      Case("graph_search_mega_cell", search(gU), search(gS)),
      Case("graph_search_mega_sliced", search(gU), search(gSsliced)))
    println(f"SKEW ${"case"}%-24s uniform  skewed   ratio  rows_u -> rows_s  (n=$n cap=$cap)")
    cases.foreach { c =>
      val (tu, ru) = time(c.uni)
      val (ts, rs) = time(c.skew)
      println(f"SKEW ${c.name}%-24s $tu%-8.2f $ts%-8.2f ${ts / tu}%-6.2f $ru%d -> $rs%d")
    }
  }

  /** NN-Descent hub-axis skew (round 12) — the 2-hop join's skew surface
    * is IN-degree: a near-dup clump's center sits in many nodes' top-k,
    * and pairs through it grow quadratically in its reverse neighborhood.
    * Plant: 90 % of vectors become EXACT clones of one vector — sims
    * inside the clump are all equal, so the (sim desc, id asc) heap
    * order sends every clone's top-k to the SAME k smallest-id clones,
    * whose in-degree then equals the clump size (a jittered clump does
    * NOT form hubs: picks spread and in-degree stays ~k — measured 1.07×
    * before this plant was sharpened). Cases: the uncapped pathology
    * (adjCap=MaxValue, probe-only — production always caps) vs the
    * shipped 2k cap, on both corpora. Bar: capped build ≤ 2× its uniform
    * baseline; the uncapped planted row is the documented pathology.
    */
  private def runNnStudy(spark: SparkSession, base: String, reps: Int,
      time: (() => Long) => (Double, Long)): Unit = {
    import spark.implicits._
    import graft.operators.GraphAnn
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, base, "embeddings")
      .select($"vec_id", $"embedding")
    val R = sys.env.getOrElse("SPARK_GRAFT_SKEW_NN_R", "1").toInt
    val uniform = (0 until R).map(i => emb.select(
        ($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(i * 1e-4f)).as("embedding")))
      .reduce(_.unionByName(_))
      .repartition(32).localCheckpoint(true)
    val n = uniform.count()
    val hub = emb.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    // 90% of ids become EXACT clones of the hub vector (see scaladoc)
    val planted = uniform.select($"vec_id",
        when($"vec_id" % 10 =!= 0, typedLit(hub))
          .otherwise($"embedding").as("embedding"))
      .localCheckpoint(true)
    val k = 10
    def build(df: org.apache.spark.sql.DataFrame, cap: Int)() =
      GraphAnn.nnDescent(df, "vec_id", "embedding", k, iters = 2,
        adjCap = cap).count()
    case class Case(name: String, uni: () => Long, skew: () => Long)
    val cases = Seq(
      Case("nn_build_uncapped", build(uniform, Int.MaxValue),
        build(planted, Int.MaxValue)),
      Case("nn_build_capped", build(uniform, -1), build(planted, -1)))
    println(f"SKEW ${"case"}%-24s uniform  skewed   ratio  rows_u -> rows_s  (n=$n)")
    cases.foreach { c =>
      val (tu, ru) = time(c.uni)
      val (ts, rs) = time(c.skew)
      println(f"SKEW ${c.name}%-24s $tu%-8.2f $ts%-8.2f ${ts / tu}%-6.2f $ru%d -> $rs%d")
    }
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

    // "text" = the r10 study (d2/d7/d11 + k7); "ann" = the r11 batch-ANN
    // probe-axis study; "all" runs both.
    val family = sys.env.getOrElse("SPARK_GRAFT_SKEW_FAMILY", "all")

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

    if (family == "all" || family == "ann") runAnnStudy(spark, base, reps, time)
    if (family == "all" || family == "graph") runGraphStudy(spark, base, reps, time)
    if (family == "all" || family == "nn") runNnStudy(spark, base, reps, time)
    if (family != "all" && family != "text") { spark.stop(); return }

    val skewDir = buildSkewDir(spark, base, out)

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
