package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, Similarity}

/** Head-to-head study: the partitioned graph-ANN tier vs the shipped IVF
  * and IVF-PQ tiers on a jittered-replica corpus (default 64× embeddings
  * = 128k vectors at sf0.1's 2000 × 64-dim), measuring BUILD wall time,
  * BATCH-SEARCH wall time, and recall@10 against the brute-force truth
  * for the same 100 held-out probes. Feeds SCALING.md "Graph-ANN study
  * (round 12)" — the honest verdict on whether layered-graph construction
  * earns a place next to IVF-PQ at 100 TB.
  *
  * SPARK_GRAFT_STUDY_MULT  corpus replicas (default 64)
  * SPARK_GRAFT_SF_DIR      base tables (default /root/testdata/sf0.1)
  */
object GraphStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STUDY_MULT", "64").toInt
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

    val emb = Tables.load(spark, sfDir, "embeddings")
    // per-(id, dim) hash jitter: every replica is a UNIQUE vector, so the
    // brute-force top-10 is tie-free and recall against it is well-defined
    // (a per-replica pattern with few distinct values leaves each vector
    // dozens of exact duplicates and turns "truth" into an id tie-break)
    val jitter = udf((v: Seq[Float], id: Long) =>
      v.zipWithIndex.map { case (x, i) =>
        val h = id * 2654435761L + i * 1099511628211L
        x + 0.01f * ((((h % 1009) + 1009) % 1009) - 504) / 504f
      })
    def copies(from: Int, until: Int) = emb
      .select(explode(sequence(lit(from), lit(until - 1))).as("r"),
        $"vec_id", $"embedding")
      .select(($"vec_id" * 2048 + $"r").as("vec_id"), $"embedding")
      .select($"vec_id", jitter($"embedding", $"vec_id").as("embedding"))
    val corpus = copies(0, mult).repartition(32).localCheckpoint(true)
    val nCorpus = corpus.count()
    val probes = copies(mult, mult + 1).limit(100)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
      .localCheckpoint(true)
    val nProbes = probes.count()
    println(s"GRAPHSTUDY corpus=$nCorpus probes=$nProbes")

    def time[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def recallOf(approx: DataFrame, truth: DataFrame): Double = {
      val hit = truth.join(approx, Seq("probe_id", "vec_id"), "left_semi").count()
      hit.toDouble / (nProbes * 10)
    }

    val (truth, tBrute) = time {
      Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
        corpus, "vec_id", "embedding", 10).localCheckpoint(true)
    }
    println(f"GRAPHSTUDY brute_truth      search=$tBrute%.2f s (the exact baseline)")

    // ---- graph tier
    val (nodes, tGB) = time {
      GraphAnn.buildGraph(spark, corpus, "vec_id", "embedding",
        nParts = 32, m = 8, efConstruction = 64).localCheckpoint(true)
    }
    def graphSearch() = GraphAnn.searchGraphBatch(nodes, probes,
      "probe_id", "probe_vec", k = 10, ef = 64)
      .select($"probe_id", $"id".as("vec_id"))
    graphSearch().count() // warm
    val (gRes, tGS) = time { graphSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY graph(m=8,ef=64) build=$tGB%.2f s search=$tGS%.2f s recall=${recallOf(gRes, truth)}%.3f")
    // ef sensitivity: the replica corpus puts every probe inside a clump of
    // `mult` near-tied clones — the regime where the beam must be wider
    // than the clump to separate the true top-10 from its ties
    def graphSearchWide() = GraphAnn.searchGraphBatch(nodes, probes,
      "probe_id", "probe_vec", k = 10, ef = 4 * mult)
      .select($"probe_id", $"id".as("vec_id"))
    graphSearchWide().count() // warm
    val (gwRes, tGW) = time { graphSearchWide().localCheckpoint(true) }
    println(f"GRAPHSTUDY graph(ef=${4 * mult}%-5d) build=   -    search=$tGW%.2f s recall=${recallOf(gwRes, truth)}%.3f")

    // ---- IVF tier
    val (ivf, tIB) = time {
      val ix = Similarity.buildIvf(spark, corpus, "vec_id", "embedding",
        nCells = 64, iters = 3)
      // keep the CHECKPOINTED assignments (a discarded checkpoint would
      // make every downstream leg re-run the cell assignment inside ITS
      // timed region — fixture cost, not operator cost)
      val asg = ix.assignments.localCheckpoint(true)
      asg.count()
      ix.copy(assignments = asg)
    }
    def ivfSearch() = Similarity.searchIvfBatch(ivf, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 10)
      .select($"probe_id", $"id".as("vec_id"))
    ivfSearch().count() // warm
    val (iRes, tIS) = time { ivfSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY ivf(64c,np=8)    build=$tIB%.2f s search=$tIS%.2f s recall=${recallOf(iRes, truth)}%.3f")

    // ---- cell-routed graph (per-cell graphs over the IVF assignment,
    // probes visit only their nprobe routed cells — the composition the
    // study's verdict points at; reuses the IVF index built above)
    val (cellNodes, tRB) = time {
      GraphAnn.buildGraphPerCell(spark, ivf.assignments,
        m = 8, efConstruction = 64).localCheckpoint(true)
    }
    def routedSearch() = GraphAnn.searchGraphRouted(cellNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", nprobe = 8, k = 10, ef = 64)
      .select($"probe_id", $"id".as("vec_id"))
    routedSearch().count() // warm
    val (rRes, tRS) = time { routedSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY routed(np=8)     build=$tRB%.2f s search=$tRS%.2f s recall=${recallOf(rRes, truth)}%.3f")

    // ---- NN-Descent → NSW composition (r13 closure of "wire v22 into
    // serving"): the global k-NN graph converts to per-cell single-layer
    // NSW adjacency and serves through the same routed path. Build cost
    // is NN-Descent's all-to-all candidate shuffle + the conversion —
    // fully distributed (no per-cell sequential insertion), the trade
    // the study prices against buildGraphPerCell's one-task-per-cell.
    val (nswNodes, tNB) = time {
      val knn = GraphAnn.nnDescent(corpus, "vec_id", "embedding",
        k = 20, iters = 4)
      GraphAnn.knnToNswSegments(ivf.assignments, knn, m = 8)
        .localCheckpoint(true)
    }
    def nswSearch() = GraphAnn.searchGraphRouted(nswNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", nprobe = 8, k = 10, ef = 64)
      .select($"probe_id", $"id".as("vec_id"))
    nswSearch().count() // warm
    val (nRes, tNS) = time { nswSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY knn_nsw(np=8)    build=$tNB%.2f s search=$tNS%.2f s recall=${recallOf(nRes, truth)}%.3f")

    // ---- IVF-PQ tier
    val (ivfpq, tPB) = time {
      Similarity.buildIvfPq(spark, corpus, "vec_id", "embedding",
        nCells = 64, subspaces = 8, codesPerSub = 16)
    }
    def pqSearch() = Similarity.searchIvfPqBatch(spark, ivfpq,
      corpus, "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 8, k = 10)
      .select($"probe_id", $"id".as("vec_id"))
    pqSearch().count() // warm
    val (pRes, tPS) = time { pqSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY ivfpq(8x16)      build=$tPB%.2f s search=$tPS%.2f s recall=${recallOf(pRes, truth)}%.3f")

    // ---- PQ-routed graph (r12 closure of the study's last upgrade):
    // per-cell graphs over the IVF-PQ index storing ONLY the 8-byte
    // residual codes, beams on ADC scores, exact rerank of survivors —
    // the full DiskANN memory layout. Reuses the IVF-PQ index above.
    val (pqNodes, tQB) = time {
      GraphAnn.buildGraphPerCellPq(spark, corpus, "vec_id", "embedding",
        ivfpq, m = 8, efConstruction = 64).localCheckpoint(true)
    }
    def pqRoutedSearch() = GraphAnn.searchGraphRoutedPq(pqNodes, ivfpq,
      corpus, "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 8, k = 10, ef = 64)
      .select($"probe_id", $"id".as("vec_id"))
    pqRoutedSearch().count() // warm
    val (qRes, tQS) = time { pqRoutedSearch().localCheckpoint(true) }
    println(f"GRAPHSTUDY pq_routed(np=8)  build=$tQB%.2f s search=$tQS%.2f s recall=${recallOf(qRes, truth)}%.3f")
    // clump sensitivity: in the replica-clump regime ADC noise inside a
    // clump is larger than the true-neighbor gaps, so BOTH the beam and
    // the rerank cut must out-width the clump (ef and k·rerankFactor >
    // mult) for the exact rerank to see the true top-10 at all
    def pqRoutedWide() = GraphAnn.searchGraphRoutedPq(pqNodes, ivfpq,
      corpus, "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 8, k = 10, ef = 4 * mult, rerankFactor = mult / 2)
      .select($"probe_id", $"id".as("vec_id"))
    pqRoutedWide().count() // warm
    val (qwRes, tQW) = time { pqRoutedWide().localCheckpoint(true) }
    println(f"GRAPHSTUDY pq_routed(ef=${4 * mult}%d,rf=${mult / 2}%d) build=   -    search=$tQW%.2f s recall=${recallOf(qwRes, truth)}%.3f")
    // stored bytes per node: codes + adjacency vs float vectors + adjacency
    val dim = emb.select($"embedding").head().getSeq[Float](0).length
    val bytesPq = pqNodes.select(
      (length($"codes") + expr("aggregate(transform(neighbors, l -> size(l) * 8), 0, (a, x) -> a + x)")).as("b"))
      .agg(avg($"b")).head().getDouble(0)
    println(f"GRAPHSTUDY pq_routed storage: avg ${bytesPq}%.0f B/node vs float-graph ${dim * 4 + bytesPq - 8}%.0f B/node")

    spark.stop()
  }
}
