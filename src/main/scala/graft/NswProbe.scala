package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphAnn, Similarity}

/** Standalone 512k NN-Descent→NSW probe: the GraphStudy leg OOM'd an
  * 8-GB executor at 512k under shuffle.partitions=32 — candidate volume
  * per partition, not total, is the wall. Measures whether partition
  * count is the knob.
  */
object NswProbe {
  def main(args: Array[String]): Unit = {
    val parts = args.headOption.getOrElse("256").toInt
    val mult = args.lift(1).getOrElse("256").toInt
    // data dir and master are args like the other study mains — the probe
    // must not silently depend on this machine's layout / core count
    val dataDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val master = args.lift(4).getOrElse("local[32]")
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, dataDir, "embeddings")
    val jitter = udf((v: Seq[Float], id: Long) =>
      v.zipWithIndex.map { case (x, i) =>
        val h = id * 2654435761L + i * 1099511628211L
        x + 0.01f * ((((h % 1009) + 1009) % 1009) - 504) / 504f
      })
    def copies(from: Int, until: Int) = emb
      .select(explode(sequence(lit(from), lit(until - 1))).as("r"), $"vec_id", $"embedding")
      .select(($"vec_id" * 2048 + $"r").as("vec_id"), $"embedding")
      .select($"vec_id", jitter($"embedding", $"vec_id").as("embedding"))
    val corpus = copies(0, mult).repartition(64).localCheckpoint(true)
    println(s"NSWPROBE corpus=${corpus.count()} shufflePartitions=$parts rho=${args.lift(2).getOrElse("0.25")}")
    val ivf0 = Similarity.buildIvf(spark, corpus, "vec_id", "embedding", nCells = 64, iters = 3)
    // checkpoint the ASSIGNMENTS USED, not a discarded copy — otherwise
    // the timed region re-runs the cell assignment (fixture, not operator)
    val assignments = ivf0.assignments.localCheckpoint(true)
    assignments.count()
    val t0 = System.nanoTime()
    val rho = args.lift(2).getOrElse("0.25").toDouble
    val slices = args.lift(5).getOrElse("1").toInt
    val knn = GraphAnn.nnDescent(corpus, "vec_id", "embedding", k = 20,
      iters = 4, sampleRate = rho, candidateSlices = slices)
    val nsw = GraphAnn.knnToNswSegments(assignments, knn, m = 8).localCheckpoint(true)
    nsw.count()
    val tB = (System.nanoTime() - t0) / 1e9
    val probes = copies(mult, mult + 1).limit(100)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec")).localCheckpoint(true)
    val truth = Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      corpus, "vec_id", "embedding", 10).localCheckpoint(true)
    def search() = GraphAnn.searchGraphRouted(nsw, ivf0.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 10, ef = 64)
      .select($"probe_id", $"id".as("vec_id"))
    search().count()
    val t1 = System.nanoTime()
    val res = search().localCheckpoint(true)
    val tS = (System.nanoTime() - t1) / 1e9
    val hit = truth.join(res, Seq("probe_id", "vec_id"), "left_semi").count()
    val denom = truth.count().toDouble
    println(f"NSWPROBE knn_nsw build=$tB%.1f s search=$tS%.2f s recall=${hit / denom}%.3f")
    spark.stop()
  }
}
