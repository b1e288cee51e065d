package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphAnn, Similarity}

/** The v37 scale claim measured directly: a FIXED-SIZE drifted batch
  * against a GROWING corpus — rebuild rows and wall must track the
  * drifted region (members of the tripped cells + the batch), not the
  * corpus. The v37 gate itself can't show this (its batch grows with
  * the replica corpus by construction); this probe pins the batch at
  * `batchRows` and walks the replica ladder.
  *
  * Usage: runMain graft.PartialRebuildProbe [batchRows] [dir1 dir2 ...]
  * Defaults: 256 rows; /root/testdata/sf0.1 + /tmp/graft_scale/x{2,4,8}
  * (generate with ScaleProbe). Prints one line per dir:
  * corpus rows, tripped cells, region rows, appended remainder, jobs,
  * wall — the claim holds when the last four stay ~flat as corpus × 8.
  */
object PartialRebuildProbe {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.getOrElse("256").toInt
    val dirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale/x2",
        "/tmp/graft_scale/x4", "/tmp/graft_scale/x8")
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    println(f"${"dir"}%-28s ${"corpus"}%8s ${"tripped"}%8s ${"region"}%8s " +
      f"${"rest"}%6s ${"jobs"}%5s ${"sec"}%7s")
    dirs.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val base = emb.select($"vec_id", $"embedding").localCheckpoint(true)
      val nBase = base.count()
      // deployment state (built outside the timed region): index, graph,
      // reference, published root — the probe times the RESPONSE only
      val ix = Similarity.buildIvfPq(spark, base, "vec_id", "embedding",
        nCells = 16, subspaces = 8, codesPerSub = 16, ivfIters = 2,
        pqIters = 2)
      val nodes = GraphAnn.buildGraphPerCellPq(spark, base, "vec_id",
        "embedding", ix, m = 8, efConstruction = 48).localCheckpoint(true)
      val ref = Similarity.driftStats(spark, base.select($"embedding"),
        "embedding", ix.centroids, unit = true)
      val root = java.nio.file.Files.createTempDirectory("graft-prp").toString
      GraphAnn.publishPqServing(nodes, ix, root,
        Some(GraphAnn.pqClumpBound(nodes)), Some(ref))
      // the SAME drifted batch at every scale: first batchRows vec_ids,
      // +0.5/dim (v36's mode-preserving plant), ids offset past any
      // replica's key space
      val batch = emb.orderBy($"vec_id").limit(batchRows)
        .select(($"vec_id" + 900000000L).as("vec_id"),
          expr("transform(embedding, x -> x + 0.5f)").as("embedding"))
        .localCheckpoint(true)
      val corpus = base.unionByName(batch).localCheckpoint(true)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val res = GraphAnn.rebuildDriftedPqServing(spark, root, corpus,
        "vec_id", "embedding", batch, "vec_id", "embedding",
        splitFactor = 2, ivfIters = 2, m = 8, efConstruction = 48)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events dispatch async — drain before reading the count,
      // or late onJobStart events undercount the headline jobs column
      ListenerDrain.drain(spark)
      spark.sparkContext.removeSparkListener(listener)
      res match {
        case Some(r) =>
          println(f"$d%-28s $nBase%8d ${r.tripped.length}%8d " +
            f"${r.regionRows}%8d ${r.restRows}%6d ${jobs.get()}%5d $wall%7.2f")
        case None =>
          println(f"$d%-28s $nBase%8d   no-trip (batch read in-distribution)")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
    spark.stop()
  }
}
