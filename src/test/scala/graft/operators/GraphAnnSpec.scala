package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Partitioned HNSW-style graph tier: structural invariants (degree caps,
  * segment-closed adjacency, node conservation), determinism of the
  * build, recall against brute force, and batch/single equality.
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 6
  private lazy val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
  private lazy val nodes = GraphAnn.buildGraph(spark, emb, "vec_id", "embedding",
    nParts = 4, m = M, efConstruction = 48).localCheckpoint(true)

  test("every corpus vector becomes exactly one node; levels follow the hash") {
    val n = emb.count()
    assert(nodes.count() == n)
    assert(nodes.select("id").distinct().count() == n)
    val mismatched = nodes.as[GraphNode].collect()
      .count(gn => gn.level != GraphAnn.levelOf(gn.id, M) ||
        gn.neighbors.length != gn.level + 1)
    assert(mismatched == 0, "stored level must equal the deterministic hash level")
  }

  test("adjacency respects the degree caps and never crosses a partition") {
    val gs = nodes.as[GraphNode].collect()
    val partOf = gs.map(g => g.id -> g.part).toMap
    gs.foreach { g =>
      g.neighbors.zipWithIndex.foreach { case (layer, l) =>
        val cap = if (l == 0) 2 * M else M
        assert(layer.length <= cap, s"node ${g.id} layer $l degree ${layer.length} > $cap")
        assert(layer.forall(nb => partOf(nb) == g.part),
          s"node ${g.id} has a cross-partition edge")
        assert(!layer.contains(g.id), s"node ${g.id} has a self-loop")
      }
    }
  }

  test("the build is deterministic — a rebuild is edge-identical") {
    val again = GraphAnn.buildGraph(spark, emb, "vec_id", "embedding",
      nParts = 4, m = M, efConstruction = 48)
    def flat(df: org.apache.spark.sql.DataFrame) = df.as[GraphNode].collect()
      .map(g => (g.id, g.level, g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq
    assert(flat(nodes) == flat(again))
  }

  test("beam search recalls the brute-force top-10 (self-probe finds itself first)") {
    val probe = emb.filter($"vec_id" === 7)
      .select($"embedding").head().getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val got = GraphAnn.searchGraph(nodes, probe, k = 10, ef = 48)
      .orderBy($"rank").collect()
    assert(got.head.getLong(0) == 7L, "the probe's own vector must rank first")
    val recall = got.map(_.getLong(0)).count(exact)
    assert(recall >= 8, s"recall@10 fell to $recall/10")
  }

  test("batch search equals the single-probe path probe-for-probe") {
    val probes = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val batch = GraphAnn.searchGraphBatch(nodes, probes, "probe_id", "probe_vec",
        k = 5, ef = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    val singles = (0L until 6L).flatMap { q =>
      val p = emb.filter($"vec_id" === q)
        .select($"embedding").head().getSeq[Float](0).toArray
      GraphAnn.searchGraph(nodes, p, k = 5, ef = 32)
        .orderBy($"rank").collect()
        .map(r => (q, r.getLong(0), r.getInt(2)))
    }.sortBy(t => (t._1, t._3))
    assert(batch.length == singles.length)
    assert(batch.sameElements(singles))
  }

  test("nnDescent: k edges per node, no self-loops, deterministic, monotone, high recall") {
    // k=20 is the paper's operating regime: neighbor-of-neighbor
    // exploration needs width on high-intrinsic-dimension data (measured
    // here: k=5 plateaus at 0.37 recall, k=10 at 0.85, k=20 reaches
    // 0.992 by iteration 4 — truncate a k=20 build for smaller k)
    val k = 20
    val g1 = GraphAnn.nnDescent(emb, "vec_id", "embedding", k, iters = 1)
      .localCheckpoint(true)
    val g4 = GraphAnn.nnDescent(emb, "vec_id", "embedding", k, iters = 4)
      .localCheckpoint(true)
    val n = emb.count()
    val rows = g4.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == n * k, "exactly k edges per node")
    assert(rows.forall(t => t._1 != t._2), "no self-loops")
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    // determinism
    val again = GraphAnn.nnDescent(emb, "vec_id", "embedding", k, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq)
    // monotone: each node's worst kept sim can only improve with iterations
    def worst(g: Array[(Long, Long, Double)]) =
      g.groupBy(_._1).map { case (id, es) => id -> es.map(_._3).min }
    val w1 = worst(g1.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    val w4 = worst(rows)
    w4.foreach { case (id, w) => assert(w >= w1(id) - 1e-12,
      s"node $id got worse with more iterations") }
    // recall vs exact k-NN (self excluded from the exact side)
    val exact = Similarity.topKPerProbe(
        emb.select($"vec_id".as("probe_id"), $"embedding".as("probe_vec")),
        "probe_id", "probe_vec", emb, "vec_id", "embedding", k + 1)
      .filter($"probe_id" =!= $"vec_id")
      .select($"probe_id", $"vec_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, es) => id -> es.map(_._2).take(k).toSet }
    val gotBy = rows.groupBy(_._1).map { case (id, es) => id -> es.map(_._2).toSet }
    val recall = exact.map { case (id, ex) =>
      (gotBy(id) & ex).size.toDouble / ex.size }.sum / exact.size
    assert(recall >= 0.95, f"mean k-NN graph recall $recall%.3f below floor")
  }

  test("nnDescent sliced candidate generation is edge-identical to unsliced") {
    // candidateSlices bounds PEAK candidate volume (the 512k rho=1 OOM
    // fix); top-k folding under the deterministic (sim desc, id asc)
    // order is an associative merge, so slicing must change NOTHING
    val k = 10
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val whole = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k, iters = 2))
    val sliced = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, candidateSlices = 4))
    assert(sliced == whole, "sliced build diverged from the unsliced build")
    // and with rho-sampling on top (the thin filter is per-row, so it
    // commutes with slicing)
    val wholeR = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, sampleRate = 0.5))
    val slicedR = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, sampleRate = 0.5, candidateSlices = 3))
    assert(slicedR == wholeR, "sliced+sampled build diverged")
    // the carried-sims fold (the corpus-scale path: known pairs re-enter
    // the fold with stored sims instead of re-joining the vector table)
    // is edge-identical on every combination — cosine is deterministic,
    // so a carried sim equals a recomputed one bit-for-bit
    val carried = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, foldCarriedSims = Some(true)))
    assert(carried == whole, "carried-sims fold diverged (unsliced)")
    val carriedS = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, candidateSlices = 4, foldCarriedSims = Some(true)))
    assert(carriedS == whole, "carried-sims fold diverged (sliced)")
    val carriedR = flat(GraphAnn.nnDescent(emb, "vec_id", "embedding", k,
      iters = 2, sampleRate = 0.5, candidateSlices = 3,
      foldCarriedSims = Some(true)))
    assert(carriedR == wholeR, "carried-sims fold diverged (sliced+sampled)")
  }

  test("orphaned directed components are still found (multi-entry roots)") {
    // hand-crafted segment: node 4 points INTO the graph but nothing
    // points at it — pruning produces exactly this shape at scale, and a
    // beam seeded only at the entry can never reach it at any ef
    def v(x: Float, y: Float) = {
      val n = math.sqrt(x * x + y * y).toFloat
      Array(x / n, y / n)
    }
    val ns = Seq(
      GraphNode(0, 1L, v(1f, 0f), 1, Array(Array(2L), Array.empty[Long])),
      GraphNode(0, 2L, v(0.9f, 0.1f), 0, Array(Array(1L, 3L))),
      GraphNode(0, 3L, v(0.8f, 0.2f), 0, Array(Array(1L, 2L))),
      GraphNode(0, 4L, v(-1f, 0.05f), 0, Array(Array(1L))))
    // builders emit a part's nodes co-located; a hand-built DF must too
    val nodesDf = spark.createDataset(ns).toDF().coalesce(1)
    val probes = Seq((9L, v(-1f, 0.05f))).toDF("probe_id", "probe_vec")
    val got = GraphAnn.searchGraphBatch(nodesDf, probes, "probe_id",
      "probe_vec", k = 4, ef = 4).orderBy($"rank").collect()
    assert(got.length == 4, "full beam must cover the orphan too")
    assert(got.head.getLong(1) == 4L,
      "the orphan is the probe's own vector and must rank first")
  }

  test("append: existing segments byte-identical, batch lands in fresh parts, search exact at full beam") {
    val existingCorpus = emb.filter($"vec_id" % 2 === 0)
    val batchCorpus = emb.filter($"vec_id" % 2 === 1)
    val existing = GraphAnn.buildGraph(spark, existingCorpus, "vec_id",
      "embedding", nParts = 3, m = M, efConstruction = 48).localCheckpoint(true)
    val appended = GraphAnn.appendSegments(existing, batchCorpus, "vec_id",
      "embedding", nParts = 2, m = M, efConstruction = 48).localCheckpoint(true)
    def flat(df: org.apache.spark.sql.DataFrame) = df.as[GraphNode].collect()
      .map(g => (g.id, g.part, g.seg, g.level, g.vec.toSeq,
        g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq
    val oldMax = existing.agg(max($"part")).head().getInt(0)
    val (oldRows, newRows) = flat(appended).partition(_._2 <= oldMax)
    assert(oldRows == flat(existing), "append must not touch existing segments")
    val batchIds = batchCorpus.select($"vec_id".cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(newRows.map(_._1).toSet == batchIds, "every batch id in a fresh part")
    assert(newRows.forall(_._2 > oldMax))
    // adjacency of fresh segments closed over their own (part, seg)
    val segOf = newRows.map(r => r._1 -> (r._2, r._3)).toMap
    newRows.foreach { r => r._6.foreach(_.foreach(nb =>
      assert(segOf(nb) == ((r._2, r._3))))) }
    // exhaustive beams over the union reproduce brute force on the union
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = top(GraphAnn.searchGraphBatch(appended, probes,
      "probe_id", "probe_vec", k = 5, ef = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("merge: small segments pack deterministically, big ones pass byte-identical, search exact") {
    val many = GraphAnn.buildGraph(spark, emb, "vec_id", "embedding",
      nParts = 8, m = M, efConstruction = 48).localCheckpoint(true)
    val n = emb.count().toInt
    val target = n / 2
    val merged = GraphAnn.mergeSegments(many, target, m = M,
      efConstruction = 48, withinPart = false).localCheckpoint(true)
    val gs = merged.as[GraphNode].collect()
    assert(gs.length == n, "node conservation")
    assert(gs.map(_.id).distinct.length == n)
    val segsBefore = many.select($"part", $"seg").distinct().count()
    val segsAfter = merged.select($"part", $"seg").distinct().count()
    assert(segsAfter < segsBefore, s"merge must reduce segments ($segsBefore -> $segsAfter)")
    // adjacency closed over the merged segments
    val segOf = gs.map(g => g.id -> (g.part, g.seg)).toMap
    gs.foreach(g => g.neighbors.foreach(_.foreach(nb =>
      assert(segOf(nb) == ((g.part, g.seg))))))
    // at-target segments pass through untouched
    val bigBefore = many.as[GraphNode].collect().groupBy(_.part)
      .filter(_._2.length >= target)
    bigBefore.foreach { case (p, ns) =>
      val after = gs.filter(_.part == p)
      assert(after.map(g => (g.id, g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq ==
        ns.map(g => (g.id, g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq)
    }
    // determinism
    val again = GraphAnn.mergeSegments(many, target, m = M,
      efConstruction = 48, withinPart = false)
    def flat(df: org.apache.spark.sql.DataFrame) = df.as[GraphNode].collect()
      .map(g => (g.id, g.part, g.seg, g.neighbors.map(_.toSeq).toSeq))
      .sortBy(_._1).toSeq
    assert(flat(merged) == flat(again))
    // exhaustive beams over the merged layout still reproduce brute force
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = top(GraphAnn.searchGraphBatch(merged, probes,
      "probe_id", "probe_vec", k = 5, ef = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  private lazy val ivf = Similarity.buildIvf(spark, emb, "vec_id", "embedding",
    nCells = 8, iters = 2)
  private lazy val cellNodes = GraphAnn.buildGraphPerCell(spark,
    ivf.assignments, m = M, efConstruction = 48).localCheckpoint(true)

  test("per-cell graphs: part is the cell, adjacency stays inside it") {
    val cellOf = ivf.assignments.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gs = cellNodes.as[GraphNode].collect()
    assert(gs.length == cellOf.size)
    gs.foreach { g =>
      assert(g.part == cellOf(g.id), s"node ${g.id} stored under part ${g.part}")
      g.neighbors.foreach(layer => layer.foreach(nb =>
        assert(cellOf(nb) == g.part, s"edge ${g.id}->$nb leaves cell ${g.part}")))
    }
  }

  test("routed search touches only the probed cells") {
    val probe = emb.filter($"vec_id" === 11)
      .select($"embedding").head().getSeq[Float](0).toArray
    val nprobe = 3
    val probed = GraphAnn.routeCells(ivf.centroids, probe, nprobe).toSet
    assert(probed.size == nprobe)
    val got = GraphAnn.searchGraphRouted(cellNodes, ivf.centroids,
      Seq((0L, probe)).toDF("probe_id", "probe_vec"),
      "probe_id", "probe_vec", nprobe, k = 10, ef = 48).collect()
    val cellOf = ivf.assignments.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach(r => assert(probed.contains(cellOf(r.getLong(1))),
      s"result ${r.getLong(1)} came from an un-probed cell"))
  }

  test("appendSegments onto an empty graph is the initial build (no NPE)") {
    val empty = nodes.filter($"part" < -1)
    val appended = GraphAnn.appendSegments(empty, emb.limit(20), "vec_id",
      "embedding", nParts = 2, m = M, efConstruction = 48)
    assert(appended.count() == 20)
    assert(appended.agg(min($"part")).head().getInt(0) >= 0)
  }

  test("withinPart merge packs a cell's slices but never crosses cells (routing preserved)") {
    val cap = 24
    val sliced = GraphAnn.buildGraphPerCell(spark, ivf.assignments, m = M,
      efConstruction = 48, maxSegmentSize = cap).localCheckpoint(true)
    val merged = GraphAnn.mergeSegments(sliced, targetNodesPerSegment = 1000,
      m = M, efConstruction = 48, withinPart = true).localCheckpoint(true)
    val cellOf = ivf.assignments.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gs = merged.as[GraphNode].collect()
    assert(gs.length == cellOf.size, "node conservation")
    gs.foreach(g => assert(g.part == cellOf(g.id),
      s"node ${g.id} left its cell: part ${g.part} vs cell ${cellOf(g.id)}"))
    val segsBefore = sliced.select($"part", $"seg").distinct().count()
    val segsAfter = merged.select($"part", $"seg").distinct().count()
    assert(segsAfter < segsBefore, s"slices must merge ($segsBefore -> $segsAfter)")
    // routed search over the merged layout still finds everything exactly
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = top(GraphAnn.searchGraphRouted(merged, ivf.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 5, ef = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("persisted cell layout: pruned read, results identical to in-memory routed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-graphcells").toString
    GraphAnn.writeGraphCells(cellNodes, dir)
    val probes = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val mem = flat(GraphAnn.searchGraphRouted(cellNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", nprobe = 3, k = 6, ef = 48))
    val disk = flat(GraphAnn.searchGraphRoutedPersisted(spark, dir,
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 3, k = 6,
      ef = 48))
    assert(disk.sameElements(mem), "persisted path must be row-identical")
    // the pruned read plans a PartitionFilters predicate on `part`
    val probed = probes.select($"probe_vec").as[Array[Float]].collect()
      .flatMap(v => Similarity.nearestCells(ivf.centroids, v, 3)).distinct.toSeq
    val pruned = spark.read.parquet(dir).filter($"part".isin(probed: _*))
    val p = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("part#"),
      "part IN (...) must land in PartitionFilters:\n" + p.take(1500))
    assert(p.contains("part") && probed.nonEmpty)
    val rm = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try rm.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally rm.close()
  }

  test("routing to every cell equals the un-routed sweep of the same index") {
    val probes = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val routedAll = flat(GraphAnn.searchGraphRouted(cellNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", nprobe = 8, k = 6, ef = 48))
    val swept = flat(GraphAnn.searchGraphBatch(cellNodes, probes,
      "probe_id", "probe_vec", k = 6, ef = 48))
    assert(routedAll.length == swept.length)
    assert(routedAll.sameElements(swept))
  }

  test("sliced build: oversized cells split into seg-closed sub-segments") {
    val cap = 24
    val sliced = GraphAnn.buildGraphPerCell(spark, ivf.assignments, m = M,
      efConstruction = 48, maxSegmentSize = cap).localCheckpoint(true)
    val cellCounts = ivf.assignments.groupBy($"cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val gs = sliced.as[GraphNode].collect()
    assert(gs.length == cellCounts.values.sum, "node conservation")
    val segOf = gs.map(g => g.id -> (g.part, g.seg)).toMap
    gs.foreach(g => g.neighbors.foreach(layer => layer.foreach(nb =>
      assert(segOf(nb) == ((g.part, g.seg)),
        s"edge ${g.id}->$nb crosses sub-segment ${(g.part, g.seg)}"))))
    gs.groupBy(_.part).foreach { case (cell, ns) =>
      val expected = ((cellCounts(cell) + cap - 1) / cap).toInt
      val segs = ns.map(_.seg).toSet
      if (expected == 1) assert(segs == Set(0), s"cell $cell should be unsliced")
      else assert(segs == (0 until expected).toSet,
        s"cell $cell: segs $segs, expected $expected slices")
    }
    // determinism: a sliced rebuild is edge-identical
    val again = GraphAnn.buildGraphPerCell(spark, ivf.assignments, m = M,
      efConstruction = 48, maxSegmentSize = cap)
    def flat(df: org.apache.spark.sql.DataFrame) = df.as[GraphNode].collect()
      .map(g => (g.id, g.seg, g.level, g.neighbors.map(_.toSeq).toSeq))
      .sortBy(_._1).toSeq
    assert(flat(sliced) == flat(again))
    // full fan-out + whole-slice beams: one beam per SUB-segment (not one
    // per cell) must recover the exact brute-force top-k
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = top(GraphAnn.searchGraphRouted(sliced, ivf.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 5, ef = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  private lazy val ivfPq = Similarity.buildIvfPq(spark, emb, "vec_id",
    "embedding", nCells = 8, subspaces = 8, codesPerSub = 16,
    ivfIters = 2, pqIters = 2)
  private lazy val pqNodes = GraphAnn.buildGraphPerCellPq(spark, emb,
    "vec_id", "embedding", ivfPq, m = M, efConstruction = 48)
    .localCheckpoint(true)

  test("PQ graph: nodes store only the code word, cell-closed, deterministic") {
    val cellOf = ivfPq.coded.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gs = pqNodes.as[GraphAnn.PqGraphNode].collect()
    assert(gs.length == cellOf.size)
    gs.foreach { g =>
      assert(g.codes.length == 8, s"node ${g.id} stores ${g.codes.length} B")
      assert(g.part == cellOf(g.id))
      g.neighbors.foreach(layer => layer.foreach(nb =>
        assert(cellOf(nb) == g.part, s"edge ${g.id}->$nb leaves cell ${g.part}")))
    }
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.as[GraphAnn.PqGraphNode].collect()
        .map(g => (g.id, g.level, g.codes.toSeq,
          g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq
    val again = GraphAnn.buildGraphPerCellPq(spark, emb, "vec_id",
      "embedding", ivfPq, m = M, efConstruction = 48)
    assert(flat(pqNodes) == flat(again))
  }

  test("routed PQ search: full fan-out + exhaustive rerank recovers exact top-k") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    // nprobe = all cells, beam covers each whole cell, rerank keeps the
    // full candidate set — stage 2's exact cosine must then reproduce
    // brute force row for row (ids, sims and ranks)
    val got = GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb, "vec_id",
        "embedding", probes, "probe_id", "probe_vec", nprobe = 8, k = 5,
        ef = n, rerankFactor = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val exact = Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
        emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.length == exact.length)
    assert(got.sameElements(exact))
  }

  test("routed PQ search touches only the probed cells") {
    val probe = emb.filter($"vec_id" === 11)
      .select($"embedding").head().getSeq[Float](0).toArray
    val nprobe = 3
    val probed = Similarity.probedCells(ivfPq, probe, nprobe).toSet
    assert(probed.size == nprobe)
    val cellOf = ivfPq.coded.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb, "vec_id",
      "embedding", Seq((0L, probe)).toDF("probe_id", "probe_vec"),
      "probe_id", "probe_vec", nprobe, k = 5, ef = 32).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(probed.contains(cellOf(r.getLong(1))),
      s"result ${r.getLong(1)} came from an un-probed cell"))
  }

  test("sliced PQ build: sub-segments closed, exhaustive search still exact") {
    val cap = 24
    val sliced = GraphAnn.buildGraphPerCellPq(spark, emb, "vec_id",
      "embedding", ivfPq, m = M, efConstruction = 48, maxSegmentSize = cap)
      .localCheckpoint(true)
    val gs = sliced.as[GraphAnn.PqGraphNode].collect()
    assert(gs.length == emb.count())
    assert(gs.exists(_.seg > 0), "cap 24 over ~60-node cells must slice")
    val segOf = gs.map(g => g.id -> (g.part, g.seg)).toMap
    gs.foreach(g => g.neighbors.foreach(layer => layer.foreach(nb =>
      assert(segOf(nb) == ((g.part, g.seg))))))
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val got = top(GraphAnn.searchGraphRoutedPq(sliced, ivfPq, emb, "vec_id",
      "embedding", probes, "probe_id", "probe_vec", nprobe = 8, k = 5,
      ef = n, rerankFactor = n))
    val exact = top(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("search ranks are dense from 1 and sims non-increasing") {
    val probe = emb.filter($"vec_id" === 3)
      .select($"embedding").head().getSeq[Float](0).toArray
    val rows = GraphAnn.searchGraph(nodes, probe, k = 8, ef = 32)
      .orderBy($"rank").collect()
    assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length))
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  // ------------------------------------------ filtered search (v24) ----

  private def topIds(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))

  test("filtered keystone: exhaustive filtered beams = brute force over the allowed subset") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id".as("id"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRoutedFiltered(cellNodes,
      ivf.centroids, probes, "probe_id", "probe_vec", allowed,
      nprobe = 8, k = 5, ef = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb.filter($"vec_id" % 3 === 0), "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact),
      "all cells probed + full ef must reproduce the filtered brute force")
  }

  test("selective filter can't starve top-k; empty intersection returns empty, not error") {
    val probes = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    // 5 allowed ids anywhere in the corpus: all 5 must surface per probe
    // even at serving-width ef (the result heap only holds allowed nodes)
    val five = emb.filter($"vec_id".isin(3L, 97L, 211L, 404L, 555L))
      .select($"vec_id".as("id"))
    val nFive = five.count().toInt
    val got = GraphAnn.searchGraphRoutedFiltered(cellNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", five, nprobe = 8, k = 10, ef = 16)
      .collect()
    val gotIds = got.map(_.getLong(1)).toSet
    assert(got.length == 2 * nFive, s"wanted 2×$nFive rows, got ${got.length}")
    assert(gotIds == five.collect().map(_.getLong(0)).toSet)
    // allowed ∩ corpus = ∅ — no rows, no crash
    val none = spark.range(1).select((col("id") + 1000000L).as("id"))
    assert(GraphAnn.searchGraphRoutedFiltered(cellNodes, ivf.centroids,
      probes, "probe_id", "probe_vec", none, nprobe = 8, k = 10,
      ef = 16).count() == 0L)
  }

  // ------------------------------------------ delete lifecycle (v25) ----

  test("tombstone mask: exhaustive masked beams = brute force over the survivors") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val tombs = emb.filter($"vec_id" % 4 === 1).select($"vec_id".as("id"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphBatch(nodes, probes, "probe_id",
      "probe_vec", k = 5, ef = n, tombstones = Some(tombs)))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb.filter($"vec_id" % 4 =!= 1), "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
    // the routed tier masks identically
    val gotRouted = topIds(GraphAnn.searchGraphRouted(cellNodes,
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 8, k = 5,
      ef = n, tombstones = Some(tombs)))
    assert(gotRouted.sameElements(exact))
  }

  test("filter and tombstone mask compose on both tiers: emit = allowed AND live") {
    val probes = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id".as("id"))
    val tombs = emb.filter($"vec_id" % 6 === 0).select($"vec_id".as("id"))
    val n = emb.count().toInt
    // allowed minus deleted = multiples of 3 that aren't multiples of 6
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb.filter($"vec_id" % 3 === 0 && $"vec_id" % 6 =!= 0),
      "vec_id", "embedding", k = 5))
    val got = topIds(GraphAnn.searchGraphRoutedFiltered(cellNodes,
      ivf.centroids, probes, "probe_id", "probe_vec", allowed,
      nprobe = 8, k = 5, ef = n, tombstones = Some(tombs)))
    assert(got.sameElements(exact), "exact tier: filtered+masked = brute force")
    val gotPq = topIds(GraphAnn.searchGraphRoutedPqFiltered(pqNodes, ivfPq,
      emb, "vec_id", "embedding", probes, "probe_id", "probe_vec", allowed,
      nprobe = 8, k = 5, ef = n, rerankFactor = n, tombstones = Some(tombs)))
    assert(gotPq.sameElements(exact), "PQ tier: filtered+masked = brute force")
  }

  test("purge drops tombstoned nodes, passes untouched segments byte-identical, idempotent") {
    val tombIds = Seq(2L, 7L, 13L)
    val tombs = tombIds.toDF("id")
    val purged = GraphAnn.purgeTombstones(nodes, tombs, m = M,
      efConstruction = 48).localCheckpoint(true)
    val gs = purged.as[GraphNode].collect()
    assert(gs.length == emb.count().toInt - tombIds.length, "node conservation")
    assert(gs.forall(g => !tombIds.contains(g.id)), "no tombstoned node survives")
    gs.foreach(g => g.neighbors.foreach(layer => layer.foreach(nb =>
      assert(!tombIds.contains(nb), s"edge ${g.id}->$nb points at a tombstone"))))
    // segments the deletes never touched are byte-identical
    val touched = nodes.as[GraphNode].collect()
      .filter(n => tombIds.contains(n.id)).map(n => (n.part, n.seg)).toSet
    def outside(df: org.apache.spark.sql.DataFrame) = df.as[GraphNode].collect()
      .filterNot(n => touched.contains((n.part, n.seg)))
      .map(g => (g.id, g.level, g.neighbors.map(_.toSeq).toSeq)).sortBy(_._1).toSeq
    assert(outside(purged) == outside(nodes))
    // idempotent: purging the same set again rebuilds nothing at all
    val again = GraphAnn.purgeTombstones(purged, tombs, m = M,
      efConstruction = 48)
    assert(again eq purged, "no touched segment -> the input passes through")
    // post-purge exhaustive search = brute force over the survivors
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphBatch(purged, probes, "probe_id",
      "probe_vec", k = 5, ef = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb.filter(!$"vec_id".isin(tombIds: _*)), "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("appendGraphCells: fresh slices per routed cell, then withinPart merge compacts them") {
    val even = cellNodes.join(emb.filter($"vec_id" % 2 === 0)
      .select($"vec_id".as("id")), Seq("id"), "left_semi")
      .as[GraphNode].localCheckpoint(true)
    val appended = GraphAnn.appendGraphCells(even.toDF(),
      emb.filter($"vec_id" % 2 === 1), "vec_id", "embedding",
      ivf.centroids, m = M, efConstruction = 48).localCheckpoint(true)
    val gs = appended.as[GraphNode].collect()
    assert(gs.length == emb.count().toInt, "node conservation")
    // every appended node landed in the cell the index's rule assigns
    val vecOf = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    gs.filter(_.id % 2 == 1).foreach { g =>
      val cell = GraphAnn.routeCells(ivf.centroids, vecOf(g.id), 1).head
      assert(g.part == cell, s"appended ${g.id} in part ${g.part}, rule says $cell")
    }
    // fresh slices sit past the cell's previous max; old nodes untouched
    val beforeSegs = even.collect().groupBy(_.part)
      .map { case (p, ns) => p -> ns.map(_.seg).max }
    gs.filter(_.id % 2 == 1).foreach(g =>
      assert(g.seg > beforeSegs.getOrElse(g.part, -1)))
    def flat(xs: Array[GraphNode]) = xs
      .map(g => (g.id, g.part, g.seg, g.neighbors.map(_.toSeq).toSeq))
      .sortBy(_._1).toSeq
    assert(flat(gs.filter(_.id % 2 == 0)) == flat(even.collect()))
    // exhaustive routed search over append + withinPart merge = brute force
    val merged = GraphAnn.mergeSegments(appended, targetNodesPerSegment = 1000,
      m = M, efConstruction = 48, withinPart = true)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRouted(merged, ivf.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 5, ef = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("purge composes with withinPart merge on a routed index") {
    val tombs = emb.filter($"vec_id" % 6 === 2).select($"vec_id".as("id"))
    val purged = GraphAnn.purgeTombstones(cellNodes, tombs, m = M,
      efConstruction = 48)
    val merged = GraphAnn.mergeSegments(purged, targetNodesPerSegment = 1000,
      m = M, efConstruction = 48, withinPart = true)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRouted(merged, ivf.centroids,
      probes, "probe_id", "probe_vec", nprobe = 8, k = 5, ef = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
      emb.filter($"vec_id" % 6 =!= 2), "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("knnToNswSegments: closed capped single-layer segments; exhaustive routed search exact") {
    val knn = GraphAnn.nnDescent(emb, "vec_id", "embedding", k = 10, iters = 3)
    val nsw = GraphAnn.knnToNswSegments(ivf.assignments, knn, m = M)
      .localCheckpoint(true)
    val gs = nsw.as[GraphNode].collect()
    assert(gs.length == emb.count().toInt, "node conservation")
    val cellOf = ivf.assignments.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    gs.foreach { g =>
      assert(g.level == 0 && g.neighbors.length == 1, "single layer")
      assert(g.part == cellOf(g.id), "part is the cell")
      assert(g.neighbors(0).length <= 2 * M, "layer-0 degree cap")
      g.neighbors(0).foreach(nb => assert(cellOf(nb) == g.part,
        s"edge ${g.id}->$nb leaves cell ${g.part}"))
      assert(!g.neighbors(0).contains(g.id), "no self-loop")
    }
    // exhaustive routed beams over the converted layout = brute force
    // (reachability roots make full-ef beams exhaustive whatever the
    // k-NN edge quality)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRouted(nsw, ivf.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 5, ef = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
    // serving-width recall floor on the same layout
    val serve = GraphAnn.searchGraphRouted(nsw, ivf.centroids, probes,
      "probe_id", "probe_vec", nprobe = 8, k = 5, ef = 32)
      .select($"probe_id", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = exact.count { case (pid, id, _) => serve.contains((pid, id)) }
    assert(hits >= 12, s"serving-width recall fell to $hits/15")
  }

  test("PQ filtered keystone: full fan-out + exhaustive rerank = filtered brute force") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id".as("id"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRoutedPqFiltered(pqNodes, ivfPq,
      emb, "vec_id", "embedding", probes, "probe_id", "probe_vec", allowed,
      nprobe = 8, k = 5, ef = n, rerankFactor = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb.filter($"vec_id" % 3 === 0), "vec_id", "embedding",
      k = 5))
    assert(got.sameElements(exact))
    // containment is structural: the rerank only ever sees allowed ids
    val some = GraphAnn.searchGraphRoutedPqFiltered(pqNodes, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec", allowed,
      nprobe = 8, k = 5, ef = 32).collect()
    assert(some.forall(_.getLong(1) % 3 == 0))
  }

  test("PQ tombstone mask and purge: survivors-only results, codes preserved, idempotent") {
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val tombs = emb.filter($"vec_id" % 4 === 1).select($"vec_id".as("id"))
    val n = emb.count().toInt
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb.filter($"vec_id" % 4 =!= 1), "vec_id", "embedding",
      k = 5))
    // serving-time mask, exhaustive widths = brute force over survivors
    val masked = topIds(GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec", nprobe = 8,
      k = 5, ef = n, rerankFactor = n, tombstones = Some(tombs)))
    assert(masked.sameElements(exact))
    // physical purge: rebuilt segments keep their cells and CODES
    val purged = GraphAnn.purgeTombstonesPq(pqNodes, tombs, emb, "vec_id",
      "embedding", m = M, efConstruction = 48).localCheckpoint(true)
    val tombSet = tombs.collect().map(_.getLong(0)).toSet
    val before = pqNodes.as[GraphAnn.PqGraphNode].collect()
      .map(g => g.id -> (g.part, g.codes.toSeq)).toMap
    val gs = purged.as[GraphAnn.PqGraphNode].collect()
    assert(gs.length == before.size - tombSet.size, "node conservation")
    gs.foreach { g =>
      assert(!tombSet.contains(g.id))
      assert((g.part, g.codes.toSeq) == before(g.id),
        s"node ${g.id} changed cell or codes across the purge")
      g.neighbors.foreach(_.foreach(nb => assert(!tombSet.contains(nb))))
    }
    // post-purge exhaustive search = brute force over survivors
    val after = topIds(GraphAnn.searchGraphRoutedPq(purged, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec", nprobe = 8,
      k = 5, ef = n, rerankFactor = n))
    assert(after.sameElements(exact))
    // idempotent
    assert(GraphAnn.purgeTombstonesPq(purged, tombs, emb, "vec_id",
      "embedding", m = M, efConstruction = 48) eq purged)
  }

  test("PQ persisted cell layout serves row-identical to in-memory routed PQ") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcells").toString
    GraphAnn.writeGraphCells(pqNodes, dir)
    val disk = GraphAnn.restoreSegmentLocality(spark.read.parquet(dir))
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def run(nodes: org.apache.spark.sql.DataFrame) =
      GraphAnn.searchGraphRoutedPq(nodes, ivfPq, emb, "vec_id", "embedding",
          probes, "probe_id", "probe_vec", nprobe = 4, k = 5, ef = 48)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(run(disk) == run(pqNodes),
      "the persisted PQ layout must serve the same rows as the in-memory one")
  }

  test("PQ published serving: version-pinned, pruned scan, filtered leg row-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft-pqroot").toString
    GraphAnn.publishGraphCellsPq(pqNodes, root)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val mem = flat(GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 4, k = 5, ef = 48))
    val pub = flat(GraphAnn.searchGraphRoutedPqPublished(spark, root, ivfPq,
      emb, "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 4, k = 5, ef = 48))
    assert(pub == mem, "published PQ serving must be row-identical to in-memory")
    // filtered leg through the same published files
    val allowed = emb.filter($"vec_id" % 2 === 0).select($"vec_id".as("id"))
    val fmem = flat(GraphAnn.searchGraphRoutedPqFiltered(pqNodes, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec", allowed,
      nprobe = 4, k = 5, ef = 96, rerankFactor = 8))
    val fpub = flat(GraphAnn.searchGraphRoutedPqPublished(spark, root, ivfPq,
      emb, "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 4, k = 5, ef = 96, rerankFactor = 8, allowed = Some(allowed)))
    assert(fpub == fmem,
      "published filtered PQ serving must be row-identical to in-memory filtered")
    // the version-pinned pruned read lands `part IN (…)` in PartitionFilters
    val vdir = s"$root/${graft.pipeline.VersionedIndex.currentVersion(root).get}"
    val probed = probes.select($"probe_vec").as[Array[Float]].collect()
      .flatMap(v => Similarity.probedCells(ivfPq, v, 4)).distinct.toSeq
    val pruned = spark.read.parquet(vdir).filter($"part".isin(probed: _*))
    val p = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("part#"),
      "part IN (...) must land in PartitionFilters:\n" + p.take(1500))
    val rm = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try rm.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally rm.close()
  }

  test("float filtered+masked persisted serving is row-identical to the in-memory filtered path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fltcells").toString
    GraphAnn.writeGraphCells(cellNodes, dir)
    val probes = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val allowed = emb.filter($"vec_id" % 2 === 0).select($"vec_id".as("id"))
    val tombs = emb.filter($"vec_id" % 5 === 2).select($"vec_id".as("id"))
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val mem = flat(GraphAnn.searchGraphRoutedFiltered(cellNodes,
      ivf.centroids, probes, "probe_id", "probe_vec", allowed,
      nprobe = 3, k = 6, ef = 96, tombstones = Some(tombs)))
    val disk = flat(GraphAnn.searchGraphRoutedPersisted(spark, dir,
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 3, k = 6,
      ef = 96, tombstones = Some(tombs), allowed = Some(allowed)))
    assert(disk == mem,
      "persisted filtered+masked serving must equal the in-memory filtered path")
    val rm = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try rm.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally rm.close()
  }

  test("appendGraphCellsPq: fresh slices past each cell's max, oversized batches slice, keystone exact") {
    // a REAL even-subset build (pruning pqNodes would leave dangling
    // odd adjacency ids and trip the segment-locality fail-fast)
    val even = GraphAnn.buildGraphPerCellPq(spark,
        emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding", ivfPq,
        m = M, efConstruction = 48)
      .as[GraphAnn.PqGraphNode].localCheckpoint(true)
    // maxSegmentSize forces the arrival batch to hash-slice per cell,
    // like the float twin's spec — the shared buildCellSegmentsPq body
    val appended = GraphAnn.appendGraphCellsPq(even.toDF(),
      emb.filter($"vec_id" % 2 === 1), "vec_id", "embedding", ivfPq,
      m = M, efConstruction = 48, maxSegmentSize = 20).localCheckpoint(true)
    val gs = appended.as[GraphAnn.PqGraphNode].collect()
    assert(gs.length == emb.count().toInt, "node conservation")
    // fresh slices sit past the cell's previous max; old nodes untouched
    val beforeSegs = even.collect().groupBy(_.part)
      .map { case (p, ns) => p -> ns.map(_.seg).max }
    gs.filter(_.id % 2 == 1).foreach(g =>
      assert(g.seg > beforeSegs.getOrElse(g.part, -1),
        s"appended ${g.id} landed in a pre-existing slice"))
    // the APPENDED slices' adjacency stays closed over (part, seg) even
    // when the batch hash-slices (the existing fixture nodes reference
    // pruned odd ids — a fixture artifact, not an operator property)
    val segOf = gs.map(g => g.id -> (g.part, g.seg)).toMap
    gs.filter(_.id % 2 == 1).foreach(g => g.neighbors.foreach(_.foreach(nb =>
      assert(segOf(nb) == ((g.part, g.seg)), "cross-slice edge"))))
    def flat(xs: Array[GraphAnn.PqGraphNode]) = xs
      .map(g => (g.id, g.part, g.seg, g.codes.toSeq,
        g.neighbors.map(_.toSeq).toSeq))
      .sortBy(_._1).toSeq
    assert(flat(gs.filter(_.id % 2 == 0)) == flat(even.collect()),
      "existing segments must pass through byte-identical")
    // keystone: full fan-out + exhaustive rerank over the appended,
    // sliced layout recovers exact top-k
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val n = emb.count().toInt
    val got = topIds(GraphAnn.searchGraphRoutedPq(appended, ivfPq, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec",
      nprobe = 8, k = 5, ef = n, rerankFactor = n))
    val exact = topIds(Similarity.topKPerProbe(probes, "probe_id",
      "probe_vec", emb, "vec_id", "embedding", k = 5))
    assert(got.sameElements(exact))
  }

  test("appendGraphCellsPq: empty existing and empty batch are both safe; arrivals match the coded table") {
    // onto-empty: segBase is empty, slices start at 0 — the r12
    // appendSegments-onto-empty NPE class, guarded on the PQ tier too
    val some = emb.filter($"vec_id" < 20)
    val fromEmpty = GraphAnn.appendGraphCellsPq(pqNodes.filter(lit(false)),
      some, "vec_id", "embedding", ivfPq, m = M, efConstruction = 48)
    assert(fromEmpty.count() == some.count())
    // every arrival's (cell, codes) must equal the index's own coded row —
    // append-time encode is byte-consistent with build-time encode
    val bad = fromEmpty
      .join(ivfPq.coded.select($"id", $"cell", $"pq_codes"), Seq("id"))
      .filter($"part" =!= $"cell" || $"codes" =!= $"pq_codes")
    assert(bad.count() == 0, "appended (cell, codes) diverged from the coded table")
    // empty batch: index unchanged, no NPE
    val unchanged = GraphAnn.appendGraphCellsPq(pqNodes,
      emb.filter(lit(false)), "vec_id", "embedding", ivfPq,
      m = M, efConstruction = 48)
    assert(unchanged.count() == pqNodes.count())
  }

  test("clump guard: no-op on a uniform corpus, exact min-id top-k on a clumped one") {
    val cloneVec = emb.filter($"vec_id" === 42)
      .select($"embedding").head().getSeq[Float](0).toArray
    val probes = Seq((42L, cloneVec)).toDF("probe_id", "probe_vec")
    // uniform corpus: guard on/off must be row-identical (bound ≤ k·rf)
    val plain = GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb, "vec_id",
      "embedding", probes, "probe_id", "probe_vec", nprobe = 4, k = 5, ef = 48)
    val plainOff = GraphAnn.searchGraphRoutedPq(pqNodes, ivfPq, emb, "vec_id",
      "embedding", probes, "probe_id", "probe_vec", nprobe = 4, k = 5, ef = 48,
      rerankFactor = 4, clumpGuard = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(_._3).toSeq
    assert(rows(plain) == rows(plainOff),
      "guard must be a no-op when no clump exceeds the survivor pool")
    // clumped corpus: 60 exact replicas of vec 42 under fresh ids — the
    // guarded search must return the brute-force top-k exactly (ties
    // break by id asc on both sides: 42 first, then the lowest clone ids)
    val clones = spark.range(60).select(($"id" + 100000L).as("vec_id"),
      typedLit(cloneVec).as("embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(clones)
      .localCheckpoint(true)
    val index = Similarity.buildIvfPq(spark, corpus, "vec_id", "embedding",
      nCells = 8, subspaces = 8, codesPerSub = 16, ivfIters = 2, pqIters = 2)
    val nodes = GraphAnn.buildGraphPerCellPq(spark, corpus, "vec_id",
      "embedding", index, m = M, efConstruction = 48).localCheckpoint(true)
    val k = 10
    val guarded = GraphAnn.searchGraphRoutedPq(nodes, index, corpus, "vec_id",
      "embedding", probes, "probe_id", "probe_vec", nprobe = 3, k = k, ef = 48)
    val exactIds = Similarity.topKPerProbe(probes, "probe_id", "probe_vec",
        corpus, "vec_id", "embedding", k)
      .orderBy($"rank").collect().map(_.getLong(1)).toSeq
    assert(exactIds.head == 42L && exactIds.tail.forall(_ >= 100000L),
      s"fixture self-check: the exact top-k should be the clump, got $exactIds")
    val gotIds = guarded.orderBy($"rank").collect().map(_.getLong(1)).toSeq
    assert(gotIds == exactIds,
      s"guarded search must serve the exact top-k through the clump: $gotIds vs $exactIds")
  }

  test("publishGraphCells: readers never observe a half-written rebuild") {
    import graft.pipeline.VersionedIndex
    val root = java.nio.file.Files.createTempDirectory("graft-graphpub").toString
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3)).toSeq
    // v000: the full per-cell graph
    assert(GraphAnn.publishGraphCells(cellNodes, root) == "v000")
    val r0 = flat(GraphAnn.searchGraphRoutedPublished(spark, root,
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 8, k = 5, ef = 64))
    assert(r0.nonEmpty)
    // a reader pinned to v000 BEFORE the rebuild lands...
    val pinned = GraphAnn.searchGraphRoutedPersisted(spark, s"$root/v000",
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 8, k = 5, ef = 64)
    // ...while a rebuild (a purge of every odd id) publishes v001
    val purged = GraphAnn.purgeTombstones(cellNodes,
      emb.filter($"vec_id" % 2 === 1).select($"vec_id".as("id")),
      m = M, efConstruction = 48)
    assert(GraphAnn.publishGraphCells(purged, root) == "v001")
    assert(VersionedIndex.currentVersion(root).contains("v001"))
    // the pinned reader still serves v000's answer (retention keeps it)
    assert(flat(pinned) == r0, "pinned readers drain on their own version")
    // a fresh open serves the published rebuild: odd ids are gone
    val r1 = flat(GraphAnn.searchGraphRoutedPublished(spark, root,
      ivf.centroids, probes, "probe_id", "probe_vec", nprobe = 8, k = 5, ef = 64))
    assert(r1.forall(_._2 % 2 == 0), s"v001 must not serve purged ids: $r1")
    // a crashed half-materialization never moves CURRENT: write a partial
    // version directory WITHOUT the pointer flip
    GraphAnn.writeGraphCells(cellNodes.filter($"part" === 0), s"$root/v002")
    assert(VersionedIndex.currentVersion(root).contains("v001"),
      "an unpublished directory must not affect the pointer")
    assert(flat(GraphAnn.searchGraphRoutedPublished(spark, root,
      ivf.centroids, probes, "probe_id", "probe_vec",
      nprobe = 8, k = 5, ef = 64)) == r1,
      "reads keep serving the published version past a writer crash")
    // the next successful publish claims v002, overwriting the debris
    assert(GraphAnn.publishGraphCells(cellNodes, root) == "v002")
    assert(flat(GraphAnn.searchGraphRoutedPublished(spark, root,
      ivf.centroids, probes, "probe_id", "probe_vec",
      nprobe = 8, k = 5, ef = 64)) == r0,
      "v002 serves the full graph again")
  }

  test("deleting every node yields empty searches and an empty purge") {
    val all = emb.select($"vec_id".as("id"))
    assert(GraphAnn.searchGraphBatch(nodes,
      emb.filter($"vec_id" < 2).select($"vec_id".as("probe_id"),
        $"embedding".as("probe_vec")),
      "probe_id", "probe_vec", k = 5, ef = 64,
      tombstones = Some(all)).count() == 0L)
    assert(GraphAnn.purgeTombstones(nodes, all, m = M,
      efConstruction = 48).count() == 0L)
  }
}
