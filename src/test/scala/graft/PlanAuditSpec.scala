package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression tests — the scale posture, asserted.
  *
  * These lock in the plan shapes that make the operators survive a 100 TB /
  * 1000-executor deployment: filters and projections reach the parquet scan,
  * small dimensions broadcast instead of shuffling the fact side, top-k is a
  * per-partition heap (TakeOrderedAndProject) rather than a global sort, and
  * sketch UDFs are evaluated once per row (no self-join double-compute).
  * A regression that silently reintroduces a shuffle or a second scan fails
  * here before it ever reaches a cluster.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.explainString(FormattedMode)
  }

  test("q02: filters and column pruning reach the parquet scan") {
    val p = plan("q02_filtered_revenue")
    assert(p.contains("PushedFilters:"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity filter not pushed")
    // projection pruning: the 16-column lineitem scan reads only 4 columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"), "scan reads more columns than needed")
  }

  test("j5/q05: dimension joins broadcast — the fact table never shuffles for a join") {
    val p5 = plan("j5_dim_join_revenue")
    assert(p5.contains("BroadcastHashJoin"), p5.take(1500))
    assert(!p5.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
    val q5 = plan("q05_regional_revenue")
    assert(q5.contains("BroadcastHashJoin"), q5.take(1500))
  }

  test("j1: change-detect state snapshot broadcasts to the probe side") {
    val p = plan("j1_change_detect")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("w7/v2: top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("w7_topk_orders").contains("TakeOrderedAndProject"))
    assert(plan("v2_knn_top10").contains("TakeOrderedAndProject"))
  }

  test("w8: the admin listing page is a bounded slice, not a full global sort") {
    // the HTTP handler serves this exact plan (AdminServer.pageSlice);
    // offset+limit over orderBy must stay a bounded top-(offset+limit)
    // selection — CollectLimit/TakeOrderedAndProject — never a
    // materialized whole-table Sort feeding the slice
    val p = plan("w8_admin_page")
    assert(p.contains("TakeOrderedAndProject") || p.contains("CollectLimit"),
      p.take(2000))
  }

  test("j2: purge anti-join stays a single anti-join (no distinct/aggregate detour)") {
    val p = plan("j2_purge_anti")
    assert(p.contains("LeftAnti"), p.take(1500))
  }

  test("d2: the minhash signature UDF is computed at most once per row") {
    // the sketch table is localCheckpoint'ed, so the final plan reads the
    // materialized blocks (0 evaluation sites); anything >1 means the
    // self-join double-compute regressed
    val p = plan("d2_minhash_pairs")
    val n = "graft_minhash".r.findAllIn(p).length
    assert(n <= 1, s"minhash evaluated at $n sites in the plan")
  }

  test("d3: the simhash sketch UDF is computed at most once per row") {
    val p = plan("d3_simhash_pairs")
    val n = "graft_simhash".r.findAllIn(p).length
    assert(n <= 1, s"simhash evaluated at $n sites in the plan")
  }

  test("s4: the DSv2 source receives pushed filters and a pruned projection") {
    val p = plan("s4_paged_pushdown")
    // the scan's description advertises what reached the "service" —
    // assert membership, not ordering (Catalyst may reorder conjuncts)
    assert(p.contains("EqualTo(site,site3)"), p.take(2500))
    assert(p.contains("GreaterThan(modified_ms,"), p.take(2500))
    // the cols list alone proves the $select-analog pruning
    assert(p.contains("cols=[site,size_bytes]"), p.take(2500))
  }

  test("index table partitioned by source prunes partitions at scan time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-partidx")
    try {
      pipelineIndex.write.mode("overwrite").partitionBy("source").parquet(dir.toString)
      val pruned = spark.read.parquet(dir.toString).filter(col("source") === "web")
      val p = pruned.queryExecution.explainString(FormattedMode)
      assert(p.contains("PartitionFilters: [isnotnull(source"), p.take(2000))
      assert(p.contains("(source"), "source equality missing from partition filters")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  private lazy val pipelineIndex =
    graft.pipeline.ChunkIndexer.buildChunkIndex(spark, TestSpark.sf)

  test("v8: multi-probe top-k is a bounded-heap aggregate — no window, no corpus sort") {
    val p = plan("v8_topk_multiprobe")
    assert(!p.contains("Window"), "top-k regressed to a row_number window:\n" + p.take(2000))
    // the probe set broadcasts; the corpus side never shuffles for the join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    // ranking happens in the partial-agg-friendly Aggregator, k rows per probe
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(2000))
    // the only Sort allowed is the single final presentation orderBy AFTER
    // the aggregate has reduced the corpus to (probes × k) rows
    val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).length
    assert(sorts <= 1, s"$sorts Sort nodes — a corpus-side sort crept in:\n" + p.take(2000))
  }

  test("v5: persisted IVF probe prunes cell partitions at scan time") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val probe = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val index = graft.operators.Similarity.buildIvf(spark, emb, "vec_id", "embedding",
      nCells = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx")
    try {
      graft.operators.Similarity.writeIvf(index, dir.toString)
      val res = graft.operators.Similarity.searchIvfPartitioned(
        spark, dir.toString, probe, nprobe = 2, k = 10)
      val p = res.queryExecution.explainString(FormattedMode)
      // the cell IN (…) predicate must land in PartitionFilters — unprobed
      // cells are pruned at planning time, never scanned
      val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
      assert(pf.contains("cell"), "no cell predicate in PartitionFilters:\n" + p.take(2000))
      assert(pf.contains(" IN "), "cell IN (...) not pushed to PartitionFilters: " + pf)
      assert(res.count() == 10, "partitioned probe returned wrong k")
      // probing only 2 of 8 cells must agree with the in-memory path
      val mem = graft.operators.Similarity.searchIvf(index, probe, nprobe = 2, k = 10)
        .collect().map(_.getLong(0)).toSeq
      val disk = res.collect().map(_.getLong(0)).toSeq
      assert(disk == mem, s"partitioned search diverged: $disk vs $mem")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("m1: the crop UDF evaluates once per row despite three field reads") {
    // withFigureCrops projects _c._1/_2/_3 from one UDF result; CollapseProject
    // must not inline the non-cheap UDF into three evaluation sites
    val p = plan("m1_multimodal_features")
    // the crop UDF (signature: payload + polygon + page dims) must be
    // materialized into a single _c struct and projected from there — not
    // inlined by CollapseProject into one site per consumed field
    val cropSites = "UDF\\(payload".r.findAllIn(p).length
    assert(cropSites == 1,
      s"crop UDF evaluated at $cropSites sites — projection collapse duplicated it:\n" +
        p.take(2000))
    assert("AS _c#\\d+".r.findAllIn(p).length == 1, p.take(2000))
  }

  test("m17: the avcC probe UDF evaluates once per row despite eight field reads") {
    // the probe decodes an MP4 container per row; CollapseProject must
    // materialize its struct result ONCE (`... AS a#n`) and project the
    // eight surfaced fields from it, not inline the decode per field
    val p = plan("m17_avcc_probe")
    assert("AS a#\\d+".r.findAllIn(p).length == 1,
      s"avcC probe UDF not materialized once:\n${p.take(2000)}")
    val sites = "UDF\\(knownnotnull".r.findAllIn(p).length
    assert(sites == 1,
      s"avcC probe UDF evaluated at $sites sites:\n${p.take(2000)}")
  }

  test("v1: cosine similarity stays inside whole-stage codegen") {
    val df = SparkEntry.queries("v1_cosine_scan")(spark, TestSpark.sf)
    df.collect() // AQE only annotates codegen ids once THIS plan executes
    // FormattedMode labels codegen'd operators with "[codegen id : N]"
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("codegen id"), p.take(1500))
  }

  test("dc1: the benchmark gram set broadcasts — the corpus side never shuffles for it") {
    val p = plan("dc1_decontam")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // the semi-join against the gram set must be the broadcast variant, not
    // a shuffled sort-merge over the (huge at scale) exploded corpus grams
    assert(!p.contains("SortMergeJoin(keys=[gram"),
      "decontamination gram join shuffled the corpus side:\n" + p.take(2000))
  }

  test("t6: per-doc repetition metrics stay shuffle-free array expressions") {
    // only the top-word mode (id,word grouping) and the final join/sort may
    // shuffle; the counter columns themselves must not add exchanges
    val df = graft.operators.Quality.withRepetitionMetrics(
      graft.Tables.load(spark, TestSpark.sf, "documents"), "text")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"repetition counters introduced a shuffle:\n$p")
  }

  test("rj1: the interval join is an equi-join — no product surface") {
    val p = plan("rj1_range_join")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval join regressed to a nested loop:\n" + p.take(2000))
  }

  test("sp2: balanced sampling broadcasts the count tables — the corpus never shuffles") {
    val p = plan("sp2_balanced_sample")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // exchanges allowed: the tiny count aggregations and the final per-lang
    // aggregate — never a corpus-side join shuffle
    assert(!p.contains("SortMergeJoin"),
      "corpus side shuffled for the count join:\n" + p.take(2000))
  }

  test("sp1/sp3: pack + reservoir windows shuffle once on the stratum, no extra sort") {
    val p1 = plan("sp1_sequence_pack")
    assert(p1.contains("Window"), p1.take(1500))
    val p3 = plan("sp3_reservoir_sample")
    // rank-limit windows qualify for WindowGroupLimit: each map task emits
    // at most k rows per key before the shuffle
    assert(p3.contains("WindowGroupLimit"),
      "reservoir lost the group-limit pushdown:\n" + p3.take(2000))
  }

  test("t8: html strip is scan + projection only — zero exchanges before the sort") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.TextAnalysis.stripHtml(
      graft.Tables.load(spark, TestSpark.sf, "documents")
        .withColumn("html", concat(lit("<p>"), col("text"), lit("</p>"))), "html")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"stripHtml introduced a shuffle:\n$p")
  }

  test("t10/t11: distribution tables broadcast — no sort-merge join on the corpus") {
    val p10 = plan("t10_dsir_weights")
    assert(p10.contains("BroadcastHashJoin"), p10.take(1500))
    assert(!p10.contains("SortMergeJoin"), "DSIR distribution join fell back to SMJ")
    val p11 = plan("t11_unigram_ppl")
    assert(p11.contains("BroadcastHashJoin"), p11.take(1500))
    assert(!p11.contains("SortMergeJoin"), "perplexity reference join fell back to SMJ")
  }

  test("sp6: the mixture plan broadcasts — the corpus side never shuffles for the join") {
    val p = plan("sp6_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "mixture-plan join fell back to SMJ")
  }

  test("t12: the column profile is one Expand-based job, not a per-column loop") {
    val p = plan("t12_corpus_profile")
    assert(p.contains("Expand"), "multi-distinct lost the Expand plan:\n" + p.take(1500))
    // one scan feeds the whole profile (formatted mode lists each node
    // once in the tree and once in the details — count the detail entries)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      "profile reads the table more than once:\n" + p.take(2000))
  }

  test("d11: paragraph keeper is an aggregate, not a hot-key window") {
    // the boilerplate-skew claim: dedup must NOT funnel every instance of a
    // duplicated paragraph through one row_number reducer
    val p = plan("d11_paragraph_dedup")
    assert(!p.contains("Window"), "paragraph dedup regressed to a window:\n" + p.take(2000))
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      "keeper table lost its partial aggregation:\n" + p.take(2000))
  }

  test("v20: 1-bit stage 1 is a broadcast product + partial agg — the code scan never sorts or shuffles raw") {
    // the memory-lever claim: stage 1 reads only the bit codes, probes
    // arrive by broadcast (BroadcastNestedLoopJoin over the tiny batch,
    // never a CartesianProduct), per-probe top-k is the bounded-heap
    // partial aggregate (ObjectHashAggregate w/ partial merge), and no
    // global Sort of the corpus appears anywhere in the plan
    val s = TestSpark.spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.load(s, TestSpark.sf, "embeddings")
    val index = graft.operators.Similarity.quantizeBinary(emb, "vec_id", "embedding")
    val probes = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val df = graft.operators.Similarity.searchBinaryBatch(index, emb,
      "vec_id", "embedding", probes, "probe_id", "probe_vec", k = 10)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), "stage 1 fell to a cartesian:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"), "rerank join fell to sort-merge:\n" + p.take(2000))
    assert(!p.contains("\n   Sort "), "a global sort appeared:\n" + p.take(2000))
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "bounded-heap aggregate missing:\n" + p.take(2000))
  }

  test("a7: the turn-merge fusion plans as one group aggregate + generate — no WindowExec") {
    val p = plan("a7_turn_merge")
    // the fusion's whole claim, structurally: the lag → running-sum →
    // re-aggregate chain (exchange + sort + row-at-a-time WindowExec +
    // a SECOND exchange) is gone; what remains is the collect_list
    // aggregate, the generator, and the final-order exchange
    assert(!p.contains("Window"), "WindowExec reappeared:\n" + p.take(2000))
    assert(p.contains("Generate"), "turn_merge generator missing:\n" + p.take(2000))
    // formatted plans list each node once in the tree header — count there
    val tree = p.split("\n\n").head
    val nExch = "Exchange".r.findAllIn(tree).size
    assert(nExch <= 2,
      s"fusion should need at most the group exchange + the orderBy range exchange, got $nExch:\n" + tree)
  }
}
