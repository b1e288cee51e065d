package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for SYNTHESIZED media fixtures (the m5/m11 gates
  * render thousands of PNGs/AVIs through the real codecs to have
  * something to dedup — ~1.5s of the m11 bench entry was fixture
  * synthesis, not operator work). Memoizing the eagerly-checkpointed
  * fixture per (session, key) moves synthesis outside the timed region
  * exactly the way `Tables.load` moves file listing + analysis out: the
  * bench's warm run pays it once, the timed run measures only the
  * operator (decode + hash + near-dup machinery). Correctness is
  * untouched — the fixture build is deterministic in doc_id, so the
  * cached blocks hold byte-identical payloads to a fresh build, and
  * Verify (one execution per query) takes the same path.
  *
  * Keys must embed the sf dir (different scale factors are different
  * fixtures). A WeakHashMap keyed on the session alone would never
  * reclaim anything here — the cached DataFrames strongly reference
  * their SparkSession, and per WeakHashMap semantics a value that
  * (transitively) references its key pins the key forever. So reclaim
  * is EXPLICIT: the first insert for a session registers an
  * onApplicationEnd listener that drops that session's entries from
  * both maps, releasing the DataFrames (and with them the checkpoint
  * blocks and the session itself) once the SparkContext stops. NOTE
  * the listener granularity: ApplicationEnd fires when the shared
  * CONTEXT stops, not when an individual `newSession()` clone goes
  * away — a JVM churning many sessions over one long-lived context
  * accumulates entries until the context ends (or a caller invokes
  * [[Fixtures.drop]] on the session it is retiring). The gate/test
  * processes this memo serves stop their context at exit, which is the
  * case the listener closes.
  */
object Fixtures {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]())

  /** Sessions that already have a cleanup listener on their bus — guards
    * against re-registration when a session's entries are [[drop]]ped and
    * later re-inserted (each duplicate listener would strongly pin the
    * session until application end). Weak keys so the guard itself never
    * pins a session.
    */
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Clears this session's entries when its SparkContext ends. The
    * listener closure references the session, but the listener lives on
    * that session's own (stopped) bus — after removal from the maps the
    * whole cycle is unreachable together and GC reclaims it. Idempotent
    * per session: at most one listener is ever added, however many
    * insert/drop/insert cycles the session goes through.
    */
  private def registerCleanup(spark: SparkSession): Unit =
    if (registered.add(spark))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            cache.remove(spark)
            objCache.remove(spark)
            registered.remove(spark)
          }
        })

  /** Explicitly drop one session's memoized entries — for callers that
    * retire `newSession()` clones while the shared context lives on
    * (the listener above only fires at context stop).
    */
  def drop(spark: SparkSession): Unit = {
    cache.remove(spark)
    objCache.remove(spark)
    ()
  }

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        cache.put(spark, m)
        registerCleanup(spark) // idempotent — the registered set guards
      }
      m
    }
    perSession.getOrElseUpdate(key, build.localCheckpoint(true))
  }

  private val objCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Any]]())

  /** Same memo for non-DataFrame scaffolding — the v15/v16 batch-serving
    * gates memoize their BUILT index here (the build paths keep their own
    * gates: v5 times IVF training, v13 IVF-PQ training), so the batch
    * gate times what a serving tier actually runs per request batch: the
    * candidate join + scoring + rerank against an index built once.
    * Builders must return state whose distributed parts are already
    * checkpointed (buildIvf/buildIvfPq do).
    */
  def cachedObj[T](spark: SparkSession, key: String)(build: => T): T = {
    val perSession = objCache.synchronized {
      var m = objCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Any]
        objCache.put(spark, m)
        registerCleanup(spark) // idempotent — the registered set guards
      }
      m
    }
    perSession.getOrElseUpdate(key, build).asInstanceOf[T]
  }

  /** Stage one parquet FILE per frame with ascending fixed mtimes under
    * a session-cached temp dir — the arrival-stream fixture the
    * streaming gates share (each file becomes its own micro-batch under
    * `maxFilesPerTrigger = 1`; the file source takes oldest-first).
    * Cached under `key` so gates sharing the SAME arrival data (st8 /
    * v41) stage it once per session — and cannot drift apart, which is
    * why this lives here instead of per-gate copies of the staging loop.
    */
  def stagedStreamDir(spark: SparkSession, key: String)(
      dfs: => Seq[DataFrame]): java.nio.file.Path =
    cachedObj(spark, key) {
      val t = java.nio.file.Files.createTempDirectory("graft-stream-fix")
      dfs.zipWithIndex.foreach { case (df, i) =>
        val scratch =
          java.nio.file.Files.createTempDirectory("graft-stage-part")
        df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val ls = java.nio.file.Files.list(scratch)
        val part =
          try ls.filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          finally ls.close()
        val dst = t.resolve(s"b$i.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst, java.nio.file
          .attribute.FileTime.fromMillis(1700000000000L + i * 3600000L))
        val rm = java.nio.file.Files.walk(scratch)
        try rm.sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally rm.close()
      }
      t
    }
}
