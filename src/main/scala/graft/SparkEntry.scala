package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps SURVEY.md §2 operator ids to runnable Spark plans over the
  * test tables; `oracleSql` holds the DuckDB-equivalent SQL (same column
  * names/types) for the hash-match correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.ChunkIndexer.flagship(spark, "/root/testdata/sf0.001")

  import graft.{queries => gq}
  private val parts: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (gq.Relational.queries, gq.Relational.oracles),
      (gq.Extended.queries, gq.Extended.oracles),
      (gq.DomainQueries.queries, gq.DomainQueries.oracles),
      (gq.TextQueries.queries, gq.TextQueries.oracles),
      (gq.VectorQueries.queries, gq.VectorQueries.oracles),
      (gq.PipelineQueries.queries, gq.PipelineQueries.oracles),
      (gq.Coverage3.queries, gq.Coverage3.oracles),
      (gq.Coverage4.queries, gq.Coverage4.oracles),
      (gq.Coverage5.queries, gq.Coverage5.oracles),
      (gq.Coverage6.queries, gq.Coverage6.oracles),
      (gq.Coverage7.queries, gq.Coverage7.oracles),
      (gq.Coverage8.queries, gq.Coverage8.oracles),
      (gq.Coverage9.queries, gq.Coverage9.oracles),
      (gq.Coverage10.queries, gq.Coverage10.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parts.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Deterministic-but-not-SQL-expressible ops
    * (sketch dedup, the chunk+embed pipeline, …) are pinned by generated
    * snapshot VALUES oracles instead — see [[graft.queries.Snapshots]]. */
  def oracleSql: Map[String, String] =
    parts.map(_._2).reduce(_ ++ _) ++ gq.Snapshots.oracles
}
