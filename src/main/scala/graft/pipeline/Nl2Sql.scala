package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.services.Embedder

/** NL2SQL metadata indexing (SURVEY §2.1 S11, §2.9 C6, §1.1 row 4; behavior
  * spec: /root/reference/jobs/nl2sql_indexer.py:131-328).
  *
  * Three document kinds live as JSON files under `<root>/{queries,tables,
  * measures}` (glob `*.json`). Each file becomes one search doc: id from the file
  * name, embedding text = question (queries) / description (tables,
  * measures), vector from the pluggable embedder. The scan is
  * `spark.read.option("multiLine", true).json` + `input_file_name()` —
  * Catalyst prunes/pushes into the JSON scan like any other source.
  */
object Nl2Sql {

  private def docId(kind: String, path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(kind), lit("-"),
      regexp_replace(element_at(split(path, "/"), -1), "\\.json$", ""))

  /** Load one kind directory into (id, kind, datasource, embedding_text, payload). */
  def loadKind(spark: SparkSession, root: String, kind: String,
      textField: String): DataFrame = {
    val dir = s"$root/$kind"
    if (!graft.core.Fs.exists(spark, dir)) return spark.emptyDataFrame
    val raw = spark.read.option("multiLine", "true").json(s"$dir/*.json")
      .withColumn("_path", input_file_name())
    raw.select(
      docId(kind, col("_path")).as("id"),
      lit(kind).as("kind"),
      col("datasource"),
      col(textField).as("embedding_text"),
      to_json(struct(raw.columns.filter(_ != "_path").toIndexedSeq.map(col): _*)).as("payload"))
  }

  /** Full NL2SQL corpus: queries + tables + measures with vectors attached. */
  def buildDocs(spark: SparkSession, root: String, embedder: Embedder): DataFrame = {
    val kinds = Seq(
      ("queries", "question"),
      ("tables", "description"),
      ("measures", "description"))
    val parts = kinds.map { case (k, f) => loadKind(spark, root, k, f) }
      .filter(!_.isEmpty)
    require(parts.nonEmpty, s"no nl2sql docs under $root")
    val all = parts.reduce(_ unionByName _)
    ChunkIndexer.embedChunks(all, "embedding_text", embedder)
      .withColumnRenamed("contentVector", "vector")
  }

  /** F12: unchanged-skip — keep only docs whose (id, payload-hash) is new or
    * changed vs the previous index state (the etag+lastModified analog).
    */
  def changedOnly(docs: DataFrame, prevState: DataFrame): DataFrame = {
    val hashed = docs.withColumn("payload_hash", md5(col("payload")))
    hashed.join(
      prevState.select(col("id"), col("payload_hash").as("prev_hash")),
      Seq("id"), "left")
      .filter(col("prev_hash").isNull || col("prev_hash") =!= col("payload_hash"))
      .drop("prev_hash")
  }
}
