package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Incremental append to a persisted IVF index: new vectors become
  * searchable without retraining, untouched cell partitions keep their
  * files, and old results are unchanged.
  */
class IvfAppendSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("appended vectors are found; untouched cells gain no files") {
    val dir = Files.createTempDirectory("graft-ivf-append")
    val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
    val index = Similarity.buildIvf(spark, emb, "vec_id", "embedding",
      nCells = 4, iters = 2)
    Similarity.writeIvf(index, dir.toString)

    // the new vector is an exact copy of vec 0 with a fresh id — it must
    // land in vec 0's cell and rank at the top of a probe with vec 0
    val probe = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val before = Similarity.searchIvfPartitioned(spark, dir.toString,
      probe.toArray, nprobe = 4, k = 5).collect().map(_.getLong(0)).toSeq

    import scala.jdk.CollectionConverters._
    def cellFiles(): Map[String, Int] = {
      val walk = Files.walk(dir.resolve("assignments"))
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .toSeq.groupBy(_.getParent.getFileName.toString)
        .view.mapValues(_.size).toMap
      finally walk.close()
    }
    val filesBefore = cellFiles()

    Similarity.appendToIvf(spark, dir.toString,
      Seq((9999L, probe)).toDF("vec_id", "embedding"), "vec_id", "embedding")

    val after = Similarity.searchIvfPartitioned(spark, dir.toString,
      probe.toArray, nprobe = 4, k = 5).collect().map(_.getLong(0)).toSeq
    assert(after.take(2).toSet == Set(0L, 9999L),
      s"clone must tie with the original at the top, got $after")
    assert(after.filterNot(_ == 9999L) == before.take(4),
      "pre-existing ranking order must be unchanged below the insert")

    // exactly one cell directory gained files
    val filesAfter = cellFiles()
    val grown = filesAfter.filter { case (cell, n) => n > filesBefore.getOrElse(cell, 0) }
    assert(grown.size == 1, s"expected one grown cell, got $grown")
  }

  test("readIvf round-trips the index: cold-start searchIvf ≡ in-memory") {
    val dir = Files.createTempDirectory("graft-ivf-rt")
    val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
    val index = Similarity.buildIvf(spark, emb, "vec_id", "embedding",
      nCells = 4, iters = 2)
    Similarity.writeIvf(index, dir.toString)
    val back = Similarity.readIvf(spark, dir.toString)
    assert(back.centroids.length == index.centroids.length)
    back.centroids.zip(index.centroids).foreach { case ((ci, a), (cj, b)) =>
      assert(ci == cj && java.util.Arrays.equals(a, b),
        s"centroid $ci must round-trip bit-exactly")
    }
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"cell")
    assert(norm(back.assignments).exceptAll(norm(index.assignments)).isEmpty &&
      norm(index.assignments).exceptAll(norm(back.assignments)).isEmpty,
      "assignments must round-trip row-identically")
    val probe = emb.filter($"vec_id" === 3L)
      .select($"embedding").head().getSeq[Float](0).toArray
    val mem = Similarity.searchIvf(index, probe, nprobe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cold = Similarity.searchIvf(back, probe, nprobe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(cold == mem, "cold-start search must be row-identical")
  }
}
