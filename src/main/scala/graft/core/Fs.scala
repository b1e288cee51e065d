package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Resolution-independent filesystem probes. Table/index directories are
  * Spark data paths — on a cluster they live on HDFS/S3/ABFS, where a
  * `java.io.File` check silently answers "absent" and an exists-guarded
  * writer would clobber existing state. Every data-path existence check in
  * the library goes through here.
  */
object Fs {

  /** Does `dir` exist under the session's Hadoop configuration? */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Executor-side FileSystem for a path (no SparkSession available inside
    * foreachPartition; the default Configuration picks up core-site.xml
    * from the executor classpath, which resolves the same filesystems).
    */
  def executorFs(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(new Configuration()), p)
  }
}
