package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev helper: print a query's formatted physical plan.
  * `sbt "Test/runMain graft.PlanDump <query_name>"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val df = SparkEntry.queries(args(0))(TestSpark.spark, TestSpark.sf)
    // scalastyle:off println
    println(df.queryExecution.explainString(FormattedMode))
    // scalastyle:on println
  }
}
