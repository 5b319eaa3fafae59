package graft

import org.apache.spark.sql.SparkSession

/** Dev plan-inspection main: print the formatted physical plan of a
  * registry query at a given SF dir (the `.explain("formatted")`
  * discipline from the build instructions, runnable outside tests).
  *
  * Usage: runMain graft.Explain <sfDir> <query1,query2,...> [exec]
  * `exec` additionally RUNS the query first so AQE's final plan (the
  * one with runtime join strategy changes) is printed, not the static
  * estimate.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries ++ Queries.benchOnly.toMap
    val exec = args.length > 2 && args(2) == "exec"
    for (name <- args(1).split(",")) {
      val df = registry(name)(spark, args(0))
      if (exec) df.queryExecution.toRdd.count()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
