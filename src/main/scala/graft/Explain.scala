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
  *
  * SPARK_GRAFT_PLAN_DIR=<dir> [SPARK_GRAFT_PLAN_SUFFIX=_before]:
  * instead of stdout, write each query's `.explain("formatted")`
  * output to <dir>/<query><suffix>.txt — the optimization-round
  * deliverable (plans/r15/). `all` as the query list expands to the
  * whole registry.
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
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val names =
      if (args(1) == "all") registry.keys.toSeq.sorted
      else args(1).split(",").toSeq
    planDir.foreach(d => new java.io.File(d).mkdirs())
    for (name <- names) {
      val df = registry(name)(spark, args(0))
      if (exec) df.queryExecution.toRdd.count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      planDir match {
        case Some(d) =>
          val w = new java.io.PrintWriter(
            new java.io.File(d, name + suffix + ".txt"), "UTF-8")
          try w.println(formatted) finally w.close()
        case None =>
          println(s"===== $name =====")
          println(formatted)
      }
    }
    spark.stop()
  }
}
