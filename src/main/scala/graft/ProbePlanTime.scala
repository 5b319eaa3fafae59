package graft

import org.apache.spark.sql.SparkSession

/** Dev attribution main (r15): split a registry query's wall time into
  * BUILD (DataFrame construction — expression-tree assembly),
  * PLAN (analysis+optimization+physical planning via executedPlan),
  * and RUN (toRdd.count) to decide whether the bench tail is
  * planning-bound or execution-bound.
  *
  * Usage: runMain graft.ProbePlanTime <sfDir> <q1,q2,...> [reps]
  */
object ProbePlanTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = SparkEntry.queries ++ Queries.benchOnly.toMap
    val reps = if (args.length > 2) args(2).toInt else 3
    for (name <- args(1).split(",")) {
      val fn = registry(name)
      // warm (codegen/JIT) like the bench
      // NonFatal only: swallowing OOM/interrupts here would mask a dying
      // JVM and corrupt the timings being attributed (r15 ADVICE)
      for (w <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
        try fn(spark, w).queryExecution.toRdd.count()
        catch { case scala.util.control.NonFatal(_) => () }
      for (r <- 0 until reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, args(0))
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        println(f"$name rep$r build ${(t1 - t0) / 1e6}%7.1f ms  plan ${(t2 - t1) / 1e6}%7.1f ms  run ${(t3 - t2) / 1e6}%7.1f ms")
      }
    }
    spark.stop()
  }
}
