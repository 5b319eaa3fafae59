package graft
import org.apache.spark.sql.SparkSession
// scratch: codegen inspection of default_network (removed after use)
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.queryExecution.toRdd.count() // finalize AQE
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val s = finalPlan.toString
    println("WSCG segments: " + "WholeStageCodegen".r.findAllIn(s).length)
    println(s.split("\n").take(40).mkString("\n"))
    spark.stop()
  }
}
