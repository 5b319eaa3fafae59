package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe: does the expression-regime tree assignment
  * evaluate nearest_fine_tree ONCE per row, or did the null-guard
  * filter push below the Project and duplicate it? */
object ProbeTreePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, args(0))
    val df = pipeline.Similarity.assignClusters(
      emb.select(col("vec_id"), col("embedding").as("v"))
        .select(col("vec_id"), col("v")),
      nCentroids = 64, flatMax = 1, nProbe = 4, levels = 3)
    val plan = df.queryExecution.executedPlan.toString
    println("OCCURRENCES=" + "nearest_fine_tree".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(_.contains("nearest_fine_tree"))
      .map(_.take(200)).mkString("\n"))
    spark.stop()
  }
}
