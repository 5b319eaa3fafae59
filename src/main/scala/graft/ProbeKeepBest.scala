package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe (r15): does the scan-parallelism floor cost
  * dedup_keep_best its exchange reuse in the eager edges job? Prints
  * the edges plan's exchange/reuse/scan census with the floor on and
  * off. */
object ProbeKeepBest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (floor <- Seq("0", "32")) {
      spark.conf.set("spark.graft.scanFloor", floor)
      val docs = Tables.documents(spark, d)
      val edges = pipeline.Dedup.simhashClusterEdges(docs,
        col("doc_id"), col("text"), maxHamming = 3, algo = "md5")
      val t0 = System.nanoTime()
      edges.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val p = edges.queryExecution.executedPlan.toString
      def c(s: String) = p.linesIterator.count(_.contains(s))
      println(f"floor=$floor%-3s ${dt}%6.2f s  Exchange=${c("Exchange")} Reused=${c("ReusedExchange")} scans=${c("documents.parquet")} simhash=${c("simhash")}")
    }
    spark.stop()
  }
}
