package graft

import org.apache.spark.sql.SparkSession

/** Dev attribution main (r15): the per-query cost FLOOR of the bench
  * protocol — a bare table scan materialized via toRdd.count, warmed,
  * with and without the scan-parallelism floor exchange, plus the
  * benched (sort-demoted) shape of a trivial projection. Everything a
  * real query adds on top of these numbers is its own compute. */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm
    for (_ <- 0 until 3) {
      Tables.events(spark, d).queryExecution.toRdd.count()
      spark.conf.set("spark.graft.scanFloor", "0")
      Tables.events(spark, d).queryExecution.toRdd.count()
      spark.conf.unset("spark.graft.scanFloor")
    }
    for (r <- 0 until 5) {
      val withFloor = t(Tables.events(spark, d).queryExecution.toRdd.count())
      spark.conf.set("spark.graft.scanFloor", "0")
      val noFloor = t(Tables.events(spark, d).queryExecution.toRdd.count())
      spark.conf.unset("spark.graft.scanFloor")
      val docsFloor = t(Tables.documents(spark, d).queryExecution.toRdd.count())
      println(f"rep $r: events+floor $withFloor%.3f s  events-nofloor $noFloor%.3f s  docs+floor $docsFloor%.3f s")
    }
    spark.stop()
  }
}
