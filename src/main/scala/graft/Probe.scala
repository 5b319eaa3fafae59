package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Dev profiling main: times registry queries at a given SF dir, both
  * as-registered and with the top-level global Sort stripped — the
  * oracle queries end in a total ORDER BY purely so the driver's
  * hash-compare is deterministic, and a range sort re-executes the
  * whole chain once for sampling, so the stripped number is the one
  * that models production (where nobody total-orders parse output).
  * The r7 sf1 scale matrix used this to attribute super-linear
  * full-query times to the harness sort (operators themselves scale
  * linearly; table in SURVEY §8).
  *
  * Usage: runMain graft.Probe <sfDir> <query1,query2,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val names = args(1).split(",")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      fn(spark, "/root/testdata/sf0.01").queryExecution.toRdd.count()
      def t(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val full = t(fn(spark, d).queryExecution.toRdd.count())
      val df = fn(spark, d)
      val stripped = df.queryExecution.logical match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
          Some(org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, s.child))
        case _ => None
      }
      val noSort = stripped.map(ds => t(ds.queryExecution.toRdd.count()))
      println(f"PROBE $name full=$full%.2f nosort=${noSort.getOrElse(-1.0)}%.2f")
    }
    spark.stop()
  }
}
