package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev attribution main (r7 verdict #3): runs one registry query with a
  * SparkListener capturing per-STAGE metrics — task-time totals, skew
  * (max/median task time), shuffle read/write bytes, spill — so a bad
  * wall-clock ratio on the multi-file layouts can be attributed to a
  * specific exchange or scan instead of guessed at. The benched query
  * forms include the oracle's global ORDER BY; pass `nosort` to strip
  * it (the production shape, same as [[Probe]]).
  *
  * Usage: runMain graft.StageProbe <sfDir> <query> [nosort]
  * Emits one JSON line per stage, heaviest first, then a total line.
  */
object StageProbe {

  final class StageAgg {
    var name = ""
    var tasks = 0
    var taskTimes = mutable.ArrayBuffer.empty[Long] // ms
    var runTimeMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    var spillB = 0L
    var inputB = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val noSort = args.length > 2 && args(2) == "nosort"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries ++ Queries.benchOnly.toMap
    val fn = registry(qname)
    def frame(d: String) = {
      val df = fn(spark, d)
      if (!noSort) df
      else df.queryExecution.logical match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
          org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, s.child)
        case _ => df
      }
    }
    // two-stage warmup (same rationale as Bench)
    frame("/root/testdata/sf0.001").queryExecution.toRdd.count()
    frame("/root/testdata/sf0.01").queryExecution.toRdd.count()

    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val agg = stages.getOrElseUpdate(e.stageId, new StageAgg)
        agg.tasks += 1
        agg.taskTimes += e.taskInfo.duration
        val m = e.taskMetrics
        if (m != null) {
          agg.runTimeMs += m.executorRunTime
          agg.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          agg.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          agg.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
          agg.inputB += m.inputMetrics.bytesRead
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, new StageAgg)
            .name = e.stageInfo.name
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    frame(sfDir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    val rows = stages.toSeq.sortBy(-_._2.runTimeMs)
    for ((sid, a) <- rows) {
      val ts = a.taskTimes.sorted
      val med = if (ts.isEmpty) 0L else ts(ts.length / 2)
      val mx = if (ts.isEmpty) 0L else ts.last
      val skew = if (med > 0) mx.toDouble / med else 0.0
      println(f"""{"stage":$sid,"tasks":${a.tasks},"task_time_ms":${a.runTimeMs},"med_task_ms":$med,"max_task_ms":$mx,"skew":$skew%.2f,"shuffle_read_mb":${a.shuffleReadB / 1048576.0}%.1f,"shuffle_write_mb":${a.shuffleWriteB / 1048576.0}%.1f,"input_mb":${a.inputB / 1048576.0}%.1f,"spill_mb":${a.spillB / 1048576.0}%.1f,"name":"${a.name.takeWhile(_ != '(')}"}""")
    }
    println(f"""{"query":"$qname","sf":"$sfDir","wall_sec":$wall%.3f,"stages":${rows.length},"total_task_sec":${rows.map(_._2.runTimeMs).sum / 1000.0}%.1f,"nosort":$noSort}""")
    spark.stop()
  }
}
