package graft.streaming

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.ConcurrentLinkedDeque

/** internal() (`/root/reference/lib/afinter.c`): the engine's own
  * diagnostics surfaced as messages in the pipeline. The Spark-native
  * form is a SparkListener: scheduler events become LogRecord-shaped
  * rows (program = "spark", facility 5 = syslogd-internal, severity
  * from the event outcome), which any log path can then filter, parse,
  * and route like real traffic.
  *
  * The buffer is bounded (oldest dropped) so a long-running session
  * cannot grow the driver; `snapshot` drains the current contents into
  * a DataFrame.
  */
/** One internal diagnostic row (top-level so Spark's reflection encoder
  * resolves it without a path-dependent type). */
final case class InternalEvent(ts: java.sql.Timestamp, host: String,
    program: String, facility: Int, severity: Int, message: String)

object Internal {

  final class Listener(maxEvents: Int = 10000) extends SparkListener {
    private[Internal] val buf = new ConcurrentLinkedDeque[InternalEvent]()
    // ConcurrentLinkedDeque.size() is O(n); at steady state (buf full)
    // that would traverse 10k nodes per scheduler event on the
    // listener-bus thread — count separately in O(1)
    private val count = new java.util.concurrent.atomic.AtomicInteger(0)

    /** Engine lifecycle notice (mainloop.c:658 "syslog-ng starting
      * up", mainloop-worker.c:385 "Configuration reload finished",
      * mainloop.c:460 "syslog-ng shutting down"): the reference's
      * msg_notice()s are internal() messages; [[Internal.lifecycle]]
      * routes ours here so an internal() path observes the same
      * start/reload/stop record stream
      * (test_internal_acceptance.py). */
    private[Internal] def notice(message: String): Unit = add(5, message)

    private def add(severity: Int, message: String): Unit = {
      buf.addLast(InternalEvent(
        new java.sql.Timestamp(System.currentTimeMillis()),
        "driver", "spark", 5, severity, message))
      if (count.incrementAndGet() > maxEvents && buf.pollFirst() != null)
        count.decrementAndGet()
    }

    override def onJobStart(e: SparkListenerJobStart): Unit =
      add(6, s"job ${e.jobId} started: ${e.stageInfos.size} stages")

    override def onJobEnd(e: SparkListenerJobEnd): Unit = e.jobResult match {
      case JobSucceeded => add(6, s"job ${e.jobId} succeeded")
      case _ => add(3, s"job ${e.jobId} failed")
    }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val s = e.stageInfo
      val sev = if (s.failureReason.isDefined) 3 else 7
      add(sev, s"stage ${s.stageId} ${s.name} completed: " +
        s"${s.numTasks} tasks${s.failureReason.map(r => s" FAILED: $r").getOrElse("")}")
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      e.reason match {
        case org.apache.spark.Success =>
        case reason => add(4, s"task ${e.taskInfo.taskId} ended: $reason")
      }
  }

  // attached-listener registry so lifecycle notices reach every live
  // internal() buffer without threading handles through the config
  // compiler
  private val attached =
    java.util.Collections.synchronizedSet(
      new java.util.HashSet[Listener]())

  /** Attach a listener; keep the handle to snapshot or detach. */
  def attach(spark: SparkSession, maxEvents: Int = 10000): Listener = {
    val l = new Listener(maxEvents)
    spark.sparkContext.addSparkListener(l)
    attached.add(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit = {
    attached.remove(l)
    spark.sparkContext.removeSparkListener(l)
  }

  /** Post an engine lifecycle notice (severity 5, program "spark") to
    * every attached internal() buffer — the analog of the reference's
    * mainloop msg_notice()s, which surface through internal(). */
  def lifecycle(message: String): Unit = {
    val arr = attached.synchronized(
      attached.toArray(new Array[Listener](0)))
    arr.foreach(_.notice(message))
  }

  /** Current buffered diagnostics as a LogRecord-shaped frame. */
  def snapshot(spark: SparkSession, l: Listener): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("host", StringType),
      StructField("program", StringType), StructField("facility", IntegerType),
      StructField("severity", IntegerType), StructField("message", StringType)))
    val rows = l.buf.toArray(new Array[InternalEvent](0)).toList.map(e =>
      Row(e.ts, e.host, e.program, e.facility, e.severity, e.message))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
