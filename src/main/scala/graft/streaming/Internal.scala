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

  /** Attach a listener; keep the handle to snapshot or detach. */
  def attach(spark: SparkSession, maxEvents: Int = 10000): Listener = {
    val l = new Listener(maxEvents)
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.sparkContext.removeSparkListener(l)

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
