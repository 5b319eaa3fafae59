package graft.model

import org.apache.spark.sql.types._

/** The record type flowing through a graft pipeline.
  *
  * Mirrors the reference's `LogMessage` (`/root/reference/lib/logmsg/
  * logmsg.h:156-230`): builtin columns are real struct fields (HOST,
  * PROGRAM, MESSAGE, ... `logmsg.h:76-95`), the priority is split into
  * `facility`/`severity` (`logmsg.h:201`), three timestamp classes
  * (`logmsg.h:67-73`), dynamic name-value pairs live in a string map
  * (the reference's NVTable, `lib/logmsg/nvtable.h`), tags as a string
  * array (`lib/logmsg/tags.c`), regexp match groups `$0..$N` as an array
  * (`logmsg.h:65`).
  *
  * Unlike the reference (string-first NVTable, type hints at the edges,
  * `lib/type-hinting.h:40-51`), hot builtin fields are strongly typed so
  * Catalyst can prune/push them; the `values` map keeps the fully-dynamic
  * long tail.
  */
object LogSchema {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),          // event time (STAMP)
    StructField("recvd_ts", TimestampType),    // arrival time (RECVD)
    StructField("proc_ts", TimestampType),     // processing time (PROCESSED)
    StructField("host", StringType),
    StructField("host_from", StringType),
    StructField("program", StringType),
    StructField("pid", StringType),
    StructField("msgid", StringType),
    StructField("message", StringType),
    StructField("facility", IntegerType),
    StructField("severity", IntegerType),
    StructField("tags", ArrayType(StringType, containsNull = false)),
    StructField("matches", ArrayType(StringType)),
    StructField("sdata", MapType(StringType, StringType)),
    StructField("values", MapType(StringType, StringType)),
    StructField("source", StringType)          // originating source name
  ))

  /** Struct returned by the syslog parse expression (subset of the full
    * record: what one raw line yields). */
  val parsedSchema: StructType = StructType(Seq(
    StructField("pri", IntegerType),
    StructField("facility", IntegerType),
    StructField("severity", IntegerType),
    StructField("version", IntegerType),       // 0 = RFC3164
    StructField("ts", TimestampType),
    StructField("host", StringType),
    StructField("program", StringType),
    StructField("pid", StringType),
    StructField("msgid", StringType),
    StructField("sdata", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("message", StringType)
  ))
}

/** Typed view of the core record for Dataset[LogRecord] paths. */
case class LogRecord(
    ts: java.sql.Timestamp,
    recvd_ts: java.sql.Timestamp,
    proc_ts: java.sql.Timestamp,
    host: String,
    host_from: String,
    program: String,
    pid: String,
    msgid: String,
    message: String,
    facility: Int,
    severity: Int,
    tags: Seq[String],
    matches: Seq[String],
    sdata: Map[String, String],
    values: Map[String, String],
    source: String)
