package graft.streaming

import graft.operators.Routing
import graft.operators.Routing.Branch
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sinks (SURVEY §2.9). The reference's templated file paths are
  * dynamic partitioning; multi-destination log paths are a fan-out that
  * must not recompute the source per sink (§7.4 risk 2) — `foreachBatch`
  * + persist gives the mpx/COW equivalent: one scan, N filtered writes.
  */
object Sinks {

  /** file("/p/$HOST/$YEAR$MONTH.log") (`modules/affile/affile-dest.c`):
    * template path columns become partition columns. Batch form; the
    * streaming form goes through [[foreachBatchPartitioned]]. */
  def partitionedWrite(df: DataFrame, outDir: String, pathCols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.mode("append").format(format).partitionBy(pathCols: _*).save(outDir)

  /** Streaming templated-path file sink. */
  def foreachBatchPartitioned(ds: Dataset[Row], outDir: String,
      pathCols: Seq[String], checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        partitionedWrite(batch.toDF(), outDir, pathCols)
      }

  /** Multi-destination fan-out (`lib/logmpx.c:73-131`): one persisted
    * micro-batch, each branch (with final/fallback routing semantics
    * from §2.6) filtered and written — the scan runs once per trigger,
    * not once per destination. */
  def foreachBatchFanOut(ds: Dataset[Row], checkpoint: String,
      branches: Seq[Branch], writer: (DataFrame, String) => Unit): DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val cached = batch.persist()
        try
          Routing.effectivePredicates(branches).foreach { case (b, pred) =>
            writer(cached.filter(pred).toDF(), b.name)
          }
        finally { cached.unpersist(); () }
      }

  /** sql() destination (`modules/afsql/afsql.h:62-117`): INSERT each
    * micro-batch over JDBC. `table` may be computed per batch for the
    * reference's templated table() — pass a constant for the common case.
    * Exactly-once = checkpoint + idempotent/transactional target, the
    * Spark replacement for the reference's txn + disk-buffer pair. */
  def jdbcSink(ds: Dataset[Row], url: String, table: String,
      props: java.util.Properties, checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").jdbc(url, table, props)
      }

  /** kafka() destination (`modules/kafka/`): native Structured Streaming
    * sink. Requires the spark-sql-kafka package on the cluster (absent in
    * this dev container — compile-checked only). */
  def kafkaSink(ds: Dataset[Row], bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** Start a fan-out writing parquet per branch under `outDir/<branch>`. */
  def startFanOutParquet(ds: Dataset[Row], outDir: String, checkpoint: String,
      branches: Seq[Branch]): StreamingQuery =
    foreachBatchFanOut(ds, checkpoint, branches, (df, name) =>
      df.write.mode("append").parquet(s"$outDir/$name"))
      .trigger(Trigger.AvailableNow())
      .start()
}
