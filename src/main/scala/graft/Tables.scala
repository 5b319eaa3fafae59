package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS): Spark 4 only reads it as a
    // nanos-since-epoch LongType behind this legacy flag (runtime-settable).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The generated events.ts column has shipped as both TIMESTAMP(NANOS)
    * (read as a nanos long under nanosAsLong) and plain µs TIMESTAMP_NTZ.
    * Normalize to the nanos-since-epoch long every consumer expects; the
    * NTZ naive datetime is the same wall-clock DuckDB's epoch_ns sees, so
    * interpret it as UTC regardless of session zone. */
  private def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * 1000L)
    case _ =>
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
  }

  /** events.ts arrives as nanos-since-epoch long; `tsMicros` gives a real
    * TimestampType column (truncation matches DuckDB ns->us floor for
    * positive epochs). Long `/` long in Spark is DOUBLE division, which
    * corrupts ns-scale epochs (> 2^53); SQL integer `div` keeps the
    * exact quotient with the same truncate-toward-zero semantics the
    * old decimal(38,0) path had, without per-row decimal arithmetic. */
  def tsMicros(nanos: Column): Column =
    timestamp_micros(longDiv(nanos, 1000L))
  /** Epoch seconds from the nanos long — the oracle-safe egress form. */
  def tsSeconds(nanos: Column): Column = longDiv(nanos, 1000000000L)

  private def longDiv(c: Column, d: Long): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast("long")),
        org.apache.spark.sql.catalyst.expressions.Literal(d)))

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
