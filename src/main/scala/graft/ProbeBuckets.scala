package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off attribution: hyperplane bucket-population skew at a given
  * scale (the sf100p candidate-pair explosion). */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val planes = pipeline.Dedup.planesFor(n, targetBucket = 32)
    println(s"n=$n planes=$planes")
    val sig = pipeline.Similarity.hyperplaneBucket(col("embedding"), planes,
      seed = 42, dim = 64)
    val pops = emb.select(sig.as("b")).groupBy("b").count()
    val stats = pops.agg(count("*").as("nb"), max("count").as("mx"),
      expr("percentile_approx(count, 0.5)").as("med"),
      sum(col("count") * (col("count") - 1) / 2).as("pairs")).head
    println(s"buckets=${stats.getLong(0)} maxPop=${stats.getLong(1)} " +
      s"medPop=${stats.get(2)} candPairsOneTable=${stats.get(3)}")
    spark.stop()
  }
}
