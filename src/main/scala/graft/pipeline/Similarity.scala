package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline: one narrow map
  * (cosine per row, codegen'd HOFs) + a top-k, which Spark executes as
  * per-partition TakeOrdered then a driver merge — no shuffle of the
  * full table. The scale path is `hyperplaneBucket` LSH (probe only
  * matching buckets) or `ivfTopK` (probe only the nearest partitions'
  * lists) — both turn the scan into a pruned fraction of the corpus.
  */
object Similarity {

  /** Sequential-order double dot product (bit-stable across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine against a constant query vector: the query's norm is folded
    * driver-side (same sequential double accumulation → bit-identical),
    * so each row pays one dot + one norm instead of three passes. */
  private def cosineToQuery(vec: Column, query: Seq[Float]): Column = {
    val qn = math.sqrt(query.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    dot(vec, typedLit(query)) / (norm(vec) * lit(qn))
  }

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(df: DataFrame, vec: Column, id: Column,
      query: Seq[Float], k: Int): DataFrame =
    df.select(id.as("vec_id"), cosineToQuery(vec, query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)

  /** Random-hyperplane LSH bucket: `planes` sign bits of dot products
    * with seeded pseudo-random hyperplanes. Deterministic in `seed`.
    * Hyperplane components come from xxhash64(seed, plane, dim) mapped to
    * [-1, 1) — no stored model, reproducible on any executor. */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Long): Column = {
    val bits: Seq[Column] = (0 until planes).map { p =>
      val prods = zip_with(vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          (xxhash64(lit(seed), lit(p), i).cast("double") / lit(Long.MaxValue.toDouble)))
      val d = aggregate(prods, lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH ANN: probe only rows whose bucket matches the query's bucket
    * (single-probe). Recall/speed trades by `planes`. */
  def lshTopK(df: DataFrame, vec: Column, id: Column,
      query: Seq[Float], k: Int, planes: Int = 8, seed: Long = 42): DataFrame = {
    val bucketed = df.select(id.as("vec_id"), vec.as("v"),
      hyperplaneBucket(vec, planes, seed).as("bucket"))
    val qDf = bucketed.sparkSession.range(1)
      .select(hyperplaneBucket(typedLit(query), planes, seed).as("qbucket"))
    bucketed.join(broadcast(qDf), col("bucket") === col("qbucket"), "inner")
      .select(col("vec_id"), cosineToQuery(col("v"), query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-lite ANN: cluster the corpus on `nCentroids` seed vectors (rows
    * sampled deterministically by id), assign every vector to its nearest
    * centroid (broadcast argmax — one narrow pass), then probe only the
    * `nProbe` centroids nearest the query. At scale the assignment is
    * done once offline and the probe reads `nProbe/nCentroids` of the
    * corpus; here both steps run inline. */
  def ivfTopK(df: DataFrame, vec: Column, id: Column,
      query: Seq[Float], k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(id.as("vec_id"), vec.as("v"))
    val centroids = base.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val cList = centroids.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1)))

    def nearestCentroid(v: Column): Column = {
      val scored = cList.map { case (cid, cv) =>
        struct(cosineToQuery(v, cv.toSeq).as("cos"), lit(cid).as("cid"))
      }
      array_max(array(scored: _*)).getField("cid")
    }

    val probeSet: Seq[Long] = cList
      .map { case (cid, cv) =>
        val qd = Similarity.cosineLocal(query, cv)
        (cid, qd)
      }
      .sortBy(-_._2).take(nProbe).map(_._1).toSeq

    base.withColumn("cid", nearestCentroid(col("v")))
      .filter(col("cid").isin(probeSet: _*))
      .select(col("vec_id"), cosineToQuery(col("v"), query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Driver-side cosine for centroid selection. */
  private[pipeline] def cosineLocal(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}
