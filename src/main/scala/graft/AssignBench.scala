package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main for the SemDeDup centroid-assignment stage in
  * isolation (r7 verdict #1 "done" criterion: an sf4+ point showing
  * assignment scaling ~N·√k, not N·k): times `Similarity
  * .assignClusters` at the production sizing k ≈ N/32 under both the
  * flat compiled-argmax path and the two-level coarse-quantizer path,
  * so the asymptote claim is a measured pair, not a plan reading.
  *
  * Usage: runMain graft.AssignBench <sfDir> [repeat]
  * Emits one JSON line: {"n":..,"k":..,"flat_sec":..,"two_level_sec":..}
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
    val n = base.count()
    // SPARK_GRAFT_ASSIGN_K forces k past the production N/32 sizing —
    // the r10 verdict's k≥500k plumbing check runs at sf100p data
    // without waiting for an sf1000p generation
    val k = sys.env.get("SPARK_GRAFT_ASSIGN_K").map(_.toInt)
      .getOrElse(math.max(64, (n / 32L).toInt))
    // single-task-stage detector: the failure mode of the old
    // orderBy(md5).limit(k) fine selection was a single-partition
    // exchange funneling k vector rows through ONE task. Track
    // shuffle-read records per stage; stages that ran exactly one task
    // and read more than max(2k/P, 4096) rows are reported in the JSON.
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) stageAgg.merge(te.stageId,
            (1L, m.shuffleReadMetrics.recordsRead),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      })
    def singleTaskMaxRows(): Long = {
      // onTaskEnd arrives asynchronously on the listener bus — drain
      // it first or late events can be missed and the metric
      // underreports (ADVICE r11)
      org.apache.spark.graft.ListenerDrain.waitUntilEmpty(
        spark.sparkContext)
      var mx = 0L
      stageAgg.forEach { (_, v) =>
        if (v._1 == 1L && v._2 > mx) mx = v._2
      }
      mx
    }
    def median(f: => Long): Double = {
      val ts = (1 to repeat).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    // warmup all paths at a small slice
    val warm = base.limit(2000)
    graft.pipeline.Similarity.assignClusters(warm, 64).queryExecution.toRdd.count()
    graft.pipeline.Similarity.assignClusters(warm, 64, flatMax = 1, levels = 2).queryExecution.toRdd.count()
    graft.pipeline.Similarity.assignClusters(warm, 64, flatMax = 1, levels = 3).queryExecution.toRdd.count()
    // SPARK_GRAFT_ASSIGN_PATHS selects paths (default all three) — the
    // flat argmax at sf100p sizing (N=2M, k=62.5k) is 125G dots and
    // exists only to be beaten; skip it at the big decades.
    val paths = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_PATHS", "flat,two,tree")
      .split(",").map(_.trim).toSet
    require(paths.exists(Set("flat", "two", "tree")),
      s"SPARK_GRAFT_ASSIGN_PATHS must name at least one of flat/two/tree, got: $paths")
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    if (paths("flat")) parts += s""""flat_sec":${median(graft.pipeline.Similarity
      .assignClusters(base, k, flatMax = Int.MaxValue)
      .queryExecution.toRdd.count())}"""
    if (paths("two")) parts += s""""two_level_sec":${median(graft.pipeline.Similarity
      .assignClusters(base, k, flatMax = 1, levels = 2)
      .queryExecution.toRdd.count())}"""
    if (paths("tree")) {
      stageAgg.clear()
      parts += s""""tree_sec":${median(graft.pipeline.Similarity
        .assignClusters(base, k, flatMax = 1, levels = 3)
        .queryExecution.toRdd.count())}"""
      parts += s""""tree_single_task_shuffle_rows_max":${singleTaskMaxRows()}"""
    }
    println(s"""{"sf":"$sfDir","n":$n,"k":$k,${parts.mkString(",")},"repeat":$repeat}""")
    spark.stop()
  }
}
