package graft

import graft.functions.SessionOrdinal
import org.apache.spark.sql.functions._

/** Unit gates for the [[graft.functions.SessionOrdinal]] prefix-scan
  * expression (the session primitive behind grouping-by()/suppress —
  * groupingby.c:35-51): ordinal semantics under its sorted-partition
  * contract, codegen/interpreted equivalence, string-key buffer
  * aliasing, and null-key grouping.
  */
class SessionOrdinalSpec extends GraftSuite {
  import spark.implicits._

  private def ordinals(rows: Seq[(String, Long)], gap: Long,
      parts: Int = 1): Seq[((String, Long), Long)] = {
    val df = rows.toDF("k", "us")
      .repartition(parts, col("k"))
      .sortWithinPartitions(col("k"), col("us"))
      .withColumn("sess", SessionOrdinal.column(col("k"), col("us"), gap))
    df.collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toSeq
  }

  test("gap >= opens a session; key change opens a session; ordinals " +
      "unique per (key, session)") {
    val out = ordinals(Seq(
      ("a", 0L), ("a", 5L), ("a", 15L), // gap 10: 15-5 >= 10 → new session
      ("a", 16L),
      ("b", 0L), ("b", 9L), ("b", 19L)) // 19-9 >= 10 → new
      .sortBy(x => (x._1, x._2)), gap = 10L)
    val byRow = out.toMap
    assert(byRow(("a", 0L)) == byRow(("a", 5L)))
    assert(byRow(("a", 15L)) != byRow(("a", 5L)))
    assert(byRow(("a", 16L)) == byRow(("a", 15L)))
    assert(byRow(("b", 0L)) != byRow(("a", 16L))) // key change
    assert(byRow(("b", 9L)) == byRow(("b", 0L)))
    assert(byRow(("b", 19L)) != byRow(("b", 9L)))
    // exactly-gap boundary matches session_window: [ts, ts+gap) excludes
    // an event arriving exactly gap later
    assert(out.map(_._2).distinct.size == 4)
  }

  test("string keys do not alias the task-reused UnsafeRow buffer " +
      "(consecutive distinct keys each open a session)") {
    val rows = (0 until 1000).map(i => (s"key_$i", 0L))
    val out = ordinals(rows, gap = 1000L)
    assert(out.map(_._2).distinct.size == 1000, "keys collapsed")
  }

  test("null keys form their own group; null != non-null") {
    val df = Seq[(java.lang.Long, Long)]((1L, 0L), (null, 1L), (null, 2L),
      (2L, 3L)).toDF("k", "us")
      .repartition(1)
      .sortWithinPartitions(col("k"), col("us"))
      .withColumn("sess", SessionOrdinal.column(col("k"), col("us"), 100L))
    val out = df.collect().map(r =>
      (Option(r.get(0)), r.getLong(2))).toSeq
    val nullSess = out.filter(_._1.isEmpty).map(_._2).distinct
    assert(nullSess.size == 1, s"null rows split: $out")
    assert(!out.filter(_._1.isDefined).map(_._2).contains(nullSess.head), out)
  }

  test("codegen and interpreted paths agree") {
    val rows = (0 until 500).map(i => (s"k${i % 7}", (i * 13 % 997).toLong))
    val sorted = rows.sortBy(x => (x._1, x._2))
    val fromDf = ordinals(sorted, gap = 50L)
    // interpreted reference: walk the sorted rows with the documented
    // semantics
    var prev: Option[(String, Long)] = None
    var ord = 0L
    val expect = sorted.map { case (k, t) =>
      val fresh = prev.forall { case (pk, pt) => pk != k || t - pt >= 50L }
      if (fresh) ord += 1
      prev = Some((k, t))
      ((k, t), ord)
    }
    // compare session PARTITIONS (ordinal values may differ, grouping
    // must not): same set of (key, members) groups
    def groups(s: Seq[((String, Long), Long)]) =
      s.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups(fromDf) == groups(expect))
  }

  test("multi-partition: ordinals never merge sessions across keys even " +
      "when partitions coalesce several keys") {
    val rows = (0 until 200).flatMap(i =>
      Seq((s"u$i", 0L), (s"u$i", 1L), (s"u$i", 500L)))
    val out = ordinals(rows.sortBy(x => (x._1, x._2)), gap = 100L, parts = 8)
    val grouped = out.groupBy { case ((k, _), sess) => (k, sess) }
    // each key has exactly 2 sessions: {0,1} and {500}
    val perKey = grouped.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perKey.values.forall(_ == 2), perKey.filter(_._2 != 2).take(3))
  }
}
