package graft

import graft.dsl.LogPath
import graft.dsl.LogPath._
import org.apache.spark.sql.functions._

class LogPathSpec extends GraftSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (1, "error", 10), (2, "warn", 200), (3, "error", 300), (4, "info", 5))
    .toDF("id", "level", "size")

  test("sequence compile: filter then transform") {
    val out = LogPath.compile(df, Seq(
      Filter(col("size") > 50),
      Transform(_.withColumn("big", lit(true)))))
    assert(out.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("junction: final blocks later channels, fallback catches the rest") {
    val out = LogPath.compileJunction(df, Seq(
      Channel("errs", Seq(Filter(col("level") === "error")), Set(Final)),
      Channel("big", Seq(Filter(col("size") > 100)), Set(Final)),
      Channel("rest", Seq.empty, Set(Fallback))))
    val got = out.select("id", "__channel").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // id=3 is error AND big: final on errs wins; id=4 matches nothing → rest
    assert(got == Set((1, "errs"), (3, "errs"), (2, "big"), (4, "rest")))
  }

  test("junction without final: multi-delivery like plain fan-out") {
    val out = LogPath.compileJunction(df, Seq(
      Channel("errs", Seq(Filter(col("level") === "error"))),
      Channel("big", Seq(Filter(col("size") > 100)))))
    val got = out.select("id", "__channel").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "errs"), (3, "errs"), (2, "big"), (3, "big")))
  }

  test("junction branches with different schemas union by name") {
    val out = LogPath.compileJunction(df, Seq(
      Channel("a", Seq(Filter(col("level") === "error"),
        Transform(_.withColumn("extra", lit("x")))), Set(Final)),
      Channel("b", Seq.empty, Set(Fallback))))
    val cols = out.columns.toSet
    assert(cols.contains("extra"))
    val b = out.filter(col("__channel") === "b").select("extra").collect()
    assert(b.forall(_.isNullAt(0)))
  }

  test("appParser: detect + parse per app, unknown fallback") {
    val logs = Seq(
      (1, "GET /idx HTTP/1.1 200"), (2, "sshd[9]: Accepted password"),
      (3, "whatever else")).toDF("id", "line")
    val out = LogPath.appParser(logs, Seq(
      ("http", col("line").rlike("HTTP/\\d"),
        _.withColumn("status", regexp_extract(col("line"), "(\\d+)$", 1))),
      ("sshd", col("line").contains("sshd"),
        _.withColumn("auth", regexp_extract(col("line"), "(Accepted|Failed)", 1)))))
    val got = out.select("id", "__channel").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "http"), (2, "sshd"), (3, "unknown")))
    assert(out.filter(col("id") === 1).select("status").head.getString(0) == "200")
    assert(out.filter(col("id") === 2).select("auth").head.getString(0) == "Accepted")
  }
}
