package graft

class QueriesSpec extends GraftSuite {
  test("every registered query runs and returns rows on sf0.001") {
    Queries.all.foreach { q =>
      val df = q.fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"query ${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching column casing between spark and oracle") {
    // oracle compare sorts columns by name: ensure no dup/odd columns
    Queries.all.foreach { q =>
      val cols = q.fn(spark, sf).columns
      assert(cols.distinct.length == cols.length, s"${q.name} dup columns")
      assert(cols.forall(c => c == c.toLowerCase), s"${q.name} non-lowercase col")
    }
  }
}
