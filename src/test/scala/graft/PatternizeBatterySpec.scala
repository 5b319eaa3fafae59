package graft

import graft.patterndb.Patternize
import org.apache.spark.sql.functions._

/** Verbatim port of the patternize battery
  * (`/root/reference/modules/dbparser/tests/test_patternize.c`): the
  * 9 `test_frequent_words` cases (both the direct and the two-pass
  * hash-cache variants verify against the same expectations — the
  * cache is a pruning optimization with identical output, so one
  * aggregation covers both) and the 8 `test_find_clusters_slct` cases.
  *
  * The C harness wraps every input line as
  * `Jul 29 06:25:41 vav zorp/inter_http[27940]: <line>` and parses it
  * back to a LogMessage (test_patternize.c:78) — the port replays that
  * through [[graft.functions.SyslogLineParser]] so MESSAGE extraction
  * rides the same parse path, not a shortcut.
  */
class PatternizeBatterySpec extends GraftSuite {
  import spark.implicits._

  private val Delims = " :&~?![]=,;()'\""

  /** test_patternize.c:78: wrap + syslog-parse each input line; the
    * cluster/word functions then run over MESSAGE. */
  private def messagesOf(logs: String): Seq[String] =
    logs.split("\n", -1).filter(_.nonEmpty).toSeq.map { line =>
      val wrapped = s"Jul 29 06:25:41 vav zorp/inter_http[27940]: $line"
      val p = graft.functions.SyslogLineParser.parse(wrapped, 2019,
        noParse = false, expectHostname = true, noHostname = false,
        noParseDate = false, refMon = -1, badHostname = null,
        syslogProtocol = false, checkHostname = false, noHeader = false)
      assert(p.message != null, s"parse failed for: $wrapped")
      p.message
    }

  private def freqMap(logs: String, support: Long): Map[String, Long] = {
    val df = messagesOf(logs).toDF("message")
    Patternize.frequentWords(df, col("message"), support, Delims)
      .collect().map(r => s"${r.getInt(0)} ${r.getString(1)}" -> r.getLong(2))
      .toMap
  }

  /** One frequent-words case: `expected` is the C battery's
    * `"pos word:count"` CSV; every listed key must carry exactly that
    * count (0 = absent, like the C's g_hash_table_lookup miss). */
  private def checkFreq(logs: String, support: Long, expected: String): Unit = {
    val got = freqMap(logs, support)
    if (expected.nonEmpty) expected.split(",").foreach { item =>
      val Array(key, cnt) = item.split(":", 2)
      assert(got.getOrElse(key, 0L) == cnt.toLong,
        s"word '$key': expected $cnt, got ${got.getOrElse(key, 0L)} " +
          s"(support=$support, input=$logs, map=$got)")
    }
  }

  test("test_frequent_words (test_patternize.c:101-154)") {
    checkFreq("a\n", 0, "0 a:1")
    checkFreq("a b\n", 0, "0 a:1,1 b:1")
    checkFreq("a a\nb b", 0, "0 a:1,1 a:1,0 b:1,1 b:1")
    checkFreq("a b\nb a", 0, "0 a:1,1 a:1,0 b:1,1 b:1")
    checkFreq("a b\na b", 0, "0 a:2,1 b:2")
    // support threshold
    checkFreq("a\n", 1, "")
    checkFreq("a b\n", 1, "")
    checkFreq("a b\nb a", 1, "0 a:1,1 a:1,0 b:1,1 b:1")
    checkFreq("a b\nb a\na c", 2, "0 a:2")
  }

  test("frequent words keep count == support and drop count < support " +
      "(the remove predicate is strict '<', patternize.c:93-96)") {
    // the battery's "" expectations (:135-140) check NOTHING — the C
    // remove predicate is `count < support`, so a word at exactly the
    // threshold SURVIVES
    assert(freqMap("a\n", 1) == Map("0 a" -> 1L))
    assert(freqMap("a b\n", 1) == Map("0 a" -> 1L, "1 b" -> 1L))
    assert(freqMap("a\n", 2).isEmpty)
    assert(freqMap("a b\nb a\na c", 2) == Map("0 a" -> 2L))
  }

  /** One SLCT case: `expected` = `lines:support|...` — for each item a
    * cluster must exist whose member set is EXACTLY those input lines
    * and whose support matches (the C's _clusters_find checks
    * found-all + completeness). */
  private def checkClusters(logs: String, support: Long,
      expected: String): Unit = {
    val msgs = messagesOf(logs)
    val df = msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "message")
    val clusters = Patternize.findClustersSlct(df, col("id"),
        col("message"), support, Delims)
      .select(col("members"), col("support"))
      .collect().map(r => (r.getSeq[Long](0).toSet, r.getLong(1)))
    expected.split("\\|").foreach { item =>
      val Array(linesS, supS) = item.split(":", 2)
      val want = linesS.split(",").map(_.toLong).toSet
      val hit = clusters.find(_._1 == want)
      assert(hit.isDefined,
        s"no cluster with members $want (support=$support, " +
          s"input=$logs, clusters=${clusters.toSeq})")
      assert(hit.get._2 == supS.toLong,
        s"cluster $want: expected support $supS, got ${hit.get._2}")
    }
  }

  test("test_find_clusters_slct (test_patternize.c:299-364)") {
    checkClusters("a\n", 0, "0:1")
    checkClusters("a\nb\n", 0, "0:1|1:1")
    checkClusters("a\nb\na\nb\n", 2, "0,2:2|1,3:2")
    checkClusters("alma korte korte alma\nalma korte\nbela korte\nalma\n", 1,
      "0:1|1:1|2:1|3:1")
    checkClusters("alma korte\nalma korte\nalma korte\nalma korte\n" +
      "bela korte\nbela korte\nalma\n", 2, "0,1,2,3:4|4,5:2")
    checkClusters("alma korte\nalma korte\nalma korte\nalma korte\n" +
      "bela korte\nbela korte\nalma\n", 3, "0,1,2,3:4")
    checkClusters("alma korte asdf1 labda\nalma korte asdf2 labda\n" +
      "alma korte asdf3 labda\nsallala\n", 3, "0,1,2:3")
    checkClusters("alma korte asdf1 labda qwe1\nalma korte asdf2 labda qwe2\n" +
      "alma korte asdf3 labda qwe3\nsallala\n", 3, "0,1,2:3")
  }

  test("SLCT extras the C cases imply: non-candidate lines cluster " +
      "nowhere; same words under different delimiters split") {
    // "sallala" (support 3, appears once) is not a candidate: it must
    // not appear in ANY cluster's members
    val msgs = messagesOf("alma korte asdf1 labda\nalma korte asdf2 labda\n" +
      "alma korte asdf3 labda\nsallala\n")
    val df = msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "message")
    val members = Patternize.findClustersSlct(df, col("id"),
        col("message"), 3, Delims)
      .select(explode(col("members"))).as[Long].collect().toSet
    assert(!members.contains(3L))
    // delimiter-sequence unicity (patternize.c:284-288): "a b" vs "a:b"
    // carry the same words at the same positions but must NOT merge
    val df2 = Seq((0L, "a b"), (1L, "a:b"), (2L, "a b"))
      .toDF("id", "message")
    val cl2 = Patternize.findClustersSlct(df2, col("id"), col("message"),
        0, Delims)
      .select(col("members")).collect().map(_.getSeq[Long](0).toSet).toSet
    assert(cl2.contains(Set(0L, 2L)) && cl2.contains(Set(1L)), cl2.toString)
  }
}
