package graft

import graft.operators.{Filters, Rewrites}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Semantics port of the reference's tag battery
  * (`/root/reference/lib/logmsg/tests/test_tags.c`). The C suite
  * exercises the interned-tag registry (`log_tags_get_by_name` assigns
  * sequential LogTagIds, idempotently; `log_tags_get_by_id` of an
  * unregistered id is NULL), the per-message tag store across the
  * inline-bitset boundary (ids < 8*sizeof(gulong)=64 live inline in the
  * LogMessage, larger ids spill to the heap array — test_msg_tags:134
  * pins that boundary), and the tags() filter truth table with and
  * without negation (test_filters_true/test_filters_false).
  *
  * The engine's tag store is an `array<string>` column — no numeric ids
  * exist, so the registry/bitset internals have no surface — and the
  * engine-visible contract maps as:
  *  - registration idempotence → set-tag of a present tag leaves ONE
  *    entry (Rewrites.setTag's array_union);
  *  - the 64-id inline boundary → set/clear correctness on one message
  *    across a tag population well past 64, in both directions;
  *  - id-order rendering (the reference renders ${TAGS} in
  *    first-registration id order) → first-set order of the array;
  *  - filter truth table: FILTER_TAGS=100 single-tag messages against
  *    the {i : i%3==1} tag list, plus the no-tags message, with
  *    comp=FALSE (test_filters_false asserts raw matches) and comp=TRUE
  *    (test_filters_true asserts the negation, and that a message with
  *    no tags passes the negated filter).
  */
class TagsBatterySpec extends GraftSuite {
  import spark.implicits._

  /** get_tag_by_id (test_tags.c:44-48). */
  private def tagName(i: Int): String = s"tags$i"

  /** One empty message (log_msg_new_empty) with the engine's tag store. */
  private def emptyMsg: DataFrame =
    Seq(Tuple1("m")).toDF("message")
      .withColumn("tags", array().cast("array<string>"))

  private def tagsOf(df: DataFrame): Seq[String] =
    df.select("tags").collect().head.getSeq[String](0)

  // test_msg_tags (:90-142): set every tag, then clear every tag, checking
  // membership after each pass; NUM spans the 64-id inline boundary the C
  // test pins at :134 (the engine has no bitset — the pin here is that
  // set/clear stay exact across a population far past any small-store
  // optimization, with no dup / no loss).
  test("test_msg_tags: set then clear across the inline-bitset boundary") {
    val Num = 150
    val names = (0 until Num).map(tagName)
    val allSet = names.foldLeft(emptyMsg)(Rewrites.setTag(_, _))
    assert(tagsOf(allSet) == names) // all present, first-set id order

    // second registration pass (test_tags:57 check loop): same ids —
    // re-setting every tag changes nothing
    val reSet = names.foldLeft(allSet)(Rewrites.setTag(_, _))
    assert(tagsOf(reSet) == names)

    // clear pass (set=0 loop): clear the first half, the rest remain
    val halfCleared = names.take(Num / 2).foldLeft(reSet)(Rewrites.clearTag(_, _))
    assert(tagsOf(halfCleared) == names.drop(Num / 2))

    // finish clearing — empty again; clearing an absent tag is a no-op
    val allCleared = names.drop(Num / 2).foldLeft(halfCleared)(Rewrites.clearTag(_, _))
    assert(tagsOf(allCleared).isEmpty)
    assert(tagsOf(Rewrites.clearTag(allCleared, "tags3")).isEmpty)
  }

  // test_tags (:50-88) registry semantics that survive the representation
  // change: a name registered twice is ONE tag (ids are stable), and
  // rendering order is first-registration order.
  test("test_tags: re-registration is idempotent and order is first-set") {
    val df = Seq("tags2", "tags0", "tags1", "tags0", "tags2")
      .foldLeft(emptyMsg)(Rewrites.setTag(_, _))
    assert(tagsOf(df) == Seq("tags2", "tags0", "tags1"))
    val rendered = df.select(
      graft.template.Macros.resolver(df.columns.toSet)("TAGS").as("t"))
      .as[String].collect().head
    assert(rendered == "tags2,tags0,tags1")
  }

  /** FILTER_TAGS=100 messages, message i carrying exactly tag i, plus the
    * no-tags message (the C loop clears the tag and re-evaluates). */
  private def filterCorpus: DataFrame = {
    val tagged = (0 until 100).map(i => (i, Seq(tagName(i))))
    val noTags = Seq((100, Seq.empty[String]))
    (tagged ++ noTags).toDF("id", "tags")
  }

  /** The filter's tag list: ids 1,4,7,...,97 (test_filters_*:154). */
  private val filterTags: Seq[String] =
    (1 until 100 by 3).map(tagName)

  test("test_filters_false: tags() matches exactly the listed tags; " +
      "a message with no tags never matches") {
    val got = filterCorpus.filter(Filters.tags(filterTags: _*))
      .select("id").as[Int].collect().toSet
    assert(got == (1 until 100 by 3).toSet)
  }

  test("test_filters_true: negated tags() matches the complement, " +
      "including the no-tags message") {
    val got = filterCorpus.filter(!Filters.tags(filterTags: _*))
      .select("id").as[Int].collect().toSet
    assert(got == ((0 until 100).filterNot(_ % 3 == 1).toSet + 100))
  }

  // rewrites/set-tag/test_set_tag.py: set-tag under condition(match())
  // through the compiled config path — only the matching condition's tag
  // lands in ${TAGS}
  test("test_set_tag.py: conditioned set-tag through config, " +
      "${TAGS} renders only the matching tag") {
    val src = Seq(Tuple1("input with MATCHSTRING in it")).toDF("message")
      .withColumn("tags", array().cast("array<string>"))
    val cfg = graft.config.ConfigParser.parse("""
      source s_gen { network(); };
      rewrite r_match { set-tag("SHOULDMATCH"
        condition(match("MATCHSTRING" value("MSG")))); };
      rewrite r_nomatch { set-tag("DONOTMATCH"
        condition(match("NONE" value("MSG")))); };
      destination d_file { file("/out/output.log"); };
      log { source(s_gen); rewrite(r_match); rewrite(r_nomatch);
            destination(d_file); };
    """)
    val df = graft.config.ConfigCompiler.compile(cfg, Map("s_gen" -> src))
      .head.df
    val line = df.select(graft.template.Template.column("$TAGS",
      df.columns.toSeq).as("l")).head.getString(0)
    assert(line.contains("SHOULDMATCH") && !line.contains("DONOTMATCH"))
  }
}
