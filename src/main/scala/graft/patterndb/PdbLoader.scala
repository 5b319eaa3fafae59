package graft.patterndb

import scala.xml.{Elem, XML}

/** One `<example>` golden case: input (program, message) and the expected
  * name/value captures (`modules/dbparser/pdb-example.h:29-38`). */
final case class PdbExample(program: String, message: String,
    expectedValues: Seq[(String, String)])

/** One `<action>` block (`modules/dbparser/pdb-action.c`): fires on
  * `trigger` (match/timeout), guarded by `condition` (a filter
  * expression) and `rate` ("N/SEC" token bucket); `messageValues` /
  * `messageTags` describe the synthetic message. Drives
  * [[graft.streaming.Correlate]]'s onMatch/rateLimit knobs. */
final case class PdbAction(trigger: String, condition: Option[String],
    rate: Option[(Int, Int)], messageValues: Seq[(String, String)],
    messageTags: Seq[String],
    /** `<message inherit-properties>`: "none" (default), "last-message"
      * (TRUE/1), or "context" (synthetic-message.c:51-75). */
    inheritProperties: String = "none")

final case class PdbRule(id: String, ruleClass: String, patterns: Seq[String],
    tags: Seq[String], values: Seq[(String, String)], examples: Seq[PdbExample],
    contextScope: Option[String] = None, contextId: Option[String] = None,
    contextTimeout: Option[Int] = None, actions: Seq[PdbAction] = Nil)

/** `programPatterns` are the ruleset-level selectors: a message is only
  * matched against rulesets whose program pattern matches its PROGRAM
  * (`modules/dbparser/patterndb.c` lookup: program radix → ruleset →
  * message radix). */
final case class PdbRuleset(name: String, programPatterns: Seq[String],
    rules: Seq[PdbRule])

/** Loader for the reference's patterndb XML ruleset format
  * (`/root/reference/modules/dbparser/pdb-load.c`; versions 4/5 as used
  * by `scl/` and the dbparser test suites). Parses `<ruleset>` /
  * `<rules>/<rule>` with patterns, tags, values, and the embedded
  * `<examples>` golden blocks that `pdbtool test` validates
  * (`pdbtool/pdbtool.c:676-792`).
  */
object PdbLoader {

  def loadString(xml: String): Seq[PdbRuleset] =
    parse(XML.loadString(xml))

  def loadFile(path: String): Seq[PdbRuleset] =
    parse(XML.loadFile(path))

  private def parse(root: Elem): Seq[PdbRuleset] = {
    require(root.label == "patterndb", s"expected <patterndb>, got <${root.label}>")
    (root \ "ruleset").map { rs =>
      // ruleset-level program selectors appear both bare (<pattern> directly
      // under <ruleset>, scl/windowseventlog) and grouped (<patterns>)
      val progs = ((rs \ "pattern") ++ (rs \ "patterns" \ "pattern")).map(_.text)
      val rules = (rs \ "rules" \ "rule").map { r =>
        PdbRule(
          id = r \@ "id",
          ruleClass = r \@ "class",
          patterns = (r \ "patterns" \ "pattern").map(_.text),
          tags = (r \ "tags" \ "tag").map(_.text),
          values = (r \ "values" \ "value").map(v => (v \@ "name", v.text)),
          examples = (r \ "examples" \ "example").map { ex =>
            PdbExample(
              program = (ex \ "test_message").headOption.map(_ \@ "program").getOrElse(""),
              message = (ex \ "test_message").text,
              expectedValues = (ex \ "test_values" \ "test_value")
                .map(tv => (tv \@ "name", tv.text)))
          },
          contextScope = Option(r \@ "context-scope").filter(_.nonEmpty),
          contextId = Option(r \@ "context-id").filter(_.nonEmpty),
          contextTimeout = Option(r \@ "context-timeout").filter(_.nonEmpty)
            .map(_.toInt),
          actions = (r \ "actions" \ "action").map { a =>
            // rate='N/SEC' (pdb-action.c token bucket)
            val rate = Option(a \@ "rate").filter(_.nonEmpty).map { rv =>
              val Array(n, per) = rv.split("/", 2)
              (n.toInt, per.toInt)
            }
            // inherit-properties: context | T*/1 -> last-message |
            // F*/0 -> none (synthetic_message_set_inherit_properties_string);
            // inherit-mode takes the mode name directly
            val inheritRaw = (a \ "message").headOption
              .flatMap(m => Option(m \@ "inherit-mode").filter(_.nonEmpty)
                .orElse(Option(m \@ "inherit-properties").filter(_.nonEmpty)))
            val inherit = inheritRaw.map(_.toLowerCase) match {
              case Some("context") => "context"
              case Some("last-message") => "last-message"
              case Some("none") => "none"
              case Some(s) if s.startsWith("t") || s.startsWith("1") => "last-message"
              case Some(s) if s.startsWith("f") || s.startsWith("0") => "none"
              case Some(other) => throw new IllegalArgumentException(
                s"Unknown inherit-properties: $other")
              case None => "none"
            }
            PdbAction(
              trigger = Option(a \@ "trigger").filter(_.nonEmpty).getOrElse("match"),
              condition = Option(a \@ "condition").filter(_.nonEmpty),
              rate = rate,
              messageValues = (a \ "message" \ "values" \ "value")
                .map(v => (v \@ "name", v.text)),
              messageTags = (a \ "message" \ "tags" \ "tag").map(_.text),
              inheritProperties = inherit)
          })
      }
      PdbRuleset(rs \@ "name", progs, rules)
    }
  }

  /** Flatten to the (ruleId, ruleClass, pattern) triples
    * [[graft.functions.RadixMatch]] compiles — the message-only
    * classification path used by `db-parser()`. */
  def radixRules(rulesets: Seq[PdbRuleset]): Seq[(String, String, String)] =
    for (rs <- rulesets; r <- rs.rules; p <- r.patterns) yield (r.id, r.ruleClass, p)
}

/** Program-scoped classifier over loaded rulesets: the program string
  * selects rulesets via their own radix of program patterns, then the
  * message is matched inside each candidate ruleset — the same two-level
  * lookup `pattern_db_process` performs. Returns
  * (ruleId, ruleClass, captures ++ literal rule values). */
final class PdbMatcher(rulesets: Seq[PdbRuleset]) extends Serializable {

  private val entries: Seq[(Radix.Tree, Radix.Tree, Map[String, PdbRule])] =
    rulesets.map { rs =>
      val progTree = new Radix.Tree
      rs.programPatterns.foreach(p => progTree.insert(p, Radix.Rule(rs.name, "ruleset")))
      val msgTree = new Radix.Tree
      rs.rules.foreach(r =>
        r.patterns.foreach(p =>
          msgTree.insert(p, Radix.Rule(r.id, r.ruleClass, r.tags))))
      (progTree, msgTree, rs.rules.map(r => r.id -> r).toMap)
    }

  def classify(program: String, message: String)
      : Option[(String, String, Map[String, String])] = {
    val it = entries.iterator
    while (it.hasNext) {
      val (progTree, msgTree, byId) = it.next()
      if (progTree.find(program) != null) {
        msgTree.find(message) match {
          case null =>
          case (rule, caps) =>
            val values = byId.get(rule.ruleId).map(_.values).getOrElse(Nil)
              .filterNot { case (_, v) => v.contains("$") } // templates need row context
            return Some((rule.ruleId, rule.ruleClass, (values ++ caps).toMap))
        }
      }
    }
    None
  }
}
