package graft.patterndb

import scala.xml.{Elem, XML}

/** One `<example>` golden case: input (program, message) and the expected
  * name/value captures (`modules/dbparser/pdb-example.h:29-38`). */
final case class PdbExample(program: String, message: String,
    expectedValues: Seq[(String, String)])

/** An `<action><create-context>` block (pdb-load.c:256-298 +
  * patterndb.c _execute_action_create_context): opens a NEW correlation
  * context whose first member is the synthetic message described by the
  * nested `<message>`. `contextId` is a template; a missing context-id
  * is a load error. */
final case class PdbCreateContext(contextId: String,
    contextTimeout: Option[Int], contextScope: Option[String],
    messageValues: Seq[(String, String)], messageTags: Seq[String],
    inheritProperties: String = "none")

/** One `<action>` block (`modules/dbparser/pdb-action.c`): fires on
  * `trigger` (match/timeout), guarded by `condition` (a filter
  * expression) and `rate` ("N/SEC" token bucket); `messageValues` /
  * `messageTags` describe the synthetic message, OR `createContext`
  * carries a `<create-context>` content block. Drives
  * [[graft.streaming.Correlate]]'s onMatch/rateLimit knobs. */
final case class PdbAction(trigger: String, condition: Option[String],
    rate: Option[(Int, Int)], messageValues: Seq[(String, String)],
    messageTags: Seq[String],
    /** `<message inherit-properties>`: "none" (default), "last-message"
      * (TRUE/1), or "context" (synthetic-message.c:51-75). */
    inheritProperties: String = "none",
    createContext: Option[PdbCreateContext] = None)

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
/** The whole `<patterndb>` document: `version`/`pub_date` root
  * attributes (pattern_db_get_ruleset_version/pub_date) + rulesets. */
final case class PdbDatabase(version: String, pubDate: String,
    rulesets: Seq[PdbRuleset])

object PdbLoader {

  def loadString(xml: String): Seq[PdbRuleset] =
    loadDatabase(XML.loadString(xml)).rulesets

  def loadFile(path: String): Seq[PdbRuleset] =
    loadDatabase(XML.loadFile(path)).rulesets

  def loadDatabaseString(xml: String): PdbDatabase =
    loadDatabase(XML.loadString(xml))

  /** Structural validation mirroring the loader state machine
    * (pdb-load.c PDBL_* states): an element a state does not accept is
    * a load ERROR — `pattern_db_reload_ruleset` returns FALSE on e.g.
    * `<tags>` directly under `<ruleset>` (test_patterndb.c
    * test_tag_outside_of_rule_skeleton). */
  private val rulesetChildren =
    Set("description", "url", "urls", "patterns", "pattern", "rules")
  private val ruleChildren = Set("description", "url", "urls", "patterns",
    "tags", "values", "examples", "actions")

  private def validate(root: Elem): Unit = {
    (root \ "ruleset").foreach { rs =>
      rs.child.collect { case e: Elem => e.label }.foreach { l =>
        require(rulesetChildren(l),
          s"invalid element <$l> under <ruleset> (pdb-load.c unexpected element)")
      }
      (rs \ "rules" \ "rule").foreach { r =>
        r.child.collect { case e: Elem => e.label }.foreach { l =>
          require(ruleChildren(l),
            s"invalid element <$l> under <rule> (pdb-load.c unexpected element)")
        }
      }
    }
  }

  private def loadDatabase(root: Elem): PdbDatabase = {
    require(root.label == "patterndb", s"expected <patterndb>, got <${root.label}>")
    validate(root)
    PdbDatabase(root \@ "version", root \@ "pub_date", parse(root))
  }

  private def parse(root: Elem): Seq[PdbRuleset] = {
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
            // `a \ "message"` is direct-children only, so a
            // create-context's nested <message> never leaks here
            val cc = (a \ "create-context").headOption.map { c =>
              val id = c \@ "context-id"
              require(id.nonEmpty,
                s"context-id attribute is missing from <create-context>, rule=${r \@ "id"}")
              PdbCreateContext(
                contextId = id,
                contextTimeout = Option(c \@ "context-timeout")
                  .filter(_.nonEmpty).map(_.toInt),
                contextScope = Option(c \@ "context-scope").filter(_.nonEmpty),
                messageValues = (c \ "message" \ "values" \ "value")
                  .map(v => (v \@ "name", v.text)),
                messageTags = (c \ "message" \ "tags" \ "tag").map(_.text),
                inheritProperties = inheritMode((c \ "message").headOption))
            }
            PdbAction(
              trigger = Option(a \@ "trigger").filter(_.nonEmpty).getOrElse("match"),
              condition = Option(a \@ "condition").filter(_.nonEmpty),
              rate = rate,
              messageValues = (a \ "message" \ "values" \ "value")
                .map(v => (v \@ "name", v.text)),
              messageTags = (a \ "message" \ "tags" \ "tag").map(_.text),
              inheritProperties = inheritMode((a \ "message").headOption),
              createContext = cc)
          })
      }
      PdbRuleset(rs \@ "name", progs, rules)
    }
  }

  /** inherit-properties: "context" | leading T/t/1 -> last-message |
    * leading F/f/0 -> none
    * (synthetic_message_set_inherit_properties_string); inherit-mode
    * takes the mode name directly. */
  private def inheritMode(message: Option[scala.xml.Node]): String = {
    val raw = message.flatMap(m =>
      Option(m \@ "inherit-mode").filter(_.nonEmpty)
        .orElse(Option(m \@ "inherit-properties").filter(_.nonEmpty)))
    raw.map(_.toLowerCase) match {
      case Some("context") => "context"
      case Some("last-message") => "last-message"
      case Some("none") => "none"
      case Some(s) if s.startsWith("t") || s.startsWith("1") => "last-message"
      case Some(s) if s.startsWith("f") || s.startsWith("0") => "none"
      case Some(other) => throw new IllegalArgumentException(
        s"Unknown inherit-properties: $other")
      case None => "none"
    }
  }

  /** `pdb_get_filenames` (pdb-file.c:170-210): list a directory's
    * regular files, recursing into subdirectories when asked; `pattern`
    * is a GPatternSpec glob (`*`/`?` only) matched against the FULL
    * path (g_pattern_match_simple(pattern, full_path)) — directories
    * recurse regardless of the pattern. Used by `pdbtool merge` over
    * ruleset directories. */
  def pdbGetFilenames(dirPath: String, recursive: Boolean,
      pattern: String): Seq[String] = {
    val dir = new java.io.File(dirPath)
    require(dir.isDirectory, s"not a directory: $dirPath")
    val re = if (pattern == null) null
      else ("(?s)" + pattern.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }).r.pattern
    val out = Seq.newBuilder[String]
    // listFiles() returns null (not empty) on I/O error / permission
    // denial — the g_dir_open error path; fail loudly like the C
    val entries = Option(dir.listFiles()).getOrElse(
      throw new IllegalArgumentException(s"cannot read directory $dirPath"))
    entries.foreach { f =>
      val full = s"$dirPath/${f.getName}"
      if (recursive && f.isDirectory)
        out ++= pdbGetFilenames(full, recursive, pattern)
      else if (f.isFile && (re == null || re.matcher(full).matches()))
        out += full
    }
    out.result()
  }

  /** `pdb_sort_filenames` (pdb-file.c:245 via pdbtool_path_compare):
    * shallower paths first, then byte-wise strcmp. */
  def sortFilenames(names: Seq[String]): Seq[String] =
    names.sortWith { (a, b) =>
      val da = a.count(_ == '/'); val db = b.count(_ == '/')
      if (da != db) da < db
      else {
        // strcmp on raw UTF-8 bytes
        val xa = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val xb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        java.util.Arrays.compareUnsigned(xa, xb) < 0
      }
    }

  /** Flatten to the (ruleId, ruleClass, pattern) triples
    * [[graft.functions.RadixMatch]] compiles — the message-only
    * classification path used by `db-parser()`. */
  def radixRules(rulesets: Seq[PdbRuleset]): Seq[(String, String, String)] =
    for (rs <- rulesets; r <- rs.rules; p <- r.patterns) yield (r.id, r.ruleClass, p)
}

/** Program-scoped classifier over loaded rulesets: ONE radix of program
  * patterns selects a shared per-program rule radix, then the message
  * is matched inside it — the reference's two-level lookup
  * (`pdb_ruleset_lookup`, pdb-ruleset.c:85-134) with pdb-load.c's merge
  * semantics (pdb-load.c:425-487):
  *
  *  - rulesets are merged by PROGRAM pattern: the FIRST `<pattern>`
  *    keys a shared program (same text → same program, rules from all
  *    such rulesets merge into ONE message radix, so preference across
  *    them is radix specificity, not file order);
  *  - secondary patterns alias the same program; joining rulesets with
  *    mismatching program-pattern sets is a load error (the reference's
  *    exact message);
  *  - a ruleset with NO `<patterns>` adds its rules to the ROOT
  *    program, which `r_find_node` returns only for the EMPTY program
  *    string (radix.c:1174-1186 requires complete key consumption —
  *    only "" terminates at the valued root node);
  *  - the program lookup returns at most ONE program node — a message
  *    whose rules don't match there classifies unknown, it does NOT
  *    fall through to another program's rules.
  *
  * Returns (ruleId, ruleClass, captures ++ literal rule values). */
final class PdbMatcher(rulesets: Seq[PdbRuleset]) extends Serializable {
  import PdbMatcher.Program

  private val (progTree, programs, rootProgram) = {
    val byPattern = scala.collection.mutable.HashMap.empty[String, Program]
    val root = new Program
    rulesets.foreach { rs =>
      val program = rs.programPatterns.headOption match {
        case None => root
        case Some(first) =>
          val p = byPattern.getOrElseUpdate(first, new Program)
          rs.programPatterns.tail.foreach { alias =>
            byPattern.get(alias) match {
              case Some(other) if other ne p =>
                throw new IllegalArgumentException(
                  s"Joining rulesets with mismatching program name sets, program=$alias")
              case _ => byPattern(alias) = p
            }
          }
          p
      }
      program.add(rs)
    }
    val pt = new Radix.Tree
    val distinct = scala.collection.mutable.ArrayBuffer.empty[Program]
    // distinct Program objects, indexed; the radix payload is the index
    byPattern.foreach { case (pattern, p) =>
      var idx = distinct.indexWhere(_ eq p)
      if (idx < 0) { distinct += p; idx = distinct.size - 1 }
      pt.insert(pattern, Radix.Rule(idx.toString, "program"))
    }
    (pt, distinct.toIndexedSeq, root)
  }

  def classify(program: String, message: String)
      : Option[(String, String, Map[String, String])] =
    classifyRule(program, message).map { case (rule, caps) =>
      val values = rule.values
        .filterNot { case (_, v) => v.contains("$") } // templates need row context
      (rule.id, rule.ruleClass, (values ++ caps).toMap)
    }

  /** Rule-level lookup returning the full [[PdbRule]] and the raw radix
    * captures — the surface correlation drivers need (rule values stay
    * un-rendered templates). PROGRAM-pattern parser captures merge in
    * ahead of message captures (pdb-ruleset.c:97-104
    * `_add_matches_to_message` runs on the program node's matches
    * before the message lookup — test_patterndb.c match_in_program). */
  def classifyRule(program: String, message: String)
      : Option[(PdbRule, Map[String, String])] = {
    val prog = if (program == null) "" else program
    val (target, progCaps) =
      if (prog.isEmpty) (rootProgram, Nil)
      else progTree.find(prog) match {
        case null => (null, Nil)
        case (r, caps) => (programs(r.ruleId.toInt), caps)
      }
    if (target == null) return None
    target.msgTree.find(message) match {
      case null => None
      case (rule, caps) =>
        target.byId.get(rule.ruleId).map(r => (r, (progCaps ++ caps).toMap))
    }
  }
}

object PdbMatcher {
  /** The PDBProgram analog: one shared message radix + rule table per
    * distinct program-pattern group (pdb-load.c:464 pdb_program_new). */
  private final class Program extends Serializable {
    val msgTree = new Radix.Tree
    val byId = scala.collection.mutable.HashMap.empty[String, PdbRule]
    def add(rs: PdbRuleset): Unit = rs.rules.foreach { r =>
      r.patterns.foreach(p =>
        msgTree.insert(p, Radix.Rule(r.id, r.ruleClass, r.tags)))
      byId(r.id) = r
    }
  }
}
