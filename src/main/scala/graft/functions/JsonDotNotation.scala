package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The dot-notation subscript engine of json-parser's
  * `extract-prefix()` — a faithful port of
  * `/root/reference/modules/json/dot-notation.c`:
  *
  *   - levels split at `.` and `[`; member names are any printable
  *     run without `.`/`[`/`]` (`@foo`, `foo bar`, `foo+4`, `1` are
  *     all valid names — test_dot_notation.c:126-135)
  *   - `[N]` array references take a non-negative decimal index and
  *     must end the level (`foo[1]bar`, `foo[zbc]` fail to compile)
  *   - an empty FIRST level is skipped (`""` selects the whole
  *     document); an empty inner level (`foo.[0]`) fails
  *   - eval returns null on a missing member, wrong container type or
  *     out-of-bounds index
  */
object JsonDotNotation {

  sealed trait Elem
  final case class Member(name: String) extends Elem
  final case class Idx(i: Int) extends Elem

  /** None = the subscript does not compile (config error in the
    * reference — json_parser init fails). */
  def compile(notation: String): Option[Seq[Elem]] = {
    if (notation.isEmpty) return Some(Nil)
    // _split_dot_notation: '.' ends a level and is dropped, '[' ends a
    // level and starts the next one
    val levels = scala.collection.mutable.ArrayBuffer.empty[String]
    var last = 0
    var i = 0
    while (i < notation.length) {
      notation.charAt(i) match {
        case '.' =>
          levels += notation.substring(last, i); last = i + 1; i += 1
        case '[' =>
          levels += notation.substring(last, i); last = i; i += 1
        case _ => i += 1
      }
    }
    levels += notation.substring(last)
    val out = Vector.newBuilder[Elem]
    for ((level, idx) <- levels.zipWithIndex) {
      if (!(idx == 0 && level.isEmpty)) {
        if (level.startsWith("[")) {
          // strtol + ']' + end-of-level
          var j = 1
          while (j < level.length && level.charAt(j).isDigit) j += 1
          if (j == 1 || j >= level.length || level.charAt(j) != ']' ||
            j + 1 != level.length) return None
          out += Idx(level.substring(1, j).toInt)
        } else {
          if (level.isEmpty ||
            level.exists(c => c < 0x20 || c > 0x7e || ".[]".contains(c)))
            return None
          out += Member(level)
        }
      }
    }
    Some(out.result())
  }

  def eval(root: JsonNode, elems: Seq[Elem]): JsonNode = {
    var node = root
    for (e <- elems) {
      if (node == null) return null
      e match {
        case Member(name) =>
          if (!node.isObject) return null
          node = node.get(name)
        case Idx(i) =>
          if (!node.isArray || i >= node.size()) return null
          node = node.get(i)
      }
    }
    node
  }

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
    m
  }

  /** Test/driver helper: extract and render canonically; None on
    * compile failure or eval miss. */
  def extractString(json: String, subscript: String): Option[String] =
    compile(subscript).flatMap { elems =>
      val node = eval(mapper.readTree(json), elems)
      Option(node).map(_.toString)
    }

  private[functions] def parse(json: String): JsonNode = mapper.readTree(json)
}
