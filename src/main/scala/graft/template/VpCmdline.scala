package graft.template

import graft.operators.{Rewrites, ValuePairs}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The value-pairs command line shared by `$(format-json)`,
  * `$(format-flat-json)`, `$(format-welf)` and friends —
  * `/root/reference/lib/value-pairs/cmdline.c` (vp_cmdline_parse):
  *
  *   - `--scope/-s name[,name]`, `--key/-k glob`, `--exclude/-x glob`,
  *     `--pair/-p k=v`
  *   - positional `k=v` args are pairs, other positionals are key globs
  *   - `--rekey glob` opens a transform set; `--shift n`,
  *     `--shift-levels n`, `--add-prefix p`, `--replace-prefix from=to`
  *     attach to the LAST `--key`/`--rekey` glob (cmdline.c
  *     last_pattern)
  *   - `--omit-empty-values`, and format-json's `--leave-initial-dot`
  *
  * Pair values take type hints (`lib/type-hinting.c`):
  * `int32()/int64()/double()/boolean()/list()/literal()/string()`.
  * Typed values pre-encode as raw JSON behind
  * [[graft.functions.FormatJson.RawJsonMarker]]. Unparsable hinted
  * values follow the template-options on-error mode
  * (`drop-message` default | `drop-property` | `fallback-to-string`),
  * accepted here as an `--on-error` argument since the engine has no
  * global template-options object.
  *
  * Explicitly added pairs bypass the exclude patterns, and the `--key`
  * space is the `everything` scope (cmdline patterns trigger
  * vp_merge_macros, value-pairs.c:345).
  */
object VpCmdline {

  private val Err = "\u0002"
  private val Raw = graft.functions.FormatJson.RawJsonMarker.toString

  private final case class Parsed(
      scopes: Seq[String],
      keys: Seq[String],
      excludes: Seq[String],
      pairs: Seq[(String, String)],
      rekeys: Seq[(String, Seq[Column => Column])],
      omitEmpty: Boolean,
      leaveInitialDot: Boolean,
      onError: String)

  private def parseArgs(args: Seq[String]): Parsed = {
    var scopes = Vector.empty[String]
    var keys = Vector.empty[String]
    var excludes = Vector.empty[String]
    var pairs = Vector.empty[(String, String)]
    // glob -> transform chain, in arrival order
    var rekeys = Vector.empty[(String, Vector[Column => Column])]
    var lastPattern: Option[String] = None
    var omitEmpty = false
    var leaveDot = false
    var onError = "drop-message"
    def attach(f: Column => Column): Unit = {
      val glob = lastPattern.getOrElse(
        throw new IllegalArgumentException(
          "value-pairs: --shift/--add-prefix need a preceding --key/--rekey"))
      rekeys.indexWhere(_._1 == glob) match {
        case -1 => rekeys :+= (glob -> Vector(f))
        case i => rekeys = rekeys.updated(i, (glob, rekeys(i)._2 :+ f))
      }
    }
    var i = 0
    def next(): String = { i += 1; args(i) }
    while (i < args.length) {
      args(i) match {
        case "--scope" | "-s" => scopes ++= next().split(",").map(_.trim)
        case "--key" | "-k" =>
          // --key and --exclude take comma lists (test_format_welf.c);
          // components are NOT trimmed — a space-prefixed glob like
          // --subkeys ' ' must survive (test-format-cef-extension.c:203)
          val gs = next().split(",").toSeq
          keys ++= gs; lastPattern = gs.lastOption
        case "--exclude" | "-x" => excludes ++= next().split(",").toSeq
        case "--pair" | "-p" =>
          val kv = next(); val eq = kv.indexOf('=')
          pairs :+= (kv.substring(0, eq) -> kv.substring(eq + 1))
        case "--subkeys" =>
          // select PREFIX* and shift the prefix off (cmdline.c
          // vp_cmdline_parse_subkeys); the prefix is raw — commas and
          // spaces are legal (test-format-cef-extension.c:195-206)
          if (i + 1 >= args.length) throw new IllegalArgumentException(
            "Missing argument for --subkeys")
          val p = next()
          if (p.isEmpty) throw new IllegalArgumentException(
            "Error parsing value-pairs: --subkeys requires a non-empty argument")
          keys :+= p + "*"
          rekeys :+= ((p + "*") -> Vector(ValuePairs.shiftKey(p.length)))
          lastPattern = Some(p + "*")
        case "--rekey" => val g = next(); lastPattern = Some(g)
          if (!rekeys.exists(_._1 == g)) rekeys :+= (g -> Vector())
        case "--shift" => attach(ValuePairs.shiftKey(next().toInt))
        case "--shift-levels" => attach(ValuePairs.shiftLevelsKey(next().toInt))
        case "--add-prefix" => attach(ValuePairs.addPrefixKey(next()))
        case "--replace-prefix" | "--replace" =>
          val kv = next(); val eq = kv.indexOf('=')
          attach(ValuePairs.replacePrefixKey(kv.substring(0, eq), kv.substring(eq + 1)))
        case "--omit-empty-values" => omitEmpty = true
        case "--leave-initial-dot" => leaveDot = true
        case "--on-error" =>
          // log_template_on_error_parse (template/templates.c): six
          // accepted modes, anything else is a config-time error
          // (test_template_on_error.c "do-what-i-mean")
          onError = next()
          if (TemplateOnError.parse(onError).isEmpty)
            throw new IllegalArgumentException(
              s"value-pairs: invalid on-error mode: $onError")
        case kv if kv.indexOf('=') > 0 &&
            (kv.indexOf('(') < 0 || kv.indexOf('=') < kv.indexOf('(')) =>
          val eq = kv.indexOf('=')
          pairs :+= (kv.substring(0, eq) -> kv.substring(eq + 1))
        case glob => keys :+= glob; lastPattern = Some(glob)
      }
      i += 1
    }
    Parsed(scopes, keys, excludes, pairs, rekeys.map { case (g, t) => (g, t.toSeq) },
      omitEmpty, leaveDot, onError)
  }

  private def emptyMap: Column = map().cast("map<string,string>")

  private def mergeLastWins(a: Column, b: Column): Column =
    map_concat(map_filter(a, (k, _) => !array_contains(map_keys(b), k)), b)

  /** Resolver-backed scope map — the template-function twin of
    * [[ValuePairs.scopeMap]] (which takes a DataFrame); here only the
    * resolver is available, so NV access goes through the
    * `__VALUES_MAP__` pseudo-name and builtins through their macros. */
  private def scopeMapR(resolve: String => Column, scope: String): Column = {
    def macroMap(names: Seq[String]): Column = {
      val uniq = names.distinct
      val m = map_from_arrays(
        array(uniq.map(lit(_)): _*),
        array(uniq.map(n => coalesce(resolve(n).cast("string"), lit(""))): _*))
      map_filter(m, (_, v) => v =!= "")
    }
    val values = resolve("__VALUES_MAP__")
    def opt(name: String): Column = {
      val c = coalesce(resolve(name).cast("string"), lit(""))
      when(c =!= "", map(lit(name), c)).otherwise(emptyMap)
    }
    val builtinNv = Seq("HOST", "HOST_FROM", "MESSAGE", "PROGRAM", "PID",
      "MSGID", "SOURCE").map(opt).reduce(map_concat(_, _))
    val nvPairs = mergeLastWins(builtinNv,
      map_filter(values, (k, _) => !k.startsWith(".")))
    val dotNv = map_filter(values, (k, _) => k.startsWith("."))
    val sdataNv = map_filter(values, (k, _) => k.startsWith(".SDATA."))
    val rfc3164Names = Seq("FACILITY", "PRIORITY", "HOST", "PROGRAM", "PID",
      "MESSAGE", "DATE")
    scope.replace('_', '-') match {
      case "rfc3164" | "core" | "base" => macroMap(rfc3164Names)
      case "rfc5424" | "syslog-proto" =>
        mergeLastWins(macroMap(rfc3164Names :+ "MSGID"), sdataNv)
      case "selected-macros" =>
        macroMap(rfc3164Names ++ Seq("TAGS", "SOURCEIP", "SEQNUM"))
      case "nv-pairs" => nvPairs
      case "dot-nv-pairs" => dotNv
      case "all-nv-pairs" => mergeLastWins(nvPairs, dotNv)
      case "sdata" => sdataNv
      case "all-macros" => macroMap(Macros.allNames)
      case "everything" =>
        mergeLastWins(mergeLastWins(nvPairs, dotNv), macroMap(Macros.allNames))
      case other =>
        throw new IllegalArgumentException(s"unknown value-pairs scope: $other")
    }
  }

  private val HintRe =
    "^(string|literal|list|boolean|bool|int|int32|i32|int64|i64|double|float|datetime)\\((.*)\\)$".r

  /** Compile one pair value: split off the type hint, render the inner
    * template, encode typed values as raw JSON, apply on-error. */
  private def pairValue(text: String, compile: String => Column,
      onError: String): Column = {
    def str(s: String): Column = coalesce(compile(s).cast("string"), lit(""))
    text match {
      case HintRe(hint, inner) =>
        val v = str(inner)
        // the silently- prefix only mutes logging — behavior matches
        // the base mode (templates.h ON_ERROR_SILENT; the TypeHint
        // battery caught the exact-string compare missing it)
        val flags = TemplateOnError.parse(onError)
          .getOrElse(TemplateOnError.DropMessage)
        def onBad(bad: Column, good: Column): Column =
          if ((flags & TemplateOnError.FallbackToString) != 0)
            when(bad, v).otherwise(good)
          else when(bad, lit(Err)).otherwise(good)
        hint match {
          case "string" => v
          case "literal" => concat(lit(Raw), v)
          case "boolean" | "bool" =>
            // type-hinting.c:91-106 casts by FIRST CHARACTER: T/t/1 ->
            // true, F/f/0 -> false ("totaly true" is TRUE), anything
            // else is a cast error — the reference never grew a
            // yes/no/on/off vocabulary (test_type_hints.c bool battery)
            val c0 = substring(v, 1, 1)
            onBad(!c0.isin("T", "t", "1", "F", "f", "0"),
              concat(lit(Raw),
                when(c0.isin("T", "t", "1"), "true").otherwise("false")))
          case "int" | "int32" | "i32" | "int64" | "i64" =>
            // strtol full-string parse (type-hinting.c:108-141):
            // leading isspace + optional +/- sign, no trailing junk,
            // empty is a cast error; valid values are emitted VERBATIM
            // unquoted (format-json.c append_value(.., FALSE) keeps the
            // original bytes — " 12" and "+12" pass through as-is)
            onBad(!v.rlike("^\\s*[+-]?[0-9]+\\z"), concat(lit(Raw), v))
          case "double" | "float" =>
            // strtod semantics (type-hinting.c:143-164): leading
            // whitespace + sign, decimal/exponent forms, the
            // inf/infinity/nan literals; trailing junk and empty are
            // cast errors, ERANGE OVERFLOW is a cast error
            // (test_type_hints.c: "1e1000000" fails) while underflow
            // parses as 0.0 ("1e-100000000" passes). The cast sits in
            // a when() branch guarded by the form regex, so ANSI mode
            // never sees an unparseable string; overflow shows up as
            // a non-literal infinity.
            val form = v.rlike(
              "^\\s*[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?\\z")
            val infnan = v.rlike("^\\s*[+-]?(?i:inf(inity)?|nan)\\z")
            val overflow = form && when(form, trim(v).cast("double"))
              .isin(Double.PositiveInfinity, Double.NegativeInfinity)
            onBad(!(form || infnan) || overflow, concat(lit(Raw), v))
          case "datetime" =>
            // format-json.c:214-218: DATETIME renders exactly like
            // STRING — quoted, unvalidated. The seconds[.frac] -> ms
            // integer cast (type-hinting.c:167-210) exists for sinks
            // with native date types (mongodb), not for the JSON path.
            v
          case "list" =>
            // str-repr list -> JSON array (list-funcs str-repr parse)
            concat(lit(Raw),
              to_json(graft.functions.ListFunctions.list_scan(v)))
        }
      case plain => str(plain)
    }
  }

  /** Build the final NV map for one command line. `compile` renders a
    * template string with the caller's resolver. */
  def buildMap(args: Seq[String], resolve: String => Column,
      compile: String => Column): Column = {
    val p = parseArgs(args)
    val scoped =
      (p.scopes.map(scopeMapR(resolve, _)) ++
        // the --key space is the everything scope
        (if (p.keys.nonEmpty)
          Seq(ValuePairs.select(scopeMapR(resolve, "everything"),
            include = p.keys))
         else Nil))
        .reduceOption(mergeLastWins).getOrElse(emptyMap)
    // excludes prune scope/key results but never explicit pairs
    val pruned = ValuePairs.select(scoped, exclude = p.excludes)
    val pairMap = p.pairs.foldLeft(emptyMap) { case (m, (k, vText)) =>
      mergeLastWins(m, map(lit(k), pairValue(vText, compile, p.onError)))
    }
    val merged = mergeLastWins(pruned, pairMap)
    val rekeyed = p.rekeys.foldLeft(merged) { case (m, (glob, fns)) =>
      if (fns.isEmpty) m else ValuePairs.rekeySet(m, Seq(glob), fns)
    }
    val dotted =
      if (p.leaveInitialDot) rekeyed
      else transform_keys(rekeyed, (k, _) =>
        when(k.startsWith("."), concat(lit("_"), k.substr(lit(2), length(k))))
          .otherwise(k))
    val nonEmpty =
      if (p.omitEmpty) map_filter(dotted, (_, v) => v.isNotNull && v =!= "")
      else dotted
    nonEmpty
  }

  /** `$(format-json ...)` / `$(format-flat-json ...)`. */
  def formatJson(args: Seq[String], resolve: String => Column,
      compile: String => Column, flat: Boolean): Column = {
    val p = parseArgs(args)
    val m = buildMap(args, resolve, compile)
    val rendered = graft.functions.FormatJson(
      map_filter(m, (_, v) => v =!= Err), flat)
    val flags = TemplateOnError.parse(p.onError)
      .getOrElse(TemplateOnError.DropMessage)
    if ((flags & TemplateOnError.DropMessage) != 0)
      when(exists(map_values(m), _ === Err), lit("")).otherwise(rendered)
    else rendered
  }

  /** `$(format-welf ...)` over the same command line (format-welf.c). */
  def formatWelf(args: Seq[String], resolve: String => Column,
      compile: String => Column): Column =
    ValuePairs.formatWelf(stripTyped(buildMap(args, resolve, compile)))

  /** `$(format-cef-extension ...)` — key validation + value escaping
    * per the cef module, on-error aware; `--subkeys` is handled by the
    * shared cmdline parse. */
  def formatCef(args: Seq[String], resolve: String => Column,
      compile: String => Column): Column =
    ValuePairs.formatCef(stripTyped(buildMap(args, resolve, compile)),
      onError = parseArgs(args).onError)

  /** `$(graphite-output [--timestamp T] ...)` — the full value-pairs
    * command line plus the timestamp template option (default
    * `$R_UNIXTIME`, graphite-output.c:102-106); leading-dot keys
    * become `_`-prefixed via the cmdline's default dot handling, like
    * the replace-prefix transform graphite always installs (:113-115). */
  def formatGraphite(args: Seq[String], resolve: String => Column,
      compile: String => Column): Column = {
    var tsTemplate = "$R_UNIXTIME"
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a == "--timestamp" || a == "-t") { tsTemplate = args(i + 1); i += 2 }
      else if (a.startsWith("--timestamp=")) {
        tsTemplate = a.stripPrefix("--timestamp="); i += 1
      } else { rest += a; i += 1 }
    }
    ValuePairs.formatGraphite(
      stripTyped(buildMap(rest.toSeq, resolve, compile)), compile(tsTemplate))
  }

  /** Non-JSON formatters render typed values as their plain text. */
  private def stripTyped(m: Column): Column =
    map_filter(
      transform_values(m, (_, v) =>
        when(v.startsWith(Raw), v.substr(lit(2), length(v))).otherwise(v)),
      (_, v) => v =!= Err)
}
