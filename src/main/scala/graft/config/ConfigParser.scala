package graft.config

import scala.collection.mutable

/** The config-language front end (SURVEY §3.1): a subset of the
  * reference's grammar (`/root/reference/lib/cfg-grammar.y`, lexer
  * `lib/cfg-lex.l`) covering the operator surface this engine
  * implements. `@version`/`@include` pragmas and comments are skipped
  * like the reference lexer does; block structure is
  * `kind name { statements; };` plus `log { ... };` paths with
  * junction/channel and flags.
  */
object ConfigParser {

  // ---- AST -----------------------------------------------------------------
  /** One driver/operator statement: `name(arg, key(value), ...)`. */
  final case class Stmt(name: String, args: Seq[Arg])
  sealed trait Arg
  final case class Lit(value: String) extends Arg        // "str" | 123 | bareword
  final case class KV(key: String, args: Seq[Arg]) extends Arg // key(args)
  final case class FilterArg(expr: FilterExpr) extends Arg

  /** Filter expression tree (filter-expr-grammar.ym). */
  sealed trait FilterExpr
  final case class FAnd(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class FOr(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class FNot(e: FilterExpr) extends FilterExpr
  final case class FCall(stmt: Stmt) extends FilterExpr  // severity(..), host(..)
  final case class FCmp(lhs: String, op: String, rhs: String) extends FilterExpr

  sealed trait Decl
  final case class Block(kind: String, name: String, stmts: Seq[Stmt]) extends Decl
  final case class FilterDecl(name: String, expr: FilterExpr) extends Decl
  final case class LogDecl(path: Seq[LogElem]) extends Decl
  /** `application name[topic] { filter {...}; parser {...}; };`
    * (`modules/appmodel/appmodel-grammar.ym:68-79`) — registers an
    * application for `app-parser(topic(...))`. Topic `*` declares a
    * BASE application: same-name apps in concrete topics inherit its
    * filter/parser when their own is empty
    * (`appmodel-context.c:91-106` + `app-parser-generator.c:40-58`). */
  final case class AppDecl(name: String, topic: String,
      filter: Option[FilterExpr], parser: Seq[Stmt]) extends Decl
  /** `template NAME {...}` / `template-function NAME "..."` —
    * lib/cfg-grammar.y template_stmt + lib/template/user-function.c. */
  final case class TemplateDecl(name: String, text: String,
      isFunction: Boolean) extends Decl
  /** Global `options { ... };` block, name -> joined literal text. */
  final case class OptionsDecl(opts: Map[String, String]) extends Decl

  sealed trait LogElem
  final case class Ref(kind: String, name: String) extends LogElem  // source(s_x)
  final case class InlineFilter(expr: FilterExpr) extends LogElem
  final case class InlineStmt(kind: String, stmt: Stmt) extends LogElem
  final case class Flags(flags: Seq[String]) extends LogElem
  final case class JunctionElem(channels: Seq[ChannelElem]) extends LogElem
  final case class ChannelElem(path: Seq[LogElem], flags: Seq[String])

  final case class Config(decls: Seq[Decl]) {
    def sources: Map[String, Block] = blocks("source")
    def destinations: Map[String, Block] = blocks("destination")
    def parsers: Map[String, Block] = blocks("parser")
    def rewrites: Map[String, Block] = blocks("rewrite")
    def filters: Map[String, FilterDecl] =
      decls.collect { case f: FilterDecl => f.name -> f }.toMap
    def logs: Seq[LogDecl] = decls.collect { case l: LogDecl => l }
    /** Registered applications in declaration (= registration) order. */
    def applications: Seq[AppDecl] = decls.collect { case a: AppDecl => a }
    /** Named templates (`$(template name)` / `template(name)` refs). */
    def templates: Map[String, String] =
      decls.collect { case t: TemplateDecl => t.name -> t.text }.toMap
    /** User-defined zero-arg template functions (`$(name)`). */
    def templateFunctions: Map[String, String] =
      decls.collect { case t: TemplateDecl if t.isFunction => t.name -> t.text }.toMap
    /** Global options{} (last block wins per key). */
    def options: Map[String, String] =
      decls.collect { case o: OptionsDecl => o.opts }
        .foldLeft(Map.empty[String, String])(_ ++ _)
    /** frac-digits(N) — fractional-second digits on composite date
      * macros (timeutils format); 0 when unset. */
    def fracDigits: Int =
      options.get("frac-digits").flatMap(_.toIntOption).getOrElse(0)
    private def blocks(kind: String) =
      decls.collect { case b: Block if b.kind == kind => b.name -> b }.toMap
  }

  // ---- @include expansion --------------------------------------------------
  /** Textual `@include "path"` expansion, matching the reference lexer's
    * include handling (`lib/cfg-lex.l` include states + `cfg-parser.c`
    * process_file_inclusion): the operand may be a single file, a glob
    * (expanded in NAME order), or a directory (all regular files,
    * sorted). Relative operands resolve against the INCLUDING file's
    * directory; cycles and nesting beyond 16 levels are errors, like
    * the reference's include-depth check. Other pragmas pass through to
    * the lexer, which skips them. */
  def resolveIncludes(src: String, dir: java.nio.file.Path,
      seen: Set[java.nio.file.Path] = Set.empty, depth: Int = 0): String = {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    require(depth <= 16, s"@include nesting deeper than 16 at $dir")
    val inc = "^@include\\s+[\"']([^\"']+)[\"']\\s*;?\\s*$".r
    src.split("\n", -1).map { line =>
      line.trim match {
        case inc(operand) =>
          val files: Seq[Path] = {
            val p = dir.resolve(operand)
            if (Files.isDirectory(p)) {
              val s = Files.list(p)
              try s.iterator.asScala.filter(Files.isRegularFile(_))
                .toSeq.sortBy(_.getFileName.toString)
              finally s.close()
            } else if (operand.exists("*?[".contains(_))) {
              val parent = Option(p.getParent).getOrElse(dir)
              val glob = p.getFileName.toString
              // globs are filename-only: a pattern in a directory
              // component would resolve the parent as a literal path and
              // silently include nothing — error instead
              require(!operand.dropRight(glob.length).exists("*?[".contains(_)),
                s"@include: glob only supported in the filename component: $operand")
              if (!Files.isDirectory(parent)) Seq.empty
              else {
                val ds = Files.newDirectoryStream(parent, glob)
                try ds.iterator.asScala.filter(Files.isRegularFile(_)).toSeq
                  .sortBy(_.getFileName.toString)
                finally ds.close()
              }
            } else Seq(p)
          }
          files.map { f =>
            val abs = f.toAbsolutePath.normalize
            require(!seen(abs), s"@include cycle via $abs")
            require(Files.isRegularFile(abs), s"@include: no such file $abs")
            resolveIncludes(
              new String(Files.readAllBytes(abs), java.nio.charset.StandardCharsets.UTF_8),
              abs.getParent, seen + abs, depth + 1)
          }.mkString("\n")
        case _ => line
      }
    }.mkString("\n")
  }

  /** Parse a config FILE, expanding `@include` relative to its dir. */
  def parseFile(path: String): Config = {
    val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    val src = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    parse(resolveIncludes(src, p.getParent, Set(p)))
  }

  /** `@version` value validation, faithful to `lib/pragma-parser.c`
    * process_version_string (test_pragma.c battery): 0 = invalid.
    * The quirks are deliberate: the 7-char length guard is what
    * rejects every overflow case; leading +/- on the WHOLE string is
    * rejected but strtol's own whitespace/sign handling inside the
    * major/minor parts is kept ("\t3.7" and "3.+7" are valid,
    * "-1.1031" and ".+3.7" are not). */
  private[graft] def versionCode(value: String): Int = {
    // `@version: current` selects the compiled-in version
    // (pragma-parser.c:70 KW_VERSION_CURRENT -> VERSION_VALUE_CURRENT,
    // versioning.h:171 = 3.33 in the reference tree)
    if (value == "current") return 0x0321
    if (value.length > "xxx.yyy".length) return 0
    if (value.nonEmpty && (value(0) == '+' || value(0) == '-')) return 0
    val dot = value.indexOf('.')
    if (dot <= 0) return 0
    val MajorRe = "\\s*\\+?([0-9]+)".r
    val MinorRe = "\\s*([+-]?[0-9]+)".r
    (value.substring(0, dot), value.substring(dot + 1)) match {
      case (MajorRe(maj), MinorRe(min)) =>
        val minor = min.toInt
        if (minor < 0) 0 else (maj.toInt << 8) + minor
      case _ => 0
    }
  }

  /** Pragma sanity at lex time: a malformed `@version` is a parse
    * error (the reference's pragma parser aborts the config); other
    * pragmas pass through to their dedicated handlers (`@include` /
    * `@define` / `@module confgen` are expanded before lexing). */
  private def checkPragma(line: String): Unit = {
    val VersionRe = "^@version\\s*:?\\s*(\\S*)\\s*$".r
    line match {
      case VersionRe(v) =>
        require(versionCode(v) != 0,
          s"@version: invalid version number: $v")
      case _ => ()
    }
  }

  // ---- lexer ---------------------------------------------------------------
  private[graft] final case class Tok(kind: String, text: String, pos: Int)

  private[graft] def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '@') {
        val pStart = i
        while (i < n && src.charAt(i) != '\n') i += 1
        checkPragma(src.substring(pStart, i)) // @version validation
      }
      else if (c.isWhitespace) i += 1
      else if (c == '"') {
        // <string> state (cfg-lex.l:339-352): \a\n\r\t\v named escapes,
        // \x{1,2} hex, \o{1,3} octal, \<other> drops the backslash, a
        // backslash-newline is a line continuation (the <*>\\\r?\n rule
        // precedes <string>\\[^anrtv], so it wins and removes both),
        // and a RAW newline is kept literally.
        def isHex(ch: Char) = Character.digit(ch, 16) >= 0
        def isOct(ch: Char) = ch >= '0' && ch <= '7'
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '"') { closed = true; i += 1 }
          else if (ch == '\\' && i + 1 < n) src.charAt(i + 1) match {
            case 'a' => sb.append('\u0007'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'v' => sb.append('\u000b'); i += 2
            case 'x' if i + 2 < n && isHex(src.charAt(i + 2)) =>
              var j = i + 2
              val e = math.min(n, i + 4)
              while (j < e && isHex(src.charAt(j))) j += 1
              sb.append(Integer.parseInt(src.substring(i + 2, j), 16).toChar)
              i = j
            case 'o' if i + 2 < n && isOct(src.charAt(i + 2)) =>
              var j = i + 2
              val e = math.min(n, i + 5)
              while (j < e && isOct(src.charAt(j))) j += 1
              // the reference appends through g_string_append_c(gchar)
              // (cfg-lex.l:345), which truncates to 8 bits — \o777 is
              // 0xFF there, so mask rather than emit U+01FF
              sb.append((Integer.parseInt(src.substring(i + 2, j), 8) & 0xFF).toChar)
              i = j
            case '\n' => i += 2
            case '\r' if i + 2 < n && src.charAt(i + 2) == '\n' => i += 3
            case other => sb.append(other); i += 2
          }
          else { sb.append(ch); i += 1 }
        }
        out += Tok("str", sb.toString, i)
      }
      else if (c == '\'') {
        // <qstring> (cfg-lex.l:353-357): everything before the next
        // single quote is LITERAL — no escapes, backslashes and
        // newlines are content, and \' cannot appear inside.
        val st = i + 1
        var j = st
        while (j < n && src.charAt(j) != '\'') j += 1
        out += Tok("str", src.substring(st, j), st)
        i = if (j < n) j + 1 else j
      }
      else if (c.isLetter || c == '_' || c == '$' || c == '.') {
        val st = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
          "_-.$".contains(src.charAt(i)))) i += 1
        out += Tok("word", src.substring(st, i), st)
      }
      else if (c.isDigit || ((c == '-' || c == '+') && i + 1 < n &&
          src.charAt(i + 1).isDigit)) {
        // LL_NUMBER goes through parse_number_with_suffix
        // (cfg-lex.l:302-322): 0x hex, 0 octal, K/M/G[i][b] suffixes
        val st = i
        i += 1
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '.')) i += 1
        val text = src.substring(st, i)
        if (text.matches("[+-]?[0-9]+\\.[0-9]+"))
          out += Tok("num", text, st)
        else ParseNumber.parseNumberWithSuffix(text) match {
          case Some(v) => out += Tok("num", v.toString, st)
          case None =>
            // not a suffixed number: fall back to digits-and-dots,
            // leaving any letter tail to lex as its own word
            i = st + 1
            while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
            out += Tok("num", src.substring(st, i), st)
        }
      }
      else if ("{}();,[]".indexOf(c) >= 0) { out += Tok(c.toString, c.toString, i); i += 1 }
      // bare `*` is the appmodel base-topic name (application foo[*])
      else if (c == '*') { out += Tok("word", "*", i); i += 1 }
      else if (c == '=' || c == '!' || c == '<' || c == '>') {
        val st = i
        i += 1
        if (i < n && (src.charAt(i) == '=' ||
            (c == '=' && src.charAt(i) == '>'))) i += 1
        out += Tok("op", src.substring(st, i), st)
      }
      else i += 1 // tolerate unknown chars like the reference's lax lexer
    }
    out.result()
  }

  // ---- parser ---------------------------------------------------------------
  final class ParseError(msg: String) extends RuntimeException(msg)

  /** A reusable `block kind name(params) { body }` definition
    * (`/root/reference/lib/cfg-block-generator.c`): the body is raw
    * config text; at use, backtick-quoted \`param\` references are
    * substituted (use-site args override declared defaults) and the
    * result is re-parsed in place — the reference's lexer-level macro
    * expansion. */
  private final case class BlockDef(kind: String, name: String,
      params: Seq[(String, Option[String])], body: String,
      varargs: Boolean, globals: Map[String, String] = Map.empty) {
    def expand(args: Seq[Arg]): String = {
      val supplied = args.collect { case KV(k, vs) =>
        k -> vs.collect { case Lit(v) => v }.mkString(" ") }
      // cfg-block.c _validate_args (test_lexer_block.c battery): a
      // declared param with NO default (`param()` lexes NULL —
      // cfg-lex.l:398) is MANDATORY; use-site args outside the
      // declared set are an error unless the definition ends with
      // `...` (varargs), in which case they format into __VARARGS__
      // as `key(value) ` entries. Key comparisons normalize '-'/'_'
      // like cfg_args __normalize_key.
      def norm(k: String) = k.replace('-', '_')
      val declared = params.map(p => norm(p._1)).toSet
      val suppliedKeys = supplied.map(p => norm(p._1)).toSet
      for ((p, None) <- params if !suppliedKeys(norm(p)))
        throw new ParseError(
          s"block $kind $name: Mandatory parameter not overridden: $p")
      val extras = supplied.filterNot { case (k, _) => declared(norm(k)) }
      if (extras.nonEmpty && !varargs)
        throw new ParseError(s"block $kind $name: Unknown argument " +
          s"specified to block reference: ${extras.head._1}")
      val varargsMap =
        if (!varargs) Map.empty[String, String]
        else Map("__VARARGS__" ->
          extras.map { case (k, v) => s"$k($v) " }.mkString)
      // full cfg-lexer-subst semantics: use-site args, declared
      // defaults, @define globals, then environment — with
      // string-state-aware splicing (CfgLexerSubst)
      CfgLexerSubst.invoke(body, supplied.toMap ++ varargsMap,
        params.collect { case (k, Some(d)) => k -> d }.toMap, globals)
    }
  }

  // ---- @define + top-level backtick substitution ---------------------------
  /** `@define name value` pragmas (`lib/cfg-lex.l` @define handling →
    * cfg_args_set on the global args): collected into the global
    * substitution scope and stripped from the text. The value is the
    * rest of the line, quotes kept raw — [[CfgLexerSubst]] decides how
    * they splice at each use site. */
  private[config] def extractDefines(src: String): (Map[String, String], String) = {
    val defRe = "^\\s*@define\\s+([\\w-]+)\\s*(.*?)\\s*$".r
    val globals = mutable.LinkedHashMap.empty[String, String]
    val kept = src.split("\n", -1).filterNot { line =>
      line match {
        case defRe(name, value) => globals(name) = value; true
        case _ => false
      }
    }
    (globals.toMap, kept.mkString("\n"))
  }

  /** Backtick substitution over the top-level config text (the
    * reference lexer substitutes at token-read time): `@define`
    * globals + environment resolve everywhere EXCEPT inside `block`
    * definition bodies, which stay raw until use-site expansion (the
    * reference captures them as LL_BLOCK without substitution). */
  private[config] def substituteTopLevel(src: String,
      globals: Map[String, String]): String = {
    if (!src.contains('`')) return src
    val lookup = CfgLexerSubst.resolver(Map.empty, Map.empty, globals)
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '-'
    val out = new StringBuilder
    var chunkStart = 0
    var i = 0
    val n = src.length
    def flush(until: Int): Unit = {
      out ++= CfgLexerSubst.invoke(src.substring(chunkStart, until), lookup)
      chunkStart = until
    }
    while (i < n) {
      val c = src.charAt(i)
      if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '"' || c == '\'') {
        // backslash only escapes inside dquotes; qstring content is
        // literal, so '\' before the closing quote does not extend it
        i += 1
        while (i < n && src.charAt(i) != c) {
          if (c == '"' && src.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (src.startsWith("block", i) &&
          (i == 0 || !isWordChar(src.charAt(i - 1))) &&
          i + 5 < n && src.charAt(i + 5).isWhitespace) {
        // copy the whole definition verbatim: skip to its body's '{',
        // then to the matching '}' (strings shield braces)
        var j = i + 5
        while (j < n && src.charAt(j) != '{') j += 1
        var depth = 0
        var inStr: Char = 0
        var done = false
        while (j < n && !done) {
          val cj = src.charAt(j)
          if (inStr != 0) {
            if (inStr == '"' && cj == '\\') j += 1
            else if (cj == inStr) inStr = 0
          } else if (cj == '"' || cj == '\'') inStr = cj
          else if (cj == '{') depth += 1
          else if (cj == '}') { depth -= 1; if (depth == 0) done = true }
          j += 1
        }
        flush(i)
        out ++= src.substring(i, j)
        chunkStart = j
        i = j - 1
      }
      i += 1
    }
    flush(n)
    out.toString
  }

  def parse(src: String): Config = {
    val (defines, stripped) = extractDefines(src)
    val substituted = substituteTopLevel(stripped, defines)
    val expanded = expandGenerators(substituted)
    new P(lex(expanded), expanded, globals = defines).config()
  }

  // ---- confgen block generators --------------------------------------------
  /** `@module confgen context(C) name(N) exec("CMD")`
    * (`/root/reference/modules/confgen/confgen-plugin.c`): registers a
    * generator; any full-statement invocation `N(args);` later in the
    * text is replaced by CMD's stdout, with the invocation's
    * `key(value)` args exported as `confgen_key` environment variables
    * (confgen_set_args_as_env). A non-zero exit aborts the parse, like
    * the reference's generate error path. `syslogconf(file("PATH"))`
    * is the built-in generator equivalent of
    * `scl/syslogconf/plugin.conf` (the awk translator, implemented
    * natively in [[SyslogConf]]). */
  /** The context-name table of `cfg_lexer_lookup_context_type_by_name`
    * (`lib/cfg-lexer.c:1179-1199`) — confgen registration validates its
    * `context()` against it (confgen-plugin.c:171-177, test_confgen.c
    * "context value is unknown"). */
  private val knownContexts = Set(
    "root", "destination", "source", "parser", "rewrite", "filter", "log",
    "block-def", "block-arg", "block-ref", "block-content", "pragma",
    "format", "template-func", "inner-dest", "inner-src", "client-proto",
    "server-proto", "options", "config")

  private[graft] def expandGenerators(src: String): String = {
    import scala.util.matching.Regex
    var gens = Map.empty[String, String] // name -> exec cmdline
    // any arg order/subset lexes; validation reports each missing piece
    // with the reference's own message (confgen-plugin.c:148-185)
    val mod = "(?m)^\\s*@module\\s+confgen\\b([^\\n]*)$".r
    // key(value) pairs where value is quoted (quotes may hold parens)
    // or a bare word — the cfg_args form @module pragmas carry
    val arg = ("([\\w-]+)\\(\\s*(?:\"([^\"]*)\"|'([^']*)'|([^)]*))\\s*\\)").r
    val without = mod.replaceAllIn(src, m => {
      val args = arg.findAllMatchIn(m.group(1)).map { a =>
        val v = Option(a.group(2)).orElse(Option(a.group(3)))
          .getOrElse(a.group(4).trim)
        a.group(1) -> v
      }.toMap
      val name = args.getOrElse("name",
        throw new ParseError("confgen: name argument expected"))
      val context = args.getOrElse("context",
        throw new ParseError("confgen: context argument expected"))
      if (!knownContexts.contains(context))
        throw new ParseError(
          s"confgen: context value is unknown, context='$context'")
      val exec = args.getOrElse("exec",
        throw new ParseError("confgen: exec argument expected"))
      gens += name -> exec
      ""
    })

    val sc = "(?m)^\\s*syslogconf\\(\\s*file\\([\"']([^\"']+)[\"']\\)\\s*\\)\\s*;\\s*$".r
    val withSc = sc.replaceAllIn(without, m =>
      Regex.quoteReplacement(SyslogConf.convert(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(m.group(1))),
        java.nio.charset.StandardCharsets.UTF_8))))

    gens.foldLeft(withSc) { case (acc, (name, cmd)) =>
      // one nesting level of parens covers the `key(value)` arg form
      val inv = ("(?m)^\\s*" + java.util.regex.Pattern.quote(name) +
        "\\(((?:[^()]|\\([^()]*\\))*)\\)\\s*;\\s*$").r
      inv.replaceAllIn(acc, m => {
        val kv = "([\\w-]+)\\(\\s*[\"']?([^)\"']*)[\"']?\\s*\\)".r
        val pb = new ProcessBuilder("/bin/sh", "-c", cmd)
        kv.findAllMatchIn(m.group(1)).foreach(a =>
          pb.environment().put("confgen_" + a.group(1).replace('-', '_'), a.group(2)))
        val proc = pb.redirectError(ProcessBuilder.Redirect.INHERIT).start()
        val out = new String(proc.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        require(proc.waitFor() == 0,
          s"confgen: Error executing generator program for $name: $cmd")
        Regex.quoteReplacement(out)
      })
    }
  }

  private[graft] val wordCmpOps = Set("eq", "ne", "lt", "gt", "le", "ge")

  /** Keyword-position '-'/'_' equivalence (cfg_lexer_lookup_keyword,
    * lib/cfg-lexer.c:186-218): canonicalize to the dashed spelling the
    * engine dispatches on. */
  private[graft] def normKeyword(w: String): String = w.replace('_', '-')

  /** Parse one bare filter expression (the form template-level `$(filter
    * cond list)` / `$(if (cond) a b)` conditions take —
    * `modules/basicfuncs/cond-funcs.c:148-177` compiles its argument with
    * the same filter-expr grammar). */
  def parseFilterExpr(src: String): FilterExpr =
    new P(lex(src), src).standaloneFilter()

  private final class P(toks: Vector[Tok], src: String,
      blockDefs: mutable.Map[(String, String), BlockDef] =
        mutable.Map.empty,
      globals: Map[String, String] = Map.empty) {
    private var pos = 0
    private def peek: Tok = if (pos < toks.length) toks(pos) else Tok("eof", "", -1)
    private def next(): Tok = { val t = peek; pos += 1; t }
    private def expect(kind: String): Tok = {
      val t = next()
      if (t.kind != kind) throw new ParseError(s"expected $kind, got ${t.kind}:'${t.text}'")
      t
    }
    private def accept(kind: String, text: String = null): Boolean =
      if (peek.kind == kind && (text == null || peek.text == text)) { pos += 1; true }
      else false

    def config(): Config = {
      val decls = mutable.ArrayBuffer.empty[Decl]
      while (peek.kind != "eof") {
        val kw = expect("word").text
        kw match {
          case "log" => decls += LogDecl(logPath())
          case "filter" =>
            val name = expect("word").text
            expect("{")
            val e = filterExpr()
            accept(";")
            expect("}"); expect(";")
            decls += FilterDecl(name, e)
          case "options" =>
            // global options {} — retained as a name->text map
            // (lib/cfg-grammar.y options_items); consumers pick the
            // ones the engine honors (frac-digits, time-zone, ...)
            if (peek.kind == "{") {
              expect("{")
              val opts = mutable.LinkedHashMap.empty[String, String]
              while (!accept("}")) {
                val st = stmt()
                opts(st.name) = st.args.collect { case Lit(v) => v }.mkString(" ")
                expect(";")
              }
              expect(";")
              decls += OptionsDecl(opts.toMap)
            } else { val _ = next(); skipBlock() }
          case "template" =>
            // template NAME { template("TEXT"); [template-escape(..);] };
            // or the shorthand: template NAME "TEXT";
            // (lib/cfg-grammar.y template_stmt)
            val name = expect("word").text
            if (peek.kind == "str") {
              val text = next().text
              expect(";")
              decls += TemplateDecl(name, text, isFunction = false)
            } else {
              expect("{")
              var text = ""
              while (!accept("}")) {
                val s = stmt()
                if (s.name == "template")
                  text = s.args.collectFirst { case Lit(v) => v }.getOrElse("")
                // template-escape() accepted and ignored (escaping is a
                // sink-side concern the column algebra doesn't need)
                expect(";")
              }
              expect(";")
              decls += TemplateDecl(name, text, isFunction = false)
            }
          case "template-function" =>
            // template-function NAME "TEXT"; — lib/template/user-function.c:
            // a zero-argument function expanding the stored template
            val name = if (peek.kind == "word") next().text else expect("str").text
            val text = expect("str").text
            expect(";")
            decls += TemplateDecl(name, text, isFunction = true)
          case "block" =>
            // block kind name(param(default) ...) { raw body };
            // (cfg-block-generator.c) — must precede its uses, like the
            // reference's lexer-level expansion
            val bkind = expect("word").text
            // block references lex as keywords, so the registered name
            // must normalize the same way the call site will
            val bname = ConfigParser.normKeyword(expect("word").text)
            val rawArgs = argList()
            // `param()` (empty parens) declares a MANDATORY parameter
            // (cfg-lex.l:398 lexes NULL); `param("")` an empty default;
            // a trailing `...` accepts varargs (cfg-grammar.y:883)
            val varargs = rawArgs.exists { case Lit("...") => true; case _ => false }
            val params = rawArgs.collect {
              case KV(k, Seq()) => k -> None
              case KV(k, vs) =>
                k -> Some(vs.collect { case Lit(v) => v }.mkString(" "))
              case Lit(k) if k != "..." => k -> Some("")
            }
            val body = sliceBracedBody()
            expect(";")
            blockDefs((bkind, bname)) =
              BlockDef(bkind, bname, params, body, varargs, globals)
          case "application" =>
            // application name[topic] { filter {...}; parser {...}; };
            // (appmodel-grammar.ym:68-79; topic is MANDATORY)
            val name = expect("word").text
            expect("[")
            val topic = expect("word").text
            expect("]")
            expect("{")
            var fexpr: Option[FilterExpr] = None
            val pstmts = mutable.ArrayBuffer.empty[Stmt]
            while (!accept("}")) {
              expect("word").text match {
                case "filter" =>
                  expect("{")
                  val e = filterExpr()
                  accept(";")
                  expect("}")
                  fexpr = Some(e)
                case "parser" =>
                  expect("{")
                  while (!accept("}")) {
                    pstmts ++= stmtExpanded("parser")
                    expect(";")
                  }
                case other =>
                  throw new ParseError(s"application: unknown option $other")
              }
              expect(";")
            }
            expect(";")
            decls += AppDecl(name, topic, fexpr, pstmts.toSeq)
          case kind @ ("source" | "destination" | "parser" | "rewrite") =>
            val name = expect("word").text
            expect("{")
            val stmts = mutable.ArrayBuffer.empty[Stmt]
            while (!accept("}")) {
              stmts ++= stmtExpanded(kind)
              expect(";")
            }
            expect(";")
            decls += Block(kind, name, stmts.toSeq)
          case other => throw new ParseError(s"unknown top-level block: $other")
        }
      }
      Config(decls.toSeq)
    }

    private def skipBlock(): Unit = {
      expect("{")
      var depth = 1
      while (depth > 0) next().kind match {
        case "{" => depth += 1
        case "}" => depth -= 1
        case "eof" => throw new ParseError("unterminated block")
        case _ =>
      }
      expect(";")
      ()
    }

    private def stmt(): Stmt = {
      // keyword positions treat '-' and '_' as the same character
      // (cfg_lexer_lookup_keyword, lib/cfg-lexer.c:186-218: a token
      // char '-' or '_' matches the keyword's '_'): pad_size(2048) ==
      // pad-size(2048), unix_stream == unix-stream. User-defined NAMES
      // (rules, apps, block args) are LL_IDENTIFIERs there and stay
      // verbatim — only statement/function names and option keys
      // normalize, matching the reference exactly.
      val name = expect("word").text
      Stmt(ConfigParser.normKeyword(name), argList())
    }

    /** Raw source between a `{` and its matching `}` (both consumed) —
      * token-aware, so braces inside quoted strings don't count. */
    private def sliceBracedBody(): String = {
      val open = expect("{")
      var depth = 1
      var close = open
      while (depth > 0) {
        val t = next()
        t.kind match {
          case "{" => depth += 1
          case "}" => depth -= 1; if (depth == 0) close = t
          case "eof" => throw new ParseError("unterminated block body")
          case _ =>
        }
      }
      src.substring(open.pos + 1, close.pos)
    }

    /** Parse one statement, expanding it if it names a block definition
      * of this kind: substitute args into the stored body and re-parse
      * the result as a statement list (recursive — blocks may use
      * earlier blocks). */
    private def stmtExpanded(kind: String): Seq[Stmt] = {
      val s = stmt()
      blockDefs.get((kind, s.name)) match {
        case None => Seq(s)
        case Some(bd) =>
          val expanded = bd.expand(s.args)
          new P(lex(expanded), expanded, blockDefs, globals).stmtList(kind)
      }
    }

    /** `stmt; stmt; ...` to eof — the shape of an expanded block body;
      * nested block uses expand recursively. */
    def stmtList(kind: String): Seq[Stmt] = {
      val out = mutable.ArrayBuffer.empty[Stmt]
      while (peek.kind != "eof") {
        out ++= stmtExpanded(kind)
        expect(";")
      }
      out.toSeq
    }

    private def argList(): Seq[Arg] = {
      if (!accept("(")) return Nil
      val args = mutable.ArrayBuffer.empty[Arg]
      while (!accept(")")) {
        accept(",")
        peek.kind match {
          case "str" | "num" =>
            val t = next()
            // name-value pair: values("name" => "template") — the
            // LL_ARROW form of msg-generator / add-contextual-data
            // grammars; represented as KV(name, Lit(template))
            if (peek.kind == "op" && peek.text == "=>") {
              next()
              args += KV(t.text, Seq(Lit(next().text)))
            }
            // comparison argument: having("$n" > "2") — a bare FCmp
            else if (peek.kind == "op" ||
                (peek.kind == "word" && ConfigParser.wordCmpOps(peek.text))) {
              val op = next().text
              args += FilterArg(FCmp(t.text, op, next().text))
            } else args += Lit(t.text)
          case "word" =>
            val w = next().text
            // word(…) is a keyword option — '-'/'_' equivalent; a bare
            // word is a VALUE (rule names, flag words…) and stays as-is.
            // Exception: flag VALUES go through the grammar's
            // normalized_flag rule (cfg-grammar.y:1075, str-utils.c:71
            // normalize_flag '_'→'-'), so flags(syslog_protocol) works
            if (peek.kind == "(") {
              val k = ConfigParser.normKeyword(w)
              val inner = argList()
              args += KV(k,
                if (k == "flags") inner.map {
                  case Lit(v) => Lit(ConfigParser.normKeyword(v))
                  case other => other
                } else inner)
            } else args += Lit(w)
          case other => throw new ParseError(s"bad arg token: $other")
        }
      }
      args.toSeq
    }

    /** or-level */
    private def filterExpr(): FilterExpr = {
      var l = filterAnd()
      while (accept("word", "or")) l = FOr(l, filterAnd())
      l
    }
    private def filterAnd(): FilterExpr = {
      var l = filterUnary()
      while (accept("word", "and")) l = FAnd(l, filterUnary())
      l
    }
    private def filterUnary(): FilterExpr = {
      if (accept("word", "not")) FNot(filterUnary())
      else if (accept("(")) {
        val e = filterExpr(); expect(")"); e
      }
      else if (peek.kind == "str" || peek.kind == "num" || peek.text.startsWith("$")) {
        // "$TEMPLATE" op "value" comparison (filter-cmp.c). Symbolic ops
        // (== < ...) are the NUMERIC family (KW_NUM_*, atoi compare);
        // the word forms (eq lt ...) are byte-wise string compares
        // (filter-expr-parser.c:37-49).
        val lhs = next().text
        val opTok = next()
        val op = opTok.kind match {
          case "op" => opTok.text
          case "word" if ConfigParser.wordCmpOps(opTok.text) => opTok.text
          case k => throw new ParseError(s"expected comparison op, got $k:'${opTok.text}'")
        }
        val rhs = next().text
        FCmp(lhs, op, rhs)
      }
      else FCall(stmt())
    }

    /** Entry for standalone filter expressions (template $(filter)/$(if)). */
    def standaloneFilter(): FilterExpr = {
      val e = filterExpr()
      if (peek.kind != "eof") throw new ParseError(
        s"trailing input after filter expression: '${peek.text}'")
      e
    }

    private def logPath(): Seq[LogElem] = {
      expect("{")
      val elems = logContent()
      expect(";")
      elems
    }

    /** `if (EXPR) { ... } elif (EXPR) { ... } else { ... }` — compiled
      * exactly as the reference does (`lib/cfg-tree.c:391-431`): a
      * junction of two FINAL channels, the TRUE branch carrying the
      * filter expression, the FALSE branch holding the else content (or
      * the next conditional of the chain, or nothing). The leading `if`
      * is already consumed; the chain's trailing `;` is not. */
    private def ifChain(): LogElem = {
      expect("(")
      val cond = filterExpr()
      expect(")")
      expect("{")
      val tBranch = logContent()
      val fBranch: Seq[LogElem] =
        if (accept("word", "elif")) Seq(ifChain())
        else if (accept("word", "else")) { expect("{"); logContent() }
        else Nil
      JunctionElem(Seq(
        ChannelElem(InlineFilter(cond) +: tBranch, Seq("final")),
        ChannelElem(fBranch, Seq("final"))))
    }

    /** Log-path elements until the closing `}` (consumed). */
    private def logContent(): Seq[LogElem] = {
      val elems = mutable.ArrayBuffer.empty[LogElem]
      // consecutive embedded `log {}` statements form ONE implicit
      // junction (cfg-tree.c compiles fork points through the same mpx
      // delivery code as junction channels — final/fallback interact
      // across the sibling group, tests/python_functional/logpath).
      // The reference grammar only allows that group as the FINAL
      // junction of the block, optionally followed by flags()
      // (cfg-grammar.y: log_content = log_items log_last_junction
      // log_flags) — interleaved forms like `log{..}; filter(f);
      // log{..};` are syntax errors there, and accepting them here
      // would invent novel two-junction semantics (ADVICE r11)
      var lastEmbedded = false
      var sawEmbedded = false
      var flagsAfterEmbedded = false
      def add(e: LogElem): Unit = {
        if (sawEmbedded) throw new ParseError(
          "embedded log {} statements must form the final junction of " +
          "the log block, optionally followed by flags() (cfg-grammar.y " +
          "log_content: log_items log_last_junction log_flags)")
        elems += e; lastEmbedded = false
      }
      while (!accept("}")) {
        val w = expect("word").text
        w match {
          case "log" | "channel" =>
            // embedded fork statement (log_fork: KW_LOG | KW_CHANNEL):
            // one channel of the trailing sibling group
            if (flagsAfterEmbedded) throw new ParseError(
              "log {} fork after the block's trailing flags() " +
              "(cfg-grammar.y: log_flags ends log_content)")
            val body = logPath()
            val fl = body.collect { case Flags(f) => f }.flatten
            val ch = ChannelElem(body.filterNot(_.isInstanceOf[Flags]), fl)
            if (lastEmbedded) {
              val JunctionElem(chs) = elems.remove(elems.length - 1)
              elems += JunctionElem(chs :+ ch)
            } else {
              elems += JunctionElem(Seq(ch))
              lastEmbedded = true
            }
            sawEmbedded = true
          case "if" =>
            add(ifChain())
            expect(";")
          case "junction" =>
            expect("{")
            val chans = mutable.ArrayBuffer.empty[ChannelElem]
            while (!accept("}")) {
              expect("word") // 'channel'
              val body = logPath()
              val fl = body.collect { case Flags(f) => f }.flatten
              chans += ChannelElem(body.filterNot(_.isInstanceOf[Flags]), fl)
            }
            expect(";")
            add(JunctionElem(chans.toSeq))
          case "flags" =>
            // log-path flags use the same normalized_flag rule; legal
            // after the trailing embedded-fork group (log_flags follows
            // log_last_junction), so bypass the final-junction guard
            if (sawEmbedded) flagsAfterEmbedded = true
            elems += Flags(argList().collect {
              case Lit(v) => ConfigParser.normKeyword(v) })
            lastEmbedded = false
            expect(";")
          case kind @ ("source" | "filter" | "parser" | "rewrite" | "destination") =>
            expect("(")
            val isRef = peek.kind == "word" &&
              pos + 1 < toks.length && toks(pos + 1).kind == ")"
            if (isRef) {
              val inner = next().text
              expect(")"); expect(";")
              add(Ref(kind, inner))
            } else if (kind == "filter") {
              val e = filterExpr(); expect(")"); expect(";")
              add(InlineFilter(e))
            } else {
              // inline driver: parser(kv-parser(...)) style; a name
              // matching a block definition expands in place — keyword
              // position, so '-'/'_' normalize here too
              val inner = ConfigParser.normKeyword(expect("word").text)
              val s = Stmt(inner, argList())
              expect(")"); expect(";")
              blockDefs.get((kind, inner)) match {
                case None => add(InlineStmt(kind, s))
                case Some(bd) =>
                  val expanded = bd.expand(s.args)
                  new P(lex(expanded), expanded, blockDefs, globals)
                    .stmtList(kind).foreach(st => add(InlineStmt(kind, st)))
              }
            }
          case other => throw new ParseError(s"unknown log element: $other")
        }
      }
      elems.toSeq
    }
  }
}
