package graft.template

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `$(func ...)` scalar function library.
  *
  * Registration mirrors the reference's module plugins:
  * string/cond/list/numeric/ip/misc funcs `/root/reference/modules/
  * basicfuncs/basic-funcs.c:84-140`, crypto `/root/reference/modules/
  * cryptofuncs/cryptofuncs.c:160-166`. Each entry takes already-compiled
  * argument Columns (strings, per the reference's string-first typing) and
  * returns one Column; everything stays inside Catalyst codegen.
  *
  * Template-level "lists" are comma-separated strings, exactly like the
  * reference (`lib/scanner/list-scanner/`); array columns enter/leave via
  * split/array_join at the edges.
  *
  * Spark 4 runs ANSI mode: string->number casts on garbage would throw,
  * so numeric coercion is regex-guarded (returns null like the
  * reference's "" on unparsable input).
  */
object TemplateFunctions {
  /** A compiled template argument. `literal` is set when the argument was
    * pure literal text — functions with structural args (widths,
    * separators) require it. */
  final case class TArg(col: Column, literal: Option[String]) {
    def lit(fname: String): String = literal.getOrElse(
      throw new IllegalArgumentException(
        s"$$($fname): this argument must be a literal, not a computed value"))
  }

  /** ANSI-safe string->long: null (renders "") on non-numeric input.
    * Range-checked through decimal(38,0) so a 20+-digit string is
    * "not a number" (like strtoll's ERANGE) instead of an ANSI throw. */
  private def num(a: TArg): Column = safeLong(a.col.cast("string"))

  private def safeLong(s0: Column): Column = {
    val s = ltrim(s0)
    // fast path: <=18 digits can't overflow a long — no decimal cast
    // in the common case (the HOF lambdas evaluate this per element)
    when(s.rlike("^[+-]?[0-9]{1,18}$"), s.cast("long"))
      .otherwise({
        val d = when(s.rlike("^[+-]?[0-9]{19,38}$"), s.cast("decimal(38,0)"))
        when(d >= Long.MinValue && d <= Long.MaxValue, d.cast("long"))
      })
  }

  /** strtod-style full-consume float parse (also matches plain ints —
    * the Integer/Float split keys off [[safeLong]] succeeding first). */
  private def safeDouble(s0: Column): Column = {
    val s = ltrim(s0)
    when(s.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      s.cast("double"))
  }

  private def dbl(a: TArg): Column = safeDouble(a.col.cast("string"))

  /** The reference's Number duality (numeric-funcs.c:28-74): each
    * argument is Integer when strtoll fully consumes it, else Float
    * when strtod does, else invalid. */
  private final case class Num(i: Column, d: Column) {
    def valid: Column = d.isNotNull || i.isNotNull
    def isInt: Column = i.isNotNull
  }
  private def parseNum(a: TArg): Num = {
    val s = a.col.cast("string")
    val i = safeLong(s)
    Num(i, coalesce(i.cast("double"), safeDouble(s)))
  }

  /** Float results render "%.20f" (number_set_double sets precision
    * 20, format_number appends printf %.*f — the glibc-exact
    * [[graft.functions.CFormatDouble]], not Java's zero-padding
    * Formatter). */
  private def fmt20(c: Column): Column =
    graft.functions.GraftFunctions.c_format_double(c, 20)

  /** A 2-arg arithmetic function (numeric-funcs.c tf_num_plus etc):
    * exactly two parseable args or "NaN"; Integer&Integer stays int64,
    * anything Float promotes both and renders with 20 decimals.
    * `zeroGuard` adds the div/mod number_is_zero(m) check (int 0 or
    * |float| < DBL_EPSILON). Int overflow maps to NaN (try_add family)
    * rather than C's wrapping UB. */
  private def numOp2(args: Seq[TArg], intOp: (Column, Column) => Column,
      dblOp: (Column, Column) => Column, zeroGuard: Boolean = false): Column = {
    if (args.size != 2) return lit("NaN")
    val n = parseNum(args(0))
    val m = parseNum(args(1))
    val bad = !n.valid || !m.valid ||
      (if (zeroGuard) abs(m.d) < lit(2.220446049250313e-16) else lit(false))
    when(bad, lit("NaN"))
      .when(n.isInt && m.isInt,
        coalesce(intOp(n.i, m.i).cast("string"), lit("NaN")))
      .otherwise(fmt20(dblOp(n.d, m.d)))
  }

  // syslog-ng list representation (str-repr): quote-aware parse/encode,
  // unquoted-empty elements dropped at parse (functions.ListRepr)
  private def listIn(a: TArg): Column =
    graft.functions.ListFunctions.list_scan(a.col)
  private def listOut(c: Column): Column =
    graft.functions.ListFunctions.list_encode(c)
  /** Every list function accepts multiple args, each parsed as a list
    * and concatenated (list-funcs.c `_list_concat`). */
  private def listArgs(args: Seq[TArg]): Column =
    if (args.isEmpty) array().cast("array<string>")
    else flatten(array(args.map(listIn): _*))

  /** cryptofuncs.c tf_hash: args concatenate before digesting;
    * `--length N` / `-l N` truncates the hex output (0 or over-size
    * means the full digest). */
  private def cryptoHash(args: Seq[TArg], digest: Column => Column): Column = {
    var length = 0
    val rest = scala.collection.mutable.ArrayBuffer.empty[TArg]
    var i = 0
    while (i < args.length) {
      args(i).literal match {
        case Some("--length") | Some("-l") =>
          length = args(i + 1).lit("hash").toInt; i += 1
        case Some(s) if s.startsWith("--length=") =>
          length = s.stripPrefix("--length=").toInt
        case _ => rest += args(i)
      }
      i += 1
    }
    val hex = digest(concat(rest.toSeq.map(_.col): _*))
    if (length > 0) substring(hex, 1, length) else hex
  }

  val registry: Map[String, Seq[TArg] => Column] = Map(
    // ---- string (str-funcs.c) ------------------------------------------
    "echo" -> (args => concat_ws(" ", args.map(_.col): _*)),
    // multi-arg: one length per argument, space-joined (test_basicfuncs.c
    // "$(length $HOST $PID)" -> "5 5")
    "length" -> (args => concat_ws(" ",
      args.map(a => length(a.col).cast("string")): _*)),
    "substr" -> { args =>
      val s = args.head.col
      val start = num(args(1)).cast("int")
      val from1 = when(start >= 0, start + 1).otherwise(length(s) + start + 1)
      args.lift(2) match {
        case Some(len) => s.substr(from1, num(len).cast("int"))
        case None => s.substr(from1, length(s))
      }
    },
    // each arg strips independently (all whitespace, like g_strstrip);
    // empty results drop from the join ("$(strip $S5 $S1 $S5)" -> "value")
    "strip" -> { args =>
      def st(c: Column) = regexp_replace(c, "^\\s+|\\s+$", "")
      concat_ws(" ", args.map(a => when(st(a.col) =!= "", st(a.col))): _*)
    },
    // $(sanitize [-c|-C] [-i chars] [-r repl] args...) — str-funcs.c:209-284:
    // control chars (<0x20, default on) and invalid chars (default "/")
    // become the replacement char (default '_'); args join with '/'
    "sanitize" -> { args =>
      var ctrl = true
      var invalid = "/"
      var repl = "_"
      val rest = scala.collection.mutable.ArrayBuffer.empty[TArg]
      var i = 0
      while (i < args.length) {
        args(i).literal match {
          case Some("-c") | Some("--ctrl-chars") => ctrl = true
          case Some("-C") | Some("--no-ctrl-chars") => ctrl = false
          case Some("-i") | Some("--invalid-chars") =>
            invalid = args(i + 1).lit("sanitize"); i += 1
          case Some("-r") | Some("--replacement") =>
            repl = args(i + 1).lit("sanitize"); i += 1
          case _ => rest += args(i)
        }
        i += 1
      }
      val cls = "[" + java.util.regex.Pattern.quote(invalid) +
        (if (ctrl) "\\x00-\\x1f" else "") + "]"
      val r = java.util.regex.Matcher.quoteReplacement(repl.take(1))
      concat_ws("/", rest.toSeq.map(a => regexp_replace(a.col, cls, r)): _*)
    },
    // multi-arg, space-joined (str-funcs.c tf_string_case loops argv)
    "lowercase" -> (args => concat_ws(" ", args.map(a => lower(a.col)): _*)),
    "uppercase" -> (args => concat_ws(" ", args.map(a => upper(a.col)): _*)),
    "replace-delimiter" -> { args =>
      // $(replace-delimiter "from-chars" "to" msg)
      val from = args.head.lit("replace-delimiter")
      val to = args(1).lit("replace-delimiter")
      translate(args(2).col, from, to.take(1).padTo(from.length, to.head).mkString)
    },
    // str-funcs.c tf_padding: cyclic left-fill, NEVER truncates a
    // string already >= width; an empty pad string falls back to " "
    "padding" -> { args =>
      val width = args(1).lit("padding").toInt
      val padChar = args.lift(2).map(_.lit("padding")).filter(_.nonEmpty)
        .getOrElse(" ")
      val s = args.head.col
      when(length(s) >= width, s).otherwise(lpad(s, width, padChar))
    },
    "repeat" -> (args => repeat(args.head.col, args(1).lit("repeat").toInt)),
    // every tail arg is a list; lists concatenate (list-funcs.c
    // _list_concat) before joining/splitting
    "implode" -> (args => array_join(
      listArgs(args.tail), args.head.lit("implode"))),
    "explode" -> { args =>
      val sep = java.util.regex.Pattern.quote(args.head.lit("explode"))
      listOut(flatten(array(args.tail.map(a => split(a.col, sep)): _*)))
    },
    // ---- filename (fname-funcs.c) --------------------------------------
    "basename" -> (args => substring_index(args.head.col, "/", -1)),
    "dirname" -> { args =>
      val s = args.head.col
      when(s.contains("/"), regexp_replace(s, "/[^/]*$", "")).otherwise(lit("."))
    },
    // ---- conditional (cond-funcs.c) -------------------------------------
    "or" -> (args => coalesce(args.map(a => nullif(a.col, lit(""))) :+ lit(""): _*)),
    "default" -> (args => coalesce(args.map(a => nullif(a.col, lit(""))) :+ lit(""): _*)),
    // $(if cond a b) — cond-funcs.c:148-177. The reference's cond is a
    // filter expression; the engine-level equivalent is `when(Column)`,
    // so the template form takes the already-evaluated truth string.
    "if" -> { args =>
      val c = args.head.col
      when(c === "true" || c === "1" || c === "yes", args(1).col)
        .otherwise(args(2).col)
    },
    // ---- list (list-funcs.c) --------------------------------------------
    "list-concat" -> (args => listOut(listArgs(args))),
    "list-append" -> { args =>
      if (args.isEmpty) lit("")
      else listOut(concat(listIn(args.head),
        array(args.tail.map(_.col): _*)))
    },
    "list-head" -> (args => try_element_at(listArgs(args), lit(1))),
    "list-nth" -> { args =>
      // $(list-nth INDEX list...) — 0-indexed, index FIRST (list-funcs.c
      // tf_list_nth: argv[0] is the index); negative counts from the
      // end (-1 = last), out-of-range renders ""
      val idx = num(args.head).cast("int")
      val arr = listArgs(args.tail)
      when(idx >= 0, try_element_at(arr, idx + 1))
        .when(-idx <= size(arr), try_element_at(arr, idx))
    },
    "list-tail" -> { args =>
      val arr = listArgs(args)
      listOut(slice(arr, lit(2), greatest(size(arr) - 1, lit(0))))
    },
    "list-count" -> (args => size(listArgs(args))),
    "list-slice" -> { args =>
      // $(list-slice from:to list) — 0-based, to exclusive
      val Array(f, t) = args.head.lit("list-slice").split(":", -1)
      val arr = listArgs(args.tail)
      val from = if (f.isEmpty) 0 else f.toInt
      val fromC = if (from >= 0) lit(from + 1) else greatest(size(arr) + from + 1, lit(1))
      val untilC =
        if (t.isEmpty) size(arr) + 1
        else if (t.toInt >= 0) least(lit(t.toInt + 1), size(arr) + 1)
        else size(arr) + t.toInt + 1
      listOut(slice(arr, fromC, greatest(untilC - fromC, lit(0))))
    },
    // $(list-search [--mode literal|prefix|substring|glob|pcre]
    //   [--start-index N] PATTERN list...) — list-funcs.c
    // tf_list_search: first matching index in the concatenated list
    // (global numbering across list args), "" when none. pcre is
    // SEARCH semantics (unanchored), glob is a full match.
    "list-search" -> { args =>
      var mode = "literal"
      var start = 0
      val rest = scala.collection.mutable.ArrayBuffer.empty[TArg]
      var i = 0
      while (i < args.length) {
        args(i).literal match {
          case Some("--mode") =>
            mode = args(i + 1).lit("list-search"); i += 1
          case Some(s) if s.startsWith("--mode=") =>
            mode = s.stripPrefix("--mode=")
          case Some("--start-index") =>
            start = args(i + 1).lit("list-search").toInt; i += 1
          case Some(s) if s.startsWith("--start-index=") =>
            start = s.stripPrefix("--start-index=").toInt
          case _ => rest += args(i)
        }
        i += 1
      }
      require(rest.nonEmpty, "$(list-search): missing pattern argument")
      val pattern = rest.head
      val arr = listArgs(rest.toSeq.tail)
      val pred: Column => Column = mode match {
        case "literal" => _ === pattern.col
        case "prefix" => _.startsWith(pattern.col)
        case "substring" => _.contains(pattern.col)
        case "glob" =>
          e => graft.operators.Filters.matchesGlob(
            pattern.lit("list-search"), e)
        case "pcre" => _.rlike(pattern.lit("list-search"))
        case other => throw new IllegalArgumentException(
          s"$$(list-search): unknown mode $other")
      }
      val hits = filter(
        transform(arr, (x, ix) => when(ix >= start && pred(x), ix)),
        _.isNotNull)
      when(size(hits) > 0, try_element_at(hits, lit(1)).cast("string"))
        .otherwise(lit(""))
    },
    // ---- numeric (numeric-funcs.c:149-466) -------------------------------
    "+" -> (args => numOp2(args, call_function("try_add", _, _), _ + _)),
    "-" -> (args => numOp2(args, call_function("try_subtract", _, _), _ - _)),
    "*" -> (args => numOp2(args, call_function("try_multiply", _, _), _ * _)),
    "/" -> (args => numOp2(args, call_function("div", _, _), _ / _,
      zeroGuard = true)),
    "%" -> (args => numOp2(args, _ % _, (a, b) => a % b, zeroGuard = true)),
    // sum/min/max/average over the ARGUMENT list (the reference's forms
    // are context aggregates — see ConfigCompiler.aggTemplate; the
    // scalar multi-arg reading is this engine's batch-local equivalent)
    "sum" -> (args => args.map(num).reduce(_ + _)),
    "min" -> (args => least(args.map(num): _*)),
    "max" -> (args => greatest(args.map(num): _*)),
    "average" -> (args => (args.map(num).reduce(_ + _) / args.size).cast("long")),
    // tf_num_round: precision 0..20 (default 0), round-half-away, then
    // printf %.*f at that precision — $(round 2 20) renders 20 decimals
    "round" -> { args =>
      if (args.isEmpty || args.size > 2) lit("NaN")
      else {
        val p = args.lift(1) match {
          case None => Some(0)
          case Some(a) => a.literal.flatMap(_.toIntOption)
        }
        p match {
          case Some(prec) if prec >= 0 && prec <= 20 =>
            val n = parseNum(args.head)
            val mult = math.pow(10, prec)
            val r = round(n.d * mult, 0) / mult
            when(!n.valid, lit("NaN"))
              .otherwise(graft.functions.GraftFunctions.c_format_double(r, prec))
          case _ => lit("NaN")
        }
      }
    },
    "ceil" -> { args =>
      val n = parseNum(args.head)
      when(!n.valid, lit("NaN")).otherwise(ceil(n.d).cast("string"))
    },
    "floor" -> { args =>
      val n = parseNum(args.head)
      when(!n.valid, lit("NaN")).otherwise(floor(n.d).cast("string"))
    },
    // ---- ip / misc (ip-funcs.c, misc-funcs.c) ----------------------------
    "ipv4-to-int" -> (args => graft.functions.GraftFunctions.ipv4_to_int(args.head.col)),
    "indent-multi-line" -> (args => regexp_replace(args.head.col, "\n", "\n\t")),
    // $(env A B ...) — misc-funcs.c tf_env: present values append, with a
    // separating space after each non-final argument's value
    "env" -> { args =>
      val out = new StringBuilder
      args.zipWithIndex.foreach { case (a, i) =>
        sys.env.get(a.lit("env")).foreach { v =>
          out ++= v
          if (i < args.length - 1) out += ' '
        }
      }
      lit(out.toString)
    },
    // $(getent service key [member]) — modules/getent/tfgetent.c via the
    // NSS files backend (see template.Nss)
    "getent" -> { args =>
      Nss.getent(args.head.lit("getent"), args(1).col,
        args.lift(2).map(_.lit("getent")))
    },
    // $(dns-resolve-ip [--use-dns|--use-fqdn|--dns-cache|
    //   --normalize-hostnames yes/no] ip) — ip-funcs.c:125-164; hosts(5)
    // files backend, --dns-cache accepted as a no-op (the literal map IS
    // a cache)
    "dns-resolve-ip" -> { args =>
      var useDns = true; var useFqdn = false; var normalize = false
      var i = 0
      def yes(v: String): Boolean = v == "yes" || v == "on" || v == "1" || v == "true"
      var ip: Option[Column] = None
      while (i < args.length) {
        val l = args(i).literal
        def optVal(name: String): String =
          l.get.stripPrefix(name).stripPrefix("=") match {
            case "" => i += 1; args(i).lit("dns-resolve-ip")
            case v => v
          }
        l match {
          case Some(s) if s.startsWith("--use-dns") || s.startsWith("-d") =>
            useDns = yes(optVal(if (s.startsWith("--")) "--use-dns" else "-d"))
          case Some(s) if s.startsWith("--use-fqdn") || s.startsWith("-f") =>
            useFqdn = yes(optVal(if (s.startsWith("--")) "--use-fqdn" else "-f"))
          case Some(s) if s.startsWith("--dns-cache") || s.startsWith("-c") =>
            optVal(if (s.startsWith("--")) "--dns-cache" else "-c")
          case Some(s) if s.startsWith("--normalize-hostnames") || s.startsWith("-n") =>
            normalize = yes(optVal(if (s.startsWith("--")) "--normalize-hostnames" else "-n"))
          case _ => ip = Some(args(i).col)
        }
        i += 1
      }
      Nss.dnsResolveIp(ip.getOrElse(throw new IllegalArgumentException(
        "$(dns-resolve-ip): missing ip argument")), useDns, useFqdn, normalize)
    },
    // tf_urlencode/tf_urldecode (str-funcs.c) delegate to
    // g_uri_escape/unescape: space is %20 (never '+'), a malformed or
    // NUL-producing escape fails the WHOLE result to "". Spark's
    // url_encode/url_decode speak form-encoding, so '+' is shielded
    // both ways; args concatenate like the reference's loop.
    "url-encode" -> (args => concat(args.map(a =>
      regexp_replace(call_function("url_encode", a.col), "\\+", "%20")): _*)),
    "url-decode" -> { args =>
      val decs = args.map(a => call_function("try_url_decode",
        regexp_replace(a.col, "\\+", "%2B")))
      val bad = decs.map(d => d.isNull || d.contains("\u0000"))
        .reduce(_ || _)
      when(bad, lit("")).otherwise(concat(decs: _*))
    },
    // base64-encode concatenates args before encoding (str-funcs.c
    // tf_base64_encode appends every argv to the same encoder, break
    // length 0 — strip the MIME chunking Spark's base64 may emit)
    "base64-encode" -> (args =>
      regexp_replace(base64(concat(args.map(_.col): _*).cast("binary")),
        "[\\r\\n]", "")),
    // ---- crypto (cryptofuncs.c:41-166) -----------------------------------
    // $(hash_method [--length N] arg1 arg2 ...): argument values simply
    // concatenate before digesting; --length truncates the hex output
    "uuid" -> (_ => call_function("uuid")),
    "hash" -> (args => cryptoHash(args, c => sha2(c, 256))),
    "sha256" -> (args => cryptoHash(args, c => sha2(c, 256))),
    "sha512" -> (args => cryptoHash(args, c => sha2(c, 512))),
    "sha1" -> (args => cryptoHash(args, sha1)),
    "md5" -> (args => cryptoHash(args, md5)),
    "md4" -> (args => cryptoHash(args, graft.functions.GraftFunctions.md4)),
    // ---- misc -------------------------------------------------------------
    // $(stardate [--digits N] $UNIXTIME) -> year.fraction, fraction
    // TRUNCATED to N digits (stardate.c:128-130 floor — "No rounding
    // up!"), digits 0-9, default 2
    "stardate" -> { args =>
      var digits = 2
      val rest = scala.collection.mutable.ArrayBuffer.empty[TArg]
      var i = 0
      while (i < args.length) {
        args(i).literal match {
          case Some("--digits") | Some("-d") =>
            digits = args(i + 1).lit("stardate").toInt; i += 1
          case Some(s) if s.startsWith("--digits=") =>
            digits = s.stripPrefix("--digits=").toInt
          case _ => rest += args(i)
        }
        i += 1
      }
      if (digits < 0 || digits > 9) throw new IllegalArgumentException(
        "stardate: digits must be between 0-9.")
      val ts = to_timestamp(num(rest.head))
      val startOfYear = date_trunc("year", ts)
      val nextYear = add_months(startOfYear, 12)
      val frac = (unix_timestamp(ts) - unix_timestamp(startOfYear)).cast("double") /
        (unix_timestamp(nextYear) - unix_timestamp(startOfYear)).cast("double")
      val mult = math.pow(10, digits)
      format_string(s"%.${digits}f", year(ts) + floor(frac * mult) / mult)
    },
    // $(binary 0x41 66 0101 ...) — str-funcs.c tf_binary: bytes from
    // numeric args in C notation (hex/octal/decimal via g_ascii_strtoll
    // base 0); literal args validate at COMPILE time with the
    // reference's error texts ("unable to parse X", "X is above 255")
    "binary" -> { args =>
      if (args.isEmpty)
        throw new IllegalArgumentException("$(binary): Incorrect parameters")
      def parseByte(s: String): Int = {
        val n =
          try {
            if (s.matches("0[xX][0-9a-fA-F]+")) Integer.parseInt(s.drop(2), 16)
            else if (s.matches("0[0-7]*")) Integer.parseInt(s, 8)
            else if (s.matches("[1-9][0-9]*")) Integer.parseInt(s)
            else throw new NumberFormatException(s)
          } catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"$$(binary): unable to parse $s")
          }
        if (n > 255) throw new IllegalArgumentException(
          s"$$(binary): $n is above 255")
        n
      }
      val chars = args.map { a =>
        a.literal match {
          case Some(s) => lit(parseByte(s).toChar.toString)
          case None =>
            val s = a.col.cast("string")
            val n = when(s.rlike("^0[xX][0-9a-fA-F]+$"),
              conv(regexp_replace(s, "^0[xX]", ""), 16, 10).cast("long"))
              .when(s.rlike("^0[0-7]*$"), conv(s, 8, 10).cast("long"))
              .otherwise(num(a))
            call_function("char", n)
        }
      }
      concat(chars: _*)
    },
    // format-json / format-flat-json / format-welf / format-cef-extension
    // / graphite-output compile through the value-pairs cmdline
    // (template.VpCmdline) — intercepted in Template.compile before
    // this registry
  )
}
