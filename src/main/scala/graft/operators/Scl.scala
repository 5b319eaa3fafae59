package graft.operators

import graft.functions.{GraftFunctions, JsonFlatten}
import graft.operators.VendorParsers.Fx
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** scl composites: the reference's configuration-library blocks that
  * wire the primitive parsers into turnkey entries —
  * `default-network-drivers()`
  * (`/root/reference/scl/default-network-drivers/plugin.conf:25-82`),
  * `ewmm-parser()` (`scl/ewmm/ewmm.conf:40-57`) and the `cee`
  * adapter (`scl/cee/adapter.conf:37-39`) — plus the application
  * registry that backs `app-parser(topic(...))`
  * (`modules/appmodel/appmodel-context.c`,
  * `app-parser-generator.c:60-140`).
  *
  * The reference expresses "does this parser apply?" as try-and-branch
  * channels. A literal junction compile (union of filtered branches)
  * re-scans the source once per application — 8 scans at 100 TB, and
  * Catalyst pushes the branch filters below any pinned exchange, so
  * exchange reuse cannot save it. Instead the app-parser compiles
  * FUSED: one `__route` when-chain decides the application per row
  * (first match wins = the junction's final-flag order), and every
  * vendor parser contributes its EFFECT ([[VendorParsers.Fx]]) to one
  * shared application step — a route-keyed coalesce picks exactly one
  * add map per row and ONE values-map rebuild applies it, instead of
  * each parser re-filtering + re-concatenating the whole map (~14
  * rebuilds per row before round 6). One scan, zero shuffles, one
  * whole-stage-codegen projection chain; delivery semantics are
  * identical to the junction (`lib/logmpx.c:88-109`) because the
  * routes partition the rows.
  */
object Scl {

  private def emptyMap: Column = map().cast("map<string,string>")

  private def valuesOrEmpty(df: DataFrame): Column =
    if (df.columns.contains("values")) col("values") else emptyMap

  private def colOr(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** Merge non-null entries of `add` into values (new keys win). */
  private def merged(df: DataFrame, add: Column): Column = {
    val clean = map_filter(coalesce(add, emptyMap), (_, v) => v.isNotNull)
    map_concat(
      map_filter(valuesOrEmpty(df), (k, _) => !array_contains(map_keys(clean), k)),
      clean)
  }

  /** One registered application: name, detect predicate, and the
    * parser's effect builder — receives the frame and the route
    * predicate, returns the guarded [[Fx]] the fused compile merges. */
  final case class App(name: String, detect: Column,
      fx: (DataFrame, Column) => Fx)

  // ---- application registry -------------------------------------------------
  /** `topic(syslog-raw)` applications — detection on the RAW line
    * before any syslog parsing (the no-parse channel of
    * default-network-drivers). Detect filters are the reference's own
    * `application x[syslog-raw] { filter }` predicates:
    * checkpoint `scl/checkpoint/plugin.conf:79-87`, fortigate
    * `scl/fortigate/fortigate.conf:43-46`, cisco
    * `scl/cisco/plugin.conf:113-116`. cisco's substring filter
    * (": %") is the loosest, so it runs LAST among the raw apps. */
  def rawApplications: Seq[App] = Seq(
    App("checkpoint",
      col("message").rlike("^(<[0-9]{1,3}>)1 .* CheckPoint ") ||
        col("message").rlike("^time=[0-9]+\\|hostname=[a-zA-Z0-9-]+\\|product=Firewall"),
      (df, g) => VendorParsers.checkpointFx(df, guard = g)),
    App("netskope",
      // scl/netskope/plugin.conf:40-43: the "<134>{" prefix plus the
      // insertion-timestamp marker field
      col("message").startsWith("<134>{") &&
        col("message").contains("_insertion_epoch_timestamp"),
      (df, g) => VendorParsers.netskopeFx(df, guard = g)),
    App("websense", col("message").contains("vendor=Websense"),
      (df, g) => VendorParsers.websenseFx(df, guard = g)),
    App("fortigate", col("message").rlike("^<[0-9]+>date="),
      (df, g) => VendorParsers.fortigateFx(df, guard = g)),
    App("cisco", col("message").contains(": %"),
      (df, g) => VendorParsers.ciscoFx(df, guard = g)))

  /** `topic(syslog)` applications — detection on the post-syslog-parse
    * columns: iptables `scl/iptables/iptables.conf:27-32`, sudo
    * `scl/sudo/sudo.conf:35-38`, cee `scl/cee/adapter.conf:37-39`
    * (the cee application has no filter upstream — the json-parser's
    * marker IS the detection; here the marker check is the predicate).
    * panos (`scl/paloalto/panos.conf:271-274`) detects upstream as
    * PROGRAM prefix "1," — the legacy program parse eats the un-tagged
    * CSV up to its first space (`log_msg_parse_legacy_program_name`),
    * so "1,2020/04/14" lands in PROGRAM and the rest in MESSAGE; since
    * the r9 parser fidelity pass this engine produces the same split,
    * and the detection signal is the reference's own. The parser then
    * reassembles `${LEGACY_MSGHDR}${MESSAGE}` (panos.conf:40) before
    * the CSV split — see panosFx. */
  def syslogApplications: Seq[App] = Seq(
    App("iptables",
      col("facility") === 0 && col("program") === "kernel" &&
        col("message").contains("PROTO="),
      (df, g) => VendorParsers.iptablesFx(df, guard = g)),
    App("sudo", col("program") === "sudo",
      (df, g) => VendorParsers.sudoFx(df, guard = g)),
    App("panos", col("program").startsWith("1,"),
      (df, g) => VendorParsers.panosFx(df, guard = g)),
    App("cee", col("message").startsWith("@cee:"),
      (df, g) => jsonWithMarkerFx(df, "@cee:", ".cee.", g)),
    // scl/cim/adapter.conf:26-28 — the Mitre CEE/Lumberjack twin with
    // the @cim: marker
    App("cim", col("message").startsWith("@cim:"),
      (df, g) => jsonWithMarkerFx(df, "@cim:", ".cim.", g)),
    // scl/junos/plugin.conf:26-28 — pure SDATA-based classification:
    // the RFC5424 parse already extracted the fields, the application
    // block only tags rows where the junos SD element is present
    App("junos",
      coalesce(try_element_at(col("values"),
        lit(".SDATA.junos@2636.1.1.1.2.129.reason")) =!= "", lit(false)),
      (_, _) => Fx(guard = lit(false), adds = map().cast("map<string,string>"))))

  private def applications(topic: String): Seq[App] = topic match {
    case "syslog-raw" => rawApplications
    case "syslog" => syslogApplications
    // any other topic is legal (app-parser-generator.c matches apps by
    // string equality); only user-registered apps can live there
    case _ => Seq.empty
  }

  /** First-match route: NULL when no application matches (detects are
    * evaluated null-safe — an unset column never matches, like the
    * reference's filters). */
  private[graft] def routeOf(apps: Seq[App]): Column =
    apps.foldLeft(lit(null).cast("string")) { (acc, app) =>
      coalesce(acc, when(coalesce(app.detect, lit(false)), lit(app.name)))
    }

  /** The `.app.name` NV + `.app.<name>` tag every generated application
    * channel sets (`app-parser-generator.c:79-80`) — expressed as one
    * post-add map plus a tags effect so the fused apply folds it into
    * the SAME single values merge as the parsers. */
  private[graft] def tagAddOf(appRoute: Column): Column =
    when(appRoute.isNotNull, map(lit(".app.name"), appRoute)).otherwise(emptyMap)

  private[graft] def tagFxOf(df: DataFrame, appRoute: Column): Fx =
    Fx(guard = appRoute.isNotNull,
      // a null literal never satisfies the adds coalesce, so this
      // pseudo-effect cannot mask a parser's add map
      adds = lit(null).cast("map<string,string>"),
      sets = Seq("tags" -> array_union(
        coalesce(
          if (df.columns.contains("tags")) col("tags")
          else array().cast("array<string>"),
          array().cast("array<string>")),
        array(concat(lit(".app."), appRoute)))))

  /** One user-registered application (`application name[topic] {}`
    * config block, appmodel-grammar.ym:68-79). `detect`/`transform`
    * empty = the block had no filter/parser (after base-topic
    * inheritance); a missing filter matches EVERYTHING, first-match
    * order still applies (`_generate_filter` skips the filter line,
    * the junction channel then passes all rows). */
  final case class UserApp(name: String, detect: Option[Column],
      transform: Option[DataFrame => DataFrame])

  /** The include/exclude tests of `app-parser-generator.c:86-100` are
    * `strstr` SUBSTRING probes on the raw comma list — "foo" is
    * included by auto-parse-include("foobar"). Ported quirk-for-quirk. */
  private def selectedBy(include: Option[String], exclude: Option[String])(
      name: String): Boolean =
    include.forall(_.contains(name)) && !exclude.exists(_.contains(name))

  /** app-parser(topic(...)) as a standalone transform — the fused
    * form: route once, merge every registered parser's effect in one
    * application step, tag matches, label `__channel` (the
    * doesnotexist fallback of `app-parser-generator.c:137` = route
    * NULL → "unknown", passed through untouched). */
  def appParser(df: DataFrame, topic: String): DataFrame =
    appParserFused(df, applications(topic))

  /** The full generated-app-parser surface
    * (`app-parser-generator.c:155-215`): `auto-parse(no)` disables
    * every application branch (only the doesnotexist frame remains,
    * :135-138 — i.e. nothing matches), `auto-parse-include()`/
    * `auto-parse-exclude()` filter applications by the strstr probe,
    * and user-registered `application` blocks join the branch list
    * AFTER the built-in (scl) registry, in registration order, with
    * base-topic (`*`) filter/parser inheritance
    * (`appmodel-context.c:91-106`). With no user apps the fused
    * single-pass compile is used; user apps — config-authored, few —
    * compile the way the reference itself generates them: route once,
    * then per-app branches unioned (each branch applies its parser
    * transform to only its routed rows; the routes partition the rows
    * so delivery semantics equal the junction's flags(final) chain). */
  def appParserConfigured(df: DataFrame, topic: String,
      enabled: Boolean = true,
      include: Option[String] = None, exclude: Option[String] = None,
      userApps: Seq[UserApp] = Nil): DataFrame = {
    if (!enabled) {
      // auto-parse(no): only the '.app.doesnotexist' frame — no row
      // can match, everything passes through unrouted
      val base =
        if (df.columns.contains("values")) df
        else df.withColumn("values", emptyMap)
      return base.withColumn("__channel", lit("unknown"))
    }
    val sel = selectedBy(include, exclude) _
    val builtins = applications(topic).filter(a => sel(a.name))
    val users = userApps.filter(u => sel(u.name))
    if (users.isEmpty) appParserFused(df, builtins)
    else appParserBranched(df, builtins, users)
  }

  private def appParserFused(df: DataFrame, apps: Seq[App]): DataFrame = {
    // detects may read the NV surface (junos classifies on SDATA) —
    // guarantee it exists like the post-parse frames do
    val base =
      if (df.columns.contains("values")) df
      else df.withColumn("values", emptyMap)
    val routed = base.withColumn("__route", routeOf(apps))
    val fxs = apps.map(a => a.fx(routed, col("__route") === a.name))
    // tags update only when the frame carries tags (the reference sets
    // the tag unconditionally; a tag-less frame here has no tag surface)
    val tagFx =
      if (routed.columns.contains("tags"))
        Seq(tagFxOf(routed, col("__route"))) else Nil
    // vendor adds are all `.vendor.`-prefixed, so the `.app.name` tag
    // map is key-disjoint from every routed add — plain concat
    VendorParsers.applyFx(routed, fxs ++ tagFx,
        concatAdds = Seq(tagAddOf(col("__route"))))
      .withColumn("__channel", coalesce(col("__route"), lit("unknown")))
      .drop("__route")
  }

  /** Branch-union compile for configs with user-registered apps: one
    * `__route` pass decides the application per row (builtins first,
    * then user apps — registration order, first match wins), then each
    * user app's parser transform runs on ITS rows only and the pieces
    * re-union (`unionByName` with null-fill: a csv-parser branch adds
    * real columns the other branches lack, exactly the junction's
    * fan-in). Built-in rows keep the fused single-application step. */
  private def appParserBranched(df: DataFrame, builtins: Seq[App],
      users: Seq[UserApp]): DataFrame = {
    val base =
      if (df.columns.contains("values")) df
      else df.withColumn("values", emptyMap)
    val userAsApps = users.map(u =>
      App(u.name, u.detect.getOrElse(lit(true)), null))
    // no persist: streaming frames can't cache, and the re-scan per
    // branch IS the junction shape the reference generates here
    val routed = base.withColumn("__route", routeOf(builtins ++ userAsApps))

    // built-in (and unmatched) rows: the fused effect application
    val userNames = users.map(_.name)
    val builtinRows = routed.filter(!coalesce(col("__route"), lit(""))
      .isInCollection(userNames))
    val fxs = builtins.map(a => a.fx(builtinRows, col("__route") === a.name))
    val tagFx =
      if (builtinRows.columns.contains("tags"))
        Seq(tagFxOf(builtinRows, col("__route"))) else Nil
    val builtinDone = VendorParsers.applyFx(builtinRows, fxs ++ tagFx,
        concatAdds = Seq(tagAddOf(col("__route"))))
      .withColumn("__channel", coalesce(col("__route"), lit("unknown")))

    // each user app: its rows through its parser, then the generated
    // action (app-parser-generator.c:75-85): .app.name NV + .app.<n> tag
    val userDone = users.map { u =>
      val mine = routed.filter(col("__route") === u.name)
      val parsed = u.transform.fold(mine)(t => t(mine))
      val tagged =
        if (parsed.columns.contains("tags"))
          parsed.withColumn("tags", array_union(
            coalesce(col("tags"), array().cast("array<string>")),
            array(lit(".app." + u.name))))
        else parsed
      tagged.withColumn("values", merged(tagged,
          map(lit(".app.name"), lit(u.name))))
        .withColumn("__channel", lit(u.name))
    }

    userDone.foldLeft(builtinDone)((acc, d) =>
        acc.unionByName(d, allowMissingColumns = true))
      .drop("__route")
  }

  // ---- ewmm -----------------------------------------------------------------
  /** ewmm-parser() (`scl/ewmm/ewmm.conf:40-57`): the
    * enterprise-wide-message-model wire format — PROGRAM is
    * "@syslog-ng", the MSG field is a JSON object of name-value pairs.
    * Parsing = unset PROGRAM/RAWMSG, json-parse the message (builtin
    * NV names overwrite their columns), read `._TAGS` into tags, then
    * drop the hop-by-hop `._*` fields. Non-matching rows pass through
    * unchanged (the reference expresses the guard as the block's
    * `filter { program("@syslog-ng") }`). */
  private[graft] def ewmmFx(df: DataFrame, guard: Column = lit(true)): Fx = {
    val isEwmm = colOr(df, "program") === "@syslog-ng" && guard
    def k(name: String): Column = try_element_at(col("__ewmm"), lit(name))
    val builtins = Seq("MESSAGE", "MSG", "HOST", "PROGRAM", "PID", "MSGID")
    val carried = map_filter(col("__ewmm"), (key, _) =>
      !key.isin(builtins.map(lit(_)): _*) && !key.startsWith("._"))
    val existingTags =
      if (df.columns.contains("tags")) col("tags")
      else array().cast("array<string>")
    Fx(
      guard = isEwmm,
      adds = carried,
      sets = Seq(
        "tags" -> when(k("._TAGS").isNotNull, Parsers.tagsParse(k("._TAGS")))
          .otherwise(existingTags),
        "host" -> coalesce(k("HOST"), colOr(df, "host")),
        "program" -> k("PROGRAM"),
        "pid" -> coalesce(k("PID"), colOr(df, "pid")),
        "message" -> coalesce(k("MESSAGE"), k("MSG"), col("message"))),
      stage = d => d.withColumn("__ewmm",
        when(isEwmm, coalesce(JsonFlatten(col("message")), emptyMap))
          .otherwise(emptyMap)),
      drops = Seq("__ewmm"))
  }

  def ewmmParser(df: DataFrame, guard: Column = lit(true)): DataFrame =
    VendorParsers.applyFx(df, Seq(ewmmFx(df, guard)))

  /** The RFC5424 SDATA field from the `.SDATA.elem.param` entries of
    * `values` — sorted entries folded into `[elem p="v"...]` blocks,
    * `-` when none (the reference template's `${SDATA:--}`). SD-ID and
    * param split at the LAST dot (`logmsg.c
    * log_msg_append_format_sdata` uses memrchr): enterprise SD-IDs
    * contain dots — `.SDATA.junos@2636.1.1.1.2.129.reason` renders as
    * `[junos@2636.1.1.1.2.129 reason="..."]`. Shared by
    * [[formatEwmm]] and the `syslog()` network destination's RFC5424
    * wire format. */
  def sdataBlocks(df: DataFrame): Column =
    sdataBlocksOf(valuesOrEmpty(df))

  /** Same over a bare values-map column. `emptyAs` is the no-SDATA
    * rendering: "-" for the RFC5424 wire position (the template's
    * `${SDATA:--}`), "" for the bare $SDATA macro (`macros.c:520`
    * appends nothing). */
  def sdataBlocksOf(values: Column, emptyAs: String = "-"): Column = {
    // RFC5424 SD-PARAM value escapes: \\ " ] (rfc5424 §6.3.3)
    def sdEscape(v: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(v,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\\]", "\\\\]")
    val sdEntries = sort_array(filter(map_entries(values),
      e => e.getField("key").startsWith(".SDATA.")))
    aggregate(sdEntries,
      struct(lit("").as("out"), lit("").as("elem")),
      (acc, e) => {
        val k = e.getField("key").substr(lit(8), length(e.getField("key")))
        // SD-NAMEs sanitize with %XX percent-encoding (logmsg.c
        // log_msg_sdata_append_key_escaped; test_log_message.c
        // test_sdata_sanitization) — split BEFORE escaping so an
        // escaped %2E can't be mistaken for a level separator
        def esc(c: Column): Column =
          graft.functions.GraftFunctions.sdata_key_escape(c)
        val param = esc(substring_index(k, ".", -1))
        val elem = esc(k.substr(lit(1),
          length(k) - length(substring_index(k, ".", -1)) - 1))
        val opened = when(acc.getField("elem") === elem, acc.getField("out"))
          .otherwise(concat(acc.getField("out"),
            when(acc.getField("elem") =!= "", lit("]")).otherwise(lit("")),
            lit("["), elem))
        struct(
          concat(opened, lit(" "), param, lit("=\""),
            sdEscape(e.getField("value")), lit("\"")).as("out"),
          elem.as("elem"))
      },
      acc => when(acc.getField("elem") === "", lit(emptyAs))
        .otherwise(concat(acc.getField("out"), lit("]"))))
  }

  /** `$(format-ewmm)` — the destination side of the EWMM pair
    * (`scl/ewmm/ewmm.conf`, the template-function line):
    * `<PRI>1 ISODATE HOST @syslog-ng - - SDATA JSON` where the JSON
    * carries every NV pair (builtins + values, leading dots kept,
    * digit-start and SOURCE keys excluded) plus `._TAGS`, and
    * `.SDATA.elem.param` entries render as real RFC5424 SD blocks in
    * the SDATA field instead (the `--exclude .SDATA.*` of the
    * reference template). [[ewmmParser]] inverts this exactly — the
    * round trip is SclSpec-tested. */
  def formatEwmm(df: DataFrame): Column = {
    val values = valuesOrEmpty(df)
    def colOrT(name: String, tpe: String): Column =
      if (df.columns.contains(name)) col(name) else lit(null).cast(tpe)
    // default PRI is 13 = facility 1 (user) * 8 + severity 5 (notice),
    // syslog-format.c DefaultPri — NOT facility 13
    val pri = coalesce(colOrT("facility", "int").cast("int"), lit(1)) * 8 +
      coalesce(colOrT("severity", "int").cast("int"), lit(5))
    val isodate = coalesce(
      date_format(colOrT("ts", "timestamp"), "yyyy-MM-dd'T'HH:mm:ssxxx"),
      lit("-"))
    val hostField = coalesce(nullif(colOr(df, "host"), lit("")), lit("-"))
    val sdata = sdataBlocks(df)
    // all-nv-pairs scope: builtins under their macro names + values
    // minus SDATA (rides the SDATA field) minus digit-start/SOURCE
    // (--exclude 0*..9* --exclude SOURCE), plus the hop-by-hop tag list
    def opt(name: String, c: Column): Column =
      when(c.isNotNull && c =!= "", map(lit(name), c))
        .otherwise(emptyMap)
    val carried = map_filter(values, (k, _) =>
      !k.startsWith(".SDATA.") && !k.rlike("^[0-9]") && k =!= "SOURCE")
    val nv = map_concat(
      opt("MESSAGE", colOr(df, "message")),
      opt("HOST", colOr(df, "host")),
      opt("PROGRAM", colOr(df, "program")),
      opt("PID", colOr(df, "pid")),
      opt("MSGID", colOr(df, "msgid")),
      map_filter(carried, (k, _) =>
        !k.isin(lit("MESSAGE"), lit("MSG"), lit("HOST"), lit("PROGRAM"),
          lit("PID"), lit("MSGID"), lit("._TAGS"))),
      opt("._TAGS",
        if (df.columns.contains("tags")) array_join(col("tags"), ",")
        else lit(null).cast("string")))
    concat(lit("<"), pri.cast("string"), lit(">1 "), isodate, lit(" "),
      hostField, lit(" @syslog-ng - - "), sdata, lit(" "),
      ValuePairs.formatFlatJson(nv))
  }

  /** `$(format-gelf)` (`scl/graylog2/plugin.conf`): the Graylog GELF
    * 1.1 payload — typed JSON (level/timestamp/_pid are numbers, via
    * to_json over a struct; format-json's int()/int64() hints), host
    * and short_message defaulting to "-", `_facility` as the facility
    * name, `_class` from the patterndb classifier, every `.`/`_`
    * values key spliced as additional fields (`--key .* --key _*`),
    * and the trailing NUL of GELF TCP framing (`$(binary 0x00)`).
    * Empty/null fields are omitted (--omit-empty-values). */
  def formatGelf(df: DataFrame): Column = {
    val values = valuesOrEmpty(df)
    def ne(c: Column): Column = nullif(c, lit(""))
    val fixed = to_json(struct(
      lit("1.1").as("version"),
      coalesce(ne(colOr(df, "host")), lit("-")).as("host"),
      coalesce(ne(col("message")), lit("-")).as("short_message"),
      (if (df.columns.contains("severity")) col("severity").cast("int")
       else lit(null).cast("int")).as("level"),
      (if (df.columns.contains("ts")) col("ts").cast("long")
       else lit(null).cast("long")).as("timestamp"),
      ne(colOr(df, "program")).as("_program"),
      ne(colOr(df, "pid")).cast("int").as("_pid"),
      ne(graft.template.Template.column("$FACILITY", df.columns.toSeq))
        .as("_facility"),
      ne(try_element_at(values, lit(".classifier.class"))).as("_class")))
    val extras = map_filter(values, (k, v) =>
      (k.startsWith(".") || k.startsWith("_")) && v.isNotNull && v =!= "" &&
        k =!= ".classifier.class")
    val extraJson = ValuePairs.formatFlatJson(extras)
    // splice the two JSON objects: drop fixed's closing brace, append
    // the extras body after a comma
    val spliced = when(size(map_keys(extras)) > 0,
      concat(fixed.substr(lit(1), length(fixed) - 1), lit(","),
        extraJson.substr(lit(2), length(extraJson))))
      .otherwise(fixed)
    concat(spliced, lit("\u0000"))
  }

  // ---- cee ------------------------------------------------------------------
  /** The cee adapter (`scl/cee/adapter.conf:37-39`):
    * `json-parser(prefix('.cee.') marker('@cee:'))`. The marker is a
    * strict prefix match on the message (`modules/json/json-parser.c:
    * 223-233`); whitespace after the marker is skipped before the JSON
    * body. Non-matching rows pass through unchanged. */
  /** `extract-solaris-msgid()` (`/root/reference/scl/solaris/
    * plugin.conf`): messages whose MESSAGE starts with `[ID` (the
    * block's string-prefix filter) carry a Sun msgid header
    * `[ID <msgid> <facility.level>] rest`; `.solaris.msgid` takes the
    * second space-token inside the brackets (the block's second
    * csv-parser over `$0`) and MESSAGE drops the bracketed group (the
    * quote-pairs('[]') + greedy remainder csv-parse). Non-matching
    * rows pass through unchanged (the block's `if {}` channel). */
  private[graft] def extractSolarisMsgidFx(df: DataFrame,
      guard: Column = lit(true)): VendorParsers.Fx = {
    val msg = col("message")
    val hit = msg.startsWith("[ID") && guard
    val re = "^\\[([^\\]]*)\\]\\s?(.*)$"
    val inner = regexp_extract(msg, re, 1)
    val rest = regexp_extract(msg, re, 2)
    VendorParsers.Fx(guard = hit,
      adds = map(lit(".solaris.msgid"), element_at(split(inner, " "), 2)),
      sets = Seq("message" -> rest))
  }

  def extractSolarisMsgid(df: DataFrame, guard: Column = lit(true)): DataFrame =
    VendorParsers.applyFx(df, Seq(extractSolarisMsgidFx(df, guard)))

  def ceeParser(df: DataFrame, prefix: String = ".cee.",
      guard: Column = lit(true)): DataFrame =
    jsonWithMarker(df, "@cee:", prefix, guard)

  /** json-parser(marker(...)) core shared by cee. */
  private[graft] def jsonWithMarkerFx(df: DataFrame, marker: String,
      prefix: String, guard: Column = lit(true)): Fx = {
    val msg = col("message")
    val hit = msg.startsWith(marker) && guard
    val body = ltrim(msg.substr(lit(marker.length + 1), length(msg)))
    Fx(guard = hit,
      adds = coalesce(JsonFlatten(body, prefix, ""), emptyMap))
  }

  def jsonWithMarker(df: DataFrame, marker: String, prefix: String,
      guard: Column = lit(true)): DataFrame =
    VendorParsers.applyFx(df, Seq(jsonWithMarkerFx(df, marker, prefix, guard)))

  // ---- syslog parse step ----------------------------------------------------
  /** Promote a staged `parse_syslog` struct column (named `__syslog`)
    * into the LogRecord columns where `cond` holds, SDATA params
    * landing in values under `.SDATA.` (the reference's NV names,
    * `lib/logmsg/logmsg.c` sdata naming). Rows failing `cond` keep
    * their existing columns. The values merge here runs BEFORE any
    * application routing (junos detects on `.SDATA.` keys), against a
    * values map that is empty or tiny at this point in every pipeline
    * — the expensive per-parser merges are what the fused apply
    * eliminates. */
  private[graft] def promoteParsed(df: DataFrame, cond: Column): DataFrame = {
    val sdata = transform_keys(
      coalesce(col("__syslog.sdata"), emptyMap),
      (k, _) => concat(lit(".SDATA."), k))
    def pick(field: String, fallback: Column): Column =
      when(cond, col(s"__syslog.$field")).otherwise(fallback)
    df.withColumn("values", merged(df,
        when(cond, sdata).otherwise(emptyMap)))
      .withColumn("host", pick("host", colOr(df, "host")))
      .withColumn("program", pick("program", colOr(df, "program")))
      .withColumn("pid", pick("pid", colOr(df, "pid")))
      .withColumn("msgid", pick("msgid", colOr(df, "msgid")))
      .withColumn("facility", pick("facility",
        if (df.columns.contains("facility")) col("facility")
        else lit(null).cast("int")))
      .withColumn("severity", pick("severity",
        if (df.columns.contains("severity")) col("severity")
        else lit(null).cast("int")))
      .withColumn("ts", pick("ts",
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .withColumn("message", pick("message", col("message")))
  }

  /** The fallback branch's `syslog-parser(flags(syslog-protocol))` as a
    * standalone transform; parse_syslog auto-detects RFC3164 vs
    * RFC5424 like msg-format.c does. */
  def parseSyslogMessage(df: DataFrame, refYear: Int = 2024): DataFrame =
    promoteParsed(
      df.withColumn("__syslog",
        GraftFunctions.parse_syslog(col("message"), refYear)),
      lit(true))
      .drop("__syslog")

  // ---- default-network-drivers ---------------------------------------------
  /** default-network-drivers() — the reference's flagship composite
    * (`scl/default-network-drivers/plugin.conf:36-60`, the no-parse
    * channel): raw-topic applications try first on the unparsed line;
    * everything else syslog-parses and then branches to ewmm-parser /
    * syslog-topic applications / plain passthrough, exactly the
    * plugin.conf if/elif order.
    *
    * Fused single-pass compile (see the object doc): the raw route is
    * decided on the raw line, the syslog parse is computed once as a
    * staged struct, promotion + the syslog-side route apply only to
    * rows no raw application claimed, and every parser contributes its
    * effect to ONE application step — a route-keyed coalesce picks the
    * single add map each row pays for, and the whole composite
    * rebuilds the values map exactly once (plus the cheap pre-routing
    * SDATA promote). One scan, zero shuffles, no union — the plan gate
    * in PlanSpec asserts it.
    *
    * The listener sockets themselves (tcp/udp 514, 601, 6514) are the
    * declared transport non-goal; any line source (file, kafka, the
    * dev TCP listener spool) feeds this with the raw line in
    * `message`. Output `__channel` carries the detected route;
    * matched applications additionally set `.app.name` in values and
    * the `.app.<name>` tag, as upstream does.
    */
  def defaultNetworkDrivers(df: DataFrame, refYear: Int = 2024): DataFrame = {
    val rawRoute = routeOf(rawApplications)
    val staged = df
      .withColumn("__syslog",
        GraftFunctions.parse_syslog(col("message"), refYear))
      .withColumn("__rawroute", rawRoute)
    // non-raw rows see their parsed columns; raw rows keep the raw line
    val promoted = promoteParsed(staged, col("__rawroute").isNull)
    // plugin.conf:47-56: ewmm first, then the syslog-topic apps, else
    // plain parsed passthrough
    val sysRoute = when(col("__rawroute").isNull,
      coalesce(
        when(col("program") === "@syslog-ng", lit("ewmm")),
        routeOf(syslogApplications)))
    val routed = promoted.withColumn("__route",
      coalesce(col("__rawroute"), sysRoute))
    val allApps: Seq[App] =
      rawApplications ++
        Seq(App("ewmm", lit(false), (d, g) => ewmmFx(d, g))) ++
        syslogApplications
    val fxs = allApps.map(a => a.fx(routed, col("__route") === a.name))
    // applications get .app.name/.app.<name>; ewmm + passthrough don't
    val appNames = (rawApplications ++ syslogApplications).map(_.name)
    val appRoute =
      when(col("__route").isin(appNames.map(lit(_)): _*), col("__route"))
    // ewmm's effect creates the tags column, so the tag update is
    // unconditional here (unlike appParser on a tag-less frame)
    VendorParsers.applyFx(routed, fxs :+ tagFxOf(routed, appRoute),
        concatAdds = Seq(tagAddOf(appRoute)))
      .withColumn("__channel", coalesce(col("__route"), lit("unknown")))
      .drop("__syslog", "__rawroute", "__route")
  }
}
