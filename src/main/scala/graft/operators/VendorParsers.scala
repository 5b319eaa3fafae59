package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vendor device-log parsers — the reference ships these as scl config
  * blocks composed from csv/kv/date/match primitives
  * (`/root/reference/scl/cisco/plugin.conf`,
  * `scl/checkpoint/plugin.conf`, `scl/paloalto/panos.conf`); here each
  * is the same composition expressed as ONE narrow Column pipeline (no
  * try-and-reparse channels — the format branches are `when()` arms on
  * cheap structural predicates, so a 100 TB scan stays single-pass and
  * codegen'd).
  *
  * Extracted fields land in the `values` map under the vendor prefix
  * (the reference's NV names: `.cisco.facility`, `.panos.type`, ...);
  * HOST/PROGRAM/MSG rewrites hit the corresponding columns.
  */
object VendorParsers {

  private def valuesOrEmpty(df: DataFrame): Column =
    if (df.columns.contains("values")) col("values")
    else map().cast("map<string,string>")

  /** Merge non-null entries of `add` into values (new keys win). */
  private def merged(df: DataFrame, add: Column): Column = {
    val clean = map_filter(add, (_, v) => v.isNotNull)
    map_concat(
      map_filter(valuesOrEmpty(df), (k, _) => !array_contains(map_keys(clean), k)),
      clean)
  }

  // ---- cisco ---------------------------------------------------------------
  /** cisco-parser() (`scl/cisco/plugin.conf`): `<pri>(seq: )?(host: )?
    * (*timestamp: )?%FAC-SEV-MNEMONIC: text`. The %-triplet classifies
    * the message; host and timestamp are optional header pieces.
    * `guard` narrows applicability beyond the structural check — the
    * fused app-parser compile passes its route predicate so one
    * projection chain hosts every vendor without cross-talk. */
  def cisco(df: DataFrame, prefix: String = ".cisco.",
      refYear: Int = 2024, guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    // pri is 0..191 (3 digits); bounding the capture keeps the ANSI
    // cast below from overflowing on a hostile <999...9> line
    val pri = regexp_extract(msg, "^<(\\d{1,3})>", 1)
    val rest = regexp_replace(msg, "^<\\d{1,3}>", "")
    // split at the FIRST ": %" — header left, cisco message right
    // (csv-parser(delimiters(strings(': %')) greedy) in the reference)
    val header = substring_index(rest, ": %", 1)
    val body = rest.substr(length(header) + lit(4), length(rest))
    // %FAC-SEV-MNEMONIC triplet; STANDBY-style 4-part forms fold the
    // extra token into the facility (cisco-triplet-parser else-branch)
    val triplet = substring_index(substring_index(body, ":", 1), " ", 1)
    val parts = split(triplet, "-")
    val isQuad = size(parts) >= 4
    val facility = when(isQuad, concat_ws("-",
        try_element_at(parts, lit(1)), try_element_at(parts, lit(2))))
      .otherwise(try_element_at(parts, lit(1)))
    val sevPos = when(isQuad, lit(3)).otherwise(lit(2))
    val severity = try_element_at(parts, sevPos)
    val mnemonic = try_element_at(parts, sevPos + 1)
    // header after dropping "seqno: " (subst "^([0-9]+)?(: )?")
    val h2 = regexp_replace(header, "^([0-9]+)?(: )?", "")
    val tsRe = "\\*?[A-Za-z]{3} [0-9 ]?\\d{1,2} (\\d{4} )?\\d{2}:\\d{2}:\\d{2}(\\.\\d{3})?( (AM|PM))?"
    val hostThenTs = regexp_extract(h2, s"^([^:]+): ($tsRe)$$", 1)
    val tsText = when(h2.rlike(s"^$tsRe$$"), h2)
      .when(hostThenTs =!= "", regexp_extract(h2, s"^([^:]+): ($tsRe)$$", 2))
    val host = when(hostThenTs =!= "", hostThenTs)
      .when(!h2.rlike(s"^$tsRe$$") && h2.rlike("^[^:]+$") && h2 =!= "", h2)
    // year-less cisco timestamp: strip the '*' (unsynced-clock marker),
    // prepend the reference year, try the sub-second form first
    val cleanTs = concat(lit(s"$refYear "), regexp_replace(tsText, "^\\*", ""))
    val ts = coalesce(
      try_to_timestamp(cleanTs, lit("yyyy MMM d HH:mm:ss.SSS")),
      try_to_timestamp(cleanTs, lit("yyyy MMM d HH:mm:ss")))
    val isCisco = msg.rlike("^<\\d{1,3}>.*: %") && size(parts) >= 3 && guard
    val add = map(
      lit(prefix + "facility"), when(isCisco, facility),
      lit(prefix + "severity"), when(isCisco, severity),
      lit(prefix + "mnemonic"), when(isCisco, mnemonic))
    // every derived Column reads the ORIGINAL message — stage them all
    // before the message rewrite (the when(isCisco) guard also keeps
    // ANSI casts off non-matching rows, whose pri extract is "")
    val priL = when(isCisco, pri.cast("long"))
    df.withColumn("values", merged(df, add))
      .withColumn("__cisco", isCisco)
      .withColumn("__host", when(isCisco, host))
      .withColumn("__ts", when(isCisco, ts))
      .withColumn("__fac", when(isCisco, floor(priL / 8).cast("int")))
      .withColumn("__sev", when(isCisco, (priL % 8).cast("int")))
      .withColumn("__msg", when(isCisco, concat(lit("%"), body)).otherwise(msg))
      .withColumn("message", col("__msg"))
      .withColumn("facility", col("__fac"))
      .withColumn("severity", col("__sev"))
      .withColumn("host", coalesce(col("__host"),
        if (df.columns.contains("host")) col("host") else lit(null).cast("string")))
      .withColumn("ts", coalesce(col("__ts"),
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .drop("__cisco", "__host", "__ts", "__fac", "__sev", "__msg")
  }

  // ---- checkpoint ----------------------------------------------------------
  /** checkpoint-parser() (`scl/checkpoint/plugin.conf`): the syslog
    * form (`<pri>1 DATE HOST CheckPoint PID - [k:"v"; ...]`, date
    * either ISO-T or `date time` split across two fields) and the
    * splunk form (`time=...|hostname=...|product=Firewall`). */
  def checkpoint(df: DataFrame, prefix: String = ".checkpoint.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isSyslog = msg.startsWith("<") && guard
    val f = split(msg, " ")
    val tForm = try_element_at(f, lit(2)).rlike("^\\d{4}-\\d{2}-\\d{2}T")
    // columns 1,2,HOST,PROGRAM,PID,MSGID,MSG(greedy) — or 1,2,3,... when
    // the timestamp occupies two space-separated fields
    def tailFrom(k: Int): Column =
      array_join(slice(f, lit(k), greatest(size(f) - (k - 1), lit(0))), " ")
    val host = when(tForm, try_element_at(f, lit(3))).otherwise(try_element_at(f, lit(4)))
    val program = when(tForm, try_element_at(f, lit(4))).otherwise(try_element_at(f, lit(5)))
    val pid = when(tForm, try_element_at(f, lit(5))).otherwise(try_element_at(f, lit(6)))
    val kvBody = when(tForm, tailFrom(7)).otherwise(tailFrom(8))
    val tsRaw = when(tForm, try_element_at(f, lit(2))).otherwise(
      concat_ws(" ", try_element_at(f, lit(2)), try_element_at(f, lit(3))))
    val ts = coalesce(
      try_to_timestamp(tsRaw, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(tsRaw, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(tsRaw, lit("yyyy-MM-dd HH:mm:ss")))
    // syslog form: [action:"Update"; flags:"150784"; ...] — quoted kv
    // pairs, ':'-separated; quotes guard embedded ';' so the whitespace
    // scanner needs no explicit pair separator. splunk form: k=v pairs
    // '|'-separated, no quoting (the reference accepts that limitation,
    // plugin.conf "not handling value escaping properly")
    val kvs = when(isSyslog, Parsers.kvParse(kvBody, ':', prefix))
      .when(guard, Parsers.kvParse(translate(msg, "|", " "), '=', prefix))
      .otherwise(map().cast("map<string,string>"))
    // stage every derived Column before the message rewrite — they all
    // read the ORIGINAL message
    df.withColumn("values", merged(df, kvs))
      .withColumn("__cp_host", when(isSyslog, host))
      .withColumn("__cp_prog", when(isSyslog, program).otherwise(
        if (df.columns.contains("program")) col("program") else lit(null).cast("string")))
      .withColumn("__cp_pid", when(isSyslog, pid).otherwise(
        if (df.columns.contains("pid")) col("pid") else lit(null).cast("string")))
      .withColumn("__cp_ts", when(isSyslog, ts).otherwise(
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .withColumn("__cp_msg", when(isSyslog, kvBody).otherwise(msg))
      .withColumn("host", coalesce(col("__cp_host"),
        if (df.columns.contains("host")) col("host") else lit(null).cast("string")))
      .withColumn("program", col("__cp_prog"))
      .withColumn("pid", col("__cp_pid"))
      .withColumn("ts", col("__cp_ts"))
      .withColumn("message", col("__cp_msg"))
      .drop("__cp_host", "__cp_prog", "__cp_pid", "__cp_ts", "__cp_msg")
  }

  // ---- iptables ------------------------------------------------------------
  /** iptables-parser() (`scl/iptables/iptables.conf`): the kernel's
    * netfilter log line is pure kv (`IN=eth0 OUT= SRC=1.2.3.4 ...`);
    * flag words without '=' (`DF`, `SYN`) are stray words, exactly the
    * reference's kv-parser behavior. The application filter
    * (facility(kern) + program(kernel) + "PROTO=" substring) guards at
    * the app-parser level; here any row containing `PROTO=` parses. */
  def iptables(df: DataFrame, prefix: String = ".iptables.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isIpt = msg.contains("PROTO=") && guard
    val add = when(isIpt, Parsers.kvParse(msg, '=', prefix))
      .otherwise(map().cast("map<string,string>"))
    df.withColumn("values", merged(df, add))
  }

  // ---- sudo ----------------------------------------------------------------
  /** sudo-parser() (`scl/sudo/sudo.conf`): `SUBJECT : TTY=pts/0 ;
    * PWD=/home ; USER=root ; COMMAND=/bin/ls -la`. Pairs are
    * ';'-separated so values keep embedded spaces (kv-parser
    * pair-separator(';')); the leading stray word is the acting user
    * (extract-stray-words-into('0') + list-head). Rows without a
    * COMMAND pair (pam noise) are flagged via the presence of the key —
    * the application-level filter drops them. */
  def sudo(df: DataFrame, prefix: String = ".sudo.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isSudo = msg.contains(" : ") && msg.contains("=") && guard
    val subject = trim(substring_index(msg, " : ", 1))
    val body = msg.substr(length(substring_index(msg, " : ", 1)) + lit(4), length(msg))
    // ';'-separated K=V pairs; V is greedy to the pair end, so embedded
    // spaces survive (COMMAND=/bin/ls -la) — the pair-separator(';')
    // semantics a space-scanning kv parser cannot give
    val entries = transform(
      filter(transform(split(body, " ; "), p => trim(p)), p => instr(p, "=") > 0),
      t => struct(
        concat(lit(prefix), substring_index(t, "=", 1)).as("key"),
        t.substr(instr(t, "=") + 1, length(t)).as("value")))
    // last-wins on duplicate keys (kv-parser semantics) without
    // map_from_entries' duplicate-key exception: reverse + first-wins fold
    val kvs = aggregate(reverse(entries), map().cast("map<string,string>"),
      (acc, e) => when(array_contains(map_keys(acc), e.getField("key")), acc)
        .otherwise(map_concat(acc, map(e.getField("key"), e.getField("value")))))
    val add = when(isSudo, map_concat(
        // a hostile "SUBJECT=..." pair must not collide with the
        // extracted subject (duplicate map keys throw under ANSI)
        map_filter(kvs, (k, _) => k =!= lit(prefix + "SUBJECT")),
        map(lit(prefix + "SUBJECT"), subject)))
      .otherwise(map().cast("map<string,string>"))
    df.withColumn("values", merged(df, add))
  }

  // ---- fortigate -----------------------------------------------------------
  /** fortigate-parser() (`scl/fortigate/fortigate.conf`): the body after
    * the raw `<pri>` is pure kv (`date=2023-01-02 time=03:04:05
    * devname="fw1" ...`), then date+time fields combine into the
    * timestamp (the reference's date-parser(format("%Y-%m-%d %H:%M:%S"))
    * over "${.fortigate.date} ${.fortigate.time}"). */
  def fortigate(df: DataFrame, prefix: String = ".fortigate.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isFgt = msg.rlike("^(<\\d{1,3}>)?date=") && guard
    val body = regexp_replace(msg, "^<\\d{1,3}>", "")
    val kvs = Parsers.kvParse(body, '=', prefix)
    val ts = try_to_timestamp(
      concat_ws(" ",
        try_element_at(kvs, lit(prefix + "date")),
        try_element_at(kvs, lit(prefix + "time"))),
      lit("yyyy-MM-dd HH:mm:ss"))
    df.withColumn("values",
        merged(df, when(isFgt, kvs).otherwise(map().cast("map<string,string>"))))
      .withColumn("__fg_ts", when(isFgt, ts))
      .withColumn("ts", coalesce(col("__fg_ts"),
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .drop("__fg_ts")
  }

  // ---- apache access log ---------------------------------------------------
  /** apache-accesslog-parser() (`scl/apache/apache.conf`): the four
    * LogFormat shapes — common / combined, each with an optional
    * `vhost:port ` prefix — parsed into the reference's logstash-like
    * field names. Quoted fields use the csv-parser's escape-double-char
    * dialect (`""` → `"`); response/bytes may be `-`; rawrequest splits
    * into verb/request/httpversion with `HTTP/` stripped
    * (the reference's trailing subst). One narrow codegen'd projection. */
  def apacheAccesslog(df: DataFrame, prefix: String = ".apache."): DataFrame = {
    val msg = col("message")
    // ONE linear scan extracts every group (functions.ApacheScan -- the
    // kv_scan treatment applied to the former 11-group packing regex,
    // whose optional-group backtracking cost ~100+ us/row). The group
    // array is STAGED as a real column before the map build: map_filter
    // is a higher-order function that takes its projection down the
    // interpreted (no-CSE) path, and an inlined scan would re-run once
    // per field read
    def g(i: Int): Column = try_element_at(col("__ap_f"), lit(i))
    // "" unescape only when an escape is present -- instr beats a regex
    val unq = (c: Column) =>
      when(c.contains("\"\""), regexp_replace(c, "\"\"", "\"")).otherwise(c)
    val httpTok = try_element_at(col("__ap_rq"), lit(3))
    val isApache = col("__ap_f").isNotNull
    val add = map(
      lit(prefix + "clientip"), g(3),
      lit(prefix + "ident"), g(4),
      lit(prefix + "auth"), g(5),
      lit(prefix + "timestamp"), g(6),
      lit(prefix + "rawrequest"), col("__ap_raw"),
      lit(prefix + "response"), g(8),
      lit(prefix + "bytes"), g(9),
      lit(prefix + "referrer"), unq(g(10)),
      lit(prefix + "agent"), unq(g(11)),
      lit(prefix + "vhost"), g(1),
      lit(prefix + "port"), g(2),
      lit(prefix + "verb"), try_element_at(col("__ap_rq"), lit(1)),
      lit(prefix + "request"), try_element_at(col("__ap_rq"), lit(2)),
      lit(prefix + "httpversion"),
        when(httpTok.startsWith("HTTP/"), httpTok.substr(lit(6), length(httpTok)))
          .otherwise(httpTok))
    val cleaned = map_filter(add, (_, v) => v.isNotNull && v =!= "")
    val ts = try_to_timestamp(g(6), lit("dd/MMM/yyyy:HH:mm:ss Z"))
    val staged = df
      .withColumn("__ap_f", graft.functions.ApacheScan(msg))
      .withColumn("__ap_raw", unq(try_element_at(col("__ap_f"), lit(7))))
      .withColumn("__ap_rq", split(col("__ap_raw"), " "))
    staged.withColumn("values", merged(staged,
        when(isApache, cleaned).otherwise(map().cast("map<string,string>"))))
      .withColumn("__ap_ts", when(isApache, ts))
      .withColumn("ts", coalesce(col("__ap_ts"),
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .drop("__ap_ts", "__ap_f", "__ap_raw", "__ap_rq")
  }

  // ---- palo alto panos -----------------------------------------------------
  /** panos-parser() (`scl/paloalto/panos.conf`): syslog header, then a
    * comma CSV whose layout depends on the `type` field (SYSTEM /
    * CONFIG with its 15- and 17-column variants / other).
    *
    * Two input shapes: the RAW headered line (standalone statement —
    * applicability gated on the embedded-header host, as before), or
    * a post-syslog-parse message starting at the CSV (the application
    * registry path — pass `guard` = the route predicate; the header
    * regex simply won't match and the CSV is the whole message). */
  def panos(df: DataFrame, prefix: String = ".panos.",
      guard: Column = null): DataFrame = {
    val msg = col("message")
    // strip "<pri>Mmm dd hh:mm:ss host " — the LEGACY_MSGHDR+MESSAGE
    // the reference's csv-parser consumes starts after the RFC3164 header
    val headRe = "^(?:<\\d+>)?[A-Za-z]{3} +\\d{1,2} \\d{2}:\\d{2}:\\d{2} (\\S+) "
    val host = regexp_extract(msg, headRe, 1)
    val csv = regexp_replace(msg, headRe, "")
    val f = split(csv, ",")
    def fld(i: Int): Column = try_element_at(f, lit(i))
    val typ = fld(4)
    val head = map(
      lit(prefix + "receive_time"), fld(2),
      lit(prefix + "serial"), fld(3),
      lit(prefix + "type"), typ,
      lit(prefix + "subtype"), fld(5),
      lit(prefix + "time_generated"), fld(7))
    val nTail = size(f) - 7 // fields after the fixed 7-column prefix
    def tail(i: Int): Column = try_element_at(f, lit(i + 7)) // 1-based into tmp
    val system = map(
      lit(prefix + "vsys"), tail(1), lit(prefix + "eventid"), tail(2),
      lit(prefix + "object"), tail(3), lit(prefix + "module"), tail(6),
      lit(prefix + "severity"), tail(7), lit(prefix + "opaque"), tail(8),
      lit(prefix + "seqno"), tail(9), lit(prefix + "actionflags"), tail(10),
      lit(prefix + "vsys_name"), tail(15), lit(prefix + "device_name"), tail(16))
    // CONFIG: host,vsys,cmd,admin,client,result,path[,before,after],
    // seqno,actionflags,dg1..4,vsys_name,device_name — the custom form
    // inserts 2 columns after path (panos.conf tries the 15-column
    // layout first, falls back to 17)
    val custom = nTail >= 17
    def cfgTail(i: Int): Column = // index in the 15-col layout
      when(custom && lit(i >= 8), try_element_at(f, lit(i + 9))).otherwise(try_element_at(f, lit(i + 7)))
    val config = map_concat(map(
      lit(prefix + "host"), cfgTail(1), lit(prefix + "vsys"), cfgTail(2),
      lit(prefix + "cmd"), cfgTail(3), lit(prefix + "admin"), cfgTail(4),
      lit(prefix + "client"), cfgTail(5), lit(prefix + "result"), cfgTail(6),
      lit(prefix + "path"), cfgTail(7), lit(prefix + "seqno"), cfgTail(8),
      lit(prefix + "actionflags"), cfgTail(9), lit(prefix + "vsys_name"), cfgTail(14),
      lit(prefix + "device_name"), cfgTail(15)),
      when(custom, map(
        lit(prefix + "before_change_detail"), try_element_at(f, lit(15)),
        lit(prefix + "after_change_detail"), try_element_at(f, lit(16))))
        .otherwise(map().cast("map<string,string>")))
    val isPanos =
      (if (guard == null) host =!= "" else guard) && size(f) >= 7
    val add = when(!isPanos, map().cast("map<string,string>"))
      .when(typ === "SYSTEM", map_concat(head, system))
      .when(typ === "CONFIG", map_concat(head, config))
      .otherwise(head)
    val out = df.withColumn("values", merged(df, add))
    out
      // only an embedded-header host may rewrite the host column — the
      // registry path's stripped messages have none
      .withColumn("__po_host", when(isPanos && host =!= "", host))
      .withColumn("host", coalesce(col("__po_host"),
        if (df.columns.contains("host")) col("host") else lit(null).cast("string")))
      .withColumn("program",
        when(isPanos, lit("paloalto_panos")).otherwise(
          if (df.columns.contains("program")) col("program") else lit(null).cast("string")))
      .drop("__po_host")
  }

  // ---- netskope ------------------------------------------------------------
  /** netskope-parser() (`scl/netskope/plugin.conf:30-38`): the whole
    * no-parse line is `<pri>{json}` — strip the pri, json-parse under
    * the prefix. */
  def netskope(df: DataFrame, prefix: String = ".netskope.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isNs = msg.rlike("^<[0-9]+>\\{") && guard
    val body = regexp_replace(msg, "^<[0-9]+>", "")
    val add = when(isNs,
      coalesce(graft.functions.JsonFlatten(body, prefix, ""),
        map().cast("map<string,string>")))
      .otherwise(map().cast("map<string,string>"))
    df.withColumn("values", merged(df, add))
  }

  // ---- websense ------------------------------------------------------------
  /** websense-parser() (`scl/websense/plugin.conf:26-47`): the raw
    * line is BSD-timestamp + timezone code + host + `vendor=Websense
    * k=v ...` with no program tag. The reference substs away the
    * timezone and injects a `Websense: ` program so syslog-parser()
    * accepts it, then kv-parses; same composition here on one staged
    * parse. */
  def websense(df: DataFrame, prefix: String = ".websense.",
      guard: Column = lit(true)): DataFrame = {
    val msg = col("message")
    val isWs = msg.contains("vendor=Websense") && guard
    val fixed = regexp_replace(
      regexp_replace(msg,
        "([A-Za-z]{3} [0-9 ]\\d \\d{2}:\\d{2}:\\d{2}) [A-Z]{3,4}", "$1 "),
      "vendor=Websense", "Websense: vendor=Websense")
    val staged = df.withColumn("__ws",
      when(isWs, graft.functions.GraftFunctions.parse_syslog(fixed)))
    val kvs = when(isWs,
        Parsers.kvParse(col("__ws.message"), '=', prefix))
      .otherwise(map().cast("map<string,string>"))
    def pick(field: String): Column =
      when(isWs, col(s"__ws.$field")).otherwise(colOrNull(staged, field))
    staged.withColumn("values", merged(staged, kvs))
      .withColumn("host", pick("host"))
      .withColumn("program", pick("program"))
      .withColumn("facility", when(isWs, col("__ws.facility")).otherwise(
        if (df.columns.contains("facility")) col("facility")
        else lit(null).cast("int")))
      .withColumn("severity", when(isWs, col("__ws.severity")).otherwise(
        if (df.columns.contains("severity")) col("severity")
        else lit(null).cast("int")))
      .withColumn("ts", when(isWs, col("__ws.ts")).otherwise(
        if (df.columns.contains("ts")) col("ts").cast("timestamp")
        else lit(null).cast("timestamp")))
      .withColumn("message", when(isWs, col("__ws.message")).otherwise(msg))
      .drop("__ws")
  }

  private def colOrNull(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  // ---- application registry ------------------------------------------------
  /** The reference's scl `application name[topic] { filter; parser }`
    * blocks for the implemented vendor parsers, as (name, detect,
    * parse) triples for [[graft.dsl.LogPath.appParser]] — the
    * auto-detection path `app-parser()` drives
    * (`scl/iptables/iptables.conf`, `scl/sudo/sudo.conf`,
    * `scl/fortigate/fortigate.conf` application blocks). Detection
    * reads the post-syslog-parse columns (facility/program/message);
    * fortigate detects on the raw `<pri>date=` form like its
    * syslog-raw topic. */
  def applications: Seq[(String, Column, DataFrame => DataFrame)] = Seq(
    ("iptables",
      col("facility") === 0 && col("program") === "kernel" &&
        col("message").contains("PROTO="),
      iptables(_)),
    ("sudo", col("program") === "sudo", sudo(_)),
    ("fortigate", col("message").rlike("^<[0-9]+>date="), fortigate(_)))
}
