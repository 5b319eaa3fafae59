package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment joins.
  *
  * `add-contextual-data()` (`/root/reference/modules/add-contextual-data/
  * add-contextual-data.c:31-80`, CSV db `context-info-db.c`): a lookup
  * database of `(selector, name, value)` rows; each matching row adds one
  * name-value pair to the message. The reference probes an in-memory hash
  * per message; at Spark scale this is a **broadcast hash join** against
  * the pivoted database (one row per selector, a map of added pairs).
  *
  * `geoip2()` (`modules/geoip2/geoip-parser.c:56-70`) is a range lookup
  * (IP inside [lo, hi] blocks). A naive between-join is a broadcast
  * nested loop — O(rows × blocks). `ipRangeLookup` instead explodes each
  * block into the /16 prefixes it covers and equi-joins on the prefix,
  * which keeps the probe O(1) per row and stays a broadcast *hash* join
  * at 100 TB.
  */
object Enrich {

  /** Pivot a (selector, name, value) db into (selector, pairs-map). */
  def pivotDb(db: DataFrame, ignoreCase: Boolean = false): DataFrame = {
    val sel = if (ignoreCase) lower(col("selector")) else col("selector")
    db.groupBy(sel.as("selector"))
      .agg(map_from_entries(collect_list(struct(col("name"), col("value"))))
        .as("__ctx"))
  }

  /** `add-contextual-data(selector(...), database(csv), prefix(...),
    * default-selector(...))`. Added pairs land in the `values` map column
    * (created if absent), keys optionally prefixed. */
  def addContextualData(
      df: DataFrame,
      db: DataFrame, // columns: selector, name, value
      selector: Column,
      prefix: String = "",
      defaultSelector: Option[String] = None,
      ignoreCase: Boolean = false): DataFrame = {
    val pivoted = pivotDb(db, ignoreCase)
    val withPrefix =
      if (prefix.isEmpty) pivoted
      else pivoted.withColumn("__ctx",
        transform_keys(col("__ctx"), (k, _) => concat(lit(prefix), k)))

    val key = if (ignoreCase) lower(selector) else selector
    val joined = df.join(broadcast(withPrefix), key === col("selector"), "left")

    val defaulted = defaultSelector match {
      case None => joined
      case Some(ds) =>
        // rows with no selector hit fall back to the default selector's map
        val dflt = withPrefix.filter(col("selector") === ds)
          .select(col("__ctx").as("__ctx_default"))
        joined.crossJoin(broadcast(dflt))
          .withColumn("__ctx", coalesce(col("__ctx"), col("__ctx_default")))
          .drop("__ctx_default")
    }

    val merged =
      if (df.columns.contains("values"))
        defaulted.withColumn("values",
          map_concat(
            map_filter(col("values"),
              (k, _) => !array_contains(map_keys(coalesce(col("__ctx"),
                map().cast("map<string,string>"))), k)),
            coalesce(col("__ctx"), map().cast("map<string,string>"))))
      else defaulted.withColumn("values",
        coalesce(col("__ctx"), map().cast("map<string,string>")))
    merged.drop("selector", "__ctx")
  }

  /** `context-info-db` CSV import (`context-info-db.c:312-338` via
    * `contextual-data-record-scanner.c:180-198`): the db file is parsed
    * with the reference's OWN csv dialect — comma delimiter, quote
    * pairs `""` and `''`, double-char escape, strip-whitespace — into
    * exactly three columns. Blank lines are skipped (:324-325), EOLs
    * (`\n`/`\r\n`) stripped (`_truncate_eol` :288-298), and ANY
    * malformed line (missing column, extra trailing data) fails the
    * WHOLE import, purging the db (:327-332). Returns
    * (selector, name, value) triplets in file order; the value column
    * is a TEMPLATE string (scanner :91-127, 3.21+ semantics), compiled
    * later by [[addContextualDataTemplated]]. Parsing reuses the
    * engine's compiled `CsvScan` — the same dialect machine the
    * csv-parser() operator runs — driver-side (the db is config-scale).
    */
  def parseContextDb(lines: Seq[String],
      filename: String = "db.csv"): Seq[(String, String, String)] = {
    val scanner = new graft.functions.CsvScan(
      org.apache.spark.sql.catalyst.expressions.Literal.create(null,
        org.apache.spark.sql.types.StringType),
      Seq("selector", "name", "value"), ",", Nil, "\"\"''", "double-char",
      greedy = false, stripWhitespace = true, nullValue = null)
    lines.iterator.zipWithIndex.flatMap { case (raw, i) =>
      val line = raw.stripSuffix("\r")
      if (line.isEmpty) Iterator.empty
      else {
        val row = scanner.scan(
          org.apache.spark.unsafe.types.UTF8String.fromString(line))
        if (!row.getBoolean(3) || (0 to 2).exists(row.isNullAt))
          throw new IllegalArgumentException("add-contextual-data(): error " +
            "parsing CSV file, expecting (selector, name, value) triplets " +
            s"($filename:${i + 1}: '$line')")
        Iterator.single((row.getUTF8String(0).toString,
          row.getUTF8String(1).toString, row.getUTF8String(2).toString))
      }
    }.toSeq
  }

  /** `add-contextual-data()` over parsed db records with the
    * reference's template-valued semantics
    * (`contextual-data-record-scanner.c:91-127`: since 3.21 the value
    * column IS a template evaluated against each message;
    * `add-contextual-data.c:110-136` applies every record of the
    * selected selector, falling back to `default-selector()` only when
    * the WHOLE db lacks the resolved selector, :119-120).
    *
    * Scale split: literal values (no '$') — the overwhelming majority
    * of real enrichment dbs — keep the broadcast-hash-join path;
    * templated values (config-authored, few) compile to a `when()`
    * cascade over their selectors, a pure map-side expression. On a
    * name collision across the two halves the templated value wins
    * (file-order overwrite only matters for dbs defining the same name
    * twice for one selector — within each half, last wins). */
  def addContextualDataTemplated(
      df: DataFrame,
      records: Seq[(String, String, String)],
      selector: Column,
      prefix: String = "",
      defaultSelector: Option[String] = None,
      ignoreCase: Boolean = false): DataFrame = {
    import graft.template.Template
    def norm(s: String) = if (ignoreCase) s.toLowerCase else s
    val cols = df.columns.toSeq
    val emptyMap = map().cast("map<string,string>")
    val allSelectors = records.map(r => norm(r._1)).distinct
    val key0 = if (ignoreCase) lower(selector) else selector
    val effKey = defaultSelector match {
      case None => key0
      case Some(d) =>
        if (allSelectors.isEmpty) lit(norm(d))
        else when(key0.isin(allSelectors: _*), key0).otherwise(lit(norm(d)))
    }
    val (tmplRecs, litRecs) = records.partition(_._3.contains("$"))

    def group(rs: Seq[(String, String, String)]) = {
      val m = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
      rs.foreach { case (s, n, v) =>
        m.getOrElseUpdate(norm(s),
          scala.collection.mutable.LinkedHashMap.empty) += ((prefix + n) -> v)
      }
      m
    }

    // literal half: broadcast hash join on the normalized selector
    val litJoined =
      if (litRecs.isEmpty) df.withColumn("__ctx_lit", emptyMap)
      else {
        import df.sparkSession.implicits._
        val dbDf = group(litRecs).toSeq.map { case (s, m) => (s, m.toMap) }
          .toDF("__ctx_sel", "__ctx_lit")
        df.join(broadcast(dbDf), effKey === col("__ctx_sel"), "left")
          .drop("__ctx_sel")
      }

    // templated half: when() cascade, values evaluated per message
    val tmplMap = group(tmplRecs).foldRight(
      lit(null).cast("map<string,string>")) { case ((s, m), acc) =>
      val entries = m.toSeq.flatMap { case (n, v) =>
        Seq(lit(n), Template.column(v, cols)) }
      when(effKey === lit(s), map(entries: _*)).otherwise(acc)
    }

    val addLit = coalesce(col("__ctx_lit"), emptyMap)
    val addTmpl = coalesce(tmplMap, emptyMap)
    val added = map_concat(
      map_filter(addLit, (k, _) => !array_contains(map_keys(addTmpl), k)),
      addTmpl)
    val out =
      if (cols.contains("values"))
        litJoined.withColumn("values", map_concat(
          map_filter(col("values"),
            (k, _) => !array_contains(map_keys(added), k)),
          added))
      else litJoined.withColumn("values", added)
    out.drop("__ctx_lit")
  }

  /** Glob-selector form (`add-contextual-data-glob-selector.c`): db
    * selectors are glob patterns matched against `target`; the FIRST
    * matching db row (db order) wins. The db is config-scale (the
    * reference holds it in memory), so it compiles to a `when()` cascade
    * of map literals — a pure map-side expression, no join at all. */
  def addContextualDataGlob(df: DataFrame, db: DataFrame, target: Column,
      prefix: String = ""): DataFrame = {
    val entries: Array[(String, Map[String, String])] = pivotDbOrdered(db)
    val cascade = entries.foldRight(
      lit(null).cast("map<string,string>")) { case ((glob, m), acc) =>
      val prefixed = m.map { case (k, v) => (prefix + k, v) }
      when(target.rlike("^" + Rewrites.globToRegex(glob) + "$"), typedLit(prefixed))
        .otherwise(acc)
    }
    val merged = coalesce(cascade, map().cast("map<string,string>"))
    if (df.columns.contains("values"))
      df.withColumn("values", map_concat(
        map_filter(col("values"), (k, _) => !array_contains(map_keys(merged), k)),
        merged))
    else df.withColumn("values", merged)
  }

  /** Collect the (selector → pairs) db preserving db order. */
  private def pivotDbOrdered(db: DataFrame): Array[(String, Map[String, String])] = {
    val rows = db.select("selector", "name", "value").collect()
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    rows.foreach { r =>
      order.getOrElseUpdate(r.getString(0),
        scala.collection.mutable.LinkedHashMap.empty) += (r.getString(1) -> r.getString(2))
    }
    order.map { case (s, m) => (s, m.toMap) }.toArray
  }

  /** IPv6 range lookup (geoip2() on ip_version 6 databases,
    * `/root/reference/modules/geoip2/geoip-parser.c:56-70` semantics):
    * `ranges` is [[Mmdb.toRangeTableV6]]'s (lo_hi, lo_lo, hi_hi, hi_lo,
    * attrs...) table of inclusive u128 ranges. Same shape as the v4
    * path: equi-join on the address's top-32-bit prefix (each range
    * exploded over the /32 prefixes it covers), then an unsigned-128
    * range filter — broadcast HASH join, never a nested-loop between.
    * Sign-bit biasing maps unsigned long order onto signed comparisons.
    * Explosion bound: a /d network yields 2^(32-d) prefix rows for
    * d < 32 and exactly 1 otherwise — real GeoIP v6 allocations are
    * /16..​/64, i.e. ≤ 65k rows each, config-scale either way. */
  def ip6RangeLookup(df: DataFrame, ranges: DataFrame, ip: Column,
      joinType: String = "left"): DataFrame = {
    val bias = lit(Long.MinValue)
    def b(c: Column): Column = c.bitwiseXOR(bias)
    val withPrefixes = ranges
      .withColumn("__p32",
        explode(sequence(shiftrightunsigned(col("lo_hi"), 32),
          shiftrightunsigned(col("hi_hi"), 32))))
    val v6 = graft.functions.GraftFunctions.ipv6_to_longs(ip)
    val geCond = b(col("__ip_hi")) > b(col("lo_hi")) ||
      (col("__ip_hi") === col("lo_hi") && b(col("__ip_lo")) >= b(col("lo_lo")))
    val leCond = b(col("__ip_hi")) < b(col("hi_hi")) ||
      (col("__ip_hi") === col("hi_hi") && b(col("__ip_lo")) <= b(col("hi_lo")))
    df.withColumn("__v6", v6)
      .withColumn("__ip_hi", col("__v6").getItem(0))
      .withColumn("__ip_lo", col("__v6").getItem(1))
      .withColumn("__ip_p32", shiftrightunsigned(col("__ip_hi"), 32))
      .join(broadcast(withPrefixes),
        col("__ip_p32") === col("__p32") && geCond && leCond, joinType)
      .drop("__p32", "__ip_p32", "__ip_hi", "__ip_lo", "__v6")
  }

  /** Range lookup (geoip-style): `ranges` has (lo, hi, attrs...) with
    * lo/hi as uint32-as-long IPs. Equi-joins on /16 prefix (each block
    * exploded to its covered prefixes), then range-filters — broadcast
    * hash join instead of a nested-loop between-join. */
  def ipRangeLookup(df: DataFrame, ranges: DataFrame, ip: Column,
      joinType: String = "left"): DataFrame = {
    // /16 prefix via floor-div (values < 2^32, exact in double)
    val withPrefixes = ranges
      .withColumn("__p16",
        explode(sequence(floor(col("lo") / 65536).cast("long"),
          floor(col("hi") / 65536).cast("long"))))
    val ipInt = graft.functions.GraftFunctions.ipv4_to_int(ip)
    df.withColumn("__ip_int", ipInt)
      .withColumn("__ip_p16", floor(col("__ip_int") / 65536).cast("long"))
      .join(broadcast(withPrefixes),
        col("__ip_p16") === col("__p16") &&
          col("__ip_int") >= col("lo") && col("__ip_int") <= col("hi"),
        joinType)
      .drop("__p16", "__ip_p16", "__ip_int")
  }

  /** As-of join (left outer): for each left row, attach the right row
    * with the same key and the GREATEST rightTs <= leftTs — "the
    * dimension value in force at event time" (slowly-changing lookups,
    * config/price snapshots, user-profile history).
    *
    * Shape: no per-key loop and no range join — both sides union into
    * one stream, shuffle ONCE on the key, and a running `last(payload,
    * ignoreNulls)` over (ts, side) picks the newest right payload at or
    * before each left row (right rows sort before left rows at equal
    * ts, so ties match). Cost is one hash exchange + an in-partition
    * sort bounded by each key's row count — the same plan a sessionize
    * pays, with none of the O(left × right-per-key) blowup a
    * between-join would plan at 100 TB.
    *
    * Right rows must be unique per (key, ts) for deterministic output —
    * pre-aggregate if they are not.
    *
    * @param rightPayload struct of the right columns to carry
    * @return left rows + `asof` payload column (null when no right row
    *         at or before the left timestamp)
    */
  def asofJoin(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Column): DataFrame = {
    val reserved = Seq("__k", "__t", "__side", "__p", "asof")
    require(!left.columns.exists(reserved.contains),
      s"asofJoin: left columns may not include ${reserved.mkString("/")}")
    val pType = right.select(rightPayload.as("__p")).schema("__p").dataType
    val lSide = left
      .withColumn("__k", leftKey).withColumn("__t", leftTs)
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    // SQL equality semantics: a NULL key never matches, and a NULL
    // right timestamp can never satisfy leftTs >= rightTs — drop such
    // right rows instead of letting the window group NULL keys together
    // (left rows with a NULL key then see no right rows and get a null
    // payload, exactly like an ASOF LEFT JOIN)
    val rSide = right
      .filter(rightKey.isNotNull && rightTs.isNotNull)
      .select(rightKey.as("__k"), rightTs.as("__t"), lit(0).as("__side"),
        rightPayload.cast(pType).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    lSide.unionByName(rSide, allowMissingColumns = true)
      .withColumn("asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__p")
  }
}
