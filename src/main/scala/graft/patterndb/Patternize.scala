package graft.patterndb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** patternize — offline pattern mining (`/root/reference/modules/
  * dbparser/patternize.c`): cluster raw messages into patterndb-style
  * templates. The reference clusters interactively over samples; the
  * Spark-native redesign is a two-aggregation batch job that runs over
  * the full corpus:
  *
  *  1. cluster key = (token count, first token) — the cheap structural
  *     signature (Drain-style log template mining uses the same seed);
  *  2. per (cluster, position): if every message in the cluster agrees
  *     on the token it is a literal, else it generalizes to a wildcard;
  *  3. reassemble positions into the template + support count.
  *
  * Both aggregations are map-side combinable (count-distinct per
  * position partial-aggregates; `approxDistinct` swaps in HLL when an
  * exact answer is not required at 100 TB). No collect, no iteration.
  */
object Patternize {

  /** SLCT step 1 — `ptz_find_frequent_words`
    * (`patternize.c:98-187`): every message splits on the delimiter
    * SET (any single char of `delimiters`, g_strsplit_set — adjacent
    * delimiters yield EMPTY tokens that are positioned and counted
    * like words), words are keyed by POSITION (`"%d %s"` hash keys),
    * and keys with count < support are removed (:93-96,180). The
    * two-pass hash-cache of the reference is a memory optimization
    * with identical output (the battery runs both); here one
    * map-side-combinable aggregation replaces it.
    *
    * @return (pos, word, cnt) rows with cnt >= support */
  def frequentWords(df: DataFrame, message: Column, support: Long,
      delimiters: String = " :&~?![]=,;()'\""): DataFrame = {
    val re = "[" + delimiters.flatMap(c => "\\" + c) + "]"
    df.select(posexplode(split(message, re)).as(Seq("pos", "word")))
      .groupBy(col("pos"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= support)
  }

  /** SLCT step 2 — `ptz_find_clusters_slct` (`patternize.c:236-333`):
    * each line builds its cluster key from the frequent-word list —
    * position j contributes `"j word"` when (j, word) is frequent,
    * else the `"j ␚"` wildcard marker (PTZ_PARSER_MARKER_CHAR 0x1A),
    * elements joined by PTZ_SEPARATOR_CHAR 0x1E — plus the line's own
    * DELIMITER SEQUENCE (patternize.c:284-288: the same words split by
    * different delimiters must not merge). Lines with NO frequent word
    * are not candidates and join no cluster (:290); clusters with
    * fewer than `support` lines are removed (:325, predicate :188).
    *
    * Shape at scale: one (pos, word) exchange builds the wordlist
    * (support-filtered — the heavy-hitter table, AQE broadcasts it
    * back), one join flags positions, one line-keyed aggregation
    * assembles keys, one key-keyed aggregation forms clusters. No
    * iteration, no collect.
    *
    * @return (cluster_key, members, support) — members = sorted ids */
  def findClustersSlct(df: DataFrame, id: Column, message: Column,
      support: Long,
      delimiters: String = " :&~?![]=,;()'\""): DataFrame = {
    val re = "[" + delimiters.flatMap(c => "\\" + c) + "]"
    val sep = "\u001e" // PTZ_SEPARATOR_CHAR
    val marker = "\u001a" // PTZ_PARSER_MARKER_CHAR
    val base = df.select(id.as("__id"), message.as("__msg"))
    val words = base.select(col("__id"), col("__msg"),
      posexplode(split(col("__msg"), re)).as(Seq("pos", "word")))
    val freq = frequentWords(df, message, support, delimiters)
      .select(col("pos"), col("word"), lit(true).as("__f"))
    val flagged = words.join(freq, Seq("pos", "word"), "left")
    val keyed = flagged.groupBy(col("__id"), col("__msg")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"),
          when(col("__f"),
            concat(col("pos").cast("string"), lit(" "), col("word")))
            .otherwise(concat(col("pos").cast("string"), lit(" " + marker)))
            .as("e")))),
        e => e.getField("e")), sep).as("wkey"),
      max(coalesce(col("__f"), lit(false))).as("cand"))
    keyed.filter(col("cand"))
      .withColumn("cluster_key", concat(col("wkey"), lit(sep),
        regexp_replace(col("__msg"), "[^" + re.substring(1), ""),
        lit(sep)))
      .groupBy(col("cluster_key"))
      .agg(sort_array(collect_list(col("__id"))).as("members"),
        count(lit(1)).as("support"))
      .filter(col("support") >= support)
  }

  /** Mine templates. Returns (template, support) rows.
    *
    * @param wildcard token emitted where the cluster disagrees
    * @param approxDistinct use approx_count_distinct (HLL sketch,
    *        bounded shuffle per position — the 100 TB path) instead of
    *        exact countDistinct; only the literal/wildcard decision at
    *        distinct-count 1 consumes the estimate, so collisions can
    *        at worst turn a literal into a wildcard. Keep exact for
    *        correctness gates.
    */
  def mine(df: DataFrame, message: Column,
      wildcard: String = "@ANYSTRING@",
      approxDistinct: Boolean = false): DataFrame = {
    val toks = df.select(split(message, " ").as("toks"))
      .select(col("toks"), size(col("toks")).as("n"),
        element_at(col("toks"), 1).as("t0"))
    val pos = toks.select(col("n"), col("t0"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val nd = if (approxDistinct) approx_count_distinct(col("tok"))
             else countDistinct(col("tok"))
    val perPos = pos.groupBy(col("n"), col("t0"), col("pos"))
      .agg(nd.as("nd"), min(col("tok")).as("tok1"),
        count(lit(1)).as("sup"))
    perPos.groupBy(col("n"), col("t0"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            when(col("nd") === 1, col("tok1")).otherwise(lit(wildcard)).as("t")))),
          e => e.getField("t")), " ").as("template"),
        max(col("sup")).as("support"))
      .select(col("template"), col("support"))
  }
}
