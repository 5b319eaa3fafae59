package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale training corpora — the two standard
  * document-provenance operations crawls run before text-level dedup:
  * canonicalize each document's URL and keep one document per
  * canonical URL, and drop documents whose host falls under a domain
  * blocklist.
  *
  * Beyond-reference operator (the reference engine processes log
  * streams, not crawls); semantics follow the conventions of the
  * public C4/CCNet pipelines: URL-keyed exact dedup is the first,
  * cheapest dedup pass, and domain blocklists apply to the
  * registrable-domain suffix, not the literal host.
  *
  * Scale shape: [[normalizeUrl]] is pure codegen'd column algebra (no
  * UDF, no shuffle); [[dedupByUrl]] is one map-side-combinable
  * min-aggregate on the normalized key + a semi join (the dedupLines
  * pattern — no text payload travels through the shuffle);
  * [[domainFilter]] explodes each host into its O(labels) suffixes
  * and anti-joins a BROADCAST blocklist — the corpus never shuffles. */
object Urls {

  /** Tracking parameters every major pipeline strips (utm_* plus the
    * common click identifiers). */
  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$"

  /** Canonicalize a URL:
    *   - scheme and host lowercase; a leading `www.` dropped
    *   - explicit default ports (`:80` http, `:443` https) dropped,
    *     other ports kept
    *   - path keeps its case, trailing `/`-runs trimmed (the root path
    *     collapses to none)
    *   - the fragment is dropped
    *   - query parameters: tracking params removed, the rest sorted
    *     byte-wise for order independence; an emptied query drops its
    *     `?`
    * Null/invalid inputs (no scheme/host) yield null — callers filter
    * or pass through as policy. */
  def normalizeUrl(u: Column): Column = {
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val authority = lower(coalesce(try_parse_url(u, lit("AUTHORITY")), lit("")))
    val hostPort = regexp_replace(authority, "^[^@]*@", "") // strip userinfo
    val bare = regexp_replace(hostPort, "^www\\.", "")
    val noDefault = when(scheme === "http", regexp_replace(bare, ":80$", ""))
      .when(scheme === "https", regexp_replace(bare, ":443$", ""))
      .otherwise(bare)
    val path = regexp_replace(coalesce(try_parse_url(u, lit("PATH")), lit("")), "/+$", "")
    val params = filter(split(coalesce(try_parse_url(u, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = array_join(array_sort(params), "&")
    when(try_parse_url(u, lit("HOST")).isNull || length(try_parse_url(u, lit("HOST"))) === 0,
      lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), noDefault, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Keep ONE document per normalized URL — the keeper is the least
    * `id` (deterministic under replay). Documents whose URL fails to
    * normalize (null) always survive. Returns the input rows of the
    * survivors plus their `norm_url`. */
  def dedupByUrl(df: DataFrame, id: Column, url: Column): DataFrame = {
    val withNorm = df.withColumn("norm_url", normalizeUrl(url))
      .withColumn("__id", id)
    val keep = withNorm.where(col("norm_url").isNotNull)
      .groupBy(col("norm_url"))
      .agg(min(col("__id")).as("__id"))
    withNorm.join(keep, Seq("norm_url", "__id"), "left_semi")
      .unionByName(withNorm.where(col("norm_url").isNull))
      .drop("__id")
  }

  /** All DNS suffixes of a host that could carry a blocklist entry:
    * `a.b.example.com` → [a.b.example.com, b.example.com, example.com,
    * com]. Pure column algebra over the label array. */
  private[pipeline] def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
  }

  /** Drop rows whose `host` is a blocked domain or any subdomain of
    * one. `blocklist` is a one-column frame of lowercase domains.
    * Both joins are broadcast — the blocklist by construction
    * (config-sized, like in-list()), the blocked-id set because a
    * blocklist hits a small corpus fraction — so the corpus itself
    * never shuffles; the per-row explode is bounded by the host's
    * label count. */
  def domainFilter(df: DataFrame, id: Column, host: Column,
      blocklist: DataFrame): DataFrame = {
    val bl = broadcast(blocklist.toDF("__blocked")
      .select(lower(col("__blocked")).as("__blocked")))
    val blockedIds = df
      .select(id.as("__bid"), explode(hostSuffixes(lower(host))).as("__sfx"))
      .join(bl, col("__sfx") === col("__blocked"), "left_semi")
      .select("__bid").distinct()
    df.join(broadcast(blockedIds), id === col("__bid"), "left_anti")
  }
}
