package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure Column expressions —
  * codegen'd, shuffle-free, and safe to run over 100 TB of documents as a
  * narrow map stage fused with the scan.
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference's template-level word
    * handling is byte-oriented; a training pipeline wants tokens). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Let-binding for HOF programs: evaluates `arr` ONCE and exposes it
    * as a lambda variable. An expression referenced inside a HOF lambda
    * body is otherwise re-evaluated per element — an O(n) tokenizer
    * inlined into an n-element transform goes quadratic per row. */
  def bindArray(arr: Column)(body: Column => Column): Column =
    element_at(transform(array(arr), body), 1)

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish token estimate without a vocab: count word pieces + digit
    * runs + punctuation runs (a GPT-2-style pre-tokenizer regex). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text,
      lit("'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"))

  /** Per-language marker (stopword) sets for n-gram-free language ID.
    * Tiny on purpose: ID at 100 TB must stay a map-side expression. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"))

  /** Count of tokens belonging to a marker set. */
  def markerHits(text: Column, words: Seq[String]): Column = {
    val set = words.map(lit(_))
    size(filter(tokens(text), t => set.map(t === _).reduce(_ || _)))
  }

  /** Language-ID scores + argmax decision. Ties break toward the
    * alphabetically-first language (deterministic). Returns
    * struct(lang, score). */
  def langId(text: Column): Column = {
    val langs = markers.toSeq.sortBy(_._1)
    // array_max compares structs field-by-field: score first, then an
    // explicit priority that ranks alphabetically-first languages higher
    // (comparing the lang string itself would rank them LAST on ties).
    val scored = langs.zipWithIndex.map { case ((l, ws), i) =>
      struct(markerHits(text, ws).as("score"),
        lit(langs.size - 1 - i).as("prio"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"), best.getField("score").as("score"))
  }

  /** Quality metrics (length / punctuation / stopword ratios — the usual
    * pretraining heuristics). All ratios exact-decimal for oracle parity. */
  def qualityMetrics(text: Column): Column = {
    val nChars = length(text)
    val nWords = tokenCount(text)
    val nPunct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val nStop = markerHits(text, markers("en"))
    val nUpper = length(text) - length(regexp_replace(text, "[A-Z]", ""))
    struct(
      nChars.as("n_chars"),
      nWords.as("n_words"),
      nPunct.as("n_punct"),
      nStop.as("n_stopwords"),
      nUpper.as("n_upper"),
      // int/int via double: deterministic IEEE on every engine
      when(nWords > 0, nChars.cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)).as("chars_per_word"))
  }

  /** Composite quality gate: the standard "keep" heuristics. */
  def qualityFilter(text: Column, minWords: Int = 5, maxCharsPerWord: Double = 20,
      maxPunctRatio: Double = 0.3): Column = {
    val m = qualityMetrics(text)
    m.getField("n_words") >= minWords &&
      m.getField("chars_per_word") <= maxCharsPerWord &&
      (m.getField("n_punct").cast("double") /
        greatest(m.getField("n_chars"), lit(1)).cast("double")) <= maxPunctRatio
  }

  /** Deterministic hash sampling: keep ~`rate` of rows, decided by an
    * md5 prefix of `key` — reproducible on any engine/cluster and
    * stable across reruns (the 100 TB subsampling primitive; a seed
    * string mixes into the key for independent samples). */
  def hashSample(key: Column, rate: Double, seed: String = ""): Column = {
    val bucket = conv(substring(md5(concat(lit(seed), key)), 1, 6), 16, 10)
      .cast("long") // 24 bits: 0 .. 16_777_215
    bucket < (rate * (1 << 24)).toLong
  }

  /** Stratified deterministic sampling: per-stratum rates over the same
    * md5-bucket machinery as [[hashSample]] — language-balanced /
    * source-balanced subcorpora with reproducible membership (no RNG
    * state, any engine recomputes the decision). Strata not in
    * `rates` fall back to `defaultRate`. Pure Column expression:
    * narrow, codegen'd, no shuffle. */
  def stratifiedHashSample(key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: String = ""): Column = {
    val bucket = conv(substring(md5(concat(lit(seed), key)), 1, 6), 16, 10)
      .cast("long")
    val threshold = rates.foldLeft(lit((defaultRate * (1 << 24)).toLong)) {
      case (acc, (s, r)) => when(stratum === s, lit((r * (1 << 24)).toLong)).otherwise(acc)
    }
    bucket < threshold
  }

  /** Exact document fingerprint: hash of whitespace-normalized lowercase
    * text (the cheap dedup key). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing-style robust fingerprint: min-keep over character k-gram
    * rolling hashes — survives small edits. Small-word modular
    * arithmetic throughout, so an external SQL oracle recomputes it
    * exactly (see the text_fingerprint_robust oracle). */
  def robustFingerprint(text: Column, k: Int = 8, keep: Int = 4): Column =
    graft.functions.RollingFingerprint(
      lower(regexp_replace(trim(text), "\\s+", " ")), k, keep)
}
