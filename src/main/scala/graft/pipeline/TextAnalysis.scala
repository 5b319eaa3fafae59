package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The GPT-2-style pre-tokenizer regex: contraction suffixes, word
    * pieces, digit runs, punctuation runs — each with its leading space
    * attached (so concatenating tokens reconstructs the text minus
    * runs of extra whitespace). */
  private val bpeishPattern =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token estimate without a vocab: count word pieces + digit
    * runs + punctuation runs (a GPT-2-style pre-tokenizer regex). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern))

  /** The MODEL-token array for the same pre-tokenizer: what
    * [[chunkDocuments]]/[[packSequences]] cut on when a pretraining
    * pipeline counts model tokens instead of whitespace words (r9).
    * Same regex as [[bpeishTokenCount]] — the text_tokens_bpe oracle
    * pins the Spark↔DuckDB dialect agreement. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  /** BPE merge separator: joins a piece's symbols inside the working
    * string during training/application. A control char no tokenizer
    * piece contains (the pre-tokenizer never emits control chars). */
  private val BpeSep = "\u0001"

  /** Trained BPE merges (r9): Sennrich-style byte-pair-encoding merge
    * table learned from an md5-sampled subset — the real subword
    * tokenizer the `bpeishTokenCount` estimate stands in for. Training
    * is DRIVER-SIDE over a bounded sample (like every trained model
    * here: pqTrain's codebook, ivfTopK's k-means — a tokenizer trains
    * once on a sample, never on the full corpus), and every step is
    * deterministic and externally replayable:
    *
    *  - pieces = the GPT-2-style pre-tokenizer over the sampled docs,
    *    with frequencies; symbols start as single characters joined by
    *    [[BpeSep]];
    *  - each iteration counts ADJACENT symbol pairs weighted by piece
    *    frequency (counted per occurrence, before merging — Sennrich's
    *    convention), picks the max (ties → lexicographically smallest
    *    (a, b)), and applies it as a LITERAL left-to-right
    *    non-overlapping replace of `a SEP b` → `ab` — which is exactly
    *    what String.replace / SQL replace() do, the property that lets
    *    DuckDB replay both training and application verbatim;
    *  - no pairs left → training stops early (remaining merges empty).
    *
    * @return the merge table in rank order */
  def bpeTrain(docs: DataFrame, id: Column, text: Column,
      nMerges: Int = 16, sampleN: Int = 64): Seq[(String, String)] = {
    require(nMerges >= 0 && sampleN > 0)
    val texts = docs.select(id.cast("string").as("k"), text.as("t"))
      .orderBy(md5(col("k")), col("k")).limit(sampleN)
      .collect().map(r => Option(r.getString(1)).getOrElse(""))
    val re = bpeishPattern.r
    val freq = scala.collection.mutable.LinkedHashMap[String, Long]()
    texts.foreach(t => re.findAllIn(t).foreach(p =>
      freq(p) = freq.getOrElse(p, 0L) + 1))
    // initial symbols are CODE POINTS, not UTF-16 units — the applier
    // (bpeSubwordCount) and the DuckDB oracle both segment per code
    // point (regex `(.)` is code-point aware in Java and RE2), so a
    // surrogate-half symbol trained here could never re-form there
    var words: Seq[(String, Long)] = freq.toSeq.map { case (p, f) =>
      (p.codePoints().toArray.map(cp =>
        new String(Character.toChars(cp))).mkString(BpeSep), f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        val syms = w.split(BpeSep, -1)
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          pairCounts(key) = pairCounts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), _) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        words = words.map { case (w, f) => (w.replace(a + BpeSep + b, a + b), f) }
        k += 1
      }
    }
    merges.toSeq
  }

  /** Apply a trained merge table: per pre-tokenizer piece, symbols
    * start as characters and each merge applies in rank order as a
    * literal replace — one narrow codegen'd pass, the merge table
    * rides the expression (O(nMerges) nodes). Returns
    * struct(n_pieces, n_subwords). */
  def bpeSubwordCount(text: Column, merges: Seq[(String, String)]): Column =
    bindArray(bpeishTokens(text)) { pieces =>
      struct(size(pieces).cast("long").as("n_pieces"),
        aggregate(pieces, lit(0L), (acc, p) => {
          val symed = rtrim(regexp_replace(p, "(.)", "$1" + BpeSep), BpeSep)
          val merged = merges.foldLeft(symed) { case (c, (a, b)) =>
            replace(c, lit(a + BpeSep + b), lit(a + b))
          }
          acc + size(split(merged, BpeSep, -1)).cast("long")
        }).as("n_subwords"))
    }

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

  /** Shannon character entropy — low = boilerplate/padding, high =
    * binary junk; a standard cheap corpus-quality signal. Compiled
    * single-pass expression ([[graft.functions.CharEntropy]]), narrow
    * map-only shape. Returns struct(n_chars, distinct_chars, entropy). */
  def charEntropy(text: Column): Column = graft.functions.CharEntropy(text)

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

  /** Hashed linear classifier application (r8): the fastText-shaped
    * quality-model scoring step of the CCNet/RefinedWeb recipes —
    * word unigram + bigram features through the HASHING TRICK
    * (bucket = first-6-hex-digits(md5(feature)) mod nBuckets, an
    * engine-replayable stand-in for any fixed hash), each bucket
    * carrying a model weight, document score = Σ weights. Weights
    * arrive as a column function so a config can bind a broadcast
    * literal map, a join, or a closed form; everything stays INTEGER
    * so an external engine replays the score exactly — the caller
    * thresholds via cross-multiplication (`score·D > thr·n_feats`)
    * instead of a float mean.
    *
    * Scale shape: tokenize → HOF feature list → HOF sum per row. One
    * narrow codegen'd pass; the model is expression-resident (the
    * hashing trick exists precisely so the model is O(nBuckets), not
    * O(vocab) — at 100 TB the corpus never shuffles and the weights
    * ride the closure).
    *
    * @param weightOf bucket-id column (long in [0, nBuckets)) → weight
    * @return (id, n_feats, score) */
  def hashedLinearScore(docs: DataFrame, id: Column, text: Column,
      nBuckets: Int, weightOf: Column => Column): DataFrame = {
    require(nBuckets > 0, "hashedLinearScore: positive bucket count")
    def bucket(f: Column): Column =
      conv(substring(md5(f), 1, 6), 16, 10).cast("long") % nBuckets
    docs.select(id.as("doc_id"),
      bindArray(filter(tokens(text), t => t =!= "")) { ws =>
        bindArray(concat(ws, wordNgrams(ws, 2))) { feats =>
          struct(size(feats).cast("long").as("n_feats"),
            aggregate(feats, lit(0L),
              (acc, f) => acc + weightOf(bucket(f))).as("score"))
        }
      }.as("s"))
      .select(col("doc_id"), col("s.n_feats").as("n_feats"),
        col("s.score").as("score"))
  }

  /** Multi-label hashed classifier head (r9): argmax over L label
    * scores — quality filtering à la fastText wants a LABEL decision
    * (keep/toss, language, domain), not one scalar. Same hashing-trick
    * features as [[hashedLinearScore]], one weight function per label.
    *
    * The feature BUCKETS stage once (bindArray, so the md5 hash runs
    * once per feature, not once per label), then each label folds the
    * bucket array with its own integer weights — per-label cost is pure
    * arithmetic over an already-materialized int array. The decision is
    * `array_position(scores, array_max(scores)) - 1`: ties go to the
    * SMALLEST label index (fastText's argmax order), exactly replayable
    * in SQL.
    *
    * Scale shape: one narrow codegen'd pass, models expression-resident
    * (L × O(nBuckets)), corpus never shuffles — same 100 TB contract as
    * the single-score head.
    *
    * @param weightsOf one bucket→weight column function per label
    * @return (doc_id, n_feats, score_0..score_{L-1}, label) */
  def hashedLinearLabel(docs: DataFrame, id: Column, text: Column,
      nBuckets: Int, weightsOf: Seq[Column => Column]): DataFrame = {
    require(nBuckets > 0, "hashedLinearLabel: positive bucket count")
    require(weightsOf.nonEmpty, "hashedLinearLabel: at least one label")
    val nL = weightsOf.length
    def bucket(f: Column): Column =
      conv(substring(md5(f), 1, 6), 16, 10).cast("long") % nBuckets
    docs.select(id.as("doc_id"),
      bindArray(filter(tokens(text), t => t =!= "")) { ws =>
        bindArray(concat(ws, wordNgrams(ws, 2))) { feats =>
          bindArray(transform(feats, f => bucket(f))) { bks =>
            struct(size(bks).cast("long").as("n_feats"),
              array(weightsOf.map(w =>
                aggregate(bks, lit(0L), (acc, b) => acc + w(b))): _*).as("scores"))
          }
        }
      }.as("s"))
      .select(Seq(col("doc_id"), col("s.n_feats").as("n_feats")) ++
        (0 until nL).map(l => col("s.scores").getItem(l).as(s"score_$l")) :+
        (array_position(col("s.scores"), array_max(col("s.scores"))) - 1)
          .cast("int").as("label"): _*)
  }

  /** Target-mixture sampling (r8): the DoReMi/Pile-style mixture
    * APPLICATION step — given target domain weights (ppm) and a total
    * document budget, derive each domain's acceptance rate from its
    * actual count and sample deterministically. A domain with fewer
    * docs than its target allocation is taken whole (rate clamps at
    * 1 — the standard up-to-availability semantics; re-weighting by
    * epochs/duplication is a separate packing concern).
    *
    * Every quantity is INTEGER-exact so an external engine replays the
    * decision bit-for-bit: allocation ppm of the domain's own corpus
    * `fracPpm = min(1e6, targetPpm·budget / cnt)`, md5 threshold
    * `thr = fracPpm·2^24 / 1e6` (floor division both steps; all
    * intermediates < 2^63), acceptance = first-6-hex-digits(md5) < thr
    * — the same bucket machinery as [[stratifiedHashSample]].
    *
    * Scale shape: one TINY per-domain count aggregate (domains ≈
    * dozens), broadcast-joined back, then a narrow codegen'd filter —
    * the corpus itself never shuffles.
    *
    * @param targetPpm domain → parts-per-million of the OUTPUT mixture
    * @param budget    total documents wanted in the output
    * @return input rows that pass, plus their domain (unknown domains
    *         have no allocation and drop) */
  def mixtureSample(docs: DataFrame, key: Column, domain: Column,
      targetPpm: Map[String, Long], budget: Long,
      seed: String = ""): DataFrame = {
    require(targetPpm.values.forall(p => p >= 0 && p <= 1000000L),
      "mixtureSample: ppm weights in [0, 1e6]")
    val counted = docs.select(key.as("__mk"), domain.as("__md"),
      col("*"))
    val cnts = counted.groupBy(col("__md")).agg(count(lit(1)).as("__mc"))
    val ppm = targetPpm.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      when(col("__md") === d, lit(p)).otherwise(acc)
    }
    // exact long floor-division (Column./ is double): (a - a%b)/b is an
    // integer-valued exact double for a < 2^53
    def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val fracPpm = least(lit(1000000L), idiv(ppm * budget, col("__mc")))
    val thr = idiv(fracPpm * (1L << 24), lit(1000000L))
    val bucket = conv(substring(md5(concat(lit(seed), col("__mk"))), 1, 6),
      16, 10).cast("long")
    counted.join(broadcast(cnts), "__md")
      .filter(bucket < thr)
      .drop("__mk", "__md", "__mc")
  }

  /** Epoch-duplicating mixture application (r9): [[mixtureSample]]
    * clamps a domain at one pass ("take it whole"); real mixtures
    * UPSAMPLE scarce domains by repeating them (Pile/DoReMi epochs >
    * 1). Each row emits `floor(alloc/cnt)` full copies plus one more
    * with probability (alloc mod cnt)/cnt — decided by the same md5
    * threshold machinery, so expected output per domain is exactly its
    * allocation and every decision is integer-replayable. Output rows
    * carry a 0-based `epoch` index (downstream shuffling/packing keys
    * on it to keep copies apart).
    *
    * Scale shape: the same tiny per-domain count agg broadcast back,
    * then a narrow explode — output size is the target budget, the
    * input corpus never shuffles.
    *
    * @return input rows × their copy count, plus `epoch` */
  def mixtureSampleEpochs(docs: DataFrame, key: Column, domain: Column,
      targetPpm: Map[String, Long], budget: Long,
      seed: String = ""): DataFrame = {
    require(targetPpm.values.forall(p => p >= 0 && p <= 1000000L),
      "mixtureSampleEpochs: ppm weights in [0, 1e6]")
    val counted = docs.select(key.as("__mk"), domain.as("__md"), col("*"))
    val cnts = counted.groupBy(col("__md")).agg(count(lit(1)).as("__mc"))
    val ppm = targetPpm.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      when(col("__md") === d, lit(p)).otherwise(acc)
    }
    def idiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val alloc = idiv(ppm * budget, lit(1000000L))
    val full = idiv(alloc, col("__mc"))
    val remPpm = idiv((alloc - full * col("__mc")) * 1000000L, col("__mc"))
    val thr = idiv(remPpm * (1L << 24), lit(1000000L))
    val bucket = conv(substring(md5(concat(lit(seed), col("__mk"))), 1, 6),
      16, 10).cast("long")
    counted.join(broadcast(cnts), "__md")
      .withColumn("__copies",
        full + when(bucket < thr, lit(1L)).otherwise(lit(0L)))
      .filter(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__mk", "__md", "__mc", "__copies")
  }

  /** Word n-grams as strings: ["a","b","c"] with n=2 → ["a b","b c"].
    * Pure HOF over an already-bound token array (pass through
    * [[bindArray]] so the tokenizer runs once, not once per element). */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))

  /** Repetition metrics over word n-grams (the Gopher-style repetition
    * signals, adapted to n-grams because pretraining dedup text is often
    * single-line):
    *  - `top_bigram_frac`: chars covered by the most frequent word
    *    2-gram (count × gram length) / total chars; ties break toward
    *    the lexicographically LARGER gram (array_max struct order).
    *  - `dup_trigram_frac`: fraction of word-3-gram occurrences whose
    *    gram appears more than once in the document.
    *  - `distinct_ratio`: type-token ratio (distinct words / words).
    * All narrow codegen'd HOFs — O(G²) in per-doc gram count, zero
    * shuffle, so cost is bounded by document length, not corpus size:
    * safe as a map stage over 100 TB. */
  /** Longest run in a SORTED gram array as struct(best, gram); ties
    * break toward the lexicographically larger gram (matching what a
    * (count, gram) struct max would pick). Single O(G) fold — equal
    * grams are adjacent after the sort, so run lengths are counts. */
  private def topRunOfSorted(sortedGrams: Column): Column =
    aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"), lit("").as("gram")),
      (acc, x) => {
        val newRun = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        val better = newRun > acc.getField("best") ||
          (newRun === acc.getField("best") && x > acc.getField("gram"))
        struct(x.as("prev"), newRun.as("run"),
          when(better, newRun).otherwise(acc.getField("best")).as("best"),
          when(better, x).otherwise(acc.getField("gram")).as("gram"))
      })

  /** Occurrences belonging to runs of length ≥ 2 in a SORTED array:
    * the first repeat of a run retro-credits both occurrences, later
    * repeats add one. Single O(G) fold. */
  private def dupOccurrencesOfSorted(sortedGrams: Column): Column =
    aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("dups")),
      (acc, x) => {
        val newRun = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        val add = when(newRun === 2, lit(2)).when(newRun > 2, lit(1)).otherwise(lit(0))
        struct(x.as("prev"), newRun.as("run"),
          (acc.getField("dups") + add).as("dups"))
      }).getField("dups")

  def repetitionMetrics(text: Column): Column =
    bindArray(filter(tokens(text), t => t =!= "")) { toks =>
      bindArray(array_sort(wordNgrams(toks, 2))) { bigrams =>
        bindArray(array_sort(wordNgrams(toks, 3))) { trigrams =>
          // sort-then-run-length: O(G log G) per document instead of the
          // naive O(G²) count-per-distinct-gram — what keeps long
          // documents cheap when this runs as a 100 TB map stage
          val topBigram = topRunOfSorted(bigrams)
          val topFrac = when(size(bigrams) === 0, lit(0.0)).otherwise(
            topBigram.getField("best").cast("double") *
              length(topBigram.getField("gram")).cast("double") /
              greatest(length(text), lit(1)).cast("double"))
          val dupFrac = when(size(trigrams) === 0, lit(0.0))
            .otherwise(dupOccurrencesOfSorted(trigrams).cast("double") /
              size(trigrams).cast("double"))
          val ttr = when(size(toks) === 0, lit(0.0)).otherwise(
            size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
          struct(topFrac.as("top_bigram_frac"), dupFrac.as("dup_trigram_frac"),
            ttr.as("distinct_ratio"))
        }
      }
    }

  /** PII redaction: emails, then dotted-quad IPs, then long digit runs
    * (card/phone-shaped), each replaced by a stable token. The regexes
    * stay inside the RE2-compatible subset so external engines replay
    * them identically. Counts are measured stage-by-stage on the
    * partially-redacted text so an email's domain dots are never
    * double-counted as an IP. Narrow codegen'd map — no shuffle. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val digitRunPattern = "\\d{9,}"

  def piiRedact(text: Column): Column = {
    // '@' prefilter: the email pattern can't match without one, and most
    // rows in a real corpus have none — skip the costliest regex there
    val hasAt = instr(text, "@") > 0
    val afterEmail = when(hasAt, regexp_replace(text, emailPattern, "<EMAIL>"))
      .otherwise(text)
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    val afterDigits = regexp_replace(afterIp, digitRunPattern, "<NUM>")
    struct(
      afterDigits.as("redacted"),
      when(hasAt, regexp_count(text, lit(emailPattern)).cast("int"))
        .otherwise(lit(0)).as("n_emails"),
      regexp_count(afterEmail, lit(ipv4Pattern)).cast("int").as("n_ips"),
      regexp_count(afterIp, lit(digitRunPattern)).cast("int").as("n_digit_runs"))
  }

  /** Exact document fingerprint: hash of whitespace-normalized lowercase
    * text (the cheap dedup key). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Per-document salient terms by tf × N / df (tf-idf with a rational
    * idf — no logarithm, so every engine computes the identical score).
    * Three map-side-combinable aggregations and one windowed top-k:
    *   explode(tokens) → (doc, term) counts → term doc-frequency →
    *   score join → row_number ≤ topK per doc.
    * The (doc, term) aggregation partially aggregates before its
    * shuffle; the df table shuffles on term (AQE picks broadcast when
    * the vocabulary is small — at 100 TB vocabulary it degrades to a
    * sort-merge join on term, which is the right plan there); the
    * window repartitions on doc_id, which is the natural output
    * partitioning. Corpus size N rides in as a broadcast scalar. */
  def salientTerms(docs: DataFrame, id: Column, text: Column,
      topK: Int = 3): DataFrame = {
    val tok = docs.select(id.as("doc_id"),
      explode(filter(tokens(text), t => t =!= "")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Pack documents into training shards of ~`budgetTokens` tokens each,
    * preserving id order (the "fill shard 0, then shard 1, …" packing a
    * tokenized-corpus writer needs). A document lands in the shard its
    * EXCLUSIVE running token total falls in: shard = start_tokens div
    * budget — so shards overflow by at most one document and every
    * engine recomputes the same assignment.
    *
    * The running total is a distributed two-level prefix sum, not a
    * global window: ids are coarsened order-preservingly into buckets
    * (floor(id / bucketWidth)), per-bucket token sums get an exclusive
    * prefix via a window over the SMALL bucket-totals table (N /
    * bucketWidth rows — at 10^11 docs and width 2^20 that is ~10^5
    * rows; recurse the same trick if that ever gets big), and each
    * bucket's offset is broadcast back so the in-bucket window only
    * sorts within its bucket partition. No single-partition pass ever
    * sees more than bucketWidth rows. */
  def packShards(docs: DataFrame, id: Column, text: Column,
      budgetTokens: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    // the single-partition prefix window below is bounded by
    // construction to maxDocId / bucketWidth rows (the production
    // default 2^20 keeps 10^12 ids under 10^6 side-table rows; tests
    // shrink the width to exercise multi-bucket stitching — PlanSpec
    // "pack queries" pins that the window stays explicitly partitioned
    // and above the aggregate)
    require(bucketWidth > 0, "packShards: bucketWidth must be positive")
    val base = docs.select(id.cast("long").as("doc_id"),
      tokenCount(text).cast("long").as("n_tokens"))
    val bucketed = base.withColumn("bucket", floor(col("doc_id") / bucketWidth).cast("long"))
    val totals = bucketed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    // partitionBy(pmod(bucket, 1)): the SAME one-partition pass over
    // the tiny post-aggregate table, but with an explicit (constant,
    // yet non-foldable — a literal would be stripped back to the empty
    // spec by the optimizer) partition key, so WindowExec stops
    // spamming its all-data-to-one-partition warning over a ~1e5-row
    // frame and making every reader re-audit the bound (r14 verdict #6;
    // PlanSpec "pack queries" pins the non-empty spec)
    val wBuckets = Window.partitionBy(pmod(col("bucket"), lit(1)))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_tokens")).over(wBuckets), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    val wInBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("start_tokens",
        col("bucket_offset") + coalesce(sum(col("n_tokens")).over(wInBucket), lit(0L)))
      .withColumn("shard", expr(s"start_tokens div $budgetTokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_tokens"), col("shard"))
  }

  /** Unigram-frequency quality signal — the cheap stand-in for the
    * LM-perplexity gate of web-corpus pipelines: documents whose
    * tokens are mostly corpus-rare (OCR noise, codes, boilerplate
    * hashes) score low, fluent text scores high. Per token the signal
    * is the BIT LENGTH of its corpus frequency (`length(bin(count))`
    * = floor(log2)+1 — exact integer arithmetic, so an external SQL
    * oracle reproduces it bit-for-bit where a float log2 would
    * diverge at powers of two); out-of-vocabulary tokens floor at 1.
    *
    * Scale shape: one token-count aggregation (map-side combinable),
    * a TOP-`vocabSize` cutoff (Spark TakeOrderedAndProject — no full
    * sort), and a BROADCAST left join of the bounded vocab against
    * the token stream. The vocab cutoff is what keeps the join
    * broadcastable at 100 TB; everything off-vocab is by definition
    * rare and floors to 1 bit anyway.
    *
    * @return (doc_id, n_tokens, oov, freq_bits_avg)
    */
  def unigramQuality(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int = 65536): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(filter(tokens(lower(text)), t => t =!= "")).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val vocab = counts.orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
    toks.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("bits",
        when(col("cnt").isNull, lit(1L)).otherwise(length(bin(col("cnt"))).cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("oov"),
        (sum(col("bits")).cast("double") / count(lit(1))).as("freq_bits_avg"))
  }

  /** Bigram LM surprisal — the LM-based quality signal of the
    * CCNet/Gopher filtering recipes, INTEGERIZED so an external SQL
    * engine verifies it exactly: instead of -log2 P(b|a) from a
    * trained LM (whose libm logs are not bit-reproducible across
    * engines), each bigram position scores
    * `bits(cnt(a)) - bits(cnt(a,b))` with `bits(x) = floor(log2 x)+1`
    * — an integer estimate of log2(1/P(b|a)) since P ≈ cnt(ab)/cnt(a)
    * — clamped at 0 (a bigram can out-rank its left unigram only
    * across the two top-K table boundaries), and OOV bigrams back off
    * to `bits(cnt(a)) + 1`. High average surprisal = improbable word
    * transitions = the gibberish/boilerplate signal LM filtering
    * gates on.
    *
    * Scale shape: two partial-agg count passes (tokens, bigrams), two
    * DETERMINISTIC top-K tables (count desc, lexical tie-break —
    * replayable by the oracle) broadcast into the scoring joins, one
    * per-doc aggregation. No all-pairs anywhere; the K-row tables are
    * the only driver-bounded state, exactly like [[unigramQuality]].
    * Docs with fewer than two tokens have no bigram rows and drop
    * from the output (mirrored by the oracle's GROUP BY).
    *
    * @return (doc_id, n_bigrams, oov_bigrams, surprisal_bits_avg)
    */
  def bigramSurprisal(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int = 65536, bigramTableSize: Int = 262144): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      filter(tokens(lower(text)), t => t =!= "").as("ws"))
    val bigrams = base.select(col("doc_id"),
      explode(bindArray(col("ws")) { ws =>
        when(size(ws) < 2,
          array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(1), size(ws) - 1),
            i => struct(element_at(ws, i).as("a"),
              element_at(ws, i + 1).as("b"))))
      }).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val vocab = base.select(explode(col("ws")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("ucnt"))
      .orderBy(col("ucnt").desc, col("term").asc).limit(vocabSize)
    val btab = bigrams.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("bcnt"))
      .orderBy(col("bcnt").desc, col("a").asc, col("b").asc)
      .limit(bigramTableSize)
    bigrams
      .join(broadcast(btab), Seq("a", "b"), "left")
      .join(broadcast(vocab.withColumnRenamed("term", "a")), Seq("a"), "left")
      .withColumn("ubits", when(col("ucnt").isNull, 1L)
        .otherwise(length(bin(col("ucnt"))).cast("long")))
      .withColumn("bits", when(col("bcnt").isNull, col("ubits") + 1L)
        .otherwise(greatest(lit(0L),
          col("ubits") - length(bin(col("bcnt"))).cast("long"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("bcnt").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        (sum(col("bits")).cast("double") / count(lit(1)))
          .as("surprisal_bits_avg"))
  }

  /** CCNet-style perplexity buckets (r9): the head/middle/tail split
    * of the CCNet recipe — documents bucket by LM quality (here the
    * integerized [[bigramSurprisal]] signal; lower = more probable =
    * head) so downstream mixing can oversample the head and downsample
    * the tail. CCNet derives its cutpoints from a SAMPLE, not a global
    * sort — exactly what scales: a corpus-wide exact tercile needs a
    * total order (one-partition sort at 100 TB), while the sampled
    * cutpoints cost a bounded collect and one narrow comparison pass.
    *
    * Cutpoints: the md5-ordered sample's surprisal values sorted
    * ascending (ties by doc_id); t1 = sorted[floor(S/3)],
    * t2 = sorted[floor(2S/3)] (0-based). bucket = head if s ≤ t1,
    * middle if s ≤ t2, else tail. The surprisal double is ONE division
    * of exact integers, so both thresholds and comparisons replay
    * bit-identically in an external engine.
    *
    * @return (doc_id, n_bigrams, oov_bigrams, surprisal_bits_avg,
    *         bucket) */
  def surprisalBuckets(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int = 65536, bigramTableSize: Int = 262144,
      sampleN: Int = 4096): DataFrame = {
    require(sampleN >= 3, "surprisalBuckets: need a sample of at least 3")
    val sc = bigramSurprisal(docs, id, text, vocabSize, bigramTableSize)
    val sample = sc
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(sampleN)
      .select(col("surprisal_bits_avg"), col("doc_id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (s, did) => (s, did) }
    require(sample.nonEmpty, "surprisalBuckets: empty corpus")
    val t1 = sample(sample.length / 3)._1
    val t2 = sample(2 * sample.length / 3)._1
    sc.withColumn("bucket",
      when(col("surprisal_bits_avg") <= t1, "head")
        .when(col("surprisal_bits_avg") <= t2, "middle")
        .otherwise("tail"))
  }

  /** Context-window chunking (r8): long documents split into
    * token-bounded overlapping chunks — the standard pretraining prep
    * step between cleaning and packing. Chunk k covers tokens
    * `[k·stride, k·stride + chunkTokens)` with
    * `stride = chunkTokens − overlap`; chunks are emitted for
    * `k = 0 .. max(0, ceil((n − chunkTokens)/stride))` — i.e. a chunk
    * exists only if it reaches tokens the previous chunk did not
    * (no fully-redundant tails; the last chunk always covers the end
    * of the document, and its length is in (overlap, chunkTokens]
    * unless the whole doc is shorter than one chunk). The contract is
    * kept dead simple so an external engine replays it with a list
    * slice. One narrow pass: tokenize, explode the chunk-index range,
    * slice — no shuffle, no state; the output is
    * ~(1 + overlap/stride)× the corpus tokens, the expected chunking
    * overhead.
    *
    * BPE mode (r9): pass `tokenizer = bpeishTokens` and `joinSep = ""`
    * to cut on MODEL tokens — each BPE piece carries its leading space,
    * so empty-separator concatenation reconstructs the text span. The
    * chunk shape (one narrow Generate pass, zero corpus shuffle) is
    * identical — the tokenizer is just a different map expression.
    *
    * @return (doc_id, chunk_idx, n_tokens, chunk_text) */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
      chunkTokens: Int = 512, overlap: Int = 64,
      tokenizer: Column => Column = t => filter(tokens(t), x => x =!= ""),
      joinSep: String = " "): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      "chunkDocuments: need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    docs
      .select(id.as("doc_id"), tokenizer(text).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"),
        // kmax = ceil((n − chunkTokens)/stride) = (n − overlap − 1) div
        // stride, clamped at 0 (trunc-vs-floor div only differs below
        // the clamp)
        explode(sequence(lit(0),
          greatest(lit(0), (size(col("ws")) - overlap - 1) / stride)
            .cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        // one slice per chunk row, bound through the HOF-staging rule
        // (size + join would otherwise each re-slice)
        bindArray(slice(col("ws"), col("chunk_idx") * stride + 1,
            lit(chunkTokens))) {
          sl => struct(size(sl).cast("long").as("n_tokens"),
            array_join(sl, joinSep).as("chunk_text"))
        }.as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.n_tokens").as("n_tokens"), col("c.chunk_text").as("chunk_text"))
  }

  /** Sequence packing (r8): the GPT-style pretraining step AFTER
    * chunking/cleaning — the corpus is conceptually concatenated in
    * `doc_id` order and cut into fixed `seqLen`-token training
    * sequences; a document spanning a cut contributes a slice to each
    * side (no padding, no discarded tokens). Output: one row per
    * (doc, sequence) intersection — `seq_id`, the in-document token
    * range `[tok_from, tok_from+n_tokens)` (0-based), and `seq_off`,
    * where that slice starts inside the sequence.
    *
    * Scale shape: a naive global running sum is a ONE-PARTITION window
    * — useless at 100 TB. Instead the prefix sum is two-level: token
    * counts aggregate per coarse `doc_id`-range group (one narrow agg,
    * groups ≈ thousands), the tiny group-totals table turns into
    * per-group prefix offsets with a window over THE GROUP TABLE
    * (driver-scale rows, not the corpus), broadcast-joins back, and the
    * in-group running sum is a window partitioned BY GROUP — every
    * partition bounded by `groupSpan` docs. No corpus-wide single
    * partition anywhere; two narrow passes + one tiny agg.
    *
    * BPE mode (r9): pass `tokenCountOf = bpeishTokenCount(_)` to pack
    * on MODEL tokens — the two-level prefix-sum shape is untouched (the
    * tokenizer only changes the per-doc count expression).
    *
    * @param groupSpan docs per prefix group (the in-group window bound)
    * @return (doc_id, seq_id, seq_off, tok_from, n_tokens) */
  def packSequences(docs: DataFrame, id: Column, text: Column,
      seqLen: Int = 2048, groupSpan: Int = 1024,
      tokenCountOf: Column => Column =
        t => size(filter(tokens(t), x => x =!= ""))): DataFrame = {
    require(seqLen > 0 && groupSpan > 0, "packSequences: positive sizes")
    import org.apache.spark.sql.expressions.Window
    val counted = docs
      .select(id.as("doc_id"), tokenCountOf(text).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("grp", (col("doc_id") / groupSpan).cast("long"))
    // tiny table: one row per group -> exclusive prefix of all earlier
    // groups (window over group totals, NOT the corpus)
    val prefixes = counted.groupBy(col("grp"))
      .agg(sum(col("n")).as("gtot"))
      // partitionBy(pmod(grp, 1)) — explicit constant partition key
      // for the one-partition pass over the one-row-per-group table
      // (see packShards: a plain literal would be optimizer-stripped)
      .withColumn("gpre",
        coalesce(sum(col("gtot")).over(
          Window.partitionBy(pmod(col("grp"), lit(1))).orderBy(col("grp"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("gtot")
    val withStart = counted
      .join(broadcast(prefixes), "grp")
      .withColumn("start", col("gpre") +
        coalesce(sum(col("n")).over(
          Window.partitionBy(col("grp")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // a doc covering global tokens [start, start+n) intersects
    // sequences floor(start/L) .. floor((start+n-1)/L)
    withStart
      .select(col("doc_id"), col("start"), col("n"),
        explode(sequence((col("start") / seqLen).cast("long"),
          ((col("start") + col("n") - 1) / seqLen).cast("long")))
          .as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * seqLen, col("start")).as("abs_from"),
        least((col("seq_id") + 1) * seqLen, col("start") + col("n"))
          .as("abs_to"), col("start"))
      .select(col("doc_id"), col("seq_id"),
        (col("abs_from") - col("seq_id") * seqLen).as("seq_off"),
        (col("abs_from") - col("start")).as("tok_from"),
        (col("abs_to") - col("abs_from")).as("n_tokens"))
  }

  /** Winnowing-style robust fingerprint: min-keep over character k-gram
    * rolling hashes — survives small edits. Small-word modular
    * arithmetic throughout, so an external SQL oracle recomputes it
    * exactly (see the text_fingerprint_robust oracle). */
  def robustFingerprint(text: Column, k: Int = 8, keep: Int = 4): Column =
    graft.functions.RollingFingerprint(
      lower(regexp_replace(trim(text), "\\s+", " ")), k, keep)
}
