package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines, exact through fuzzy.
  *
  * Scale notes (the point of each design):
  *  - exact: one hash-aggregate, fully map-side combinable — the shuffle
  *    carries (hash, min_id, count), not documents;
  *  - MinHash/LSH + SimHash: candidate generation is an equi-join on
  *    band/bucket keys — never an all-pairs product. All-pairs at 100 TB
  *    is impossible; bucket joins shuffle only (key, id, signature);
  *  - shingle-join Jaccard: document-frequency cap drops stop-shingles
  *    (the skew killer) before the join.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------
  /** Exact dedup: one survivor (min of `idCol`) per distinct `key`. */
  def exactSurvivors(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(idCol).as("survivor_id"), count(lit(1)).as("n_dups"))

  /** Rows dropped by exact dedup (anti-join back to survivors). */
  def exactDropped(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val surv = exactSurvivors(df, key, idCol)
      .select(col("survivor_id").as("__sid"))
    df.join(surv, idCol === col("__sid"), "left_anti")
  }

  /** Incremental-ingest exact dedup: a NEW batch dedups within itself
    * AND against the signature table of everything already ingested —
    * the shape a rolling 100 TB corpus takes, where each ingest wave
    * must not re-admit previously-seen documents. `seen` is one
    * `signature` column (the running index a production pipeline keeps
    * partitioned by signature prefix); the anti-join shuffles on the
    * hash key, so both sides co-partition and AQE broadcasts a small
    * wave. Returns the admitted rows; union the admitted signatures
    * back into `seen` for the next wave. */
  def incrementalSurvivors(newDocs: DataFrame, key: Column, idCol: Column,
      seen: DataFrame): DataFrame = {
    val inWave = exactSurvivors(newDocs, key, idCol)
      .select(col("survivor_id").as("__sid"))
    newDocs.join(inWave, idCol === col("__sid"), "left_semi")
      .join(seen.select(col("signature").as("__seen")),
        key === col("__seen"), "left_anti")
  }

  /** The 100 TB shape of the rolling seen-signature index: persist it
    * BUCKETED on the signature (`bucketBy` + in-bucket sort), so each
    * ingest wave's anti-join reads the index pre-partitioned — only the
    * (comparatively tiny) wave shuffles, the multi-TB index never does.
    * A plain parquet index would re-shuffle entirely on every wave. */
  def writeSeenIndex(seen: DataFrame, table: String, buckets: Int = 64): Unit =
    seen.repartition(buckets, col("signature"))
      .write.mode("overwrite")
      .bucketBy(buckets, "signature").sortBy("signature")
      .format("parquet").saveAsTable(table)

  /** Admit a processed wave into the rolling index: APPEND with the
    * same bucket spec — each append adds per-bucket files (no rewrite
    * of the accumulated index; at 100 TB the index only ever grows by
    * the wave's signatures). Readers stay exchange-free on the index
    * side; periodic compaction = writeSeenIndex(spark.table(t), t2).
    * `buckets` must match the original writeSeenIndex call (Spark
    * rejects a mismatch at write time). */
  def appendToSeenIndex(seen: DataFrame, table: String,
      buckets: Int = 64): Unit =
    seen.repartition(buckets, col("signature"))
      .write.mode("append")
      .bucketBy(buckets, "signature").sortBy("signature")
      .format("parquet").saveAsTable(table)

  /** [[incrementalSurvivors]] against a [[writeSeenIndex]]-bucketed
    * table: the anti-join's index side carries NO Exchange in the plan
    * (bucket-pruned scan), asserted by PipelineSpec. After admitting a
    * wave, append its signatures with the same bucket spec. */
  def incrementalSurvivorsBucketed(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, key: Column, idCol: Column,
      table: String): DataFrame =
    incrementalSurvivors(newDocs, key, idCol, spark.table(table))

  // ---- shingles / n-grams ----------------------------------------------------
  /** k-word shingles (distinct), the unit for Jaccard / MinHash.
    * The token array is let-bound via [[TextAnalysis.bindArray]]: naively
    * inlining it into the transform lambda re-runs the tokenizing regex
    * once per shingle (quadratic per document). */
  def wordShingles(text: Column, k: Int): Column =
    TextAnalysis.bindArray(TextAnalysis.tokens(text)) { words =>
      array_distinct(transform(
        sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
        i => array_join(slice(words, i, lit(k)), " ")))
    }

  // ---- MinHash + LSH ----------------------------------------------------------
  /** MinHash signature — single-pass custom expression (one string hash
    * per shingle + numHashes long-mixes; the HOF formulation would walk
    * the array numHashes times). `algo` = "xxh64" (production) or
    * "md5p31" (oracle-replicable, see [[graft.functions.Sketches.minhashSig]]). */
  def minhashSignature(shingles: Column, numHashes: Int,
      algo: String = "xxh64"): Column =
    graft.functions.MinHashSig(shingles, numHashes, algo)

  /** LSH band keys: the signature split into `bands` bands of `rowsPerBand`
    * hashes; each band hashed to one bucket key. Docs sharing any band key
    * become candidates. `hashBandKeys=false` keeps the joined band values
    * verbatim (collision-free, SQL-replicable) instead of hashing them —
    * slightly wider shuffle keys, exact candidate-set parity with an
    * external oracle. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int,
      hashBandKeys: Boolean = true): Column =
    array((0 until bands).map { b =>
      val bandVal = array_join(slice(signature, b * rowsPerBand + 1, rowsPerBand), ",")
      concat_ws("_", lit(b), if (hashBandKeys) hash(bandVal) else bandVal)
    }: _*)

  /** MinHash/LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * One tokenization pass: the (id, shingles, signature) projection is
    * computed once and persisted for the band pass + the two
    * verification joins (the lazy-DAG alternative recomputes the
    * shingling three times; at 100 TB this materialization is the
    * standard "write the signed corpus once" step — swap the persist
    * for a table write there).
    *
    * @param df (id, text)
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, algo: String = "xxh64",
      hashBandKeys: Boolean = true): DataFrame = {
    val rows = numHashes / bands
    if (algo == "xxh64")
      return minhashPairsHashed(df, id, text, shingleK, numHashes, bands,
        rows, threshold, hashBandKeys)
    // the oracle-hash (md5p31) path needs the shingle STRINGS for its
    // signature, but the verification hashes are computed ONCE here
    // (r8: under the old `hashed = docs.select(transform(...))` shape
    // each verification-join alias re-evaluated the per-shingle xxh64
    // over the whole corpus)
    val docs = df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
      .withColumn("shh", transform(col("sh"), s => xxhash64(s)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the band join shuffles only (band, id) — shingle arrays stay out
      // of the wide join; a doc colliding in several bands dedups BEFORE
      // the (expensive) exact-Jaccard verification
      val banded = docs.select(col("id"), explode(lshBandKeys(
        minhashSignature(col("sh"), numHashes, algo), bands, rows,
        hashBandKeys)).as("band"))
      // self-join via alias, renames AFTER the join: both sides are the
      // identical physical plan, so Spark shuffles the banded postings
      // ONCE and reuses the exchange (rename-before-join plans two)
      val cand = banded.as("ba").join(banded.as("bb"),
          col("ba.band") === col("bb.band") && col("ba.id") < col("bb.id"))
        .select(col("ba.id").as("id_a"), col("bb.id").as("id_b"))
        .distinct()
      // exact-Jaccard verification on the persisted xxhash64'd shingle
      // sets: set sizes and intersections are identical modulo
      // 2^-64-scale collisions, and the joins shuffle fixed-width long
      // arrays instead of strings
      val hashed = docs.select(col("id"), col("shh"))
      // both fetches shuffle `hashed` by its id with the identical plan
      // (aliases, not pre-renamed projections) — the second join reuses
      // the first's exchange instead of re-shingling the corpus
      val pairs = cand
        .join(hashed.as("ha"), col("id_a") === col("ha.id"))
        .join(hashed.as("hb"), col("id_b") === col("hb.id"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("ha.shh"), col("hb.shh"))).cast("double") /
            size(array_union(col("ha.shh"), col("hb.shh"))).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      // the near-dup pair set is tiny relative to the corpus: materialize
      // it eagerly (localCheckpoint truncates lineage off the cache) so
      // the signed-corpus cache can be RELEASED before returning — the
      // checkpoint blocks themselves are GC-tracked by the ContextCleaner,
      // unlike Dataset.persist entries which pin the CacheManager forever
      pairs.localCheckpoint(true)
    } finally docs.unpersist(false)
  }

  /** The production (xxh64) minhash pipeline over a PRE-HASHED corpus
    * (r8, from the sf1p stage attribution): the r7 shape persisted
    * `(id, shingle STRINGS)` and paid the per-shingle xxh64 three times
    * — once inside the signature and once per verification-join side
    * (`transform(sh, xxhash64)` re-evaluated under each alias); the
    * StageProbe breakdown at sf1p put ~70% of total task time in those
    * re-hash scans. Here the persisted corpus is `(id, shh:
    * array<bigint>)` — each shingle hashed ONCE (Spark's `xxhash64`,
    * seed 42, IS the signature chain's h0; [[graft.functions
    * .MinHashSigFromLongs]] continues the chain bit-identically), the
    * cache holds fixed-width longs instead of strings (smaller, and
    * the verification joins read it with zero re-computation), and the
    * Jaccard denominator is `|a| + |b| - |a∩b|` over the
    * `array_distinct`'d hash sets — one array_intersect per candidate
    * pair, no array_union materialization. */
  private def minhashPairsHashed(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double, hashBandKeys: Boolean): DataFrame = {
    val docs = df.select(id.as("id"),
      array_distinct(transform(wordShingles(text, shingleK),
        s => xxhash64(s))).as("shh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val banded = docs.select(col("id"), explode(lshBandKeys(
        graft.functions.MinHashSigFromLongs(col("shh"), numHashes), bands,
        rows, hashBandKeys)).as("band"))
      val cand = banded.as("ba").join(banded.as("bb"),
          col("ba.band") === col("bb.band") && col("ba.id") < col("bb.id"))
        .select(col("ba.id").as("id_a"), col("bb.id").as("id_b"))
        .distinct()
      // the intersection size feeds the Jaccard twice (numerator +
      // union-size denominator): bind it through a HOF lambda
      // (bindArray — the staging rule) so it is computed once per pair,
      // not duplicated by CollapseProject into each consumer
      val pairs = cand
        .join(docs.as("ha"), col("id_a") === col("ha.id"))
        .join(docs.as("hb"), col("id_b") === col("hb.id"))
        .select(col("id_a"), col("id_b"),
          TextAnalysis.bindArray(size(array_intersect(
              col("ha.shh"), col("hb.shh"))).cast("double")) { inter =>
            inter / ((size(col("ha.shh")) + size(col("hb.shh")))
              .cast("double") - inter)
          }.as("jaccard"))
        .filter(col("jaccard") >= threshold)
      pairs.localCheckpoint(true)
    } finally docs.unpersist(false)
  }

  // ---- incremental MinHash/LSH (rolling-corpus admission) ---------------------
  /** One signed projection: `(id, shh: array<bigint>, bands:
    * array<string>)`. Each band string embeds its band index
    * ([[lshBandKeys]] prefixes `"<b>_"`), so a single string column is
    * the complete LSH join key. Shingles are hashed ONCE (xxhash64)
    * for the verification sets; the md5p31 oracle algo additionally
    * walks the shingle strings for its replicable signature. */
  private def signedDocs(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int, bands: Int, rows: Int,
      algo: String, hashBandKeys: Boolean): DataFrame =
    if (algo == "xxh64")
      df.select(id.as("id"),
          array_distinct(transform(wordShingles(text, shingleK),
            s => xxhash64(s))).as("shh"))
        .withColumn("bands", lshBandKeys(
          graft.functions.MinHashSigFromLongs(col("shh"), numHashes),
          bands, rows, hashBandKeys))
    else
      df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
        .withColumn("shh", array_distinct(transform(col("sh"), s => xxhash64(s))))
        .withColumn("bands", lshBandKeys(
          minhashSignature(col("sh"), numHashes, algo), bands, rows,
          hashBandKeys))
        .drop("sh")

  /** Exact Jaccard over two xxhash64'd shingle-set columns, intersection
    * bound once through a HOF lambda (the staging rule — see
    * [[minhashPairsHashed]]). */
  private def jaccardOf(a: Column, b: Column): Column =
    TextAnalysis.bindArray(size(array_intersect(a, b)).cast("double")) {
      inter => inter / ((size(a) + size(b)).cast("double") - inter)
    }

  /** Incremental NEAR-DUP admission — the rolling-crawl shape of
    * [[minhashPairs]]: a small NEW wave is admitted only if it is not a
    * verified near-duplicate (exact Jaccard >= threshold on LSH band
    * candidates) of (a) any already-ingested corpus document or (b) a
    * smaller-id document within the same wave (greedy first-wins, the
    * min-id-survivor rule every batch LSH dedup here uses).
    *
    * Scale shape (the reason this is not just minhashPairs on the
    * union): the CORPUS NEVER SHUFFLES. Its postings are a map-only
    * projection probed by the broadcast wave bands; verification pulls
    * corpus shingle sets through a second broadcast semi-join of the
    * (tiny) candidate ids — two map-only passes over the big side,
    * zero wide exchanges. With a persisted index
    * ([[writeMinhashBandIndex]] / [[minhashIncrementalAgainstIndex]])
    * the corpus is not even re-signed: each wave costs one map-only
    * scan of the band postings + one of the doc-hash table.
    *
    * @return the admitted rows of `wave`, unchanged */
  def minhashIncrementalAdmitted(wave: DataFrame, corpus: DataFrame,
      id: Column, text: Column, shingleK: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.7, algo: String = "xxh64",
      hashBandKeys: Boolean = true,
      maxBroadcastWave: Long = 1000000L,
      maxBroadcastCandidates: Long = 8000000L): DataFrame = {
    val rows = numHashes / bands
    val signedCorpus = signedDocs(corpus, id, text, shingleK, numHashes,
      bands, rows, algo, hashBandKeys)
    minhashIncrementalCore(wave, id, text,
      signedCorpus.select(col("id"), explode(col("bands")).as("band")),
      signedCorpus.select(col("id"), col("shh")),
      shingleK, numHashes, bands, rows, threshold, algo, hashBandKeys,
      maxBroadcastWave, maxBroadcastCandidates)
  }

  /** Persist the rolling MinHash band index for
    * [[minhashIncrementalAgainstIndex]]: `<table>_bands` = the exploded
    * (band, id) postings and `<table>_docs` = (id, shh) verification
    * sets, both bucketed so wave probes read them exchange-free and a
    * processed wave APPENDS with the same spec (no index rewrite —
    * mirror of [[appendToSeenIndex]]). */
  def writeMinhashBandIndex(docs: DataFrame, id: Column, text: Column,
      table: String, shingleK: Int = 3, numHashes: Int = 32,
      bands: Int = 8, algo: String = "xxh64", hashBandKeys: Boolean = true,
      buckets: Int = 64, append: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val meta = indexMeta(shingleK, numHashes, bands, algo, hashBandKeys)
    if (append) {
      // an append with different signing parameters would silently
      // produce bands that can never match (or worse, spuriously
      // match) — refuse like Spark refuses a bucket-spec mismatch
      val existing = spark.table(table + "_meta").head.getString(0)
      require(existing == meta,
        s"minhash band index $table was built with [$existing], " +
          s"append uses [$meta]")
    }
    val mode = if (append) "append" else "overwrite"
    val signed = signedDocs(docs, id, text, shingleK, numHashes, bands,
      numHashes / bands, algo, hashBandKeys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      signed.select(col("id"), explode(col("bands")).as("band"))
        .repartition(buckets, col("band"))
        .write.mode(mode).bucketBy(buckets, "band").sortBy("band")
        .format("parquet").saveAsTable(table + "_bands")
      signed.select(col("id"), col("shh"))
        .repartition(buckets, col("id"))
        .write.mode(mode).bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(table + "_docs")
      if (!append) {
        import spark.implicits._
        Seq(meta).toDF("params").write.mode("overwrite")
          .format("parquet").saveAsTable(table + "_meta")
      }
    } finally signed.unpersist(false)
  }

  private def indexMeta(shingleK: Int, numHashes: Int, bands: Int,
      algo: String, hashBandKeys: Boolean): String =
    s"shingleK=$shingleK,numHashes=$numHashes,bands=$bands,algo=$algo," +
      s"hashBandKeys=$hashBandKeys"

  /** [[minhashIncrementalAdmitted]] against a persisted
    * [[writeMinhashBandIndex]] — the per-wave production entry point:
    * the index tables are scanned map-only (broadcast probes, no
    * Exchange on either index side; PipelineSpec gates the plan) and
    * the corpus is never re-signed. */
  def minhashIncrementalAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      wave: DataFrame, id: Column, text: Column, table: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, algo: String = "xxh64",
      hashBandKeys: Boolean = true,
      maxBroadcastWave: Long = 1000000L,
      maxBroadcastCandidates: Long = 8000000L): DataFrame = {
    val meta = indexMeta(shingleK, numHashes, bands, algo, hashBandKeys)
    val existing = spark.table(table + "_meta").head.getString(0)
    require(existing == meta,
      s"minhash band index $table was built with [$existing], " +
        s"probe uses [$meta] — bands would silently never match")
    minhashIncrementalCore(wave, id, text,
      spark.table(table + "_bands").select(col("id"), col("band")),
      spark.table(table + "_docs"),
      shingleK, numHashes, bands, numHashes / bands, threshold, algo,
      hashBandKeys, maxBroadcastWave, maxBroadcastCandidates)
  }

  private def minhashIncrementalCore(wave: DataFrame, id: Column,
      text: Column, corpusBands: DataFrame, corpusDocs: DataFrame,
      shingleK: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double, algo: String, hashBandKeys: Boolean,
      maxBroadcastWave: Long, maxBroadcastCandidates: Long): DataFrame = {
    // the wave is small by contract (one crawl's worth against a 100 TB
    // corpus), so it stays an UNPERSISTED declarative subtree: its few
    // re-evaluations are cheap, the plan remains one Catalyst tree
    // (broadcast/exchange reuse, plan-gateable end to end), and the
    // corpus-side passes below stay map-only.
    //
    // The contract is data-dependent, though — a crawl CAN be big — and
    // force-broadcasting a big wave aborts the whole job on
    // spark.driver.maxResultSize (found by the sf1000p decade cell:
    // a 5M-doc wave's postings + shingle sets exceed the 1 GB driver
    // cap). So the broadcast hints are applied only when the wave is
    // actually small (one BOUNDED probe of the wave subtree, paid on
    // the small side by definition); a big wave degrades to unhinted
    // joins — Catalyst plans shuffles, the job completes, and the
    // map-only index probe returns on the next normal-sized wave. The
    // persisted index keeps its band bucketing either way, so the
    // big-wave SMJ shuffles the WAVE side into place, never rewrites
    // the index.
    //
    // NOTE (ADVICE r14): the probe makes this operator EAGER — calling
    // it runs one Spark job before the returned frame is acted on, and
    // the wave subtree is evaluated once more than in the
    // fully-declarative r13 form. The probe is limit(cap+1), not a
    // full count, so a wave far above the cap pays at most cap+1 rows
    // of probe work, and the extra evaluation is wave-sized by
    // construction.
    val probeLimit = math.min(maxBroadcastWave + 1L, Int.MaxValue.toLong).toInt
    val broadcastWave = wave.limit(probeLimit).count() <= maxBroadcastWave
    def bc(df: DataFrame): DataFrame = if (broadcastWave) broadcast(df) else df
    // the wave SIGNATURES feed five consumers below (postings, the
    // verification broadcast, both within-wave sides, the final
    // anti-join's reject set) — unpersisted, each re-runs the
    // shingle+minhash signing (r15 plan audit: the signing pipeline
    // appeared twice more in the executed plan). In the broadcast
    // regime the signed wave is wave-bounded by the same cap that
    // admits the broadcasts, so cache it: one signing pass, five
    // readers (two long-ish columns + band array, disk-spillable,
    // LRU-evicted after the caller's terminal job). The shuffle
    // fallback regime stays fully declarative — an over-cap wave must
    // not be pinned to the block manager.
    val w0 = signedDocs(wave, id, text, shingleK, numHashes, bands, rows,
      algo, hashBandKeys)
    val w = if (broadcastWave)
      w0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else w0
    val wBands = w.select(col("id").as("wid"), explode(col("bands")).as("wband"))
    // corpus probe: broadcast the wave postings — the big side stays a
    // map-only scan+project (column pruning drops everything but the
    // band keys)
    val candRaw = corpusBands
      .join(bc(wBands), col("band") === col("wband"))
      .select(col("wid"), col("id").as("cid")).distinct()
    // The wave cap bounds only the WAVE-side hinted frames: wBands, w,
    // and `rejected` (whose rows are wave doc ids, so |rejected| <=
    // |wave| by construction). candCorpus is NOT wave-bounded — its
    // cardinality is wave x corpus band COLLISIONS, and a hot band key
    // (short/empty docs all hashing to one band) can blow the driver
    // broadcast even under a tiny wave (ADVICE r14). So its broadcast
    // is gated on its own EXACT count: persist + count materializes
    // the probe join exactly once — the same corpus-bands pass the
    // verification join was going to pay, now read back from cache —
    // and an oversized candidate set degrades to a shuffle join
    // instead of aborting the driver. The cache stays pinned for the
    // caller's terminal job (two long columns, disk-spillable,
    // LRU-evicted afterwards).
    val (candCorpus, broadcastCand) = if (broadcastWave) {
      val c = candRaw.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (c, c.count() <= maxBroadcastCandidates)
    } else (candRaw, false)
    def bcc(df: DataFrame): DataFrame = if (broadcastCand) broadcast(df) else df
    // verification: the candidate pairs broadcast INTO the
    // doc-hash side — one more map-only pass over the corpus pulls
    // exactly the matched docs' shingle sets, and the wave side rides
    // along as a second broadcast
    val rejectedByCorpus = corpusDocs.as("cd")
      .join(bcc(candCorpus), col("cd.id") === col("cid"))
      .join(bc(w.as("wv")), col("wid") === col("wv.id"))
      .filter(jaccardOf(col("cd.shh"), col("wv.shh")) >= threshold)
      .select(col("wid")).distinct()
    // within-wave: banded self-join, reject the larger id of every
    // verified pair (wave is small — these joins broadcast)
    val rejectedInWave = wBands.as("a")
      .join(wBands.as("b"),
        col("a.wband") === col("b.wband") && col("a.wid") < col("b.wid"))
      .select(col("a.wid").as("id_a"), col("b.wid").as("id_b")).distinct()
      .join(w.as("ha"), col("id_a") === col("ha.id"))
      .join(w.as("hb"), col("id_b") === col("hb.id"))
      .filter(jaccardOf(col("ha.shh"), col("hb.shh")) >= threshold)
      .select(col("id_b").as("wid")).distinct()
    val rejected = rejectedByCorpus.union(rejectedInWave).distinct()
    if (broadcastWave) {
      // Both caches above exist only to serve the reject-set computation
      // (five signed-wave readers, two candidate readers). The reject set
      // itself is wave-bounded ids — materialize it NOW via
      // localCheckpoint(true) (checkpoint blocks are GC-tracked by the
      // ContextCleaner, unlike Dataset.persist entries, which pin the
      // CacheManager forever — see minhashPairsHashed above) and release
      // both persists before returning. A long-lived per-wave ingestion
      // loop otherwise accumulates one dead cache entry + lineage per
      // wave on the driver (r15 ADVICE medium / VERDICT item 4).
      val rej =
        try rejected.localCheckpoint(true)
        finally { w.unpersist(false); candCorpus.unpersist(false) }
      wave.join(broadcast(rej), id === col("wid"), "left_anti")
    } else wave.join(rejected, id === col("wid"), "left_anti")
  }

  // ---- SimHash -----------------------------------------------------------------
  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes —
    * single-pass custom expression. `algo` = "xxh64" (production) or
    * "md5" (oracle-replicable, see [[graft.functions.Sketches.md5Lower64]]). */
  def simhash(text: Column, algo: String = "xxh64"): Column =
    graft.functions.SimHash64(TextAnalysis.tokens(text), algo)

  /** SimHash near-dup pairs with GUARANTEED recall: the signature is
    * banded into `maxHamming + 1` chunks, so any pair within
    * `maxHamming` differing bits has at least one chunk with zero
    * differences (pigeonhole: maxHamming differences cannot touch all
    * maxHamming+1 chunks) and becomes a candidate. Candidates are then
    * verified with exact hamming distance — the output is therefore
    * EXACTLY the brute-force all-pairs result, computed with an
    * equi-join instead of a cross product.
    *
    * RADIUS / KEY-SPACE TRADEOFF: chunk width is 64/(maxHamming+1)
    * bits, so the candidate join's key space is (maxHamming+1) *
    * 2^width values. At the default r=3 chunks are 16 bits (65k values
    * per chunk — the classic 64-bit simhash operating point; bucket
    * sizes stay ~N/65k). At r=8 chunks shrink to ~7 bits (≤256 values):
    * every bucket holds ~N/256 docs and in-bucket pairing degenerates
    * toward quadratic as the corpus grows. For radii above 3 use
    * [[simhashPairs128]] — same pigeonhole guarantee over a 128-bit
    * signature, whose 9 chunks at r=8 are ~14 bits wide. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, algo: String = "xxh64"): DataFrame =
    simhashPairsFromSigs(
      df.select(id.as("id"), simhash(text, algo).as("sig")), maxHamming)

  /** The banded core of [[simhashPairs]] over a pre-computed
    * (id, sig) frame — split out so [[simhashClusterEdges]] can run
    * the same join over exact-duplicate-collapsed signatures. */
  private def simhashPairsFromSigs(withSig: DataFrame,
      maxHamming: Int): DataFrame = {
    val numChunks = math.min(64, maxHamming + 1)
    val baseW = 64 / numChunks
    val rem = 64 % numChunks
    // chunk value of `sig` for chunk index c; chunk widths <= 58 bits
    // whenever numChunks >= 2, so (index, value) packs into ONE long join
    // key — fixed-width keys keep the candidate exchange small and the
    // hash-join probe a single comparison
    def chunkVal(sig: Column, c: Int): Column = {
      val start = c * baseW + math.min(c, rem)
      val width = baseW + (if (c < rem) 1 else 0)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftrightunsigned(sig, start).bitwiseAND(lit(mask))
    }
    def chunkKey(sig: Column, c: Int): Column =
      if (numChunks == 1) chunkVal(sig, c)
      else lit(c.toLong << 58).bitwiseOR(chunkVal(sig, c))
    // no separate chunk-index column: the index rides the key's high
    // bits (extracted below), so BOTH join sides project exactly
    // (id, sig, chunk) — if one side carried an extra column, column
    // pruning would make the plans differ and kill exchange reuse
    val banded = withSig.select(col("id"), col("sig"),
      explode(array((0 until numChunks).map(chunkKey(col("sig"), _)): _*))
        .as("chunk"))
    // alias self-join (renames AFTER): both sides are the identical plan,
    // so the banded postings shuffle ONCE and the probe reuses the exchange
    val j = banded.as("sa").join(banded.as("sb"),
        col("sa.chunk") === col("sb.chunk") && col("sa.id") < col("sb.id"))
    val ci = if (numChunks == 1) lit(0)
      else shiftrightunsigned(col("sa.chunk"), 58).cast("int")
    j
      // first-match dedup: emit a pair only from its FIRST agreeing chunk
      // (all earlier chunks must differ) — a pure filter over columns we
      // already have, replacing a distinct() that would shuffle the whole
      // candidate set a second time
      .filter((0 until numChunks).map { c =>
        ci > c && chunkVal(col("sa.sig"), c) === chunkVal(col("sb.sig"), c)
      }.reduceOption(_ || _).map(!_).getOrElse(lit(true)))
      .select(col("sa.id").as("id_a"), col("sb.id").as("id_b"),
        bit_count(col("sa.sig").bitwiseXOR(col("sb.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** 128-bit SimHash over tokens as [lo, hi] (see
    * [[graft.functions.Sketches.simhash128]]). `algo` = "xxh64"
    * (production) or "md5" (oracle-replicable: lo/hi bit-identical to
    * DuckDB `md5_number_lower`/`md5_number_upper`). */
  def simhash128(text: Column, algo: String = "xxh64"): Column =
    graft.functions.SimHash128(TextAnalysis.tokens(text), algo)

  /** [[simhashPairs]] over a 128-bit signature — the scale-safe form for
    * radii above 3: the maxHamming+1 pigeonhole chunks are twice as wide
    * (r=8 → 9 chunks × ~14 bits → 16k-value chunks instead of the
    * 64-bit form's ≤256), so bucket sizes stay ~N/16k and the candidate
    * equi-join never degenerates toward an in-bucket cross product.
    * Output is provably EQUAL to brute force (verified hamming ≤ r). */
  def simhashPairs128(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 8, algo: String = "xxh64"): DataFrame = {
    require(maxHamming >= 2 && maxHamming <= 63,
      s"simhashPairs128: maxHamming $maxHamming outside [2, 63]")
    val numChunks = maxHamming + 1
    val baseW = 128 / numChunks
    val rem = 128 % numChunks
    // chunk c covers bits [start, start+width) of the 128-bit signature
    // held as (lo = bits 0..63, hi = bits 64..127); width <= 42 for
    // numChunks >= 3, so (index << 58) | value packs into ONE long key
    def chunkVal(lo: Column, hi: Column, c: Int): Column = {
      val start = c * baseW + math.min(c, rem)
      val width = baseW + (if (c < rem) 1 else 0)
      val mask = (1L << width) - 1
      if (start + width <= 64)
        shiftrightunsigned(lo, start).bitwiseAND(lit(mask))
      else if (start >= 64)
        shiftrightunsigned(hi, start - 64).bitwiseAND(lit(mask))
      else {
        // chunk spans the lo/hi boundary
        val loBits = 64 - start
        shiftrightunsigned(lo, start).bitwiseOR(
          shiftleft(hi.bitwiseAND(lit((1L << (width - loBits)) - 1)), loBits))
      }
    }
    def chunkKey(lo: Column, hi: Column, c: Int): Column =
      lit(c.toLong << 58).bitwiseOR(chunkVal(lo, hi, c))
    val withSig = df.select(id.as("id"), simhash128(text, algo).as("sig"))
      .select(col("id"), col("sig").getItem(0).as("lo"), col("sig").getItem(1).as("hi"))
    // chunk index extracted from the key's high bits — both sides
    // project exactly (id, lo, hi, chunk) so the exchange is reused
    val banded = withSig.select(col("id"), col("lo"), col("hi"),
      explode(array((0 until numChunks).map(c =>
        chunkKey(col("lo"), col("hi"), c)): _*)).as("chunk"))
    // alias self-join for exchange reuse, as in simhashPairs
    banded.as("sa").join(banded.as("sb"),
        col("sa.chunk") === col("sb.chunk") && col("sa.id") < col("sb.id"))
      // first-match dedup, as in simhashPairs: emit only from the FIRST
      // agreeing chunk — a pure filter, no distinct() shuffle
      .filter((0 until numChunks).map { c =>
        shiftrightunsigned(col("sa.chunk"), 58).cast("int") > c &&
          chunkVal(col("sa.lo"), col("sa.hi"), c) ===
            chunkVal(col("sb.lo"), col("sb.hi"), c)
      }.reduce(_ || _).unary_!)
      .select(col("sa.id").as("id_a"), col("sb.id").as("id_b"),
        (bit_count(col("sa.lo").bitwiseXOR(col("sb.lo"))) +
          bit_count(col("sa.hi").bitwiseXOR(col("sb.hi")))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact-fingerprint collapse — the mega-duplicate-cluster guard for
    * every near-dup pair family (r11 verdict #1). A cluster of c
    * identical fingerprints pairs c·(c−1)/2 times through ANY banded
    * join — quadratic in duplicate multiplicity — and real crawls have
    * exactly such clusters (boilerplate pages, re-posts, mirrored
    * files). Collapsing identical fingerprint tuples to one canonical
    * row (min id) BEFORE banding makes the pair stage O(distinct
    * fingerprints); members rejoin the cluster graph through LINEAR
    * member→canonical edges. Connectivity is unchanged: identical
    * fingerprints are near-dups at distance 0 by definition, so every
    * member belongs to its canonical's component, and any cross-hash
    * edge depends only on the fingerprint tuple — the min-id component
    * labels downstream CC computes are bit-identical to the full
    * pair-graph labels.
    *
    * Both stages are linear and skew-safe: the groupBy collapses each
    * mega-key map-side (partial agg), and the member join probes a
    * build side holding ONE row per key, the shape AQE skew-split
    * handles.
    *
    * @param keyCols the FULL fingerprint tuple — every column the pair
    *        predicate reads (e.g. video = hash + tsig + n_frames)
    * @return (reps, memberEdges): `reps` = (idCol, keyCols*) one row
    *         per distinct tuple with idCol = min id; `memberEdges` =
    *         (id_a = canonical, id_b = member) for non-canonical
    *         members */
  def collapseExactFingerprints(df: DataFrame, idCol: String,
      keyCols: Seq[String]): (DataFrame, DataFrame) = {
    val slim = df.select((col(idCol) +: keyCols.map(col)): _*)
    val reps = slim.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select((col(idCol) +: keyCols.map(col)): _*)
    val memberEdges = slim
      .join(reps.select((col(idCol).as("__canon") +: keyCols.map(col)): _*),
        keyCols)
      .where(col(idCol) =!= col("__canon"))
      .select(col("__canon").as("id_a"), col(idCol).as("id_b"))
    (reps, memberEdges)
  }

  /** Cluster EDGES for SimHash near-dup CC — [[simhashPairs]] with the
    * exact-duplicate collapse: banded pairs over DISTINCT signatures
    * plus member→canonical edges, so a c-fold exact-duplicate cluster
    * costs c−1 edges instead of c·(c−1)/2 pairs. Feeds
    * [[dedupClusters]]; components and min-id labels are provably
    * identical to clustering the full [[simhashPairs]] output. */
  def simhashClusterEdges(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, algo: String = "xxh64"): DataFrame = {
    val withSig = df.select(id.as("id"), simhash(text, algo).as("sig"))
    val (reps, memberEdges) =
      collapseExactFingerprints(withSig, "id", Seq("sig"))
    simhashPairsFromSigs(reps, maxHamming)
      .select(col("id_a"), col("id_b"))
      .union(memberEdges)
  }

  // ---- shingle-join Jaccard -------------------------------------------------------
  /** Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle,
    * computed with a shingle equi-join (no all-pairs). `maxDocFreq` drops
    * shingles present in more than that many docs — the skew cap. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, threshold: Double = 0.2,
      maxDocFreq: Long = 1000): DataFrame = {
    val docs = df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
    // join/shuffle on the 64-bit shingle hash, not the string: fixed-width
    // keys shrink the exchange and compare in one instruction. A collision
    // would need ~2^32 distinct shingles per join key-space to matter
    // (birthday bound) and only perturbs `common` by 1 — the DuckDB oracle
    // cross-checks exact string semantics at test scale.
    // postings carry (id, shingleHash) ONLY — set sizes stay out of the
    // widest exchange and rejoin after the pair aggregation
    // the explicit repartition on the join key is THE load-bearing node:
    // it pins one hashpartitioning(shingle) Exchange that every consumer
    // below — the DF-cap aggregation, BOTH self-join sides, and the set
    // sizes — reuses as the same (AQE) query stage. Without it the
    // planner is free to broadcast one self-join side, and a
    // BroadcastExchange build side shares nothing: the scan + shingling
    // (the dominant per-row cost) re-runs for every consumer — measured
    // 2.3× slower at sf0.1, and at 100 TB it would re-shingle the
    // corpus three times. (r8 note: a persist()+localCheckpoint variant
    // was measured as an alternative — it guarantees the single
    // shingle pass but pins 32 cache partitions through the self-join,
    // defeating AQE partition coalescing: 2.1 s → 7.8 s on the
    // single-file layout for a 4.6 s → 4.5 s sf1p wash. The lazy
    // exchange-reuse shape below keeps both layouts fast; the
    // remaining double-materialization risk is the canonical-form
    // mismatch fixed by the count(col) forms below.)
    val posting = docs.select(col("id"), explode(col("sh")).as("sh_str"))
      .select(col("id"), xxhash64(col("sh_str")).as("shingle"))
      .repartition(col("shingle"))
    // The cap must not shuffle the skew it removes: the postings are
    // already partitioned by shingle, so groupBy(shingle).count runs
    // with NO further exchange, and a stop-shingle's count lives on one
    // task either way. The over-cap set is tiny by construction (only
    // stop-shingles exceed maxDocFreq) -> broadcast anti-join drops
    // their postings without re-shuffling the posting list. (A
    // Window.partitionBy(shingle) count would sort; the agg hashes.)
    // count(id), NOT count(1): counting a literal lets Catalyst prune
    // `id` out of this subtree's exchange ([shingle] vs the pinned
    // [id, shingle]) — canonically different, so the stage-level reuse
    // breaks and the corpus is scanned + re-shingled a second time just
    // for the DF-cap. `id` is a non-null key, so the count is identical.
    val hot = posting.groupBy(col("shingle")).agg(count(col("id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("shingle"))
    val capped = posting.join(broadcast(hot), Seq("shingle"), "left_anti")
    // alias self-join (renames AFTER the join): both sides are the same
    // physical plan over the same pinned exchange, so the capped
    // postings shuffle ONCE and the probe side reuses the stage instead
    // of re-scanning + re-shingling.
    // The pair aggregation keys on the two ids ONLY — set sizes rejoin
    // AFTER the count, so the candidate exchange carries 2 longs per
    // occurrence instead of 4 and the (much smaller) post-agg pair set
    // pays the size lookups
    val common = capped.as("pa").join(capped.as("pb"),
        col("pa.shingle") === col("pb.shingle") && col("pa.id") < col("pb.id"))
      .groupBy(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    // set sizes fall out of the SAME postings (shingles are distinct per
    // doc), off the pinned exchange — NOT a second corpus scan. The
    // (id, count) partials are two longs a row and can never exceed the
    // posting count, so the extra shuffle is strictly cheaper than
    // re-shingling at any scale. count(shingle) keeps this subtree's
    // exchange at the pinned [id, shingle] canonical form (see `hot`).
    val sizes = posting.groupBy(col("id")).agg(count(col("shingle")).as("n"))
    common
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Leakage-safe train/val/test split (r8): the split is a pure
    * function of the near-dup CLUSTER label, not the document id, so
    * no near-duplicate pair can straddle a split boundary — the
    * eval-leakage failure mode of per-document random splits (a test
    * doc whose near-twin sits in train). Clusters come from
    * [[dedupClusters]] over the caller's near-dup pairs (min-id
    * labels); documents in no pair label themselves. Assignment
    * compares lowercase-hex `md5(label)` against EXACT cumulative
    * thresholds — integer weights scaled to 2^128 and rendered as
    * 32-char hex, so an external engine replays the split with plain
    * string comparison and no floating point anywhere. One label
    * join + a narrow projection over the corpus; the cluster pass is
    * the bounded Shiloach–Vishkin loop dedupClusters already runs.
    *
    * @param weights (name, integer weight) in declaration order
    * @return (doc_id, cluster, split) */
  def leakageSafeSplit(docs: DataFrame, id: Column, pairs: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "leakageSafeSplit: weights must be positive")
    val total = weights.map(_._2).sum
    var acc = 0
    val marks = weights.dropRight(1).map { case (name, w) =>
      acc += w
      val t = (BigInt(1) << 128) * acc / total
      val hex = t.toString(16)
      (name, ("0" * (32 - hex.length)) + hex)
    }
    val clusters = dedupClusters(pairs).withColumnRenamed("id", "doc_id")
    val labeled = docs.select(id.as("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .drop("component")
    val h = md5(col("cluster").cast("string"))
    val splitCol = marks.reverse
      .foldLeft(lit(weights.last._1): Column) {
        case (els, (name, hex)) => when(h < lit(hex), lit(name)).otherwise(els)
      }
    labeled.withColumn("split", splitCol)
  }

  // ---- test-set decontamination --------------------------------------------------
  /** Benchmark decontamination: training docs sharing any word `k`-gram
    * with the benchmark corpus, with the count of DISTINCT overlapping
    * k-grams (the standard "13-gram overlap" eval-leakage check).
    *
    * Shape at 100 TB: both sides explode to (id, gramHash) postings on
    * fixed-width xxhash64 keys; the benchmark side is k-gram-distinct
    * and typically small enough to BROADCAST (eval suites are MBs, the
    * training corpus is the big side), so the probe is a broadcast
    * semi-join + partial-agg count — no shuffle of the corpus postings.
    * Collisions at 2^-64 can only merge two distinct grams' counts,
    * never invent a match pair... a gram matches only if some benchmark
    * gram hashed identically.
    *
    * @return (doc_id, n_contaminated) — docs with >= 1 overlapping gram
    */
  def contaminationFlags(docs: DataFrame, docId: Column, docText: Column,
      bench: DataFrame, benchText: Column, k: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    val bGrams = bench.select(explode(wordShingles(benchText, k)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    val dGrams = docs
      .select(docId.as("doc_id"), explode(wordShingles(docText, k)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .distinct() // count DISTINCT overlapping grams per doc
    dGrams
      .join(if (broadcastBench) broadcast(bGrams) else bGrams, Seq("gh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
  }

  /** Per-document contamination RATIO against a held-out set — the
    * threshold-drop decontamination shape (report the fraction of a
    * document's distinct k-grams that appear in the benchmark, drop
    * when it crosses `threshold`). Same plan skeleton as
    * [[contaminationFlags]] but the bench side joins LEFT with a
    * membership marker so one aggregation yields both the total and
    * the contaminated gram counts — no second shingling pass. Docs
    * never shuffle beyond the per-doc distinct; the bench gram set
    * broadcasts once. */
  def contaminationFraction(docs: DataFrame, docId: Column, docText: Column,
      bench: DataFrame, benchText: Column, k: Int = 13,
      threshold: Double = 0.5, broadcastBench: Boolean = true): DataFrame = {
    val bGrams = bench.select(explode(wordShingles(benchText, k)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .withColumn("__hit", lit(1))
    val dGrams = docs
      .select(docId.as("doc_id"), explode(wordShingles(docText, k)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .distinct()
    dGrams
      .join(if (broadcastBench) broadcast(bGrams) else bGrams, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams"))
      .withColumn("dropped", col("contamination") >= threshold)
  }

  /** [[contaminationFlags]] with a Bloom prefilter — the 100 TB shape.
    * When the benchmark gram set outgrows a comfortable broadcast
    * (hundreds of millions of held-out grams ≈ GBs as an exact hash
    * set), a Bloom filter at `fpp` costs ~10 bits/entry, ships to every
    * executor once, and discards the overwhelming non-contaminated
    * majority of corpus grams BEFORE the distinct + join shuffles —
    * only the (tiny) surviving fraction pays the exact semi-join, which
    * removes the Bloom's false positives, so the result is IDENTICAL to
    * the exact operator (false negatives are impossible). Costs one
    * extra pass over the benchmark side to size + build the filter
    * (`df.stat.bloomFilter` — a distributed treeAggregate). */
  def contaminationFlagsBloom(docs: DataFrame, docId: Column, docText: Column,
      bench: DataFrame, benchText: Column, k: Int = 13,
      fpp: Double = 0.01): DataFrame = {
    // persisted: the bench grams feed the count, the filter build, and
    // the final exact join — one shingling pass, three consumers (the
    // caller unpersists via spark.catalog.clearCache() / session end)
    val bGrams = bench.select(explode(wordShingles(benchText, k)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = math.max(bGrams.count(), 1L)
    val bloom = bGrams.stat.bloomFilter("gh", n, fpp)
    val dGrams = docs
      .select(docId.as("doc_id"), explode(wordShingles(docText, k)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .where(graft.functions.BloomContains(col("gh"), bloom))
      .distinct()
    // exact verify on the survivors only — NOT broadcast: this is the
    // regime where the bench side was too big to broadcast
    dGrams.join(bGrams.hint("shuffle_hash"), Seq("gh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
  }

  /** Semantic decontamination (r9): flag training vectors whose
    * embedding cosine to ANY benchmark vector clears `threshold` — the
    * n-gram decontamination family's embedding-space sibling; it
    * catches PARAPHRASED eval leakage exact grams miss (the reason
    * modern data recipes run both). The benchmark side is small by
    * nature (eval sets are thousands of rows, the corpus is billions),
    * so it collects to the driver under the same bounded contract as
    * the centroid ops and the corpus pays ONE narrow compiled argmax
    * pass ([[graft.functions.NearestCentroidCos]]) — no join, no
    * shuffle, the decision rides the scan. Ties on cos go to the
    * larger bench id (the argmax comparator — oracle-replayed).
    *
    * @return flagged rows only: (doc_id, bench_id, cos) */
  /** EXACTNESS at the crossover: up to `exprMax` benchmark vectors the
    * result is the exact argmax; past it the tree path at the default
    * `nProbe` is the standard IVF approximation (flagged docs a subset,
    * cosines exact — the PipelineSpec gates). A caller that needs the
    * exact result past exprMax passes `nProbe = Int.MaxValue` (full
    * probe — bit-identical to the expression path, also gated) and pays
    * the full per-row bench scan; `maxBench` remains the hard cap on
    * the EXPRESSION path only (it fires when a caller forces the
    * expression side with exprMax >= maxBench). */
  def semanticContamination(corpus: DataFrame, id: Column, vec: Column,
      bench: DataFrame, benchId: Column, benchVec: Column,
      threshold: Double, maxBench: Int = 1 << 20,
      exprMax: Int = 65536, nProbe: Int = 8): DataFrame = {
    val bFrame = bench.select(benchId.as("bid"), benchVec.as("bv"))
    val head = bFrame.limit(math.min(exprMax, maxBench) + 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(head.nonEmpty, "semanticContamination: empty benchmark side")
    require(head.length <= maxBench,
      s"semanticContamination: benchmark vectors exceed the " +
        s"driver-bounded contract ($maxBench) — shard the benchmark or raise maxBench")
    if (head.length <= exprMax) {
      corpus
        .select(id.as("doc_id"),
          graft.functions.NearestCentroidCos(vec, head).as("best"))
        .select(col("doc_id"), col("best.cid").as("bench_id"),
          col("best.cos").as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      // ADVICE r10: callers between exprMax and maxBench previously got
      // the exact expression path — make the exactness change LOUD so a
      // decontamination gate relying on the exact contract notices.
      if (nProbe != Int.MaxValue)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"semanticContamination: benchmark has ${head.length - 1}+ vectors " +
            s"(> exprMax=$exprMax) — taking the APPROXIMATE IVF tree path at " +
            s"nProbe=$nProbe (flagged docs a subset of the exact result). " +
            s"Pass nProbe=Int.MaxValue for the exact full-probe result, or " +
            s"raise exprMax to force the exact expression path.")
      semanticContaminationTree(corpus, id, vec, bFrame, threshold, nProbe)
    }
  }

  /** The LARGE-benchmark path (r9 verdict #7): past `exprMax` vectors
    * the NearestCentroidCos expression would serialize the whole
    * benchmark into every task (256 MB at the 1M maxBench bound), so
    * the benchmark becomes a [[Similarity.buildCellTree]] coarse
    * structure instead — only its k^⅔ mid level is driver-held; the
    * full benchmark stays a DISTRIBUTED frame keyed by its best mid
    * cell. Corpus rows tree-probe their `nProbe` nearest mid cells (one
    * compiled pass) and join the benchmark rows of those cells, with
    * vectors + norms riding the keyed exchange and candidates streaming
    * through one compiled DotF each (the embeddingPairs
    * verify-in-the-join shape — nothing candidate-sized materializes).
    * With nProbe ≥ both level widths every benchmark vector is a
    * candidate and the result is BIT-IDENTICAL to the expression path
    * (same comparator: max(struct(cos, bid)), ties → larger bid —
    * PipelineSpec gates the equality); at production nProbe it is the
    * standard multi-level IVF approximation. */
  private def semanticContaminationTree(corpus: DataFrame, id: Column,
      vec: Column, bFrame: DataFrame, threshold: Double,
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val benchN = bFrame.count()
    val ct = Similarity.buildCellTree(
      bFrame.select(col("bid").as("vec_id"), col("bv").as("v")), benchN)
    val fine = bFrame
      .withColumn("cell", element_at(ct.probe(col("bv"), nProbe, 1), 1))
      .withColumn("bn", sqrt(graft.functions.DotF(col("bv"), col("bv"))))
    // same broadcast rule as the tree assignment: an eval-set-sized
    // benchmark ships whole; past ~100k rows the shuffle join on the
    // cell key is the correct distributed plan
    val fineSide = if (benchN <= 100000) broadcast(fine) else fine
    corpus
      .select(id.as("doc_id"), vec.as("v"))
      .withColumn("vn", sqrt(graft.functions.DotF(col("v"), col("v"))))
      .withColumn("cell", explode(ct.probe(col("v"), nProbe, nProbe)))
      .join(fineSide, "cell")
      .select(col("doc_id"),
        struct((graft.functions.DotF(col("v"), col("bv")) /
            (col("vn") * col("bn"))).as("cos"),
          col("bid").as("bench_id")).as("cand"))
      .groupBy(col("doc_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("doc_id"), col("best.bench_id").as("bench_id"),
        col("best.cos").as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---- cross-document duplicated spans -----------------------------------------
  /** Span-level exact duplication: for each document, how many of its
    * k-token windows (ALL positions, not distinct — a window repeated
    * inside one doc still counts each occurrence) also occur in some
    * OTHER document. The window-level signal behind "train-data
    * duplicated substring removal": a long boilerplate block shared by
    * thousands of pages lights up every window it spans.
    *
    * Shape at 100 TB: windows explode to (doc_id, gramHash) postings on
    * fixed-width xxhash64 keys; cross-doc grams are found with a
    * min(doc)≠max(doc) aggregate — TWO longs of agg buffer per gram,
    * fully map-side-combinable, instead of a countDistinct sketch — and
    * the postings probe that set with a semi-join on the same key. Both
    * shuffles carry only (long, long) rows. Collisions at 2^-64 can
    * only over-count a window as duplicated, never lose one.
    *
    * @return (doc_id, n_dup_spans) for docs with >= 1 duplicated window
    */
  def duplicatedSpans(df: DataFrame, id: Column, text: Column,
      k: Int = 8): DataFrame = {
    // the posting projection feeds BOTH the cross-doc aggregate and the
    // probe with different shuffle payloads (no exchange reuse applies),
    // so persist it — tokenize+ngram+hash the corpus ONCE, not twice
    // (at 100 TB this is the "write the postings table once" step, as
    // in minhashPairs); localCheckpoint truncates lineage off the cache
    // so it can be released before returning
    val grams = df.select(id.as("doc_id"),
        explode(TextAnalysis.bindArray(
          filter(TextAnalysis.tokens(text), t => t =!= "")) { toks =>
          TextAnalysis.wordNgrams(toks, k)
        }).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val crossDoc = grams.groupBy(col("gh"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx"))
        .select(col("gh"))
      grams.join(crossDoc, Seq("gh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
        .localCheckpoint(true)
    } finally grams.unpersist(false)
  }

  /** Corpus-wide duplicate-LINE removal — the C4-style cleanup step
    * ("discard every repeated line after its first occurrence across
    * the whole corpus"): boilerplate lines (nav bars, cookie banners,
    * license headers) repeat across millions of pages and survive
    * document-level dedup. The canonical keeper of each distinct line
    * is its least (doc_id, line_no) occurrence; every other occurrence
    * drops; documents rebuild from surviving lines in original order.
    * Lines shorter than `minLineChars` are exempt (always kept) so
    * blank separators don't collapse corpus-wide.
    *
    * Shuffle profile at 100 TB: (1) groupBy(line) with a map-side
    * combinable `min(struct)` — duplicate volume collapses before the
    * exchange; (2) a left-semi join on the (doc_id, line_no) pair —
    * the keeper table has one short row per DISTINCT line, no text
    * payload travels twice; (3) the per-doc rebuild groupBy, bounded
    * by document line counts. No windows over unbounded groups, no
    * driver collect.
    *
    * @return (doc_id, text) — docs whose every line dropped are absent
    */
  def dedupLines(df: DataFrame, id: Column, text: Column,
      minLineChars: Int = 1): DataFrame = {
    val lines = df.select(id.as("doc_id"),
        posexplode(split(text, "\n")).as(Seq("line_no", "line")))
    val candidates = lines.filter(length(col("line")) >= minLineChars)
    val keepPos = candidates.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_no"))).as("k"))
      .select(col("k.doc_id"), col("k.line_no"))
    val kept = candidates
      .join(keepPos, Seq("doc_id", "line_no"), "left_semi")
      .unionByName(lines.filter(length(col("line")) < minLineChars))
    kept.groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("line_no"), col("line")))),
        e => e.getField("line")), "\n").as("text"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet-style paragraph
    * filter): a line appearing in MORE than `maxDocFreq` distinct
    * documents is dropped from EVERY document (headers, footers,
    * cookie banners, navigation chrome), and documents rebuild from
    * the surviving lines in order. Differs from [[dedupLines]] (which
    * keeps the first occurrence): boilerplate keeps none.
    *
    * Plan: per-(line, doc) collapse then a partial-agg count on line —
    * the standard exact doc-frequency shape; the banned set (lines
    * over threshold) is tiny by construction and broadcasts into a
    * left-anti join, so the corpus shuffles only for the distinct and
    * the final per-doc rebuild. */
  def removeBoilerplate(df: DataFrame, id: Column, text: Column,
      maxDocFreq: Long = 2, minLineChars: Int = 1): DataFrame = {
    val lines = df.select(id.as("doc_id"),
        posexplode(split(text, "\n")).as(Seq("line_no", "line")))
    val candidates = lines.filter(length(col("line")) >= minLineChars)
    val docFreq = candidates.groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val banned = docFreq.filter(col("df") > maxDocFreq).select("line")
    val kept = candidates.join(broadcast(banned), Seq("line"), "left_anti")
      .unionByName(lines.filter(length(col("line")) < minLineChars))
    kept.groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("line_no"), col("line")))),
        e => e.getField("line")), "\n").as("text"))
  }

  // ---- near-dup clustering -----------------------------------------------------
  /** Connected components over near-dup pairs — the step between
    * pairwise similarity output and actually DROPPING documents: docs
    * linked through chains of pairs form one cluster with one survivor.
    *
    * Distributed path: Shiloach–Vishkin-style hook + shortcut. Each
    * round (a) hooks every vertex to the min label among its neighbors
    * (hash-min), then (b) pointer-jumps: label(v) ← label(label(v)).
    * Labels are monotone non-increasing and always ids inside the same
    * component, so at the no-change fixpoint the label is constant per
    * component and equals the component's min id. The shortcut step
    * halves label-tree depth each round, so convergence is
    * O(log diameter) — a 2^50-hop chain converges inside the default
    * maxIters = 50, unlike plain one-hop hash-min which needs
    * O(diameter) rounds and silently under-merges chain-shaped clusters
    * (serially edited boilerplate) at corpus scale. If the round budget
    * is ever exhausted anyway, this FAILS LOUDLY (`require`) rather
    * than return wrong components. Every round localCheckpoints the
    * label table: iterative self-joins otherwise stack lineage into an
    * exponentially-replanning DAG — at cluster scale swap for
    * `checkpoint` on a reliable store.
    *
    * Small graphs short-circuit to a driver-side union-find: the
    * verified pair set is orders of magnitude smaller than the corpus
    * (it IS the dedup signal, not the data), so below `maxLocalEdges`
    * (default 10M ≈ 160 MB) a path-compressed union-find beats rounds
    * of near-empty distributed jobs; anything larger takes the
    * propagation path. This is the one deliberately-bounded collect in
    * the pipeline ops, same contract as the IVF centroid collect.
    *
    * @param pairs (id_a, id_b) near-dup pairs (any direction)
    * @return (id, component) — component = min doc id in the cluster,
    *         i.e. the exact-dedup survivor convention
    */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 50,
      maxLocalEdges: Long = 10000000L): DataFrame = {
    val spark = pairs.sparkSession
    // undirected: propagate both ways each round
    val edgesAll = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // size the per-round partitioning to the PAIR GRAPH, not the
      // corpus: near-dup edges are orders of magnitude fewer than
      // documents, and every round launches join+agg jobs — a small
      // graph in one partition skips rounds of near-empty shuffles, a
      // large one gets ~1M edges per partition (capped at 4× the
      // cluster parallelism)
      val eCount = edgesAll.count()
      if (eCount <= maxLocalEdges) return localUnionFind(spark, edgesAll)
      val parts = math.max(1L, math.min(eCount / 1000000L + 1,
        spark.sparkContext.defaultParallelism * 4L)).toInt
      val edges = edgesAll.coalesce(parts)
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        // hook: pull the min label across neighbors (hash-min step)
        val minNbr = edges.join(labels, edges("src") === labels("id"))
          .groupBy(col("dst")).agg(min("label").as("nbr"))
        val hooked = labels.join(minNbr, labels("id") === minNbr("dst"), "left")
          .select(labels("id"), col("label").as("prev"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        // shortcut: label(v) ← label(label(v)). label values are vertex
        // ids of the same component, so the parent lookup is a self-join
        // on the hooked table; labels only decrease, making the change
        // flag a simple end-vs-start compare riding the same
        // materialization as the round's checkpoint.
        val parents = hooked.select(col("id").as("pid"), col("label").as("plabel"))
        val next = hooked.join(parents, hooked("label") === parents("pid"), "left")
          .select(hooked("id"),
            coalesce(col("plabel"), hooked("label")).as("label"),
            (coalesce(col("plabel"), hooked("label")) < col("prev")).as("chg"))
          .localCheckpoint(true)
        converged = next.filter(col("chg")).limit(1).count() == 0
        labels = next.drop("chg")
        it += 1
      }
      // never return silently-unmerged components: under-merged labels
      // mean duplicates survive dedup with no signal at all
      require(converged,
        s"dedupClusters: hook+shortcut did not converge after $maxIters rounds")
      labels.select(col("id"), col("label").as("component"))
    } finally edgesAll.unpersist(false)
  }

  /** Driver-side union-find with path compression + union-by-min for
    * pair graphs under the [[dedupClusters]] threshold. */
  private def localUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame): DataFrame = {
    import scala.collection.mutable
    val parent = mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      // path compression
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    val ids = mutable.ArrayBuffer.empty[Long]
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (!parent.contains(a)) { parent(a) = a; ids += a }
        if (!parent.contains(b)) { parent(b) = b; ids += b }
        val (ra, rb) = (find(a), find(b))
        // union-by-min keeps the root the smallest id — the component
        // label IS the root, no second pass needed
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    import spark.implicits._
    ids.toSeq.map(id => (id, find(id))).toDF("id", "component")
  }

  /** One row per cluster: survivor (min id), member count, members. */
  def clusterSurvivors(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("component").as("survivor_id"))
      .agg(count(lit(1)).as("n_members"),
        sort_array(collect_list(col("id"))).as("members"))

  /** Quality-aware survivor selection — the last step of a dedup
    * pipeline: within each near-dup cluster keep the BEST-scoring
    * member (longest / highest-quality / most recent — any score),
    * ties broken toward the smallest id. `scores` is (id, score).
    *
    * Shape: two-level salted max_by instead of a per-component
    * row_number window. A window must SORT each component inside one
    * task, so one boilerplate mega-cluster (every row of a crawl
    * sharing a template) becomes the straggler of the whole job. The
    * salted form is two partial-aggregatable hash aggregates: level 1
    * picks a champion per (component, salt-of-id) — at most `salt`
    * rows per component survive, whatever its size — level 2 picks
    * the champion of champions; membership then joins the winner back.
    * No sort anywhere, map-side combine on both levels.
    *
    * Edge semantics: ids must be NUMERIC (the smallest-id tie-break
    * negates them; enforced); scores compare as double, so integral
    * scores beyond 2^53 lose tie precision; a NULL score loses to any
    * non-null score — including a legitimate Double.MinValue (the
    * has-score flag leads the ordering struct, not a sentinel); a NULL
    * component means "never clustered", and such rows keep=true (each
    * is its own survivor) rather than being dropped or silently
    * all-false.
    *
    * @return (id, component, score, keep) — every member, keep=true
    *         on exactly one row per cluster
    */
  def bestPerCluster(clusters: DataFrame, scores: DataFrame,
      salt: Int = 64): DataFrame = {
    val idType = clusters.schema("id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"bestPerCluster: id must be numeric for the smallest-id tie-break, got $idType")
    // LEFT join: a member missing from `scores` must still appear (with
    // keep=false unless the whole cluster is unscored) — an inner join
    // would silently drop documents from the dedup decision
    val scored = clusters.join(scores, Seq("id"), "left")
    // max over (has-score, score, -id): higher score wins, ties ->
    // smaller id, null scores lose to every real score via the leading
    // flag (a MinValue sentinel would collide with a legitimate
    // MinValue score); the null-score group ties on a constant so its
    // winner is still the smallest id
    val s = col("score").cast("double")
    val ord = struct(
      s.isNotNull.as("has"),
      coalesce(s, lit(0.0)).as("s"),
      (-col("id")).as("tie"))
    val lvl1 = scored
      .groupBy(col("component"), pmod(xxhash64(col("id")), lit(salt)).as("__salt"))
      .agg(max_by(col("id"), ord).as("cand"), max(ord).as("cand_ord"))
    val winners = lvl1.groupBy(col("component"))
      .agg(max_by(col("cand"), col("cand_ord")).as("keep_id"))
    // LEFT: a null-component row cannot equi-join and must survive
    scored.join(winners, Seq("component"), "left")
      .withColumn("keep",
        when(col("component").isNotNull,
          coalesce(col("id") === col("keep_id"), lit(false)))
          .otherwise(lit(true)))
      .select(col("id"), col("component"), col("score"), col("keep"))
  }

  // ---- embedding near-dup ------------------------------------------------------
  /** Plane count for a corpus of `n` vectors targeting `targetBucket`
    * expected vectors per bucket: planes = ceil(log2(n / targetBucket)),
    * clamped to [4, 62]. SIZING RULE: 2^planes is the bucket count per
    * table; with p planes the expected bucket holds n/2^p vectors and
    * in-bucket candidate pairing costs ~n²/2^p per table — the default
    * 8 planes (256 buckets) is a TEST-SCALE setting; at 10^9 vectors
    * targeting 1k-vector buckets you want ~20 planes. Recall shrinks as
    * planes grow (P[same bucket] = (1-θ/π)^planes); compensate with
    * `tables` (OR-amplification), not fewer planes. */
  def planesFor(n: Long, targetBucket: Long = 1024): Int = {
    require(n > 0 && targetBucket > 0)
    val p = math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt
    math.min(62, math.max(4, p))
  }

  /** Embedding-cosine near-dup pairs via hyperplane-LSH bucketing (see
    * [[Similarity.hyperplaneBucket]]); `tables` independent bucketings
    * OR-amplify recall. Candidate (id_a, id_b) pairs are deduped on the
    * slim bucket join FIRST, then the vectors are fetched back by id —
    * the bucket shuffle carries (bucket, id), never the vectors. Exact
    * cosine is verified per candidate with precomputed norms (one dot
    * per pair).
    *
    * `planes` must scale with the corpus — see [[planesFor]] for the
    * log2(N/bucket) rule; a too-small plane count silently degenerates
    * the bucket join toward an all-pairs product. */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column,
      threshold: Double = 0.95, planes: Int = 8, seed: Long = 42,
      dim: Int = 64, tables: Int = 1, expectedRows: Long = -1L): DataFrame = {
    require(planes <= 57, s"embeddingPairs: planes $planes > 57 (packed key)")
    val base = df.select(id.as("id"), vec.as("v"))
    // per-table buckets packed with the table index into ONE long join
    // key (string keys are the silent shuffle killer); a vector's
    // buckets for ALL tables ride along as a small array so multi-table
    // duplicates dedup with a first-agreeing-table FILTER instead of a
    // distinct() shuffle over the candidate set — and a single table
    // produces no duplicates at all (one bucket per vector per table).
    // ALL tables sign in ONE compiled pass (HyperplaneBuckets): the HOF
    // form ran tables×planes zip_with dots per row, and at the
    // production shape (log2(N/32) planes × 4 tables) that per-row
    // allocation WAS the stage — the r8 verdict's 13.4×/decade log
    // factor on dedup_embedding_prod (36.9 s at sf10p) was signing
    // cost, not flops. Bit-identical to the HOF chain (spec-gated).
    val bucketArr = graft.functions.HyperplaneBuckets(
      col("v"), seed, planes, tables, dim)
    // no separate table-index column: the index rides bkey's high bits
    // (extracted in the dedup filter), so BOTH join sides project
    // exactly (id, bs, bkey) — identical plans are what lets the
    // bucket-key exchange be planned once and REUSED by the probe side
    // Vectors + norms RIDE the bucket exchange and the cosine verifies
    // INSIDE the bucket join's output stage. The previous shape kept
    // the bucket shuffle slim ((bucket, id) only) and re-fetched
    // vectors per candidate side — penny-wise at scale: the second id
    // join SORTED the candidate×vector intermediate (candidates ×
    // ~300 B with the payload; at sf100p, 2M vectors → 280M candidates
    // → an 84 GB sort that spilled the disk dry, measured live at the
    // 1000× decade). Here the sorted side is only N·tables rows of
    // (id, v, nrm, bs, bkey) — 8M × ~320 B ≈ 2.6 GB at sf100p — and
    // the 280M joined candidate rows STREAM through the codegen'd
    // DotF filter without ever materializing or re-shuffling.
    val withNorm = base.withColumn("nrm",
      sqrt(graft.functions.DotF(col("v"), col("v"))))
    val keyed0 = withNorm.select(col("id"), col("v"), col("nrm"), bucketArr.as("bs"))
      .select(col("id"), col("v"), col("nrm"), col("bs"),
        posexplode(col("bs")).as(Seq("t", "b")))
      .select(col("id"), col("v"), col("nrm"), col("bs"),
        shiftleft(col("t").cast("long"), 58).bitwiseOR(col("b")).as("bkey"))
    // Partition count sized by EXCHANGED VOLUME, not the session
    // default: at sf1000p (20M x 4 tables x ~330 B) the default 32
    // partitions hand every task an ~800 MB hash build whose random
    // probes fall out of cache/TLB — StageProbe measured the per-
    // candidate cost 10x the sf100p build's (~80 MB, cache-resident),
    // 13.1k of 20.5k total task-seconds in the probe stage alone with
    // ZERO spill and ZERO skew. Bounding builds to ~128 MB restores
    // constant per-candidate cost; on a real cluster this is exactly
    // "one build fits an executor's cache budget". Callers that know
    // the corpus size (the planesFor sites already count) pass it;
    // -1 keeps the session default (oracle parity shapes unchanged).
    val keyed = {
      val sess = df.sparkSession.sessionState.conf.numShufflePartitions
      val rowBytes = dim * 4L + 8L * tables + 80L // v + bs + id/nrm/bkey + row
      val p = if (expectedRows > 0)
        math.ceil(expectedRows.toDouble * tables * rowBytes / (128L << 20)).toInt
      else 0
      if (p > sess) keyed0.repartition(p, col("bkey")) else keyed0
    }
    // SHUFFLE_HASH instead of sort-merge: the join's equi-key is the
    // bucket, whose population is BOUNDED by construction (planesFor
    // sizes buckets to ~targetBucket rows), so the per-partition hash
    // build is small and safe — while SMJ sorted the vector-carrying
    // exchange TWICE (both aliases), and at sf1000p (20M × 4 tables ×
    // ~320 B ≈ 26 GB exchanged) those two sort spills pushed scratch
    // past what a single measurement VM holds. Same join, same rows;
    // the exchange is still planned once and reused by both sides.
    val joined = keyed.as("ka").hint("shuffle_hash").join(keyed.as("kb"),
      col("ka.bkey") === col("kb.bkey") && col("ka.id") < col("kb.id"))
    val deduped =
      if (tables == 1) joined
      else joined.filter((0 until tables).map { tp =>
        shiftrightunsigned(col("ka.bkey"), 58).cast("int") > tp &&
          element_at(col("ka.bs"), tp + 1) === element_at(col("kb.bs"), tp + 1)
      }.reduce(_ || _).unary_!)
    // per-pair dot is the compiled DotF (sequential double semantics);
    // norms were computed once per VECTOR above, never per pair
    deduped
      .select(col("ka.id").as("id_a"), col("kb.id").as("id_b"),
        (graft.functions.DotF(col("ka.v"), col("kb.v")) /
          (col("ka.nrm") * col("kb.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
