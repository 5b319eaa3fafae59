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
    * the array numHashes times). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.MinHashSig(shingles, numHashes)

  /** LSH band keys: the signature split into `bands` bands of `rowsPerBand`
    * hashes; each band hashed to one bucket key. Docs sharing any band key
    * become candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_", lit(b),
        hash(array_join(slice(signature, b * rowsPerBand + 1, rowsPerBand), ",")))
    }: _*)

  /** MinHash/LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * @param df (id, text)
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val docs = df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
    // the band join shuffles only (band, id) — shingle arrays stay out
    // of the wide join; a doc colliding in several bands dedups BEFORE
    // the (expensive) exact-Jaccard verification
    val banded = docs.select(col("id"), explode(lshBandKeys(
      minhashSignature(col("sh"), numHashes), bands, rows)).as("band"))
    val cand = banded.select(col("band"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("id").as("id_b")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -----------------------------------------------------------------
  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes —
    * single-pass custom expression. Near-dups then band on 16-bit chunks
    * and verify hamming distance (bit_count(a XOR b)). */
  def simhash(text: Column): Column =
    graft.functions.SimHash64(TextAnalysis.tokens(text))

  /** SimHash near-dup pairs: band on the four 16-bit chunks (a pair within
    * hamming distance<=maxHamming in 64 bits must agree on >=1 chunk when
    * maxHamming<=3 per pigeonhole with 4 chunks). */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(id.as("id"), simhash(text).as("sig"))
    val banded = withSig.withColumn("chunk", explode(array(
      (0 until 4).map(c => concat_ws("_", lit(c),
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)))): _*)))
    val a = banded.select(col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct() // dedupe multi-chunk collisions before anything else
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- shingle-join Jaccard -------------------------------------------------------
  /** Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle,
    * computed with a shingle equi-join (no all-pairs). `maxDocFreq` drops
    * shingles present in more than that many docs — the skew cap. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, threshold: Double = 0.2,
      maxDocFreq: Long = 1000): DataFrame = {
    val docs = df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
      .withColumn("n", size(col("sh")))
    val posting = docs.select(col("id"), col("n"), explode(col("sh")).as("shingle"))
    val capped = posting.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") <= maxDocFreq)
      .drop("df")
    val a = capped.select(col("shingle"), col("id").as("id_a"), col("n").as("n_a"))
    val b = capped.select(col("shingle"), col("id").as("id_b"), col("n").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("common"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- embedding near-dup ------------------------------------------------------
  /** Embedding-cosine near-dup pairs via LSH bucketing (see
    * [[Similarity.hyperplaneBucket]]); exact cosine verified inside each
    * bucket only. */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column,
      threshold: Double = 0.95, planes: Int = 8, seed: Long = 42): DataFrame = {
    // norms precomputed per vector (narrow pass) so each candidate pair
    // costs ONE dot product, not dot + two norms
    val withBucket = df.select(id.as("id"), vec.as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), planes, seed))
      .withColumn("nrm", Similarity.norm(col("v")))
    val a = withBucket.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
