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
  /** k-word shingles (distinct), the unit for Jaccard / MinHash. */
  def wordShingles(text: Column, k: Int): Column = {
    val words = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
      i => array_join(slice(words, i, lit(k)), " ")))
  }

  // ---- MinHash + LSH ----------------------------------------------------------
  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the document's shingles. xxhash64(seed, shingle) is the
    * family. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingles, s => xxhash64(lit(seed), s)))
    }: _*)

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
    val withSig = df.select(id.as("id"), wordShingles(text, shingleK).as("sh"))
      .withColumn("band", explode(lshBandKeys(
        minhashSignature(col("sh"), numHashes), bands, rows)))
    val a = withSig.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -----------------------------------------------------------------
  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * Pure expressions: for each bit, sum(+1/-1) over tokens, sign -> bit.
    * Near-dups then band on 16-bit chunks and verify hamming distance
    * (bit_count(a XOR b)). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val bits: Seq[Column] = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

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
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
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
    val withBucket = df.select(id.as("id"), vec.as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), planes, seed))
    val a = withBucket.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
