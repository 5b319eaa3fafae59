package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal}

/** Exact-fingerprint collapse gates (r11 verdict #1): the cluster-edge
  * stage must be O(distinct-hash pairs), NOT O(row pairs) — a c-fold
  * identical-fingerprint cluster contributes c−1 member edges, never
  * c·(c−1)/2 pairs — while the connected components (and min-id labels,
  * and keep-best survivors) stay bit-identical to clustering the full
  * pair set. */
class ClusterEdgesSpec extends GraftSuite {
  import spark.implicits._

  private def audioRows(hash: Long, ids: Range): Seq[Multimodal.AudioHash] =
    ids.map(i => Multimodal.AudioHash(i.toLong, 200 + i % 7,
      f"$hash%016x", hash))

  // ---- the plan gate: edge cardinality ----------------------------------

  test("audio cluster edges are linear in duplicate multiplicity") {
    // two mega exact-dup clusters (near each other at Hamming 1) + far
    // singletons: the full pair set is quadratic (200·199/2 + 100·99/2
    // + 200·100 cross = 44_850 pairs), the collapsed edge set is linear
    // (199 + 99 member edges + 1 rep pair = 299)
    val h1 = 0x0123456789ABCDEFL
    val h2 = h1 ^ 1L // Hamming 1 from h1 — the reps must still pair
    val far = Seq(0x7777000011110000L, 0x00FF00FF00FF00FFL)
    val rows = audioRows(h1, 0 until 200) ++ audioRows(h2, 200 until 300) ++
      far.zipWithIndex.map { case (h, i) =>
        Multimodal.AudioHash(1000L + i, 100, f"$h%016x", h) }
    val edges = Multimodal.audioEnergyHashClusterEdges(
      spark.createDataset(rows))
    // 199 + 99 member edges exactly, plus the single h1–h2 rep pair
    // once per agreeing band (≤ 4; dedupClusters distincts edges)
    val n = edges.count()
    assert(n >= 299L && n <= 302L, s"edge rows $n outside [299, 302]")
    // and the components over those edges equal the full-pair components
    val viaEdges = Dedup.dedupClusters(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaPairs = Dedup.dedupClusters(
        Multimodal.audioEnergyHashPairs(spark.createDataset(rows))
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaEdges === viaPairs)
    assert(viaEdges.length === 300) // both mega clusters fully labeled
    assert(viaEdges.forall(_._2 === 0L)) // h1∪h2 merge under min id 0
  }

  test("simhash cluster edges are linear in exact-duplicate text") {
    // 120 byte-identical docs + 3 distinct: full pair set has
    // 120·119/2 = 7140 pairs; the collapsed edges are 119
    val docs = ((0 until 120).map(i => (i.toLong, "alpha beta gamma delta")) ++
      Seq((500L, "one two three"), (501L, "completely different words here"),
        (502L, "yet another unrelated document text"))).toDF("doc_id", "text")
    val edges = Dedup.simhashClusterEdges(docs, col("doc_id"), col("text"))
    // distinct sigs may still band-collide; the gate is the ORDER: well
    // under the 7140-pair quadratic floor, at most members + rep pairs
    assert(edges.count() < 200L)
    val viaEdges = Dedup.dedupClusters(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaPairs = Dedup.dedupClusters(
        Dedup.simhashPairs(docs, col("doc_id"), col("text"))
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaEdges === viaPairs)
  }

  // ---- collapse-key completeness: video must key on the FULL tuple ------

  test("video collapse keys on (vhash, tsig, n_frames), not vhash alone") {
    // same vhash everywhere; tsigs differ so that only SOME pairs align:
    // ids 0,1 identical tuples (member edge); id 2 same length but a
    // tsig that aligns with 0/1 only at shift 1; id 3 a tsig no shift
    // within ±2 can align (every overlap window disagrees)
    val vh = 0x5A5A5A5A5A5A5A5AL
    val t01 = 0x15L // 010101 over nf=7 → valid bits 6
    val t2 = t01 >> 1 // id 2 = ids 0/1 trimmed by one leading frame
    val t3 = 0x00L // no-cut clip — no shift ≤ 2 aligns it with 010101
    val rows = Seq(
      Multimodal.VideoHash(0L, 7, f"$vh%016x", vh, t01, 16, 12),
      Multimodal.VideoHash(1L, 7, f"$vh%016x", vh, t01, 20, 14),
      Multimodal.VideoHash(2L, 7, f"$vh%016x", vh, t2, 16, 12),
      Multimodal.VideoHash(3L, 7, f"$vh%016x", vh, t3, 16, 12))
    val edges = Multimodal.videoDHashClusterEdges(
      spark.createDataset(rows), maxHamming = 3, maxShift = 2)
    val viaEdges = Dedup.dedupClusters(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaPairs = Dedup.dedupClusters(
        Multimodal.videoDHashPairs(spark.createDataset(rows),
          maxHamming = 3, maxShift = 2)
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaEdges === viaPairs)
    // 0,1,2 one component under label 0; 3 unpaired (absent entirely)
    assert(viaEdges === Array((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  test("image cluster edges reproduce full-pair components + keep-best") {
    // mixed multiplicities incl. a singleton exact-dup-free hash and a
    // Hamming-2 near pair; keep-best (resolution score) must agree too
    val hA = 0x1111222233334444L
    val hB = hA ^ 0x3L // Hamming 2 of hA
    val hC = 0x0F0F0F0F0F0F0F0FL
    val rows =
      (0 until 50).map(i => Multimodal.ImageHash(i.toLong, 10 + i % 5, 8,
        f"$hA%016x", hA)) ++
      (50 until 60).map(i => Multimodal.ImageHash(i.toLong, 30, 20,
        f"$hB%016x", hB)) ++
      Seq(Multimodal.ImageHash(99L, 64, 48, f"$hC%016x", hC))
    val ds = spark.createDataset(rows)
    val scores = ds.toDF().select(col("media_id").as("id"),
      (col("w") * col("h")).cast("double").as("score"))
    def result(edges: org.apache.spark.sql.DataFrame) =
      Dedup.bestPerCluster(Dedup.dedupClusters(edges), scores)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).sorted
    val viaEdges = result(Multimodal.imageDHashClusterEdges(ds))
    val viaPairs = result(Multimodal.imageDHashPairs(ds)
      .select(col("id_a"), col("id_b")))
    assert(viaEdges === viaPairs)
    // hA∪hB one cluster of 60; survivor = highest resolution (600 at
    // ids 50-59, tie → min id 50); hC absent (never paired)
    assert(viaEdges.length === 60)
    assert(viaEdges.count(_._4) === 1)
    assert(viaEdges.find(_._4).map(_._1) === Some(50L))
  }
}
