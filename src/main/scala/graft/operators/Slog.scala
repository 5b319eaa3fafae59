package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Forward-secure ("secure logging") encrypted log entries — the
  * `$(slog)` template function and the `slogverify` utility of
  * `/root/reference/modules/secure-logging/slog.c` re-expressed as a
  * pair of Spark operators.
  *
  * Cryptographic scheme (slog.c, constants slog.h:27-43):
  *   - AES-256-CMAC is the PRF building block (`cmac`, OpenSSL
  *     `CMAC_Init(EVP_aes_256_cbc)` — standard CMAC, RFC 4493
  *     generalized to 256-bit keys).
  *   - `PRF(key, input16, outLen)`: counter-mode CMAC — block i is
  *     `CMAC(key, input)` with `input[15]` incremented between blocks
  *     (slog.c:462-487).
  *   - Sub-keys per entry: enc = PRF(k, 0x36*16), mac = PRF(k,
  *     0x5C*16); key evolution k ← PRF(k, 0x6A*16) after every entry
  *     (`deriveSubKeys`/`evolveKey` — forward security: past keys are
  *     unrecoverable).
  *   - Entry i: `base64(LE64(i))` padded to 12 chars + `:` +
  *     `base64(iv(12) || gcmTag(16) || ciphertext)` where the payload
  *     is AES-256-GCM under the entry's enc key (`sLogEntry`,
  *     slog.c:300-383).
  *   - Aggregated MAC: mac_0 = CMAC(macKey_0, iv||tag||ct);
  *     mac_i = CMAC(macKey_i, mac_{i-1} || iv||tag||ct) — the audit
  *     chain `slogverify` checks.
  *
  * Spark mapping: one forward-secure chain per SHARD (the reference
  * runs one chain per host — `deriveHostKey` =
  * SHA256(master||MAC||serial), slog.c:500-540; here shard key k_0 =
  * SHA256(master || shardId)). Chains parallelize across shards;
  * entries WITHIN a chain are serial by cryptographic design (each
  * entry's key is evolved from the previous), so the operator
  * repartitions by shard and walks each chain in order inside
  * `mapPartitions` — the same shape as the reference's one-daemon-per-
  * host deployment, scaled horizontally by sharding. */
object Slog {

  val KeyLength = 32
  val IvLength = 12
  val MacLength = 16
  val CounterLength = 12

  private val Ipad = 0x36.toByte
  private val Opad = 0x5C.toByte
  private val Epad = 0x6A.toByte

  // ---- AES-CMAC (RFC 4493, key-size agnostic) -----------------------------

  private def aesEcb(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    c.doFinal(block)
  }

  /** GF(2^128) doubling: left shift, conditionally xor 0x87. */
  private def dbl(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var carry = 0
    var i = 15
    while (i >= 0) {
      val b = in(i) & 0xff
      out(i) = ((b << 1) | carry).toByte
      carry = b >>> 7
      i -= 1
    }
    if (carry != 0) out(15) = (out(15) ^ 0x87).toByte
    out
  }

  def cmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val l = aesEcb(key, new Array[Byte](16))
    val k1 = dbl(l)
    val k2 = dbl(k1)
    val n = math.max(1, (data.length + 15) / 16)
    val complete = data.length > 0 && data.length % 16 == 0
    val last = new Array[Byte](16)
    if (complete) {
      System.arraycopy(data, (n - 1) * 16, last, 0, 16)
      for (i <- 0 until 16) last(i) = (last(i) ^ k1(i)).toByte
    } else {
      val rem = data.length - (n - 1) * 16
      System.arraycopy(data, (n - 1) * 16, last, 0, rem)
      last(rem) = 0x80.toByte
      for (i <- 0 until 16) last(i) = (last(i) ^ k2(i)).toByte
    }
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    val full = new Array[Byte](n * 16)
    if (n > 1) System.arraycopy(data, 0, full, 0, (n - 1) * 16)
    System.arraycopy(last, 0, full, (n - 1) * 16, 16)
    val out = c.doFinal(full)
    java.util.Arrays.copyOfRange(out, out.length - 16, out.length)
  }

  // ---- PRF + key schedule (slog.c:440-487) --------------------------------

  def prf(key: Array[Byte], input16: Array[Byte], outLen: Int): Array[Byte] = {
    val input = input16.clone()
    val out = new Array[Byte](outLen)
    var off = 0
    while (off < outLen) {
      val block = cmac(key, input)
      System.arraycopy(block, 0, out, off, math.min(16, outLen - off))
      input(input.length - 1) = (input(input.length - 1) + 1).toByte
      off += 16
    }
    out
  }

  private def pattern(b: Byte) = Array.fill[Byte](16)(b)

  def deriveEncKey(k: Array[Byte]): Array[Byte] = prf(k, pattern(Ipad), KeyLength)
  def deriveMacKey(k: Array[Byte]): Array[Byte] = prf(k, pattern(Opad), KeyLength)
  def evolveKey(k: Array[Byte]): Array[Byte] = prf(k, pattern(Epad), KeyLength)

  /** Shard key k_0 — the `deriveHostKey` analog (SHA256 over master
    * key + host identity, slog.c:500-540). */
  def shardKey(masterKey: Array[Byte], shardId: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256")
      .digest(masterKey ++ shardId.getBytes(StandardCharsets.UTF_8))

  /** The exact `deriveHostKey` form (slog.c:520-545, the `slogkey -d
    * master <MAC addr> <serial>` derivation): k_0 =
    * SHA256(master || macAddr || serial). */
  def hostKey(master: Array[Byte], macAddr: String, serial: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(master ++
      macAddr.getBytes(StandardCharsets.UTF_8) ++
      serial.getBytes(StandardCharsets.UTF_8))

  // ---- key / MAC file formats (slogkey + tf-slog persistence) -------------

  /** Key file (writeKey, slog.c:877-960): key(32) ||
    * CMAC_key(LE64(counter))(16) || LE64(counter)(8) — the CMAC is
    * keyed by the key ITSELF over the 8-byte little-endian counter. */
  def writeKeyFile(path: String, key: Array[Byte], counter: Long): Unit = {
    require(key.length == KeyLength)
    val le = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(counter).array()
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      key ++ cmac(key, le) ++ le)
  }

  /** readKey (slog.c:756-870): None when the file is missing, short,
    * or its CMAC rejects (the reference logs and reverts to clear-text
    * logging on this path — tf_slog_prepare, secure-logging.c:180). */
  def readKeyFile(path: String): Option[(Array[Byte], Long)] = try {
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (b.length < KeyLength + MacLength + 8) return None
    val key = java.util.Arrays.copyOfRange(b, 0, KeyLength)
    val mac = java.util.Arrays.copyOfRange(b, KeyLength, KeyLength + MacLength)
    val le = java.util.Arrays.copyOfRange(b, KeyLength + MacLength,
      KeyLength + MacLength + 8)
    if (!java.util.Arrays.equals(cmac(key, le), mac)) None
    else Some((key,
      ByteBuffer.wrap(le).order(ByteOrder.LITTLE_ENDIAN).getLong))
  } catch { case _: Exception => None }

  /** MAC file (writeBigMAC, slog.c:563-650): mac(16) ||
    * CMAC_{mac||0^16}(0^16)(16) — the integrity tag is CMAC over 16
    * zero bytes keyed by the MAC zero-padded to a 32-byte key. */
  def writeMacFile(path: String, mac: Array[Byte]): Unit = {
    require(mac.length == MacLength)
    val keyBuffer = java.util.Arrays.copyOf(mac, KeyLength)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      mac ++ cmac(keyBuffer, new Array[Byte](MacLength)))
  }

  /** Settle the `$(slog)` file side effects after a batch
    * materialization — the reference's tf_slog_call writes the evolved
    * key + counter and the aggregated MAC back incrementally per
    * message; batch entries are pure row functions, so the two files
    * settle once from the materialized chain instead. The key file
    * must still hold the (k0, counter0) the entries were built from.
    * A counter0 > 0 chain folds onto the prior MAC from `macPath`
    * (missing prior MAC folds onto 16 zero bytes — the C's zeroed
    * TFSlogState, tf_slog_prepare's readBigMAC-miss path). */
  def settleChainFiles(keyPath: String, macPath: String,
      entries: Seq[String]): Boolean = {
    readKeyFile(keyPath) match {
      case None => false
      case Some((k0, c0)) =>
        var key = k0.clone()
        var mac: Array[Byte] =
          if (c0 == 0L) null
          else readMacFile(macPath).getOrElse(new Array[Byte](MacLength))
        var i = c0
        entries.foreach { e =>
          val payload = Base64.getDecoder.decode(e.substring(CounterLength + 1))
          val macKey = deriveMacKey(key)
          mac =
            if (i == 0L) cmac(macKey, payload)
            else cmac(macKey, mac ++ payload)
          key = evolveKey(key)
          i += 1
        }
        writeKeyFile(keyPath, key, i)
        if (mac != null) writeMacFile(macPath, mac)
        true
    }
  }

  /** readBigMAC (slog.c:660-745): None on missing/short/tag-mismatch. */
  def readMacFile(path: String): Option[Array[Byte]] = try {
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (b.length < 2 * MacLength) return None
    val mac = java.util.Arrays.copyOfRange(b, 0, MacLength)
    val tag = java.util.Arrays.copyOfRange(b, MacLength, 2 * MacLength)
    val keyBuffer = java.util.Arrays.copyOf(mac, KeyLength)
    if (!java.util.Arrays.equals(cmac(keyBuffer, new Array[Byte](MacLength)), tag))
      None
    else Some(mac)
  } catch { case _: Exception => None }

  // ---- entry encode/decode (sLogEntry, slog.c:300-383) --------------------

  private def counterB64(n: Long): String = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n)
    Base64.getEncoder.encodeToString(bb.array()) // 8 bytes → exactly 12 chars
  }

  /** GCM-seal one message under `key`'s enc sub-key: iv || tag || ct
    * (the base64 payload layout of sLogEntry, slog.c:300-383). */
  private def sealPayload(key: Array[Byte], msg: String,
      iv: Array[Byte]): Array[Byte] = {
    require(iv.length == IvLength)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(deriveEncKey(key), "AES"),
      new GCMParameterSpec(MacLength * 8, iv))
    val ctAndTag = c.doFinal(msg.getBytes(StandardCharsets.UTF_8))
    val ct = java.util.Arrays.copyOfRange(ctAndTag, 0, ctAndTag.length - MacLength)
    val tag = java.util.Arrays.copyOfRange(ctAndTag, ctAndTag.length - MacLength, ctAndTag.length)
    iv ++ tag ++ ct
  }

  /** Entry line alone, no aggregated-MAC fold — the per-row form the
    * `$(slog)` template function uses (its audit chain is recomputed
    * from the entries by [[verifyChain]] instead of carried
    * row-to-row). */
  def entryLine(counter: Long, key: Array[Byte], msg: String,
      iv: Array[Byte]): String =
    counterB64(counter) + ":" +
      Base64.getEncoder.encodeToString(sealPayload(key, msg, iv))

  /** Deterministic per-entry IV, SIV-style:
    * PRF(entryKey, SHA256(LE64(counter) || msg)[0..15]). The reference
    * draws RAND_bytes (sLogEntry) — here the IV derives from the entry
    * key AND the plaintext so Spark task RETRIES are bit-stable (a
    * retried partition must reproduce the same entries or the
    * recomputed audit MAC diverges). Binding the plaintext in (rather
    * than keying off entryKey alone) means a (key, IV) pair can only
    * repeat when (counter, msg) repeat — i.e. when the ciphertext is
    * identical anyway. That closes the cross-RUN nonce reuse a
    * key-only derivation had: re-running a pipeline from an
    * un-advanced key file encrypts NEW plaintexts under the same
    * entry keys, which with a key-only IV would reuse (key, nonce) on
    * different messages (GCM keystream + tag-forgery exposure). */
  def entryIv(entryKey: Array[Byte], counter: Long, msg: String): Array[Byte] = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
    h.update(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(counter).array())
    val d = h.digest(msg.getBytes(StandardCharsets.UTF_8))
    prf(entryKey, java.util.Arrays.copyOf(d, 16), IvLength)
  }

  /** Encrypt one entry. Returns (entry line, new aggregated MAC).
    * `prevMac` is ignored for counter 0 (first-MAC special case). */
  def encryptEntry(counter: Long, key: Array[Byte], msg: String,
      iv: Array[Byte], prevMac: Array[Byte]): (String, Array[Byte]) = {
    val payload = sealPayload(key, msg, iv)
    val entry = counterB64(counter) + ":" + Base64.getEncoder.encodeToString(payload)
    val macKey = deriveMacKey(key)
    val mac =
      if (counter == 0L) cmac(macKey, payload)
      else cmac(macKey, prevMac ++ payload)
    (entry, mac)
  }

  /** Parse + decrypt one entry under `key` (the entry-index key).
    * Returns (counter, plaintext, payload bytes) or None when the
    * format or the GCM tag rejects it. */
  def decryptEntry(entry: String, key: Array[Byte]): Option[(Long, String, Array[Byte])] = {
    val sep = entry.indexOf(':')
    if (sep != CounterLength) return None
    try {
      val cnt = ByteBuffer.wrap(Base64.getDecoder.decode(entry.substring(0, sep)))
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      val payload = Base64.getDecoder.decode(entry.substring(sep + 1))
      if (payload.length < IvLength + MacLength) return None
      val iv = java.util.Arrays.copyOfRange(payload, 0, IvLength)
      val tag = java.util.Arrays.copyOfRange(payload, IvLength, IvLength + MacLength)
      val ct = java.util.Arrays.copyOfRange(payload, IvLength + MacLength, payload.length)
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(deriveEncKey(key), "AES"),
        new GCMParameterSpec(MacLength * 8, iv))
      val pt = c.doFinal(ct ++ tag)
      Some((cnt, new String(pt, StandardCharsets.UTF_8), payload))
    } catch { case _: Exception => None }
  }

  // ---- chain core ---------------------------------------------------------

  /** Sequentially encrypt an in-order message stream into entries;
    * returns the entries plus the final aggregated MAC (the `.mac`
    * file content slogverify reads). `ivFor` supplies nonces — random
    * in production, injectable for deterministic tests (the reference
    * uses `RAND_bytes`). */
  def encryptChain(msgs: Iterator[String], k0: Array[Byte],
      ivFor: Long => Array[Byte] = _ => randomIv())
      : (Vector[String], Array[Byte]) = {
    var key = k0.clone()
    var mac: Array[Byte] = null
    var counter = 0L
    val out = Vector.newBuilder[String]
    msgs.foreach { m =>
      val (entry, newMac) = encryptEntry(counter, key, m, ivFor(counter), mac)
      out += entry
      mac = newMac
      key = evolveKey(key)
      counter += 1
    }
    (out.result(), mac)
  }

  private def randomIv(): Array[Byte] = {
    val iv = new Array[Byte](IvLength)
    new java.security.SecureRandom().nextBytes(iv)
    iv
  }

  /** Verify one chain: decrypt every entry in order, recompute the
    * aggregated MAC, compare with `expectedMac` (when given). Returns
    * per-entry plaintexts (None = corrupted entry) and whether the
    * whole chain authenticates — entry counters must be exactly
    * 0..n-1 in order, like `slogverify`'s iterateBuffer. */
  def verifyChain(entries: Seq[String], k0: Array[Byte],
      expectedMac: Option[Array[Byte]])
      : (Vector[Option[String]], Boolean) = {
    var key = k0.clone()
    var mac: Array[Byte] = null
    var ok = true
    val out = Vector.newBuilder[Option[String]]
    var i = 0L
    entries.foreach { e =>
      decryptEntry(e, key) match {
        case Some((cnt, pt, payload)) =>
          if (cnt != i) ok = false
          val macKey = deriveMacKey(key)
          // mac == null past i=0 means an earlier entry failed to
          // decrypt (ok is already false); keep folding what we can
          mac = if (mac == null) cmac(macKey, payload)
            else cmac(macKey, mac ++ payload)
          out += Some(pt)
        case None =>
          ok = false
          out += None
      }
      key = evolveKey(key)
      i += 1
    }
    expectedMac.foreach { em =>
      if (mac == null || !java.util.Arrays.equals(mac, em)) ok = false
    }
    (out.result(), ok)
  }

  // ---- Spark operators ----------------------------------------------------

  /** Encrypt `(shard, seq, message)` rows into slog entries — one
    * independent forward-secure chain per shard, k_0 =
    * [[shardKey]](master, shard). Output: (shard, seq, entry,
    * chain_mac) where chain_mac (base64) is carried on the LAST entry
    * of each shard (the `.mac` file analog). Chains run in parallel
    * across shards; rows inside a shard are walked in `seq` order
    * inside the partition (repartition + sortWithinPartitions — no
    * per-chain materialization). */
  def encryptLog(df: DataFrame, master: Array[Byte],
      shardCol: String = "shard", seqCol: String = "seq",
      msgCol: String = "message",
      ivFor: (String, Long) => Array[Byte] = (_, _) => randomIv()): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(shardCol).cast("string"), col(seqCol).cast("long"),
        col(msgCol).cast("string"))
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(seqCol))
    val enc = sorted.queryExecution.toRdd.mapPartitions { it =>
      // walk runs of equal shard: each run is one chain in seq order
      var curShard: String = null
      var key: Array[Byte] = null
      var mac: Array[Byte] = null
      var counter = 0L
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, String)]
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
      it.foreach { ir =>
        rows += ((ir.getUTF8String(0).toString, ir.getLong(1),
          ir.getUTF8String(2).toString))
      }
      rows.foreach { case (shard, seq, msg) =>
        if (shard != curShard) {
          curShard = shard
          key = shardKey(master, shard)
          mac = null
          counter = 0L
        }
        val (entry, newMac) = encryptEntry(counter, key, msg, ivFor(shard, counter), mac)
        mac = newMac
        key = evolveKey(key)
        counter += 1
        buf += ((shard, seq, entry, Base64.getEncoder.encodeToString(mac)))
      }
      // only the last entry of each shard keeps the aggregated MAC
      val lastIdx = buf.zipWithIndex.groupBy(_._1._1).map { case (_, g) => g.last._2 }.toSet
      buf.iterator.zipWithIndex.map { case ((shard, seq, entry, m), idx) =>
        (shard, seq, entry, if (lastIdx(idx)) m else null)
      }
    }
    spark.createDataFrame(enc.map { case (s, q, e, m) => Row(s, q, e, m) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("entry", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("chain_mac", org.apache.spark.sql.types.StringType))))
  }

  /** Verify/decrypt the output of [[encryptLog]]: per shard, entries
    * are walked in counter order, GCM-authenticated, and the
    * aggregated MAC is compared against the shard's recorded
    * chain_mac. Output: (shard, seq, message, entry_ok, chain_ok). */
  def verifyLog(df: DataFrame, master: Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col("shard").cast("string"), col("seq").cast("long"),
        col("entry").cast("string"), col("chain_mac").cast("string"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
    val out = sorted.queryExecution.toRdd.mapPartitions { it =>
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, String)]
      it.foreach { ir =>
        rows += ((ir.getUTF8String(0).toString, ir.getLong(1),
          ir.getUTF8String(2).toString,
          if (ir.isNullAt(3)) null else ir.getUTF8String(3).toString))
      }
      rows.groupBy(_._1).iterator.flatMap { case (shard, rs) =>
        val ordered = rs.sortBy(_._2)
        val expected = ordered.flatMap(r => Option(r._4)).lastOption
          .map(Base64.getDecoder.decode)
        val (pts, ok) = verifyChain(ordered.map(_._3).toSeq,
          shardKey(master, shard), expected)
        ordered.zip(pts).map { case ((_, seq, _, _), pt) =>
          (shard, seq, pt.orNull, pt.isDefined, ok)
        }
      }
    }
    spark.createDataFrame(out.map { case (s, q, m, eok, cok) => Row(s, q, m, eok, cok) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("message", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("entry_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("chain_ok", org.apache.spark.sql.types.BooleanType))))
  }
}
