package graft

import java.util.Base64

import graft.operators.Slog
import org.apache.spark.sql.functions._

/** Secure-logging ($(slog)/slogverify) semantics vs
  * `/root/reference/modules/secure-logging/slog.c`: the CMAC core
  * against RFC 4493 public vectors, entry format, forward-secure
  * round trips, tamper detection, and the per-shard Spark chains. */
class SlogSpec extends GraftSuite {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("AES-CMAC core matches RFC 4493 vectors (AES-128)") {
    val k = hex("2b7e1516 28aed2a6 abf71588 09cf4f3c")
    assert(toHex(Slog.cmac(k, Array.empty)) == "bb1d6929e95937287fa37d129b756746")
    val m16 = hex("6bc1bee2 2e409f96 e93d7e11 7393172a")
    assert(toHex(Slog.cmac(k, m16)) == "070a16b46b4d4144f79bdd9dd04a287c")
    val m40 = hex("6bc1bee2 2e409f96 e93d7e11 7393172a" +
      "ae2d8a57 1e03ac9c 9eb76fac 45af8e51" +
      "30c81c46 a35ce411")
    assert(toHex(Slog.cmac(k, m40)) == "dfa66747de9ae63030ca32611497c827")
    val m64 = hex("6bc1bee2 2e409f96 e93d7e11 7393172a" +
      "ae2d8a57 1e03ac9c 9eb76fac 45af8e51" +
      "30c81c46 a35ce411 e5fbc119 1a0a52ef" +
      "f69f2445 df4f9b17 ad2b417b e66c3710")
    assert(toHex(Slog.cmac(k, m64)) == "51f0bebf7e3b9d92fc49741779363cfe")
  }

  test("PRF and key evolution: deterministic, forward-distinct") {
    val k0 = Array.tabulate[Byte](32)(_.toByte)
    val enc = Slog.deriveEncKey(k0)
    val mac = Slog.deriveMacKey(k0)
    val k1 = Slog.evolveKey(k0)
    assert(enc.length == 32 && mac.length == 32 && k1.length == 32)
    assert(!java.util.Arrays.equals(enc, mac))
    assert(!java.util.Arrays.equals(k0, k1))
    // deterministic
    assert(java.util.Arrays.equals(k1, Slog.evolveKey(k0)))
    // evolution chain never cycles back in a short horizon
    val ks = Iterator.iterate(k0)(Slog.evolveKey).take(10).map(toHex).toSeq
    assert(ks.distinct.size == 10)
  }

  test("entry format: 12-char little-endian base64 counter + ':' + payload") {
    val k0 = Array.fill[Byte](32)(7)
    val iv = Array.fill[Byte](12)(1)
    val (e0, mac0) = Slog.encryptEntry(0L, k0, "hello slog", iv, null)
    assert(e0.charAt(12) == ':')
    val cnt = java.nio.ByteBuffer.wrap(Base64.getDecoder.decode(e0.substring(0, 12)))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(cnt == 0L)
    val payload = Base64.getDecoder.decode(e0.substring(13))
    // iv(12) + tag(16) + ct(len("hello slog"))
    assert(payload.length == 12 + 16 + 10)
    assert(payload.take(12).forall(_ == 1))
    assert(mac0.length == 16)
    // same message, counter 1, evolved key → different bytes (forward security)
    val (e1, _) = Slog.encryptEntry(1L, Slog.evolveKey(k0), "hello slog", iv, mac0)
    assert(e1.substring(13) != e0.substring(13))
  }

  test("chain round trip, aggregated MAC, and tamper detection") {
    val k0 = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val msgs = (0 until 20).map(i => s"event number $i with payload")
    val ivFor = (c: Long) => Array.tabulate[Byte](12)(j => (c + j).toByte)
    val (entries, finalMac) = Slog.encryptChain(msgs.iterator, k0, ivFor)
    assert(entries.size == 20)

    val (pts, ok) = Slog.verifyChain(entries, k0, Some(finalMac))
    assert(ok)
    assert(pts.flatten == msgs)

    // flip one ciphertext byte in entry 7 → GCM rejects it, chain fails
    val bad = entries.updated(7, {
      val e = entries(7)
      val p = Base64.getDecoder.decode(e.substring(13))
      p(p.length - 1) = (p(p.length - 1) ^ 1).toByte
      e.substring(0, 13) + Base64.getEncoder.encodeToString(p)
    })
    val (pts2, ok2) = Slog.verifyChain(bad, k0, Some(finalMac))
    assert(!ok2)
    assert(pts2(7).isEmpty)
    assert(pts2.count(_.isDefined) == 19) // every other entry still decrypts

    // drop an entry → counters shift, chain fails
    val (_, ok3) = Slog.verifyChain(entries.patch(3, Nil, 1), k0, Some(finalMac))
    assert(!ok3)

    // reordering fails too
    val (_, ok4) = Slog.verifyChain(entries.updated(2, entries(4)).updated(4, entries(2)),
      k0, Some(finalMac))
    assert(!ok4)
  }

  test("restart continuity: resuming from the evolved key continues the chain") {
    val k0 = Array.fill[Byte](32)(9)
    val ivFor = (c: Long) => Array.tabulate[Byte](12)(j => (c * 7 + j).toByte)
    val (all, macAll) = Slog.encryptChain((0 until 6).map(i => s"m$i").iterator, k0, ivFor)
    // encrypt 0..2, then restart with key evolved 3× and the saved MAC
    var key = k0.clone(); var mac: Array[Byte] = null
    val head = (0 until 3).map { i =>
      val (e, m) = Slog.encryptEntry(i.toLong, key, s"m$i", ivFor(i.toLong), mac)
      mac = m; key = Slog.evolveKey(key); e
    }
    val tail = (3 until 6).map { i =>
      val (e, m) = Slog.encryptEntry(i.toLong, key, s"m$i", ivFor(i.toLong), mac)
      mac = m; key = Slog.evolveKey(key); e
    }
    assert((head ++ tail) == all)
    assert(java.util.Arrays.equals(mac, macAll))
  }

  test("Spark operator: per-shard chains encrypt and verify in parallel") {
    val master = Array.tabulate[Byte](32)(i => (i + 100).toByte)
    val rows = for {
      host <- Seq("web1", "web2", "db1")
      i <- 0 until 8
    } yield (host, i.toLong, s"$host event $i")
    val df = rows.toDF("shard", "seq", "message").repartition(5)

    val enc = Slog.encryptLog(df, master).cache()
    assert(enc.count() == 24)
    // one chain_mac per shard, on the last entry
    val macs = enc.where(col("chain_mac").isNotNull)
      .select("shard", "seq").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(macs == Map("web1" -> 7L, "web2" -> 7L, "db1" -> 7L))

    val ver = Slog.verifyLog(enc, master)
    val got = ver.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3), r.getBoolean(4)))
    assert(got.length == 24)
    assert(got.forall(_._4), "every entry authenticates")
    assert(got.forall(_._5), "every chain authenticates")
    assert(got.map(g => (g._1, g._2, g._3)).toSet ==
      rows.map(r => (r._1, r._2, r._3)).toSet)

    // wrong master key: nothing decrypts
    val wrong = Slog.verifyLog(enc, master.map(b => (b ^ 1).toByte))
    assert(wrong.where(col("entry_ok")).count() == 0)
  }
}
