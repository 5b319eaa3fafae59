package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch expressions for the dedup pipeline ops. Both exist because the
  * HOF formulations (`transform`/`aggregate` per hash function) walk the
  * token array numHashes (resp. 64) times; at 100 TB the sketch must be
  * one pass over the bytes. Seed-chained xxhash64 (one string hash per
  * element, then cheap long mixes per seed) keeps the work per token
  * O(len + numHashes) instead of O(len * numHashes).
  */
object Sketches {

  /** One pass over `shingles`: per element, h0 = xxh64(bytes, 42), then
    * the k-th hash is xxh64_long(h0, k); result = per-seed minimum. */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h0 = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
      var k = 0
      while (k < numHashes) {
        val hk = XXH64.hashLong(h0, k)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Polynomial rolling hash over char k-grams, keeping the `keep`
    * smallest (unsigned order), dash-joined. */
  def rollingFingerprint(s: UTF8String, k: Int, keep: Int): UTF8String = {
    val str = s.toString
    val n = str.length
    val mins = new Array[Long](keep)
    java.util.Arrays.fill(mins, -1L) // unsigned max
    def offer(h: Long): Unit = {
      // keep is tiny (4): insertion into a sorted array
      var i = keep - 1
      if (java.lang.Long.compareUnsigned(h, mins(i)) >= 0) return
      while (i > 0 && java.lang.Long.compareUnsigned(h, mins(i - 1)) < 0) {
        mins(i) = mins(i - 1); i -= 1
      }
      mins(i) = h
    }
    val B = 1000003L
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + str.charAt(i); i += 1 }
      offer(XXH64.hashLong(h, 42L))
    } else {
      var bk = 1L // B^(k-1)
      var i = 1
      while (i < k) { bk *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + str.charAt(i); i += 1 }
      offer(XXH64.hashLong(h, 42L))
      i = k
      while (i < n) {
        h = (h - str.charAt(i - k) * bk) * B + str.charAt(i)
        offer(XXH64.hashLong(h, 42L))
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < keep && mins(j) != -1L) {
      if (j > 0) sb.append('-')
      sb.append(mins(j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One pass over `tokens`: 64-bit SimHash, per-bit majority vote of
    * xxh64 token hashes. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `rolling_fingerprint(text, k, keep)` — winnowing-style robust
  * fingerprint: polynomial rolling hash over every char k-gram (one pass,
  * O(len) — substring hashing would be O(len·k)), keeping the `keep`
  * smallest hashes joined with "-". Survives small edits: an edit only
  * perturbs the k windows covering it. */
case class RollingFingerprint(child: Expression, k: Int, keep: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(v: Any): Any =
    Sketches.rollingFingerprint(v.asInstanceOf[UTF8String], k, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Sketches.rollingFingerprint($v, $k, $keep);")

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

object RollingFingerprint {
  def apply(text: Column, k: Int, keep: Int): Column =
    ColumnBridge.column(
      new RollingFingerprint(ColumnBridge.expression(text), k, keep))
}

/** `minhash_sig(shingles, n)` — MinHash signature as array<bigint>. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    Sketches.minhashSig(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Sketches.minhashSig($v, $numHashes);")

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {
  def apply(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(new MinHashSig(ColumnBridge.expression(shingles), numHashes))
}

/** `simhash64(tokens)` — 64-bit SimHash as bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    Sketches.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Sketches.simhash64($v);")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(new SimHash64(ColumnBridge.expression(tokens)))
}
