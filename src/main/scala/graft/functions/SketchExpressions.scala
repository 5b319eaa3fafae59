package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

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
