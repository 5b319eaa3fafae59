package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_entropy(text)` — Shannon character entropy, the classic cheap
  * quality/noisiness signal for pretraining corpora (low entropy =
  * boilerplate / repeated filler / padding; implausibly high entropy =
  * binary junk or encrypted blobs masquerading as text). One compiled
  * pass per row building a codepoint histogram on a scratch map;
  * returns `struct(n_chars bigint, distinct_chars int, entropy double)`
  * with entropy in nats computed as `ln(n) − Σ c·ln(c) / n` — the
  * algebraically stable form an external SQL engine reproduces exactly
  * to float precision (per-term p·ln p underflows differently).
  *
  * Scale shape: narrow map-only projection, codegen'd, no shuffle —
  * the filter decision rides the scan like the other quality signals.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.schema
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(v: Any): Any =
    CharEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharEntropy.compute($v);")

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

object CharEntropy {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("collision", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
    }
    // collision index Σ c² — the Rényi-2 entropy numerator
    // (−ln(Σc²/n²)): an EXACT integer, so the external oracle matches
    // it bit-for-bit where a cross-engine Shannon ln-sum cannot (libm
    // vs JVM ln differ in the last ulp and the sum order is engine-
    // dependent); the Shannon double stays for in-engine consumers
    var collision = 0L
    var sumClnC = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      collision += c * c
      sumClnC += c * math.log(c.toDouble)
    }
    val entropy = if (n == 0) 0.0 else math.log(n.toDouble) - sumClnC / n
    val row = new GenericInternalRow(4)
    row.setLong(0, n)
    row.setInt(1, counts.size)
    row.setLong(2, collision)
    row.update(3, entropy)
    row
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new CharEntropy(ColumnBridge.expression(text)))
}
