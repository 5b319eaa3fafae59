package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hyperplane_buckets(vec)` — ALL `tables` random-hyperplane LSH
  * bucket keys of a float vector in one compiled pass.
  *
  * The Column form (`Similarity.hyperplaneBucket` per table) evaluates
  * tables × planes HOF dot products, each materializing a zip_with
  * product array per row — at the production signing shape
  * (planesFor ≈ log2(N/32) planes × 4 tables, 52 dots a row at sf10p)
  * that allocation was the whole stage: dedup_embedding_prod measured
  * 36.9 s at sf10p with the per-row signing cost carrying the log
  * factor (r8 verdict #1). This expression runs the
  * tables × planes × dim loop in compiled code over one float read of
  * the vector — same cure as [[DotF]] for the pairwise stage.
  *
  * Semantics are BIT-IDENTICAL to the Column form (the dedup_embedding
  * oracle replays the buckets in DuckDB): hyperplane components derive
  * from md5 exactly as [[HyperplaneBuckets.hyperplane]], the dot is the
  * sequential double accumulation of float-cast components, bit p of
  * table t's bucket is set iff d >= 0, and a vector whose length is not
  * `dim` fails loudly (the Column form's raise_error guard: a silently
  * zero-padded dot collapses every vector into one bucket and the
  * candidate join goes quadratic).
  */
case class HyperplaneBuckets(child: Expression, seed: Long, planes: Int,
    tables: Int, dim: Int) extends UnaryExpression {

  require(planes > 0 && tables > 0 && dim > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  // derived lazily on each executor from (seed, planes, tables, dim) —
  // the md5 derivation is deterministic, so the serialized expression
  // stays a few longs instead of tables*planes*dim doubles
  @transient private lazy val hps: Array[Array[Double]] =
    Array.tabulate(tables * planes) { tp =>
      HyperplaneBuckets.hyperplane(seed + tp / planes, tp % planes, dim)
    }

  def bucketsOf(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplaneBucket: dim=$dim but vector has ${arr.numElements()} components")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val hp = hps(t * planes + p)
        var d = 0.0
        var j = 0
        while (j < dim) { d += v(j) * hp(j); j += 1 }
        if (d >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = bucketsOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hpb", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.bucketsOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}

object HyperplaneBuckets {
  /** Deterministic hyperplane: component i of plane p is
    * `(md5_lower64("hp_<seed>_<p>_<i>") >>> 11) / 2^53 * 2 - 1` — only
    * the top 53 bits so the integer→double conversion is exact on every
    * engine (an external oracle reproduces the component bit-for-bit).
    * Shared with the Column-form signer in graft.pipeline.Similarity. */
  def hyperplane(seed: Long, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = Sketches.md5Lower64(UTF8String.fromString(s"hp_${seed}_${p}_${i}"))
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  def apply(vec: Column, seed: Long, planes: Int, tables: Int, dim: Int): Column =
    ColumnBridge.column(new HyperplaneBuckets(ColumnBridge.expression(vec),
      seed, planes, tables, dim))
}
