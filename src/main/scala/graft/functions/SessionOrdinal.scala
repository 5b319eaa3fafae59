package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-partition streaming session ordinal — the gap-sessionization
  * primitive behind grouping-by()/suppress()
  * (`/root/reference/modules/dbparser/groupingby.c:35-51`,
  * `lib/logwriter.c:565-640`).
  *
  * Contract: the input partition holds ALL rows of each key (hash
  * partitioning on the key) and is sorted by (key, ts). Under that
  * contract the expression is a pure prefix scan: the ordinal
  * increments whenever the key changes or `ts - prevTs >= gapMicros`,
  * so `(key, ordinal)` identifies one session. Ordinals are unique per
  * partition (they keep counting across keys), which grouping never
  * observes. Ties in ts cannot open a gap, so the assignment is
  * deterministic under retries even when the sort order of equal
  * (key, ts) rows is not.
  *
  * Why this exists (r14): both of Spark's builtin routes to session
  * aggregation measured superlinear decades on uniform data at sf100p —
  * `session_window` plans a useless pre-exchange partial
  * ObjectHashAggregate (37x/decade, r13), and the lag/running-sum
  * Window rewrite still pays WindowExec's per-group row buffering
  * (ExternalAppendOnlyUnsafeRowArray.add copies every UnsafeRow, twice
  * across the two window passes — jstack-sampled hot frames, 21-33x
  * last decade in scale_matrix_r14.jsonl). A sessionization scan needs
  * NO buffering: this expression is O(1) state per row inside a
  * codegen'd Project riding the one key exchange + one in-partition
  * sort, leaving the whole stage codegen'd.
  */
case class SessionOrdinal(key: Expression, tsMicros: Expression,
    gapMicros: Long, split: Option[Expression] = None)
    extends Expression with Nondeterministic {

  override def children: Seq[Expression] = Seq(key, tsMicros) ++ split
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def stateful: Boolean = true
  override def prettyName: String = "session_ordinal"

  override def checkInputDataTypes(): TypeCheckResult =
    if (tsMicros.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"session_ordinal ts must be long micros, got ${tsMicros.dataType}")
    else if (split.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"session_ordinal split must be long, got ${split.get.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private var prevSet = false
  @transient private var prevNull = false
  @transient private var prevKey: Any = null
  @transient private var prevTs = 0L
  @transient private var prevSplit = 0L
  @transient private var ord = 0L

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    prevSet = false; prevNull = false; prevKey = null; prevTs = 0L
    prevSplit = 0L; ord = 0L
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val k = key.eval(input)
    val kNull = k == null
    val t = tsMicros.eval(input).asInstanceOf[Long]
    // skew-split sub-key (Sessions.skewSessionAgg): a hot key's rows
    // are partitioned into contiguous ts-range splits — a split change
    // opens a new LOCAL session even when the ts gap is small (the
    // cross-split stitch re-joins them downstream). Null split = 0.
    val sp = split.map(_.eval(input)) match {
      case Some(v) if v != null => v.asInstanceOf[Long]
      case _ => 0L
    }
    val newSession = !prevSet || kNull != prevNull ||
      (!kNull && !k.equals(prevKey)) || sp != prevSplit ||
      t - prevTs >= gapMicros
    if (newSession) ord += 1
    prevSet = true
    prevNull = kNull
    // UnsafeRow-backed strings alias task-reused buffers — copy on hold
    prevKey = k match { case s: UTF8String => s.clone(); case o => o }
    prevTs = t
    prevSplit = sp
    ord
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyEv = key.genCode(ctx)
    val tsEv = tsMicros.genCode(ctx)
    val kt = CodeGenerator.javaType(key.dataType)
    val pKey = ctx.addMutableState(kt, "soPrevKey")
    val pSet = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "soPrevSet")
    val pNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "soPrevNull")
    val pTs = ctx.addMutableState(CodeGenerator.JAVA_LONG, "soPrevTs")
    val pSp = ctx.addMutableState(CodeGenerator.JAVA_LONG, "soPrevSplit")
    val ordV = ctx.addMutableState(CodeGenerator.JAVA_LONG, "soOrd")
    ctx.addPartitionInitializationStatement(s"$pSet = false;")
    ctx.addPartitionInitializationStatement(s"$pNull = false;")
    ctx.addPartitionInitializationStatement(s"$pTs = 0L;")
    ctx.addPartitionInitializationStatement(s"$pSp = 0L;")
    ctx.addPartitionInitializationStatement(s"$ordV = 0L;")
    val (spCode, spVal) = split match {
      case Some(sp) =>
        val spEv = sp.genCode(ctx)
        val v = ctx.freshName("soSplit")
        (code"""
          ${spEv.code}
          final long $v = ${spEv.isNull} ? 0L : ${spEv.value};
        """, v)
      case None => (code"", "0L")
    }
    val eq = ctx.genEqual(key.dataType, keyEv.value, pKey)
    val store = key.dataType match {
      case _: StringType =>
        s"$pKey = ${keyEv.isNull} ? null : ${keyEv.value}.clone();"
      case _ => s"$pKey = ${keyEv.value};"
    }
    ev.copy(code = code"""
      ${keyEv.code}
      ${tsEv.code}
      $spCode
      boolean ${ev.value}_new;
      if (!$pSet) {
        ${ev.value}_new = true;
      } else if (${keyEv.isNull} != $pNull) {
        ${ev.value}_new = true;
      } else if (!${keyEv.isNull} && !($eq)) {
        ${ev.value}_new = true;
      } else if ($spVal != $pSp) {
        ${ev.value}_new = true;
      } else {
        ${ev.value}_new = (${tsEv.value} - $pTs) >= ${gapMicros}L;
      }
      if (${ev.value}_new) $ordV++;
      $pSet = true;
      $pNull = ${keyEv.isNull};
      $store
      $pTs = ${tsEv.value};
      $pSp = $spVal;
      final long ${ev.value} = $ordV;
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SessionOrdinal =
    copy(key = newChildren(0), tsMicros = newChildren(1),
      split = if (newChildren.length > 2) Some(newChildren(2)) else None)
}

object SessionOrdinal {
  def column(key: Column, tsMicros: Column, gapMicros: Long): Column =
    ColumnBridge.column(SessionOrdinal(ColumnBridge.expression(key),
      ColumnBridge.expression(tsMicros), gapMicros))

  /** Skew-split form: `split` (long) joins the session key — a split
    * change opens a new local session regardless of the ts gap. */
  def column(key: Column, tsMicros: Column, gapMicros: Long,
      split: Column): Column =
    ColumnBridge.column(SessionOrdinal(ColumnBridge.expression(key),
      ColumnBridge.expression(tsMicros), gapMicros,
      Some(ColumnBridge.expression(split))))
}
