package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Slog

/** The `$(slog -k FILE -m FILE msg)` per-row form (tf_slog_call,
  * `/root/reference/modules/secure-logging/secure-logging.c:196-255`):
  * row `seq` (0-based within the run) encrypts under key
  * evolve^seq(k0) with entry counter `counter0 + seq`, where
  * (k0, counter0) came from the key file at template-compile time
  * (tf_slog_prepare's readKey).
  *
  * The reference holds the chain as process state (one key, evolved
  * per call); the closed form key_n = evolve^n(k0) makes the entry a
  * pure row function, so encryption is map-only and parallel. The
  * file side effects (evolved key + counter written back per call,
  * aggregated MAC to the mac file) are recomputable from the entries:
  * [[Slog.verifyChain]] re-folds the MAC, and a sink settles the two
  * files after materialization ([[Slog.writeKeyFile]] /
  * [[Slog.writeMacFile]]). The scalable many-chain form remains
  * [[Slog.encryptLog]] (one chain per shard).
  */
case class SlogChainEntry(msg: Expression, seq: Expression,
    k0: Array[Byte], counter0: Long)
  extends BinaryExpression with CodegenFallback {
  override def left: Expression = msg
  override def right: Expression = seq
  override def dataType: DataType = StringType
  override def prettyName: String = "slog_entry"

  // forward memo, per thread: rows arrive roughly seq-ascending within
  // a partition, so evolving from the previous row's key keeps the
  // amortized evolution count O(1) per row; a backward jump recomputes
  // from k0 (correct, just slower)
  @transient private lazy val memo = new ThreadLocal[(Long, Array[Byte])]()

  private def keyAt(n: Long): Array[Byte] = {
    val m = memo.get()
    var i = if (m != null && m._1 <= n) m._1 else 0L
    var k = if (m != null && m._1 <= n) m._2 else k0.clone()
    while (i < n) { k = Slog.evolveKey(k); i += 1 }
    memo.set((n, k))
    k
  }

  override protected def nullSafeEval(m: Any, s: Any): Any = {
    val n = s.asInstanceOf[Long]
    require(n >= 0, s"slog_entry: negative sequence $n")
    val text0 = m.asInstanceOf[UTF8String].toString
    // tf_slog_call: a zero-length message encrypts the error literal
    val text =
      if (text0.isEmpty) "[SLOG] ERROR: String of length 0 received"
      else text0
    val key = keyAt(n)
    UTF8String.fromString(Slog.entryLine(counter0 + n, key, text,
      Slog.entryIv(key, counter0 + n, text)))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SlogChainEntry = copy(msg = l, seq = r)
}

object SlogChainEntry {
  def apply(msg: Column, seq: Column, k0: Array[Byte],
      counter0: Long): Column =
    ColumnBridge.column(new SlogChainEntry(ColumnBridge.expression(msg),
      ColumnBridge.expression(seq), k0, counter0))
}
