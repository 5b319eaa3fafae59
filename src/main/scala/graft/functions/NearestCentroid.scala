package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `nearest_centroid(vec)` — broadcast cosine argmax against a
  * driver-side centroid table, as one compiled expression.
  *
  * The Column form (`array_max(array(struct(cos, cid), ...))`) builds
  * an expression tree of ~dim nodes PER CENTROID: fine at k=64, but at
  * the production SemDeDup sizing (k ≈ N/32, thousands of centroids)
  * the tree explodes past codegen limits and falls back to interpreted
  * evaluation — the r7 sf1 matrix measured the k=625 assignment at 47x
  * the k=64 time for 10x data. This expression holds the centroids as
  * plain float arrays and runs the dim×k loop in compiled code.
  *
  * Semantics are BIT-IDENTICAL to the Column form (the DuckDB oracles
  * depend on it): sequential double accumulation for dot and norm,
  * cosine = dot/(|v|·|c|), argmax by (cos, cid) with array_max's
  * ordering — NaNs compare like java.lang.Double.compare, ties take
  * the larger cid.
  */
case class NearestCentroid(child: Expression,
    centroids: Array[Array[Float]], cids: Array[Long])
  extends UnaryExpression {

  require(centroids.length == cids.length && centroids.nonEmpty)

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  // |c| per centroid, same sequential double accumulation as norm()
  @transient private lazy val cNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def nearestOf(a: Any): Long = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    var vs = 0.0
    while (i < n) {
      v(i) = arr.getFloat(i).toDouble
      vs += v(i) * v(i)
      i += 1
    }
    val vNorm = math.sqrt(vs)
    var bestCos = Double.NaN
    var bestCid = 0L
    var first = true
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var d = 0.0
      var j = 0
      val m = math.min(n, c.length)
      while (j < m) { d += v(j) * c(j); j += 1 }
      val cos = d / (vNorm * cNorms(k))
      // array_max struct ordering: Double.compare (NaN greatest),
      // tie on cos -> larger cid wins
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && cids(k) > bestCid)) {
        bestCos = cos; bestCid = cids(k); first = false
      }
      k += 1
    }
    bestCid
  }

  override protected def nullSafeEval(v: Any): Any = nearestOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nc", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.nearestOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[(Long, Seq[Float])]): Column =
    ColumnBridge.column(new NearestCentroid(ColumnBridge.expression(vec),
      centroids.map(_._2.toArray), centroids.map(_._1)))
}

/** `nearest_centroids(vec, n)` — the top-`topN` centroid ids by
  * (cos DESC, cid DESC), as an array in rank order. The multi-probe
  * generalization of [[NearestCentroid]], used for the COARSE pass of
  * two-level SemDeDup assignment (Similarity.assignTwoLevel): the
  * coarse table is √k-sized so the expression's constant stays tiny
  * even when k ≈ N/32 grows with the corpus. Same comparator as
  * NearestCentroid — java.lang.Double.compare on cos (NaN greatest),
  * ties to the larger cid — so topN=k degenerates to exactly the
  * flat argmax ranking. */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Float]], cids: Array[Long], topN: Int)
  extends UnaryExpression {

  require(centroids.length == cids.length && centroids.nonEmpty && topN > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val cNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def nearestNOf(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    var vs = 0.0
    while (i < dim) {
      v(i) = arr.getFloat(i).toDouble
      vs += v(i) * v(i)
      i += 1
    }
    val vNorm = math.sqrt(vs)
    val n = math.min(topN, centroids.length)
    // insertion top-n: coarse tables are √k-sized and n is small (≤8),
    // so the n·√k comparator cost is negligible next to the dim·√k dots
    val topCos = new Array[Double](n)
    val topCid = new Array[Long](n)
    var filled = 0
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var d = 0.0
      var j = 0
      val m = math.min(dim, c.length)
      while (j < m) { d += v(j) * c(j); j += 1 }
      val cos = d / (vNorm * cNorms(k))
      val cid = cids(k)
      // better-than test against the current worst retained entry
      def beats(co: Double, ci: Long, idx: Int): Boolean = {
        val cmp = java.lang.Double.compare(co, topCos(idx))
        cmp > 0 || (cmp == 0 && ci > topCid(idx))
      }
      if (filled < n) {
        // insert into the sorted prefix
        var p = filled
        while (p > 0 && beats(cos, cid, p - 1)) {
          topCos(p) = topCos(p - 1); topCid(p) = topCid(p - 1); p -= 1
        }
        topCos(p) = cos; topCid(p) = cid; filled += 1
      } else if (beats(cos, cid, n - 1)) {
        var p = n - 1
        while (p > 0 && beats(cos, cid, p - 1)) {
          topCos(p) = topCos(p - 1); topCid(p) = topCid(p - 1); p -= 1
        }
        topCos(p) = cos; topCid(p) = cid
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCid, filled))
  }

  override protected def nullSafeEval(v: Any): Any = nearestNOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ncs", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.nearestNOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

object NearestCentroids {
  def apply(vec: Column, centroids: Array[(Long, Seq[Float])], topN: Int): Column =
    ColumnBridge.column(new NearestCentroids(ColumnBridge.expression(vec),
      centroids.map(_._2.toArray), centroids.map(_._1), topN))
}

/** `nearest_cells_tree(vec)` — the 3-level generalization of
  * [[NearestCentroids]]: rank the top-`probe1` of k^⅓ TOP-level cells,
  * then scan only the k^⅔ MID-level centroids living in those cells
  * (CSR layout `l1Start`) and return the top-`probe2` mid-cell ids.
  * Per-row work drops from O(√k) (two-level coarse scan) to
  * O(k^⅓·(1+probe1)) — the asymptote fix for SemDeDup assignment at
  * k ≈ N/32 (r9 verdict #1: the O(N·√k)=O(N^1.5) curve was the last
  * super-linear plan). Both levels stay driver-held: k^⅔ vectors is
  * ~400 KB at k=62.5k and ~25 MB at k=31M (N=10⁹) — at which point a
  * fourth level pays; the FINE k-sized table never enters the
  * expression (it stays a distributed join, Similarity.assignTree).
  *
  * Comparator is [[NearestCentroid]]'s exactly: sequential double
  * accumulation dots, cos = d/(|v|·|c|), java.lang.Double.compare (NaN
  * greatest), ties → larger id — so probe1 = |L1| ∧ probe2 = |L2|
  * degenerates to the flat mid-cell ranking and full-probe assignment
  * is bit-identical to flat (PipelineSpec gates it). */
case class NearestCellsTree(child: Expression,
    l1Ids: Array[Long], l1Vecs: Array[Array[Float]],
    l2Ids: Array[Long], l2Vecs: Array[Array[Float]],
    l1Start: Array[Int], probe1: Int, probe2: Int)
  extends UnaryExpression {

  require(l1Ids.length == l1Vecs.length && l1Ids.nonEmpty)
  require(l2Ids.length == l2Vecs.length && l2Ids.nonEmpty)
  require(l1Start.length == l1Ids.length + 1 &&
    l1Start.head == 0 && l1Start.last == l2Ids.length)
  require(probe1 > 0 && probe2 > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells_tree"

  @transient private lazy val l1Norms: Array[Double] = l1Vecs.map(normOf)
  @transient private lazy val l2Norms: Array[Double] = l2Vecs.map(normOf)

  private def normOf(c: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cellsOf(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    var vs = 0.0
    while (i < dim) {
      v(i) = arr.getFloat(i).toDouble
      vs += v(i) * v(i)
      i += 1
    }
    val vNorm = math.sqrt(vs)

    // ---- level 1: top-probe1 cell INDEXES (ids only break ties) ----
    val n1 = math.min(probe1, l1Vecs.length)
    val c1 = new Array[Double](n1)
    val x1 = new Array[Int](n1)
    var f1 = 0
    var k = 0
    while (k < l1Vecs.length) {
      val c = l1Vecs(k)
      var d = 0.0
      var j = 0
      val m = math.min(dim, c.length)
      while (j < m) { d += v(j) * c(j); j += 1 }
      val cos = d / (vNorm * l1Norms(k))
      def beats1(idx: Int): Boolean = {
        val cmp = java.lang.Double.compare(cos, c1(idx))
        cmp > 0 || (cmp == 0 && l1Ids(k) > l1Ids(x1(idx)))
      }
      if (f1 < n1) {
        var p = f1
        while (p > 0 && beats1(p - 1)) { c1(p) = c1(p - 1); x1(p) = x1(p - 1); p -= 1 }
        c1(p) = cos; x1(p) = k; f1 += 1
      } else if (beats1(n1 - 1)) {
        var p = n1 - 1
        while (p > 0 && beats1(p - 1)) { c1(p) = c1(p - 1); x1(p) = x1(p - 1); p -= 1 }
        c1(p) = cos; x1(p) = k
      }
      k += 1
    }

    // ---- level 2: top-probe2 mid ids among the selected cells' CSR slices ----
    val n2 = math.min(probe2, l2Vecs.length)
    val c2 = new Array[Double](n2)
    val i2 = new Array[Long](n2)
    var f2 = 0
    var s = 0
    while (s < f1) {
      val cell = x1(s)
      var t = l1Start(cell)
      val end = l1Start(cell + 1)
      while (t < end) {
        val c = l2Vecs(t)
        var d = 0.0
        var j = 0
        val m = math.min(dim, c.length)
        while (j < m) { d += v(j) * c(j); j += 1 }
        val cos = d / (vNorm * l2Norms(t))
        val cid = l2Ids(t)
        def beats2(idx: Int): Boolean = {
          val cmp = java.lang.Double.compare(cos, c2(idx))
          cmp > 0 || (cmp == 0 && cid > i2(idx))
        }
        if (f2 < n2) {
          var p = f2
          while (p > 0 && beats2(p - 1)) { c2(p) = c2(p - 1); i2(p) = i2(p - 1); p -= 1 }
          c2(p) = cos; i2(p) = cid; f2 += 1
        } else if (beats2(n2 - 1)) {
          var p = n2 - 1
          while (p > 0 && beats2(p - 1)) { c2(p) = c2(p - 1); i2(p) = i2(p - 1); p -= 1 }
          c2(p) = cos; i2(p) = cid
        }
        t += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(i2, f2))
  }

  override protected def nullSafeEval(v: Any): Any = cellsOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nct", this, classOf[NearestCellsTree].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.cellsOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellsTree =
    copy(child = c)
}

object NearestCellsTree {
  def apply(vec: Column, l1: Array[(Long, Array[Float])],
      l2: Array[(Long, Array[Float])], l1Start: Array[Int],
      probe1: Int, probe2: Int): Column =
    ColumnBridge.column(new NearestCellsTree(ColumnBridge.expression(vec),
      l1.map(_._1), l1.map(_._2), l2.map(_._1), l2.map(_._2),
      l1Start, probe1, probe2))
}

/** `nearest_fine_tree(vec)` — the FULL three-level probe compiled into
  * one expression: [[NearestCellsTree]]'s L1/L2 selection (identical
  * comparators), then an argmax scan over the FINE centroids of the
  * selected mid cells (CSR `l2Start` over `l3*`), returning the best
  * fine id directly. This replaces the distributed
  * explode→join→SortAggregate pipeline wherever the fine table fits
  * the driver (Similarity.assignTree, k ≤ fineExprMax): at sf1000p
  * (N=20M, k=625k, nProbe=4) that pipeline fed ~6.9 BILLION candidate
  * rows through a partial-aggregate sort — its spills exhausted the
  * measurement VM's disk even with skinny rows — where this expression
  * is one map-only pass of ~770 compiled dots per row, zero shuffles,
  * zero aggregate state.
  *
  * Fine argmax comparator = the join path's `max(struct(cos, cid))`
  * exactly: java.lang.Double.compare on cos (NaN greatest), ties to
  * the larger fine id — full probe stays bit-identical to flat
  * (PipelineSpec gates it). */
case class NearestFineTree(child: Expression,
    l1Ids: Array[Long], l1Vecs: Array[Array[Float]],
    l2Ids: Array[Long], l2Vecs: Array[Array[Float]],
    l1Start: Array[Int], probe1: Int, probe2: Int,
    l3Ids: Array[Long], l3Vecs: Array[Array[Float]],
    l2Start: Array[Int])
  extends UnaryExpression {

  require(l1Ids.length == l1Vecs.length && l1Ids.nonEmpty)
  require(l2Ids.length == l2Vecs.length && l2Ids.nonEmpty)
  require(l3Ids.length == l3Vecs.length && l3Ids.nonEmpty)
  require(l1Start.length == l1Ids.length + 1 &&
    l1Start.head == 0 && l1Start.last == l2Ids.length)
  require(l2Start.length == l2Ids.length + 1 &&
    l2Start.head == 0 && l2Start.last == l3Ids.length)
  require(probe1 > 0 && probe2 > 0)

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_fine_tree"

  @transient private lazy val l1Norms: Array[Double] = l1Vecs.map(normOf)
  @transient private lazy val l2Norms: Array[Double] = l2Vecs.map(normOf)
  @transient private lazy val l3Norms: Array[Double] = l3Vecs.map(normOf)

  private def normOf(c: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def fineOf(a: Any): Long = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    var vs = 0.0
    while (i < dim) {
      v(i) = arr.getFloat(i).toDouble
      vs += v(i) * v(i)
      i += 1
    }
    val vNorm = math.sqrt(vs)
    def cosOf(c: Array[Float], nrm: Double): Double = {
      var d = 0.0
      var j = 0
      val m = math.min(dim, c.length)
      while (j < m) { d += v(j) * c(j); j += 1 }
      d / (vNorm * nrm)
    }

    // ---- level 1: top-probe1 cell indexes (NearestCellsTree verbatim)
    val n1 = math.min(probe1, l1Vecs.length)
    val c1 = new Array[Double](n1)
    val x1 = new Array[Int](n1)
    var f1 = 0
    var k = 0
    while (k < l1Vecs.length) {
      val cos = cosOf(l1Vecs(k), l1Norms(k))
      def beats1(idx: Int): Boolean = {
        val cmp = java.lang.Double.compare(cos, c1(idx))
        cmp > 0 || (cmp == 0 && l1Ids(k) > l1Ids(x1(idx)))
      }
      if (f1 < n1) {
        var p = f1
        while (p > 0 && beats1(p - 1)) { c1(p) = c1(p - 1); x1(p) = x1(p - 1); p -= 1 }
        c1(p) = cos; x1(p) = k; f1 += 1
      } else if (beats1(n1 - 1)) {
        var p = n1 - 1
        while (p > 0 && beats1(p - 1)) { c1(p) = c1(p - 1); x1(p) = x1(p - 1); p -= 1 }
        c1(p) = cos; x1(p) = k
      }
      k += 1
    }

    // ---- level 2: top-probe2 mid INDEXES among the selected cells ----
    val n2 = math.min(probe2, l2Vecs.length)
    val c2 = new Array[Double](n2)
    val x2 = new Array[Int](n2)
    var f2 = 0
    var s = 0
    while (s < f1) {
      val cell = x1(s)
      var t = l1Start(cell)
      val end = l1Start(cell + 1)
      while (t < end) {
        val cos = cosOf(l2Vecs(t), l2Norms(t))
        def beats2(idx: Int): Boolean = {
          val cmp = java.lang.Double.compare(cos, c2(idx))
          cmp > 0 || (cmp == 0 && l2Ids(t) > l2Ids(x2(idx)))
        }
        if (f2 < n2) {
          var p = f2
          while (p > 0 && beats2(p - 1)) { c2(p) = c2(p - 1); x2(p) = x2(p - 1); p -= 1 }
          c2(p) = cos; x2(p) = t; f2 += 1
        } else if (beats2(n2 - 1)) {
          var p = n2 - 1
          while (p > 0 && beats2(p - 1)) { c2(p) = c2(p - 1); x2(p) = x2(p - 1); p -= 1 }
          c2(p) = cos; x2(p) = t
        }
        t += 1
      }
      s += 1
    }

    // ---- level 3: argmax over the selected mid cells' fine slices ----
    // max(struct(cos, cid)) semantics: Double.compare, ties -> larger id
    var bestCos = Double.NaN
    var bestId = Long.MinValue
    var first = true
    var u = 0
    while (u < f2) {
      val mid = x2(u)
      var t = l2Start(mid)
      val end = l2Start(mid + 1)
      while (t < end) {
        val cos = cosOf(l3Vecs(t), l3Norms(t))
        val fid = l3Ids(t)
        val cmp = java.lang.Double.compare(cos, bestCos)
        if (first || cmp > 0 || (cmp == 0 && fid > bestId)) {
          bestCos = cos; bestId = fid; first = false
        }
        t += 1
      }
      u += 1
    }
    // no-candidate (every probed mid slice empty — possible since
    // fines are nearest-mid assigned): LOUD failure rather than
    // Long.MinValue leaking as a plausible cluster id (r12 advisor).
    // A null + caller-side filter was tried first and measured: the
    // deterministic isnotnull predicate pushes below the Project and
    // the ~k^(1/3)·(probe) compiled dots evaluate TWICE per row —
    // throwing keeps the probe a single map-only evaluation.
    if (first) throw new IllegalStateException(
      "nearest_fine_tree: no fine candidates in any probed mid cell " +
        "(all probed slices empty) — raise nProbe or rebuild the tree")
    bestId
  }

  override protected def nullSafeEval(v: Any): Any = fineOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nft", this, classOf[NearestFineTree].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.fineOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestFineTree =
    copy(child = c)
}

object NearestFineTree {
  def apply(vec: Column, l1: Array[(Long, Array[Float])],
      l2: Array[(Long, Array[Float])], l1Start: Array[Int],
      probe1: Int, probe2: Int, l3: Array[(Long, Array[Float])],
      l2Start: Array[Int]): Column =
    ColumnBridge.column(new NearestFineTree(ColumnBridge.expression(vec),
      l1.map(_._1), l1.map(_._2), l2.map(_._1), l2.map(_._2),
      l1Start, probe1, probe2, l3.map(_._1), l3.map(_._2), l2Start))
}

/** `nearest_centroid_cos(vec)` — [[NearestCentroid]]'s argmax WITH the
  * winning cosine: struct(cid, cos). The semantic-decontamination gate
  * needs the VALUE (flag rows whose best benchmark cosine clears a
  * threshold), not just the winner id — same comparator, same
  * sequential double accumulation, one compiled dim×k pass. */
case class NearestCentroidCos(child: Expression,
    centroids: Array[Array[Float]], cids: Array[Long])
  extends UnaryExpression {

  require(centroids.length == cids.length && centroids.nonEmpty)

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid_cos"

  @transient private lazy val cNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def nearestOf(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    var vs = 0.0
    while (i < n) {
      v(i) = arr.getFloat(i).toDouble
      vs += v(i) * v(i)
      i += 1
    }
    val vNorm = math.sqrt(vs)
    var bestCos = Double.NaN
    var bestCid = 0L
    var first = true
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var d = 0.0
      var j = 0
      val m = math.min(n, c.length)
      while (j < m) { d += v(j) * c(j); j += 1 }
      val cos = d / (vNorm * cNorms(k))
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && cids(k) > bestCid)) {
        bestCos = cos; bestCid = cids(k); first = false
      }
      k += 1
    }
    InternalRow(bestCid, bestCos)
  }

  override protected def nullSafeEval(v: Any): Any = nearestOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ncc", this, classOf[NearestCentroidCos].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.nearestOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidCos =
    copy(child = c)
}

object NearestCentroidCos {
  def apply(vec: Column, centroids: Array[(Long, Seq[Float])]): Column =
    ColumnBridge.column(new NearestCentroidCos(ColumnBridge.expression(vec),
      centroids.map(_._2.toArray), centroids.map(_._1)))
}

/** `dot_f(a, b)` — compiled sequential-order double dot product of two
  * float vectors: bit-identical to the HOF form
  * (`aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)` with double
  * casts), but ~10× cheaper per pair — the HOF materializes the
  * product array per evaluation, which at the two-level assignment's
  * ~N·√k candidate pairs dominated the whole stage (r8 AssignBench:
  * 68 s → compiled path, see Similarity.assignTwoLevel). Mismatched
  * lengths stop at the shorter (the HOF pads null and the double sum
  * then nulls out — callers only compare equal-dim corpus vectors). */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  def dotOf(a: Any, b: Any): Double = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = dotOf(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotf", this, classOf[DotF].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.dotOf($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotF = copy(left = l, right = r)
}

object DotF {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new DotF(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** `pq_encode(vec)` — product-quantization encoding against a
  * driver-held codebook sample: the D dims split into `m` contiguous
  * subspaces; per subspace the code is the ARGMIN squared-L2 over the
  * k codebook rows' matching slice (sequential double accumulation in
  * dim order; ties → the smaller code index), and `mse` is the total
  * reconstruction error Σ_subspace dist(chosen) / D with the subspace
  * partials summed in ascending-m order — every step replayable by an
  * external SQL engine (the embed_pq oracle). Returns
  * struct<codes: array<int>, mse: double>. */
case class PqEncode(child: Expression, codebook: Array[Array[Float]], m: Int)
  extends UnaryExpression {

  require(codebook.nonEmpty && m > 0)

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("mse", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"

  def encodeOf(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val sub = d / m // trailing remainder dims join the last subspace
    val codes = new Array[Int](m)
    var total = 0.0
    var s = 0
    while (s < m) {
      val from = s * sub
      val until = if (s == m - 1) d else from + sub
      var bestJ = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < codebook.length) {
        val c = codebook(j)
        var acc = 0.0
        var i = from
        val lim = math.min(until, c.length)
        while (i < lim) {
          val diff = arr.getFloat(i).toDouble - c(i).toDouble
          acc += diff * diff
          i += 1
        }
        if (acc < bestDist) { bestDist = acc; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      total += bestDist
      s += 1
    }
    InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes),
      if (d == 0) 0.0 else total / d)
  }

  override protected def nullSafeEval(v: Any): Any = encodeOf(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pq", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.encodeOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

object PqEncode {
  def apply(vec: Column, codebook: Array[Seq[Float]], m: Int): Column =
    ColumnBridge.column(new PqEncode(ColumnBridge.expression(vec),
      codebook.map(_.toArray), m))
}
