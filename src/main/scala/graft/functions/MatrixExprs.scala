package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Matrix-shaped vector kernels: the second-moment (Gram) aggregate
  * behind distributed PCA, and a projection expression that carries a
  * whole components matrix as ONE plan reference object (same
  * discipline as [[CentroidArgMin]] — plan size constant in the matrix
  * shape, tight generated loops, map-only).
  */

/** Distributed second-moment accumulator over an embedding column:
  * one pass, per-partition partials, associative merge — the scale
  * path to a covariance matrix (n, Σx, ΣxxT upper triangle packed
  * row-major) without ever exploding rows to (i, j) pairs.
  *
  * Buffer layout: [n, s_0..s_{d-1}, g_00, g_01, .., g_0(d-1), g_11, ..]
  * (1 + d + d(d+1)/2 doubles). The eval result is that buffer as
  * `array<double>`; [[graft.ext.Pca]] unpacks it driver-side (one row,
  * ~d²/2 doubles — broadcast-sized for embedding dims).
  *
  * Double accumulation is partition-order dependent in the last ulp —
  * fine for the eigen solve it feeds; the oracle-gated covariance query
  * uses the decimal-exact declarative path instead
  * ([[graft.ext.Pca.covariance]]). */
case class GramMatrixAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def prettyName: String = "graft_gram_agg"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      buf(0) += 1.0
      i = 0
      while (i < n) {
        buf(1 + i) += x(i)
        var j = i
        while (j < n) {
          // packed upper-triangle offset for (i, j), i <= j
          buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i)) += x(i) * x(j)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
}

/** Decimal-EXACT second-moment product sums: for each (i <= j) pair of
  * coordinates, Σ over rows of `CAST(xᵢ·xⱼ AS DECIMAL(28,12))`,
  * accumulated in exact java BigDecimals — bit-identical to the SQL
  * `sum(cast(xi * xj as decimal(28,12)))` of the declarative explode
  * formulation (each product goes through Spark's own `Decimal`
  * double→decimal conversion before the add), but ONE pass with
  * sketch-sized partials instead of an n·d(d+1)/2-row shuffle. Output:
  * `array<decimal(38,12)>` of length d(d+1)/2, packed row-major upper
  * triangle. The oracle-checkable face of [[GramMatrixAgg]]. */
case class DecimalGramAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecimalGramAgg.Buf]
  with UnaryLike[Expression] {
  import DecimalGramAgg.Buf

  private val triLen = dim * (dim + 1) / 2

  override def prettyName: String = "graft_decimal_gram_agg"
  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Buf = Buf(new Array[Long](triLen), null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      i = 0
      while (i < n) {
        val base = i * dim - i * (i - 1) / 2 - i
        var j = i
        while (j < n) {
          val p = x(i) * x(j)
          // Fast path: the SQL cast rounds the shortest decimal repr of
          // p HALF_UP to scale 12. Away from a .5 rounding boundary the
          // numeric result is identical and needs no BigDecimal: for
          // |p| <= 10 the combined repr+multiply error is < 3e-3
          // unscaled units, so a 0.01 guard band is conservative.
          val y = p * 1e12
          val ay = math.abs(y)
          // non-finite products: SQL cast yields null -> sum skips
          var done = java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)
          if (ay < 1e13) { // |p| <= 10: combined error < 3e-3 unscaled
            val f = ay - math.floor(ay)
            if (math.abs(f - 0.5) > 0.01) {
              val mag = if (f > 0.5) math.floor(ay) + 1.0 else math.floor(ay)
              buf.addLong(base + j, (if (y < 0) -mag else mag).toLong)
              done = true
            }
          }
          if (!done) {
            // boundary/huge values: the exact string-based conversion
            // (what Spark's Decimal.set(Double) does), HALF_UP scale 12
            val scaled = java.math.BigDecimal.valueOf(p)
              .setScale(12, java.math.RoundingMode.HALF_UP)
            if (scaled.precision() <= 28) { // CAST overflow -> null -> skip
              buf.add(base + j, scaled)
            }
          }
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = b1.mergeFrom(b2)

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](triLen)
    var i = 0
    while (i < triLen) {
      val d = org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(buf.total(i)))
      d.changePrecision(38, 12)
      out(i) = d
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(triLen)
    var i = 0
    while (i < triLen) {
      val bytes = buf.total(i).unscaledValue().toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val big = new Array[java.math.BigDecimal](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      big(i) = new java.math.BigDecimal(new java.math.BigInteger(b), 12)
      i += 1
    }
    Buf(new Array[Long](n), big)
  }

  override def withNewMutableAggBufferOffset(o: Int): DecimalGramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalGramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): DecimalGramAgg =
    copy(child = newChild)
}

object DecimalGramAgg {
  /** Exact scale-12 accumulator: hot path sums UNSCALED LONGS (one
    * Math.addExact per product — embeddings keep unscaled values far
    * under 2^63); a rare magnitude/sum overflow spills that slot into a
    * lazily-allocated exact BigDecimal side array, so the result is
    * exact at ANY scale. */
  final case class Buf(longs: Array[Long], var big: Array[java.math.BigDecimal]) {
    private def spill(k: Int, v: java.math.BigDecimal): Unit = {
      if (big == null) big = new Array[java.math.BigDecimal](longs.length)
      big(k) = if (big(k) == null) v else big(k).add(v)
    }

    def add(k: Int, scaled: java.math.BigDecimal): Unit = {
      val unscaled = scaled.unscaledValue()
      if (unscaled.bitLength() < 63) addLong(k, unscaled.longValue())
      else spill(k, scaled)
    }

    /** Accumulate an unscaled scale-12 long with overflow spill. */
    def addLong(k: Int, l: Long): Unit = {
      val prev = longs(k)
      val next = prev + l
      // overflow check (addExact semantics without the throw)
      if (((prev ^ next) & (l ^ next)) < 0) {
        longs(k) = 0L
        spill(k, java.math.BigDecimal.valueOf(prev, 12).add(
          java.math.BigDecimal.valueOf(l, 12)))
      } else longs(k) = next
    }

    def mergeFrom(o: Buf): Buf = {
      var i = 0
      while (i < longs.length) {
        val l = o.longs(i)
        if (l != 0L) {
          val prev = longs(i)
          val next = prev + l
          if (((prev ^ next) & (l ^ next)) < 0) {
            longs(i) = 0L
            spill(i, java.math.BigDecimal.valueOf(prev, 12).add(
              java.math.BigDecimal.valueOf(l, 12)))
          } else longs(i) = next
        }
        if (o.big != null && o.big(i) != null) spill(i, o.big(i))
        i += 1
      }
      this
    }

    def total(k: Int): java.math.BigDecimal = {
      val l = java.math.BigDecimal.valueOf(longs(k), 12)
      if (big != null && big(k) != null) l.add(big(k)) else l
    }
  }
}

/** y = M · (x − c): project an embedding onto `matrix` rows after
  * centering — the PCA/whitening transform as one codegen'd map-only
  * expression. The components matrix and center ride the plan as
  * reference objects (shipped once per executor), the generated code is
  * a two-level loop, and the expression stays inside WholeStageCodegen;
  * output is `array<double>` of length `matrix.length`. */
case class MatVecMul(child: Expression, matrix: Array[Array[Double]],
    center: Array[Double]) extends UnaryExpression {
  override def prettyName: String = "graft_matvec_mul"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Double](matrix.length)
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      val n = math.min(x.numElements(), math.min(row.length, center.length))
      var s = 0.0
      var i = 0
      while (i < n) {
        val xi = elemT match {
          case FloatType => x.getFloat(i).toDouble
          case _ => x.getDouble(i)
        }
        s += row(i) * (xi - center(i))
        i += 1
      }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xa => {
      val mat = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val ctr = ctx.addReferenceObj("center", center, "double[]")
      val getX = elemT match {
        case FloatType => (i: String) => s"(double) $xa.getFloat($i)"
        case _ => (i: String) => s"$xa.getDouble($i)"
      }
      val (out, r, row) = (ctx.freshName("out"), ctx.freshName("r"), ctx.freshName("row"))
      val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
      s"""
         |double[] $out = new double[$mat.length];
         |for (int $r = 0; $r < $mat.length; $r++) {
         |  double[] $row = $mat[$r];
         |  int $n = java.lang.Math.min($xa.numElements(),
         |    java.lang.Math.min($row.length, $ctr.length));
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $row[$i] * (${getX(i)} - $ctr[$i]);
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatrixFunctions {
  def gramAgg(e: Column, dim: Int): Column =
    ColumnBridge.column(GramMatrixAgg(ColumnBridge.expression(e), dim)
      .toAggregateExpression())

  def decimalGramAgg(e: Column, dim: Int): Column =
    ColumnBridge.column(DecimalGramAgg(ColumnBridge.expression(e), dim)
      .toAggregateExpression())

  def matVecMul(e: Column, matrix: Array[Array[Double]],
      center: Array[Double]): Column =
    ColumnBridge.column(MatVecMul(ColumnBridge.expression(e), matrix, center))
}
