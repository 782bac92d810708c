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

  def matVecMul(e: Column, matrix: Array[Array[Double]],
      center: Array[Double]): Column =
    ColumnBridge.column(MatVecMul(ColumnBridge.expression(e), matrix, center))
}
