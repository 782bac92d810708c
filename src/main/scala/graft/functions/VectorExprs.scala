package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) vector kernels over `array<float>` /
  * `array<double>` embedding columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates one interpreted lambda call per element per row; on an
  * all-pairs similarity join that is O(pairs × dim) lambda dispatches and
  * dominated the benchmark. These expressions generate a tight Java loop
  * inside the surrounding codegen stage instead — same double-precision
  * sequential accumulation order, ~100× less overhead, and they keep the
  * join stage inside WholeStageCodegen.
  *
  * Accumulation is sequential in index order with each accumulator
  * independent, so results are bit-identical to the sequential fold the
  * DuckDB oracles mirror. Array elements must be non-null; lengths are
  * clamped to the shorter side (embeddings are fixed-dim in practice).
  */
private[graft] trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  protected def getD(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Java source reading element `i` of `arr` as double. */
  protected def getJ(arr: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ in double precision, sequential. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getD(x, lt, i) * getD(y, rt, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getJ(xa, elemType(left), i)} * ${getJ(ya, elemType(right), i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot(a,b) / sqrt(dot(a,a) · dot(b,b)) — the three dots
  * fused into one pass (three independent sequential accumulators, so
  * each is identical to its standalone fold). */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var (sab, saa, sbb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < n) {
      val (p, q) = (getD(x, lt, i), getD(y, rt, i))
      sab += p * q; saa += p * p; sbb += q * q
      i += 1
    }
    sab / math.sqrt(saa * sbb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val (sab, saa, sbb) = (ctx.freshName("sab"), ctx.freshName("saa"), ctx.freshName("sbb"))
      val (i, p, q) = (ctx.freshName("i"), ctx.freshName("p"), ctx.freshName("q"))
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = ${getJ(xa, elemType(left), i)};
         |  double $q = ${getJ(ya, elemType(right), i)};
         |  $sab += $p * $q; $saa += $p * $p; $sbb += $q * $q;
         |}
         |${ev.value} = $sab / java.lang.Math.sqrt($saa * $sbb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqdist(a, b) = Σ (aᵢ−bᵢ)² in double precision, sequential — the
  * k-means assignment metric (argmin over it ≡ argmin over euclidean). */
case class SqDist(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = getD(x, lt, i) - getD(y, rt, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val (n, s) = (ctx.freshName("n"), ctx.freshName("s"))
      val (i, d) = (ctx.freshName("i"), ctx.freshName("d"))
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getJ(xa, elemType(left), i)} - ${getJ(ya, elemType(right), i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmin over a whole CENTROID MATRIX in one expression: returns
  * struct(cl: int, d: double) — the first centroid index achieving the
  * minimum squared distance, and that distance.
  *
  * The k-wide alternative (an `array(sqdist(e, c₀), …, sqdist(e, cₖ₋₁))`
  * literal per row) is the ideal map-only plan for small k but embeds k
  * expression subtrees: at SemDeDup-scale k (10⁴–10⁵ clusters, Abbas et
  * al. 2023 use ~100k) the codegen'd tree and the task closure explode.
  * Here the matrix rides the plan as ONE reference object (k × dim
  * doubles, shipped once per executor with the task binary) and the
  * generated code is a tight two-level loop — still map-only, still
  * whole-stage codegen, plan size constant in k.
  *
  * Tie-break matches the literal-array formulation exactly: strict `<`
  * scanning in index order ≡ array_position's first-minimum. */
case class CentroidArgMin(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "graft_centroid_argmin"

  override def dataType: DataType = StructType(Seq(
    StructField("cl", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.sql}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = -1
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(x.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = (elemT match {
          case FloatType => x.getFloat(i).toDouble
          case _ => x.getDouble(i)
        }) - cv(i)
        s += d * d
        i += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xa => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val getX = elemT match {
        case FloatType => (i: String) => s"(double) $xa.getFloat($i)"
        case _ => (i: String) => s"$xa.getDouble($i)"
      }
      val (best, bd) = (ctx.freshName("best"), ctx.freshName("bd"))
      val (c, cv, n) = (ctx.freshName("c"), ctx.freshName("cv"), ctx.freshName("n"))
      val (s, i, d) = (ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("d"))
      s"""
         |int $best = -1;
         |double $bd = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cv = $mat[$c];
         |  int $n = java.lang.Math.min($xa.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${getX(i)} - $cv[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd) { $bd = $s; $best = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Integer.valueOf($best), java.lang.Double.valueOf($bd) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `n` NEAREST centroid indexes of a vector, ordered by
  * (squared distance ASC, index ASC) — the top-nprobe generalization of
  * [[CentroidArgMin]], and the map-only replacement for the
  * crossJoin(broadcast(centroids)) + row_number window every probe used
  * to rank its lists with: at query-batch scale (batch ANN join — every
  * document probing the collection) that window shuffles queries × nlist
  * rows, the same shape the append path already shed. Distances run the
  * exact [[SqDist]] subtract-square-accumulate loop in index order, and
  * ties break to the lower index — bit-identical to a SqDist-based
  * window (`ORDER BY Σ(q−c)², __list`). Cross-version caveat: the
  * production window this replaced ranked by |c|²−2·q·c (the |q|² term
  * dropped), which rounds differently from the full Σ(q−c)² — rows
  * assigned by pre-change appends under that formula may sit in the
  * OTHER list of a near-tied centroid pair, so low-nprobe probes of
  * such collections can miss a near-tied row (the same caveat as the
  * k-means write path; nprobe = nlist is exact regardless).
  *
  * Selection keeps a sorted top-n prefix (insertion bounded by a
  * worst-entry cutoff — one compare per non-qualifying centroid, the
  * FAISS heap-with-cutoff discipline; equal-distance later candidates
  * lose to the held worst by the ascending scan order, preserving the
  * tie-break without comparing indexes). */
case class CentroidTopN(child: Expression, centroids: Array[Array[Double]],
    n: Int) extends UnaryExpression {
  override def prettyName: String = "graft_centroid_topn"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.sql}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cap = math.min(n, centroids.length)
    val topD = new Array[Double](cap)
    val topI = new Array[Int](cap)
    var held = 0
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val nn = math.min(x.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < nn) {
        val d = (elemT match {
          case FloatType => x.getFloat(i).toDouble
          case _ => x.getDouble(i)
        }) - cv(i)
        s += d * d
        i += 1
      }
      if (held < cap || s < topD(held - 1)) {
        // insert before the first STRICTLY-greater entry: equal
        // distances keep the earlier (lower) index first
        var j = if (held < cap) held else held - 1
        while (j > 0 && topD(j - 1) > s) {
          topD(j) = topD(j - 1); topI(j) = topI(j - 1); j -= 1
        }
        topD(j) = s; topI(j) = c
        if (held < cap) held += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topI, held))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xa => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val getX = elemT match {
        case FloatType => (i: String) => s"(double) $xa.getFloat($i)"
        case _ => (i: String) => s"$xa.getDouble($i)"
      }
      val cap = math.min(n, centroids.length)
      val (topD, topI, held) =
        (ctx.freshName("topD"), ctx.freshName("topI"), ctx.freshName("held"))
      val (c, cv, nn) = (ctx.freshName("c"), ctx.freshName("cv"), ctx.freshName("nn"))
      val (s, i, d, j) = (ctx.freshName("s"), ctx.freshName("i"),
        ctx.freshName("d"), ctx.freshName("j"))
      s"""
         |double[] $topD = new double[$cap];
         |int[] $topI = new int[$cap];
         |int $held = 0;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cv = $mat[$c];
         |  int $nn = java.lang.Math.min($xa.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $nn; $i++) {
         |    double $d = ${getX(i)} - $cv[$i];
         |    $s += $d * $d;
         |  }
         |  if ($held < $cap || $s < $topD[$held - 1]) {
         |    int $j = ($held < $cap) ? $held : $held - 1;
         |    while ($j > 0 && $topD[$j - 1] > $s) {
         |      $topD[$j] = $topD[$j - 1]; $topI[$j] = $topI[$j - 1]; $j--;
         |    }
         |    $topD[$j] = $s; $topI[$j] = $c;
         |    if ($held < $cap) $held++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($topI, $held));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-dimension int8 scalar quantization (the FAISS-SQ8 shape): for
  * element i with corpus stats (mn_i, mx_i),
  * `r = round((x − mn) / (mx − mn) · 255)`, code `q = r − 128`, and the
  * reconstruction `deq = mn + r / 255 · (mx − mn)`. Returns
  * `(q array<int>, qsum long, max_err double)` in ONE pass — codes,
  * their checksum, and the worst per-element |x − deq|. A zero-span
  * dimension (mx = mn) keeps r = 0 (code −128) with deq = mn. Stats arrive as two
  * array columns (a 1-row broadcast from the stats aggregation), so
  * the kernel stays a pure projection — map-only at any corpus size.
  * Double arithmetic in index order, `Math.round` ≡ SQL `round` for
  * the non-negative operand, so a SQL engine re-derives every code and
  * error bit-exactly. */
case class QuantizeInt8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "graft_quantize_int8"

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("qsum", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    def dblOk(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk(first) && dblOk(second) && dblOk(third))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>, array<double>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  private def elemT: DataType = first.dataType.asInstanceOf[ArrayType].elementType

  def quantize(xa: ArrayData, mna: ArrayData, mxa: ArrayData): Any = {
    val n = math.min(xa.numElements(), math.min(mna.numElements(), mxa.numElements()))
    val q = new Array[Int](n)
    var qsum = 0L
    var maxErr = 0.0
    var i = 0
    while (i < n) {
      val x = elemT match {
        case FloatType => xa.getFloat(i).toDouble
        case _ => xa.getDouble(i)
      }
      val mn = mna.getDouble(i)
      val mx = mxa.getDouble(i)
      var deq = mn
      var r = 0L
      if (mx > mn) {
        r = Math.round((x - mn) / (mx - mn) * 255.0)
        deq = mn + r / 255.0 * (mx - mn)
      }
      q(i) = (r - 128L).toInt
      qsum += q(i)
      val err = Math.abs(x - deq)
      if (err > maxErr) maxErr = err
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(q), qsum, maxErr)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    quantize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.quantize($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** Reconstruction of [[QuantizeInt8]] codes back to doubles:
  * `deq_i = mn_i + (q_i + 128) / 255 · (mx_i − mn_i)` — the exact
  * arithmetic the quantizer's error column measures, so distances over
  * dequantized vectors (asymmetric distance computation, ADC) are
  * engine-replayable bit-for-bit. */
case class DequantizeInt8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "graft_dequantize_int8"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def intOk(e: Expression) = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    def dblOk(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (intOk(first) && dblOk(second) && dblOk(third))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>, array<double>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  def dequantize(qa: ArrayData, mna: ArrayData, mxa: ArrayData): Any = {
    val n = math.min(qa.numElements(), math.min(mna.numElements(), mxa.numElements()))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val mn = mna.getDouble(i)
      val mx = mxa.getDouble(i)
      val r = qa.getInt(i) + 128L
      out(i) = if (mx > mn) mn + r / 255.0 * (mx - mn) else mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    dequantize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dequantizeInt8", this, classOf[DequantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.dequantize($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** Sign-bit binary quantization: `array<float|double>` → `array<long>`
  * of ⌈dim/64⌉ words, bit (i mod 64) of word ⌊i/64⌋ set iff `v_i > 0`.
  * The 1-bit/dim code behind Hamming-space candidate generation
  * (binary quantization as in FAISS `IndexBinaryFlat` / the sign-hash
  * limit of ITQ): 64× smaller than float32, and distance becomes
  * XOR+popcount over words instead of dim multiplies.
  *
  * The comparison is the plain Java `>` on the element widened to
  * double — no arithmetic, so any SQL engine replays it exactly.
  * NULL elements raise (a null dimension has no sign — packing it as
  * 0 would silently produce a wrong code, and `spark.sql` users of the
  * registered `graft_pack_signbits` are outside the internal
  * "non-null by contract" guarantee). NaN elements pack as 0 here
  * (Java `NaN > 0` is false) while engines that order NaN above all
  * values (DuckDB) would pack 1 — embeddings are NaN-free by
  * contract. */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_pack_signbits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  def pack(xa: ArrayData): Any = {
    val n = xa.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: NULL array element at index $i — a null " +
            "dimension has no sign bit; filter or impute nulls first")
      val x = elemT match {
        case FloatType => xa.getFloat(i).toDouble
        case _ => xa.getDouble(i)
      }
      if (x > 0.0) words(i / 64) |= 1L << (i % 64)
      i += 1
    }
    new GenericArrayData(words)
  }

  override def nullSafeEval(a: Any): Any = pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packSignBits", this, classOf[PackSignBits].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.pack($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed bit codes (`array<long>`):
  * Σ popcount(a_w XOR b_w), clamped to the shorter side. Pure integer
  * ops — bit-identical across engines (`bit_count(xor(...))`), and the
  * tight popcount loop stays inside whole-stage codegen. NULL words
  * raise rather than XOR as 0 (a silently-wrong distance for
  * `spark.sql` users of the registered `graft_hamming`); the check is
  * emitted only when the schema admits null elements, so the
  * containsNull=false codes [[PackSignBits]] emits keep the branchless
  * loop. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def mayHaveNullElems: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  /** Shared raise for the interpreted and generated paths. */
  def nullElem(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: NULL array element at index $i — packed codes " +
        "must be non-null words; filter or impute nulls first")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) nullElem(i)
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
      val guard =
        if (!mayHaveNullElems) ""
        else {
          val ref = ctx.addReferenceObj("hammingDist", this, classOf[HammingDist].getName)
          s"if ($xa.isNullAt($i) || $ya.isNullAt($i)) $ref.nullElem($i);"
        }
      s"""
         |int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $s += java.lang.Long.bitCount($xa.getLong($i) ^ $ya.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door for the vector kernels. */
object VectorFunctions {
  def packSignBits(vec: Column): Column =
    ColumnBridge.column(PackSignBits(ColumnBridge.expression(vec)))

  def hammingDist(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantizeInt8(vec: Column, mins: Column, maxs: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(vec),
      ColumnBridge.expression(mins), ColumnBridge.expression(maxs)))

  def dequantizeInt8(q: Column, mins: Column, maxs: Column): Column =
    ColumnBridge.column(DequantizeInt8(ColumnBridge.expression(q),
      ColumnBridge.expression(mins), ColumnBridge.expression(maxs)))

  def dotp(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def centroidArgMin(e: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidArgMin(ColumnBridge.expression(e), centroids))

  def centroidTopN(e: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(CentroidTopN(ColumnBridge.expression(e), centroids, n))
}
