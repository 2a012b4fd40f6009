package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftshim.Bridge

/** Vector math over `array<float>` embedding columns.
  *
  * Two implementations of every kernel:
  *  - `*Hof` — composed from built-in higher-order functions (zip_with /
  *    aggregate). Portable, but each arithmetic step is a separate
  *    expression tree node.
  *  - the default — a native Catalyst [[CosineSimilarity]] expression with
  *    `doGenCode` emitting one fused primitive loop. On brute-force ANN
  *    (O(n²) pairs) the fused loop is the difference between the kernel
  *    being memory-bound vs expression-overhead-bound, which is what
  *    matters at 100 TB where a single pass touches billions of pairs.
  */
object VectorFns {

  /** Cosine similarity via the native fused expression (preferred). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine similarity composed from higher-order built-ins — used by
    * tests as a differential oracle for [[CosineSimilarity]]. A NULL
    * element propagates to a NULL result in both forms. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    when(dot.isNull || na.isNull || nb.isNull, lit(null).cast("double"))
      .when(na =!= 0.0 && nb =!= 0.0, dot / (na * nb))
      .otherwise(lit(0.0))
  }

  /** Dot product via the native fused expression (preferred). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Dot product via higher-order built-ins — differential oracle for
    * [[DotProduct]] (same sequential left-fold summation order, so the
    * doubles agree bitwise). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Exact integer squared L2 distance between two micro (array<bigint>)
    * vectors via the native fused expression (preferred — this kernel
    * sits under every centroid assignment: KMeans fit rounds, IVF cell
    * assignment, residual derivation; the HOF form pays interpreted
    * CodegenFallback eval per (row, candidate)). */
  def sqDistMicro(a: Column, b: Column): Column =
    Bridge.column(SqDistMicro(Bridge.expression(a), Bridge.expression(b)))

  /** [[SqDistMicro]] composed from higher-order built-ins — the
    * differential oracle (bitwise-equal: integer arithmetic has no
    * summation-order sensitivity). */
  def sqDistMicroHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
}

/** Native exact integer squared L2 distance over two `array<bigint>`
  * micro vectors — the assignment kernel under the whole vector-index
  * family. Same fused-loop design as [[CosineSimilarity]]; NULL on
  * length mismatch or any NULL element (matching the HOF fold, whose
  * zip_with null-pads the short side and whose NULL product poisons
  * the sum) — visible, never a scan-poisoning throw. All-integer:
  * bitwise-equal to the HOF form and to DuckDB's list arithmetic.
  */
case class SqDistMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dist_micro needs array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var d = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val t = xs.getLong(i) - ys.getLong(i)
      d += t * t
      i += 1
    }
    d
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $t = $xs.getLong($i) - $ys.getLong($i);
         |    $d += $t * $t;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native cosine similarity over two `array<float>` columns.
  *
  * Single fused loop over both arrays computing dot, |a|², |b|² at once —
  * in interpreted eval and in generated code. Null if either side, any
  * ELEMENT, is null — or the lengths differ (matching the HOF fold,
  * whose zip_with null-pads the short side); 0.0 if either norm is 0.
  * Never a throw: a bad row must not poison a 100 TB scan, and NULL is
  * visible where a made-up score would not be.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _)  => true
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _                                                   => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    // mismatched dims → NULL (the HOF fold's zip_with null-padding does
    // the same); equal-but-empty → 0.0 (both norms are 0)
    if (n != ys.numElements()) return null
    if (n == 0) return 0.0
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val lf = isFloat(left); val rf = isFloat(right)
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |final int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else if ($n == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double x = (double) $xs.$lGet($i);
         |    final double y = (double) $ys.$rGet($i);
         |    $dot += x * y; $nx += x * x; $ny += y * y;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<float|double>` columns — the
  * scoring kernel (q68 logistic margin, IVF probe). Same fused-loop
  * design, null and codegen behavior as [[CosineSimilarity]];
  * summation is the sequential left fold, so results are bitwise equal
  * to the HOF `aggregate(zip_with(...))` form AND to engines that fold
  * lists sequentially (DuckDB list_dot_product). Length mismatch → NULL
  * (like cosine and the HOF fold: visible, and never a scan-poisoning
  * throw).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _)  => true
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _                                                   => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    // mismatched dims: NULL, matching the HOF fold (zip_with pads the
    // short side with NULL) — visible-but-harmless, never a throw
    if (n != ys.numElements()) return null
    var dot = 0.0
    var i = 0
    val lf = isFloat(left); val rf = isFloat(right)
    while (i < n) {
      // a NULL element poisons the product — match the HOF fold and
      // DuckDB list_dot_product, which both return NULL (reading the
      // zeroed slot instead would be a silently wrong score)
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ((double) $xs.$lGet($i)) * ((double) $ys.$rGet($i));
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
