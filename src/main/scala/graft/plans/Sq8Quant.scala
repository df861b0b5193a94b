package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._

/** Per-vector int8 scalar quantization as a compact BINARY payload — the
  * codec behind the pair generator's conservative verify PRESCREEN
  * (Vectors.cosinePairsLshBits): `code_i = round((x_i − mn) / step)` with
  * per-vector `mn = min(x)`, `step = (max(x) − mn)/255` (the standard SQ8
  * grid, same arithmetic family as Vectors.sq8Audit), packed one byte per
  * dimension. 64-dim float vectors shrink from ~270 serialized bytes
  * (UnsafeArrayData of floats + norm) to 64 bytes + four scalars — the
  * byte mass that rides every candidate-pair exchange.
  *
  * The codec's value here is its DETERMINISTIC error bound: every
  * component reconstructs to within step/2 (plus ~1 ulp of double
  * rounding), so a dot product recomputed from codes carries a provable
  * error envelope and a prescreen threshold of `tau − envelope` can
  * never drop a pair the exact verify would keep — output sets stay
  * bit-identical to the unprescreened plan (spec-pinned), which is what
  * keeps the DuckDB oracle replaying pairs without modeling the codec.
  */
case class Sq8Encode(vec: Expression, mn: Expression, step: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mn
  override def third: Expression = step

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (vecOk && mn.dataType == DoubleType && step.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double, double), got " +
        s"(${vec.dataType.sql}, ${mn.dataType.sql}, ${step.dataType.sql})")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_encode"

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** A null element yields a null code block (a corrupt embedding must
    * not prescreen as a plausible byte pattern); a degenerate grid
    * (step ≤ 0, constant vector) codes every component 0 so the
    * reconstruction `mn + step·0 = mn` is exact.
    */
  override def nullSafeEval(v: Any, m: Any, s: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mnV = m.asInstanceOf[Double]
    val stV = s.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val c =
        if (stV > 0) {
          val r = Math.round((xv - mnV) / stV)
          if (r < 0L) 0L else if (r > 255L) 255L else r
        } else 0L
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $r = 0L;
         |  if ($s > 0) {
         |    $r = Math.round(($get - $m) / $s);
         |    if ($r < 0L) $r = 0L; else if ($r > 255L) $r = 255L;
         |  }
         |  $out[$i] = (byte) $r;
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, mn = newSecond, step = newThird)
}

/** Unsigned-byte dot product Σ (a_i & 0xFF)·(b_i & 0xFF) over two SQ8 code
  * blocks — the prescreen's inner loop: one integer multiply-accumulate
  * per dimension inside WholeStageCodegen, no array allocation, no
  * boxing. Exact (a 64-dim sum of ≤ 255² terms peaks at 2²² — nowhere
  * near long overflow), so the reconstructed dot `d·mn_a·mn_b +
  * mn_a·st_b·Σb + mn_b·st_a·Σa + st_a·st_b·sq8Dot(a,b)` is a pure
  * double-arithmetic function of exactly-known integers. Null on length
  * mismatch, mirroring FloatVectorDot's truncated-input semantics.
  */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) {
      acc += (x(i) & 0xff).toLong * (y(i) & 0xff).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long)($a[$i] & 0xff) * (long)($b[$i] & 0xff);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8Quant {
  /** `sq8Encode(vec, mn, step)` — pack a vector into its SQ8 code block. */
  def sq8Encode(vec: Column, mn: Column, step: Column): Column =
    GraftSqlShim.column(Sq8Encode(GraftSqlShim.expression(vec),
      GraftSqlShim.expression(mn), GraftSqlShim.expression(step)))

  /** `sq8Dot(a, b)` — unsigned-byte dot product of two code blocks. */
  def sq8Dot(a: Column, b: Column): Column =
    GraftSqlShim.column(Sq8Dot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
