package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH bucketing: one pass over an embedding
  * produces its bucket in EVERY hash table — array(nTables) of
  * bitsPerTable-bit sign codes — replacing a (nTables·bitsPerTable)-row
  * broadcast join + groupBy shuffle with a narrow projection. At 10^9
  * vectors that shuffle was ~32× the corpus in flight; this is zero
  * movement until the (tbl, bucket) candidate join itself.
  *
  * Hyperplane components are md5-derived ("lsh|t|b|d" → md5_number_lower
  * → [-0.5, 0.5); see graft.sim.Vectors.planes) and cached per
  * (nTables, bitsPerTable, dim) — deterministic across executors AND
  * recomputable verbatim by the SQL oracle. Dot products accumulate in
  * double in index order, bit set iff strictly positive: bit-identical to
  * the FloatVectorDot-join formulation it replaces.
  */
object LshBuckets {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Array[Array[Double]]]]()

  /** Component (t, b, d): lower 64 MD5 bits of "lsh|t|b|d" (little-endian,
    * = DuckDB md5_number_lower), top 53 bits scaled to [-0.5, 0.5).
    */
  def planes(nTables: Int, bitsPerTable: Int, dim: Int): Array[Array[Array[Double]]] =
    cache.computeIfAbsent((nTables, bitsPerTable, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def unit(t: Int, b: Int, d: Int): Double = {
        val dig = md.digest(s"lsh|$t|$b|$d".getBytes("UTF-8"))
        var h = 0L
        var i = 15
        while (i >= 8) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
        (h >>> 11).toDouble / 9007199254740992.0 - 0.5
      }
      Array.tabulate(nTables)(t =>
        Array.tabulate(bitsPerTable)(b => Array.tabulate(dim)(d => unit(t, b, d))))
    })

  /** Per-table bucket codes of one embedding; null on dimension mismatch
    * (a truncated vector must not silently land in a plausible bucket).
    */
  def compute(v: ArrayData, nTables: Int, bitsPerTable: Int, dim: Int): ArrayData = {
    if (v == null || v.numElements() != dim) return null
    val ps = planes(nTables, bitsPerTable, dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val plane = ps(t)(b)
        var s = 0.0
        var d = 0
        while (d < dim) { s += v.getFloat(d).toDouble * plane(d); d += 1 }
        if (s > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def buckets(emb: Column, nTables: Int, bitsPerTable: Int, dim: Int): Column =
    GraftSqlShim.column(
      LshBucketsExpr(GraftSqlShim.expression(emb), nTables, bitsPerTable, dim))
}

/** array<long> of per-table LSH bucket codes for an array<float> column. */
case class LshBucketsExpr(child: Expression, nTables: Int, bitsPerTable: Int, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], nTables, bitsPerTable, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.LshBuckets.compute($c, $nTables, $bitsPerTable, $dim);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
