package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Optimizer rule: derive parquet-pushable bounds from comparisons on
  * derived epoch-time expressions.
  *
  * The canonical time axis `t_us` is DERIVED from the raw `ts` column —
  * `ts DIV 1000` when the parquet stores epoch-ns longs, or
  * `unix_micros(ts)` when it stores timestamps. A predicate like
  * `t_us >= T` therefore sits on an expression, the parquet scan pushes
  * nothing on the time axis, and every time-range query reads every row
  * group — at 100 TB the time filter is precisely the one that must
  * prune. Two inversions restore the raw-column bound:
  *
  * `unix_micros` is EXACTLY invertible (TimestampType stores epoch µs;
  * a UTC-cast TIMESTAMP_NTZ is bit-identity on the stored µs), so each
  * comparison maps 1:1 onto the raw timestamp column.
  *
  * Truncating `DIV` by a positive constant implies a one-step-wider
  * bound on the raw column:
  *
  *   c div d >= v  ⟹  c >= v*d − (d−1)
  *   c div d >  v  ⟹  c >= v*d + 1
  *   c div d <= v  ⟹  c <= v*d + (d−1)
  *   c div d <  v  ⟹  c <= v*d − 1
  *   c div d ==  v ⟹  both of the = bounds above
  *
  * (bounds are valid for ALL long c, including negatives, because they are
  * deliberately one truncation-step wider than the exact positive-c
  * inverse). The implied conjunct is ADDED, never substituted — the
  * original predicate still filters exactly; the new one exists so the
  * datasource can translate it into row-group pruning + a scan PushedFilter
  * on the raw column. Conjuncts already present are not re-added, so the
  * rule is a fixpoint no-op after one application.
  */
object DivComparisonBounds extends Rule[LogicalPlan] with PredicateHelper {

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)     => Some(v)
    case Literal(v: Int, IntegerType)   => Some(v.toLong)
    case Literal(v: Short, ShortType)   => Some(v.toLong)
    case Literal(v: Byte, ByteType)     => Some(v.toLong)
    case Cast(inner, LongType, _, _)    => longLit(inner)
    case _ => None
  }

  private def mul(a: Long, b: Long): Option[Long] =
    try Some(Math.multiplyExact(a, b)) catch { case _: ArithmeticException => None }
  private def add(a: Long, b: Long): Option[Long] =
    try Some(Math.addExact(a, b)) catch { case _: ArithmeticException => None }

  private def lower(c: Expression, d: Long, lo: Long): Expression =
    GreaterThanOrEqual(c, Literal(lo, LongType))
  private def upper(c: Expression, d: Long, hi: Long): Expression =
    LessThanOrEqual(c, Literal(hi, LongType))

  /** The (child, divisor) of a `div` by a positive integral literal. */
  private object DivByConst {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case IntegralDivide(c, dl, _) => longLit(dl).filter(_ > 0).map((c, _))
      case _ => None
    }
  }

  private def isUtc(tz: Option[String]): Boolean = tz.exists { s =>
    try java.time.ZoneId.of(s).normalized() == java.time.ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }
  }

  /** The raw column behind an exactly-invertible epoch-µs projection,
    * plus the literal constructor mapping a µs bound back onto it:
    * `unix_micros(ts: TIMESTAMP)` (µs-stored, timezone-independent) or
    * `unix_micros(CAST(ts: TIMESTAMP_NTZ AS TIMESTAMP))` under a UTC
    * session zone (bit-identity on the stored µs — any other zone shifts
    * the mapping, so the inversion is declined there). Cast-rooted
    * children are confined to that first case: without the guard below,
    * a non-UTC NTZ cast would fall through to the plain-TIMESTAMP case
    * (the Cast itself has TimestampType) and add an exact but
    * Cast-rooted — hence never pushable — redundant conjunct.
    */
  private object MicrosOf {
    def unapply(e: Expression): Option[(Expression, Long => Literal)] = e match {
      case UnixMicros(Cast(inner, TimestampType, tz, _))
          if inner.dataType == TimestampNTZType && isUtc(tz) =>
        Some((inner, v => Literal(v, TimestampNTZType)))
      case UnixMicros(c) if c.dataType == TimestampType && !c.isInstanceOf[Cast] =>
        Some((c, v => Literal(v, TimestampType)))
      case _ => None
    }
  }

  private def implied(conjunct: Expression): Seq[Expression] = conjunct match {
    // exact unix_micros inversions — checked before the div cases so a
    // wrapped comparison resolves once, by the tighter rule
    case GreaterThanOrEqual(MicrosOf(c, tsLit), vl) =>
      longLit(vl).map(v => GreaterThanOrEqual(c, tsLit(v))).toSeq
    case GreaterThan(MicrosOf(c, tsLit), vl) =>
      longLit(vl).map(v => GreaterThan(c, tsLit(v))).toSeq
    case LessThanOrEqual(MicrosOf(c, tsLit), vl) =>
      longLit(vl).map(v => LessThanOrEqual(c, tsLit(v))).toSeq
    case LessThan(MicrosOf(c, tsLit), vl) =>
      longLit(vl).map(v => LessThan(c, tsLit(v))).toSeq
    case EqualTo(MicrosOf(c, tsLit), vl) =>
      longLit(vl).map(v => EqualTo(c, tsLit(v))).toSeq
    // literal-on-left variants (v OP unix_micros(c)) — mirror the comparison
    case GreaterThanOrEqual(vl, MicrosOf(c, tsLit)) =>
      longLit(vl).map(v => LessThanOrEqual(c, tsLit(v))).toSeq
    case GreaterThan(vl, MicrosOf(c, tsLit)) =>
      longLit(vl).map(v => LessThan(c, tsLit(v))).toSeq
    case LessThanOrEqual(vl, MicrosOf(c, tsLit)) =>
      longLit(vl).map(v => GreaterThanOrEqual(c, tsLit(v))).toSeq
    case LessThan(vl, MicrosOf(c, tsLit)) =>
      longLit(vl).map(v => GreaterThan(c, tsLit(v))).toSeq
    case EqualTo(vl, MicrosOf(c, tsLit)) =>
      longLit(vl).map(v => EqualTo(c, tsLit(v))).toSeq
    case GreaterThanOrEqual(DivByConst(c, d), vl) =>
      longLit(vl).toSeq.flatMap(v => mul(v, d).flatMap(p => add(p, -(d - 1))).map(lower(c, d, _)))
    case GreaterThan(DivByConst(c, d), vl) =>
      longLit(vl).toSeq.flatMap(v => mul(v, d).flatMap(p => add(p, 1)).map(lower(c, d, _)))
    case LessThanOrEqual(DivByConst(c, d), vl) =>
      longLit(vl).toSeq.flatMap(v => mul(v, d).flatMap(p => add(p, d - 1)).map(upper(c, d, _)))
    case LessThan(DivByConst(c, d), vl) =>
      longLit(vl).toSeq.flatMap(v => mul(v, d).flatMap(p => add(p, -1)).map(upper(c, d, _)))
    case EqualTo(DivByConst(c, d), vl) =>
      longLit(vl).toSeq.flatMap { v =>
        mul(v, d).toSeq.flatMap(p =>
          add(p, -(d - 1)).map(lower(c, d, _)).toSeq ++
            add(p, d - 1).map(upper(c, d, _)).toSeq)
      }
    // literal-on-left variants (v OP (c div d)) — mirror the comparison
    case GreaterThanOrEqual(vl, DivByConst(c, d)) => implied(LessThanOrEqual(IntegralDivide(c, Literal(d, LongType)), vl))
    case GreaterThan(vl, DivByConst(c, d))        => implied(LessThan(IntegralDivide(c, Literal(d, LongType)), vl))
    case LessThanOrEqual(vl, DivByConst(c, d))    => implied(GreaterThanOrEqual(IntegralDivide(c, Literal(d, LongType)), vl))
    case LessThan(vl, DivByConst(c, d))           => implied(GreaterThan(IntegralDivide(c, Literal(d, LongType)), vl))
    case EqualTo(vl, DivByConst(c, d))            => implied(EqualTo(IntegralDivide(c, Literal(d, LongType)), vl))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(implied)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}

/** Session extension entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Installs the optimizer rule and registers graft's custom expressions as
  * SQL functions, so `spark.sql` users get the same codegen'd primitives
  * as the Column API:
  *   fvec_dot(a, b), minhash_sig(norm, n, k), simhash_sig(norm),
  *   hashed_shingles(norm, n), sorted_intersect_count(a, b)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def dblLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans", name, usage),
      (args: Seq[Expression]) => builder(args))

  private def tfn(name: String, usage: String)(builder: Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans", name, usage),
      (args: Seq[Expression]) => builder(args))

  // TVF helpers: the first argument names a table/view, resolved against
  // SparkSession.active — the THREAD-LOCAL active session at function-
  // resolution time, which in a multi-session app (cloned sessions,
  // Connect) may differ from the session that registered the extension.
  // Single-session deployments (this engine's contract) are unaffected;
  // a missing view is rethrown as an AnalysisException naming the TVF
  // argument so it surfaces as an analysis error, not a builder crash.
  private def view(e: Expression): org.apache.spark.sql.DataFrame = {
    val name = strLit(e, "view name")
    try org.apache.spark.sql.SparkSession.active.table(name)
    catch {
      // only the genuine missing-relation error gets relabeled with the
      // TVF context; any other analysis failure (e.g. an unresolvable
      // view DEFINITION) must keep its own error class — and either way
      // the original exception rides along as the cause, so the
      // diagnostic chain survives the rewrap
      case ex: org.apache.spark.sql.AnalysisException
          if ex.getCondition == "TABLE_OR_VIEW_NOT_FOUND" =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "TABLE_OR_VIEW_NOT_FOUND",
          messageParameters = Map("relationName" ->
            (s"`$name` (a graft TVF view argument, resolved in the " +
              "ACTIVE session's catalog)")),
          cause = Some(ex))
    }
  }
  private def keyCols(e: Expression): Seq[String] =
    strLit(e, "key columns").split(",").map(_.trim).filter(_.nonEmpty).toSeq

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DivComparisonBounds)
    ext.injectPlannerStrategy(_ => GraftStrategies)
    ext.injectFunction(fn("fvec_dot",
      "fvec_dot(a, b) - double dot product of two float/double arrays") {
      case Seq(a, b) => FloatVectorDot(a, b)
    })
    ext.injectFunction(fn("minhash_sig",
      "minhash_sig(norm, n, k) - k-function MinHash over word n-gram shingles") {
      case Seq(s, n, k) => MinHashSig(s, intLit(n, "n"), intLit(k, "k"))
    })
    ext.injectFunction(fn("simhash_sig",
      "simhash_sig(norm) - 64-bit SimHash of the words of norm") {
      case Seq(s) => SimHashSig(s)
    })
    ext.injectFunction(fn("hashed_shingles",
      "hashed_shingles(norm, n) - sorted distinct hashed word n-gram shingles") {
      case Seq(s, n) => HashedShingles(s, intLit(n, "n"))
    })
    ext.injectFunction(fn("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |a ∩ b| of sorted distinct long arrays") {
      case Seq(a, b) => SortedIntersectCount(a, b)
    })
    // SQL TABLE functions: the core read operators callable straight from
    // spark.sql — `SELECT * FROM graft_windows('pts', 'uuid', 0, 100, 10)`.
    // The builder runs at analysis time in the calling session, so the TVF
    // expands to the operator's own DataFrame plan — identical pushdown,
    // codegen, and partial aggregation; nothing is interpreted per row.
    import graft.ts.TimeSeriesOps
    ext.injectTableFunction(tfn("graft_raw_values",
      "graft_raw_values(view, keys_csv, start, end) - time-ordered raw scan of [start, end)") {
      case Seq(v, k, s0, e0) =>
        TimeSeriesOps.rawValues(view(v), keyCols(k),
          longLit(s0, "start"), longLit(e0, "end")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_windows",
      "graft_windows(view, keys_csv, start, end, width) - StatPoints per fixed-width window") {
      case Seq(v, k, s0, e0, w) =>
        TimeSeriesOps.windows(view(v), keyCols(k),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"))
          .queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_aligned_windows",
      "graft_aligned_windows(view, keys_csv, start, end, pw) - StatPoints per 2^pw-aligned bucket") {
      case Seq(v, k, s0, e0, pw) =>
        TimeSeriesOps.alignedWindows(view(v), keyCols(k),
          longLit(s0, "start"), longLit(e0, "end"), intLit(pw, "pointWidth"))
          .queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_gaps",
      "graft_gaps(view, keys_csv, start, end, width) - empty grid windows per stream") {
      case Seq(v, k, s0, e0, w) =>
        TimeSeriesOps.gaps(view(v), keyCols(k),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"))
          .queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_asof_join",
      "graft_asof_join(left_view, right_view, keys_csv[, tolerance_us]) - " +
        "latest right value at or before each left row's timestamp") {
      case Seq(lv, rv, k) =>
        TimeSeriesOps.asofJoin(view(lv), view(rv), keyCols(k)).queryExecution.logical
      case Seq(lv, rv, k, tol) =>
        TimeSeriesOps.asofJoin(view(lv), view(rv), keyCols(k),
          toleranceUs = Some(longLit(tol, "tolerance_us"))).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_forecast",
      "graft_forecast(view, keys_csv, start, end, width, period, alpha, beta, gamma, horizon) - " +
        "h-step Holt-Winters projection per stream") {
      case Seq(v, k, s0, e0, w, p, a, b, g, h) =>
        TimeSeriesOps.holtWintersForecast(view(v), keyCols(k),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"),
          intLit(p, "period"), dblLit(a, "alpha"), dblLit(b, "beta"),
          dblLit(g, "gamma"), intLit(h, "horizon")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_band",
      "graft_band(view, keys_csv, start, end, width, k, n_sigma) - " +
        "Bollinger envelope (trailing-k mean ± n_sigma·σ) per stream") {
      case Seq(v, kc, s0, e0, w, kk, ns) =>
        TimeSeriesOps.bollingerBands(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"),
          intLit(kk, "k"), dblLit(ns, "n_sigma")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_peaks",
      "graft_peaks(view, keys_csv, start, end, width, k, min_prom_us) - " +
        "window-mean peaks with strict k-shoulder dominance and a prominence floor") {
      case Seq(v, kc, s0, e0, w, kk, mp) =>
        TimeSeriesOps.peaks(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"),
          intLit(kk, "k"), longLit(mp, "min_prom_us")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_changepoints",
      "graft_changepoints(view, keys_csv, start, end, width, k, min_shift_us) - " +
        "offline mean-shift change points over the window-mean series") {
      case Seq(v, kc, s0, e0, w, kk, ms) =>
        TimeSeriesOps.changePoints(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"),
          intLit(kk, "k"), longLit(ms, "min_shift_us")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_motifs",
      "graft_motifs(view, keys_csv, start, end, width, w, k) - " +
        "top-k SAX subsequence motifs across the fleet") {
      case Seq(v, kc, s0, e0, wd, sw, kk) =>
        graft.ts.Downsample.motifs(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(wd, "width"),
          intLit(sw, "w"), intLit(kk, "k")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_savgol",
      "graft_savgol(view, keys_csv, start, end, width) - " +
        "Savitzky-Golay 5-point smoothing of the window-mean series") {
      case Seq(v, kc, s0, e0, w) =>
        TimeSeriesOps.savgol(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"))
          .queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_boxplot",
      "graft_boxplot(view, keys_csv, start, end, width, whisker) - " +
        "five-number summary + Tukey-fence outlier counts per window") {
      case Seq(v, kc, s0, e0, w, wh) =>
        TimeSeriesOps.boxplotWindows(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), longLit(w, "width"),
          dblLit(wh, "whisker")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_burnrate",
      "graft_burnrate(view, keys_csv, start, end, widths_csv, bad_gt, slo) - " +
        "multi-window SLO burn rate; bad = value > bad_gt") {
      case Seq(v, kc, s0, e0, ws, bg, sl) =>
        val widths = strLit(ws, "widths").split(",").map(_.trim.toLong).toSeq
        TimeSeriesOps.burnRate(view(v), keyCols(kc),
          longLit(s0, "start"), longLit(e0, "end"), widths,
          org.apache.spark.sql.functions.col("value") > dblLit(bg, "bad_gt"),
          dblLit(sl, "slo")).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_dedup_exact",
      "graft_dedup_exact(view) - exact-dedup verdict per document of (doc_id, text)") {
      case Seq(v) =>
        graft.text.Dedup.exact(view(v)).queryExecution.logical
    })
    ext.injectTableFunction(tfn("graft_shard",
      "graft_shard(view, min_quality, budget_per_stratum) - the one-pass " +
        "training-shard manifest over (doc_id, text, source)") {
      case Seq(v, mq, b) =>
        graft.text.TextFunctions.corpusShard(view(v), dblLit(mq, "min_quality"),
          longLit(b, "budget_per_stratum")).queryExecution.logical
    })
  }
}
