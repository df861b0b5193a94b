package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Loaders for the driver-generated test tables plus the canonical
  * time-series "points" projection.
  *
  * BTrDB's data model (grpcinterface/btrdb.proto: RawPoint, StreamDescriptor)
  * is streams of (time int64, value float64) keyed by uuid with a
  * collection + tags. We map the synthetic `events` table onto it:
  *   stream identity = (user_id, event_type), collection = event_type,
  *   tags = {user: user_id}, time axis = epoch microseconds, value = value,
  *   version proxy = event_id (monotone insert order).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Decouple compute parallelism from source file layout. A small corpus
    * in one parquet file is one unsplittable scan partition (parquet splits
    * at row-group granularity), which would pin every CPU-heavy per-row
    * stage downstream — shingling, hashing, vector math — to a single core.
    * Repartition up to the session's parallelism ONLY when the scan has
    * fewer partitions; at real scale inputs already carry far more
    * partitions than cores and this inserts no shuffle at all.
    */
  def rebalance(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, Join, LocalLimit, RepartitionOperation, Sort, Window => WindowOp}
    // A plan that already shuffles or orders (join/agg/window/repartition/
    // sort/dedup) gets its parallelism from spark.sql.shuffle.partitions,
    // and a round-robin repartition would destroy a sort — leave it alone.
    // (Also load-bearing: under AQE, .rdd on a shuffling plan EXECUTES its
    // query stages eagerly, so the partition probe below is only safe on
    // narrow scan chains, where no AQE wrapper is inserted.)
    val wide = df.queryExecution.analyzed.collectFirst {
      case j: Join => j
      case a: Aggregate => a
      case r: RepartitionOperation => r
      case w: WindowOp => w
      case s: Sort => s
      case l: GlobalLimit => l
      case l: LocalLimit => l
      case d: Deduplicate => d
    }.isDefined
    // streaming frames: no .rdd probe possible (and micro-batch
    // parallelism belongs to the source) — pass through untouched
    if (df.isStreaming || wide) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }

  /** Epoch-µs expression for an events frame's `ts` column —
    * schema-adaptive, because driver generations of the parquet have
    * stored ts both as TIMESTAMP(NANOS) (which Spark's µs TimestampType
    * rejects, PARQUET_TYPE_ILLEGAL; the supported path, SPARK-40819, is
    * `nanosAsLong`, reading it as a long of epoch-ns) and as plain
    * TIMESTAMP_NTZ µs. For the ns-long shape, integer `DIV 1000` matches
    * DuckDB's `epoch_us(ts)` exactly (both truncate; epoch values here
    * are positive — a double-division would corrupt low bits, 1.7e18 ns
    * exceeds 2^53). For NTZ, the wall-clock µs ARE the epoch µs under a
    * UTC session timezone (which points() pins), so the NTZ→TIMESTAMP
    * cast is bit-identity and unix_micros reads the raw µs out.
    */
  def tsUs(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case types.LongType         => expr("ts DIV 1000")
      case types.TimestampNTZType => unix_micros(col("ts").cast(types.TimestampType))
      case types.TimestampType    => unix_micros(col("ts"))
      case t => throw new IllegalStateException(s"unsupported events.ts type: $t")
    }

  /** Canonical points view: (user_id, event_type, t_us, value, ver).
    *
    * REQUIRES a UTC session timezone: epoch arithmetic here (and the
    * DuckDB oracle's `epoch_us`) reads NTZ wall-clock µs as epoch µs,
    * which only holds under UTC. A non-UTC session fails fast rather
    * than being silently reconfigured — a caller who deliberately set
    * another zone for unrelated queries must not have it clobbered as
    * a side effect of building this frame.
    */
  def points(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val utc =
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    if (!utc) throw new IllegalStateException(
      s"graft requires spark.sql.session.timeZone=UTC for epoch arithmetic (found '$tz'); " +
        """set .config("spark.sql.session.timeZone", "UTC") on the session before calling points()""")
    val ev = load(spark, dir, "events")
    ev.select(
      col("user_id"),
      col("event_type"),
      tsUs(ev).as("t_us"),
      col("value"),
      col("event_id").as("ver"))
  }

  /** SQL fragment mirroring points() for DuckDB oracles. */
  val pointsSql: String =
    "SELECT user_id, event_type, epoch_us(ts) AS t_us, value, event_id AS ver FROM events"

  /** Derived stream-descriptor table (mprovider/metaprovider.go analogue):
    * one row per stream with collection, tag, point count, time bounds,
    * and latest version.
    */
  def streams(spark: SparkSession, dir: String): DataFrame =
    points(spark, dir)
      .groupBy(col("event_type").as("collection"), col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("t_us")).as("t_min"),
        max(col("t_us")).as("t_max"),
        max(col("ver")).as("version"))
      .withColumn("uuid", md5(concat_ws("/", col("collection"), col("user_id"))))

  val streamsSql: String =
    """SELECT event_type AS collection, user_id,
      |       CAST(count(*) AS BIGINT) AS n_points,
      |       min(epoch_us(ts)) AS t_min, max(epoch_us(ts)) AS t_max,
      |       max(event_id) AS version,
      |       md5(concat(event_type, '/', CAST(user_id AS VARCHAR))) AS uuid
      |FROM events GROUP BY event_type, user_id""".stripMargin
}
