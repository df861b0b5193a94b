package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ts.{Metadata, TimeSeriesOps => TS}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry implements, and the reference citations in the
  * implementing objects (graft.ts.*, graft.text.*, graft.sim.*).
  *
  * Every `queries` entry has a deterministic total order (orderBy over
  * enough columns) mirrored by an ORDER BY in `oracleSql`; float
  * accumulations are rounded identically on both sides (sums→2dp,
  * means→6dp); min/max stay unrounded (order-insensitive, bit-exact).
  * Time axis is epoch microseconds everywhere: Spark `unix_micros` and
  * DuckDB `epoch_us` truncate the parquet ns timestamps identically.
  */
object SparkEntry {

  // Epoch-µs constants for the events table (2024-01-01 .. 2024-01-31 UTC).
  private val T0  = 1704067200000000L // 2024-01-01
  private val T08 = 1704672000000000L // 2024-01-08
  private val T15 = 1705276800000000L // 2024-01-15
  private val T20 = 1705708800000000L // 2024-01-20
  private val T22 = 1705881600000000L // 2024-01-22
  private val T29 = 1706486400000000L // 2024-01-29
  private val T31 = 1706659200000000L // 2024-01-31
  private val DAY = 86400000000L
  private val STREAM = Seq("user_id", "event_type")

  private val PTS_SQL =
    "SELECT user_id, event_type, epoch_us(ts) AS t_us, value, event_id AS ver FROM events"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * aligned statistical windows over every stream at once — the core
    * BTrDB operation (AlignedWindows), fanned out across streams.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_aligned_windows")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- BTrDB API surface (SURVEY §2) -------------------------------
    "ts_raw_values" -> ((s, dir) =>
      TS.rawValues(
          Tables.points(s, dir).filter(col("user_id") === 7 && col("event_type") === "click"),
          STREAM, T08, T22)
        .orderBy(col("t_us"))),

    "ts_aligned_windows" -> ((s, dir) =>
      TS.alignedWindows(Tables.points(s, dir), STREAM, T0, T31, 36)
        .orderBy(col("user_id"), col("event_type"), col("w_start"))),

    "ts_windows" -> ((s, dir) =>
      TS.windows(Tables.points(s, dir), STREAM, T0, T29, DAY)
        .orderBy(col("user_id"), col("event_type"), col("w_start"))),

    "ts_nearest_before" -> ((s, dir) =>
      TS.nearest(Tables.points(s, dir), STREAM, T15, backward = true)
        .orderBy(col("user_id"), col("event_type"))),

    "ts_nearest_after" -> ((s, dir) =>
      TS.nearest(Tables.points(s, dir), STREAM, T15, backward = false)
        .orderBy(col("user_id"), col("event_type"))),

    "ts_changes" -> ((s, dir) =>
      TS.changes(Tables.points(s, dir), STREAM, 100, 700, 32)
        .orderBy(col("user_id"), col("event_type"), col("c_start"))),

    "ts_version_at" -> ((s, dir) =>
      TS.rawValues(Tables.points(s, dir), STREAM, T0, T31, version = Some(500))
        .orderBy(col("user_id"), col("event_type"), col("t_us"))),

    "ts_delete_range" -> ((s, dir) =>
      Tables.points(s, dir)
        .filter(col("user_id") === 3 && col("event_type") === "view")
        .filter(!(col("t_us") >= T08 && col("t_us") < T20))
        .select(col("user_id"), col("event_type"), col("t_us"), col("value"))
        .orderBy(col("t_us"))),

    "ts_stats_global" -> ((s, dir) =>
      TS.statsGlobal(Tables.points(s, dir), STREAM)
        .orderBy(col("user_id"), col("event_type"))),

    "meta_stream_info" -> ((s, dir) =>
      Metadata.streamInfo(Tables.streams(s, dir)).orderBy(col("uuid"))),

    "meta_list_collections" -> ((s, dir) =>
      Metadata.listCollections(Tables.streams(s, dir), "", "", 3)),

    "meta_lookup_streams" -> ((s, dir) =>
      Metadata.lookupStreams(Tables.streams(s, dir), "c", col("user_id") < 8)
        .orderBy(col("uuid"))),

    "meta_usage" -> ((s, dir) =>
      Metadata.metadataUsage(Tables.streams(s, dir), "")
        .orderBy(col("collection"))),

    "ts_csv_export" -> ((s, dir) => {
      val p = Tables.points(s, dir)
        .filter(col("event_type") === "click" && col("user_id").isin(1, 2, 3) &&
          col("t_us") >= T0 && col("t_us") < T29)
      val d = col("t_us") - T0
      p.groupBy((lit(T0) + d - pmod(d, lit(DAY))).as("w_start"))
        .agg(
          round(avg(when(col("user_id") === 1, col("value"))), 6).as("u1_mean"),
          round(avg(when(col("user_id") === 2, col("value"))), 6).as("u2_mean"),
          round(avg(when(col("user_id") === 3, col("value"))), 6).as("u3_mean"),
          count(lit(1)).as("n_points"))
        .orderBy(col("w_start"))
    }),

    "ts_asof_join" -> ((s, dir) => {
      val p = Tables.points(s, dir)
      TS.asofJoin(
          p.filter(col("event_type") === "click"),
          p.filter(col("event_type") === "purchase"),
          Seq("user_id"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "ts_resample" -> ((s, dir) =>
      TS.resample(Tables.points(s, dir), STREAM, T0, T29, DAY)
        .orderBy(col("user_id"), col("event_type"), col("g_t"))),

    // ---- General analytics -------------------------------------------
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("2000-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q3_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate").cast("date") < lit("1998-03-15").cast("date"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") > lit("1998-03-15").cast("date"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q6_filter" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1998-01-01").cast("date") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))),
  )

  def oracleSql: Map[String, String] = Map(
    "ts_raw_values" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, t_us, value FROM pts
         |WHERE user_id = 7 AND event_type = 'click' AND t_us >= $T08 AND t_us < $T22
         |ORDER BY t_us""".stripMargin,

    "ts_aligned_windows" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, (t_us >> 36) << 36 AS w_start,
         |       min(value) AS v_min, round(avg(value), 6) AS v_mean,
         |       max(value) AS v_max, CAST(count(*) AS BIGINT) AS v_count
         |FROM pts WHERE t_us >= $T0 AND t_us < $T31
         |GROUP BY 1, 2, 3 ORDER BY user_id, event_type, w_start""".stripMargin,

    "ts_windows" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type,
         |       $T0 + (t_us - $T0) - ((t_us - $T0) % $DAY) AS w_start,
         |       min(value) AS v_min, round(avg(value), 6) AS v_mean,
         |       max(value) AS v_max, CAST(count(*) AS BIGINT) AS v_count
         |FROM pts WHERE t_us >= $T0 AND t_us < $T29
         |GROUP BY 1, 2, 3 ORDER BY user_id, event_type, w_start""".stripMargin,

    "ts_nearest_before" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, max(t_us) AS t_us, arg_max(value, t_us) AS value
         |FROM pts WHERE t_us < $T15 GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "ts_nearest_after" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, min(t_us) AS t_us, arg_min(value, t_us) AS value
         |FROM pts WHERE t_us >= $T15 GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "ts_changes" ->
      s"""WITH pts AS ($PTS_SQL),
         |ch AS (SELECT DISTINCT user_id, event_type, (t_us >> 32) << 32 AS r_start
         |       FROM pts WHERE ver > 100 AND ver <= 700),
         |ranges AS (SELECT user_id, event_type, r_start, r_start + 4294967296 AS r_end FROM ch),
         |flagged AS (SELECT *, CASE WHEN lag(r_end) OVER w IS NULL OR r_start > lag(r_end) OVER w
         |                           THEN 1 ELSE 0 END AS is_new
         |            FROM ranges WINDOW w AS (PARTITION BY user_id, event_type ORDER BY r_start)),
         |islands AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id, event_type ORDER BY r_start
         |                                        ROWS UNBOUNDED PRECEDING) AS island FROM flagged)
         |SELECT user_id, event_type, min(r_start) AS c_start, max(r_end) AS c_end
         |FROM islands GROUP BY user_id, event_type, island
         |ORDER BY user_id, event_type, c_start""".stripMargin,

    "ts_version_at" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, t_us, value FROM pts
         |WHERE ver <= 500 AND t_us >= $T0 AND t_us < $T31
         |ORDER BY user_id, event_type, t_us""".stripMargin,

    "ts_delete_range" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, t_us, value FROM pts
         |WHERE user_id = 3 AND event_type = 'view'
         |  AND NOT (t_us >= $T08 AND t_us < $T20)
         |ORDER BY t_us""".stripMargin,

    "ts_stats_global" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT user_id, event_type, min(value) AS v_min, round(avg(value), 6) AS v_mean,
         |       max(value) AS v_max, CAST(count(*) AS BIGINT) AS v_count,
         |       min(t_us) AS t_first, max(t_us) AS t_last
         |FROM pts GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "meta_stream_info" ->
      s"""SELECT md5(concat(event_type, '/', CAST(user_id AS VARCHAR))) AS uuid,
         |       event_type AS collection, user_id,
         |       CAST(count(*) AS BIGINT) AS n_points,
         |       min(epoch_us(ts)) AS t_min, max(epoch_us(ts)) AS t_max,
         |       max(event_id) AS version
         |FROM events GROUP BY event_type, user_id ORDER BY uuid""".stripMargin,

    "meta_list_collections" ->
      "SELECT DISTINCT event_type AS collection FROM events WHERE event_type >= '' ORDER BY collection LIMIT 3",

    "meta_lookup_streams" ->
      s"""SELECT md5(concat(event_type, '/', CAST(user_id AS VARCHAR))) AS uuid,
         |       event_type AS collection, user_id, max(event_id) AS version
         |FROM events WHERE event_type LIKE 'c%' AND user_id < 8
         |GROUP BY event_type, user_id ORDER BY uuid""".stripMargin,

    "meta_usage" ->
      s"""SELECT event_type AS collection,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS tag_user_count,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_streams
         |FROM events GROUP BY event_type ORDER BY collection""".stripMargin,

    "ts_csv_export" ->
      s"""WITH pts AS ($PTS_SQL)
         |SELECT $T0 + (t_us - $T0) - ((t_us - $T0) % $DAY) AS w_start,
         |       round(avg(CASE WHEN user_id = 1 THEN value END), 6) AS u1_mean,
         |       round(avg(CASE WHEN user_id = 2 THEN value END), 6) AS u2_mean,
         |       round(avg(CASE WHEN user_id = 3 THEN value END), 6) AS u3_mean,
         |       CAST(count(*) AS BIGINT) AS n_points
         |FROM pts
         |WHERE event_type = 'click' AND user_id IN (1, 2, 3) AND t_us >= $T0 AND t_us < $T29
         |GROUP BY 1 ORDER BY w_start""".stripMargin,

    "ts_asof_join" ->
      s"""WITH pts AS ($PTS_SQL),
         |c AS (SELECT user_id, t_us, value FROM pts WHERE event_type = 'click'),
         |p AS (SELECT user_id, t_us, value FROM pts WHERE event_type = 'purchase')
         |SELECT c.user_id AS user_id, c.t_us AS t_us, c.value AS l_value, p.value AS asof_value
         |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t_us >= p.t_us
         |ORDER BY user_id, t_us""".stripMargin,

    "ts_resample" ->
      s"""WITH pts AS ($PTS_SQL),
         |s AS (SELECT DISTINCT user_id, event_type FROM pts),
         |g AS (SELECT user_id, event_type, unnest(generate_series($T0, ${T29 - 1}, $DAY)) AS g_t FROM s),
         |b AS (SELECT user_id, event_type, $T0 + (t_us - $T0) - ((t_us - $T0) % $DAY) AS g_t,
         |             arg_max(value, t_us) AS last_v
         |      FROM pts WHERE t_us >= $T0 AND t_us < $T29 GROUP BY 1, 2, 3)
         |SELECT g.user_id, g.event_type, g.g_t,
         |       last_value(b.last_v IGNORE NULLS) OVER (PARTITION BY g.user_id, g.event_type
         |           ORDER BY g.g_t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
         |FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.event_type = b.event_type AND g.g_t = b.g_t
         |ORDER BY g.user_id, g.event_type, g.g_t""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_extendedprice), 6) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q6_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
  )
}
