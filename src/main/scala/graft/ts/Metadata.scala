package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-metadata query surface (reference: internal/mprovider — the
  * etcd-backed metadata provider — and the ListCollections /
  * LookupStreams / GetMetadataUsage RPCs in grpcinterface/btrdb.proto:111-128).
  *
  * Operates on the derived `streams` descriptor table
  * (graft.Tables.streams): one row per stream with collection, tag
  * columns, point count, time bounds, latest version. At 100 TB the
  * streams table is millions of rows, not billions — always
  * broadcast-joinable against the points fact table.
  */
object Metadata {

  /** ListCollections(prefix, startWith, limit) — mprovider/lookup.go. */
  def listCollections(streams: DataFrame, prefix: String, startWith: String,
                      limit: Int): DataFrame =
    streams.select(col("collection")).distinct()
      .filter(col("collection").startsWith(prefix) && col("collection") >= startWith)
      .orderBy(col("collection"))
      .limit(limit)

  /** LookupStreams(collectionPrefix, tag predicates) — btrdb.proto:120-125. */
  def lookupStreams(streams: DataFrame, collectionPrefix: String,
                    tagPredicate: org.apache.spark.sql.Column): DataFrame =
    streams
      .filter(col("collection").startsWith(collectionPrefix) && tagPredicate)
      .select(col("uuid"), col("collection"), col("user_id"), col("version"))

  /** StreamInfo — one descriptor per stream (btrdb.proto StreamDescriptor). */
  def streamInfo(streams: DataFrame): DataFrame =
    streams.select(col("uuid"), col("collection"), col("user_id"),
      col("n_points"), col("t_min"), col("t_max"), col("version"))

  /** GetMetadataUsage(prefix): distinct tag-value usage counts under a
    * collection prefix (btrdb.proto:99-109, KeyCount).
    */
  def metadataUsage(streams: DataFrame, prefix: String): DataFrame =
    streams.filter(col("collection").startsWith(prefix))
      .groupBy(col("collection"))
      .agg(countDistinct(col("user_id")).as("tag_user_count"),
           count(lit(1)).as("n_streams"))
}
