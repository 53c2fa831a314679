package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming-shaped operators over the `events` table. The reference
  * has no stream engine (its incremental path is task batches,
  * index-scheduler); these model the U1 "del/add delta" semantics the
  * Spark way: the same aggregation runs as a batch DataFrame (used by
  * the DuckDB oracle) and as a Structured Streaming query with
  * watermarking (tested via a file stream in the spec).
  */
object Events {

  /** Tumbling-window counts per event type — batch form. Window start
    * aligns to the epoch hour, matching date_trunc('hour', ts). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 6).as("sum_value"))

  /** The same aggregation as a Structured Streaming query reading
    * parquet files as a stream; results land in an in-memory table. */
  def hourlyCountsStream(spark: SparkSession, dir: String,
                         queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      // parquet naive timestamps infer as TIMESTAMP_NTZ; event-time
      // watermarks require TIMESTAMP (session tz = UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
    hourlyCounts(stream.withWatermark("ts", "2 hours"))
      .writeStream
      // complete mode re-emits the whole result each batch — fine for
      // the bounded test corpus, NOT for unbounded key sets; the scale
      // path is hourlyCountsAppendStream below
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exact dedup: one row per content hash survives,
    * duplicates are dropped in the state store. `dropDuplicates` keyed
    * on the hash with an event-time watermark bounds state to the
    * watermark horizon — the streaming form of
    * [[graft.ops.Dedup.exactGroups]] for continuous ingestion (a
    * 100-TB/day pipeline dedups the firehose before indexing; an
    * unbounded key set without the watermark would OOM the state
    * store). `dropDuplicatesWithinWatermark` is the bounded-state API:
    * a plain dropDuplicates on the key alone would keep every key ever
    * seen (the watermark only evicts when the event-time column is in
    * the key). Dedup is guaranteed for duplicates arriving within the
    * watermark delay of each other — the firehose contract. Parity with
    * the batch form: the surviving KEY set is identical on a bounded
    * replay; the representative row is first-arrival in the stream vs
    * earliest-ts in `dedupBatch` (arrival order inside a micro-batch is
    * not an event-time order — the spec asserts the key-set invariant,
    * not row identity). */
  def dedupBatch(df: DataFrame, tsCol: String, payloadCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(payloadCol)))
      .orderBy(col(tsCol).asc)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  def dedupStream(spark: SparkSession, dir: String, tsCol: String,
                  payloadCol: String, outDir: String,
                  checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, "2 hours")
      .withColumn("_h", md5(col(payloadCol)))
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Append-mode variant for unbounded streams: only watermark-finalized
    * windows emit, so state is bounded by the watermark horizon (2h of
    * open windows) instead of every key ever seen — the 100-TB/day
    * deployment shape. Sink is a parquet dir (exactly-once via the
    * checkpoint). Append mode requires the event-time window itself in
    * the grouping key. */
  def hourlyCountsAppendStream(spark: SparkSession, dir: String,
                               outDir: String, checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
    stream.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
