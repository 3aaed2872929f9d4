package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` surface (SURVEY.md §2.6 [EXT]):
  * the reference has no streams; this is the Spark-native streaming design
  * the engine contributes.
  *
  * Scale design: event-time processing with watermarks bounds state; the
  * windowed aggregate shuffles once on (window, event_type); sessionization
  * keeps per-user state in the state store keyed by user_id (shuffle on
  * user_id), with watermark-driven eviction — both shapes run unchanged on a
  * 1000-executor cluster with a distributed state store.
  */
/** Streaming row/state types — top-level so Catalyst encoders and state
  * codegen can reference them (object-nested private classes break the
  * generated code's accessors). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class Session(user_id: Long, n_events: Int, start: Timestamp, end: Timestamp, total_value: Double)
case class SessionState(n: Int, start: Long, last: Long, total: Double)

object EventsPipeline {

  /** The events schema as `graft.Tables.events` exposes it: ts normalized
    * to TimestampType. The file-stream source needs an explicit schema, so
    * the PHYSICAL ts type is probed from a one-off batch read of the same
    * file (nanos-as-long legacy generations read BIGINT; `timestamp[us]`
    * generations read TIMESTAMP_NTZ) and the matching conversion applied —
    * mirroring [[graft.Tables.events]]. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // through Tables.load so the footer-inference job is paid once per
    // session, not once per stream start (the cache returns the physical
    // schema: load() does no ts normalization)
    val physTs = graft.Tables.load(spark, dir, "events").schema("ts").dataType
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
          .fields.patch(1, Seq(org.apache.spark.sql.types.StructField("ts", physTs)), 0)))
      .format("parquet")
      // file-stream source wants a directory; glob-filter to the one table
      .option("pathGlobFilter", "events.parquet")
      .load(dir)
    physTs match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling event-time window aggregation with a watermark: counts and
    * sums per (1-hour window, event_type). Late events beyond 30 minutes
    * are dropped and their window state evicted. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives for `gapMinutes` (event-time timeout driven by
    * the watermark). Custom distributed state — the mapGroupsWithState
    * capability the [EXT] surface requires. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n, new Timestamp(s.start), new Timestamp(s.last), s.total))
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption.orNull
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(1, t, t, e.value)
              else if (t - cur.last > gapMs) {
                closed ::= Session(userId, cur.n, new Timestamp(cur.start), new Timestamp(cur.last), cur.total)
                cur = SessionState(1, t, t, e.value)
              } else cur = cur.copy(n = cur.n + 1, last = math.max(cur.last, t), total = cur.total + e.value)
            }
            state.update(cur)
            // a late-but-within-watermark batch can leave cur.last + gapMs
            // at-or-below the current watermark, which Spark rejects — clamp
            // the timeout strictly past the watermark (fires next trigger)
            state.setTimeoutTimestamp(
              math.max(cur.last + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: drop duplicate event_ids within the watermark
    * horizon — state stays bounded (keys older than the watermark are
    * evicted), the streaming half of the batch Dedup.exact operator. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases within `windowMinutes` after an
    * error by the same user — BOTH sides unbounded streams. The watermarks
    * bound each side's join state: a buffered error can be evicted once the
    * purchase-side watermark passes error_ts + window (no match can arrive
    * anymore), which is what makes an unbounded two-stream join feasible at
    * all. Equi-key user_id carries the shuffle; the time-range predicate
    * prunes state inside each key group — the streaming twin of the batch
    * range join (q50). */
  def errorPurchaseJoin(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val base = events.withColumn("ts", date_trunc("second", col("ts")))
    val errors = base.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", "30 minutes")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    errors.join(purchases, expr(
      s"""user_id = p_user AND purchase_ts > error_ts
         |AND purchase_ts <= error_ts + INTERVAL $windowMinutes MINUTES""".stripMargin))
      .select(col("user_id"), col("error_id"), col("purchase_id"),
        date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("err_t"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("buy_t"))
  }

  /** Run a streaming DataFrame to completion over the (finite) file source
    * and return the materialized result — used by the verify path so the
    * STREAMING plan itself (not a batch twin) produces the checked rows. */
  def runToMemoryTable(spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
