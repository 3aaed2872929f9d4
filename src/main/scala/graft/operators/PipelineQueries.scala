package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-level capabilities: batch sessionization (the oracle-checkable
  * twin of the streaming sessionizer), single-pass data profiling, and
  * multi-format sink/source roundtrips. */
object PipelineQueries {

  // ---------------------------------------------------------------- batch sessionization
  /** Gap-based sessionization in batch: a session starts where the gap from
    * the previous event exceeds 30 minutes; session ids are running counts
    * of starts. Same semantics as the streaming
    * [[graft.streaming.EventsPipeline.sessionize]] (which the driver checks
    * rows-only) — this batch formulation is fully SQL-expressible, so the
    * sessionization OPERATOR gets a DuckDB hash check. Two window passes
    * over user partitions, then one aggregation — no global sort. */
  val q64SessionizeBatch = QuerySpec(
    "q64_sessionize_batch", "§2.6-sessionize-batch",
    "gap-based sessionization via lag + running sum of session starts",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("ts", date_trunc("second", col("ts")))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      ev.withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("is_start", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_start").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, value, date_trunc('second', ts) AS ts FROM events),
           |g AS (SELECT *, CAST(date_diff('second',
           |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), ts) AS BIGINT) AS gap_s
           |      FROM ev),
           |st AS (SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS is_start FROM g),
           |sess AS (SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
           |           ORDER BY ts ASC, event_id ASC
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |         FROM st)
           |SELECT user_id, session_id, count(*) AS n_events,
           |  round(sum(value), 2) AS total_value,
           |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts
           |FROM sess GROUP BY user_id, session_id""".stripMargin))

  // ---------------------------------------------------------------- data profiling
  /** Single-pass column profiler over orders — see [[graft.ext.Profiler]].
    * One scan computes count/nulls/distinct/min/max for all columns; the
    * oracle recomputes each column's stats independently. */
  val q65Profile = QuerySpec(
    "q65_profile", "EXT-profile",
    "single-pass multi-column data-quality profile (long format)",
    (s, d) => graft.ext.Profiler.profile(
      Tables.orders(s, d),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")),
    Some("""SELECT 'o_orderkey' AS col_name, CAST(count(o_orderkey) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           |  CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
           |FROM orders
           |UNION ALL
           |SELECT 'o_orderstatus', CAST(count(o_orderstatus) AS BIGINT),
           |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           |  min(o_orderstatus), max(o_orderstatus) FROM orders
           |UNION ALL
           |SELECT 'o_totalprice', CAST(count(o_totalprice) AS BIGINT),
           |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
           |  printf('%.2f', min(o_totalprice)), printf('%.2f', max(o_totalprice)) FROM orders
           |UNION ALL
           |SELECT 'o_orderpriority', CAST(count(o_orderpriority) AS BIGINT),
           |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           |  min(o_orderpriority), max(o_orderpriority) FROM orders""".stripMargin))

  // ---------------------------------------------------------------- multi-format roundtrip
  /** Sink/source parity across the engine's file formats: the same filtered
    * slice written as ORC, CSV and JSON, read back through each reader, and
    * aggregated identically — one output row per format, all three required
    * to match the parquet-derived oracle row-for-row. Columnar ORC keeps
    * schema natively; CSV/JSON readers get the schema explicitly (a
    * production pipeline never infers schemas twice). */
  val q66MultiFormat = QuerySpec(
    "q66_multiformat", "S-formats",
    "ORC / CSV / JSON sink+source roundtrip parity",
    (s, d) => {
      val base = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      val root = "/tmp/graft-formats"
      base.write.mode("overwrite").orc(s"$root/orc")
      base.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
      base.write.mode("overwrite").json(s"$root/json")
      val schema = "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_extendedprice DOUBLE"
      val orc = s.read.orc(s"$root/orc")
      val csv = s.read.schema(schema).option("header", "true").csv(s"$root/csv")
      val json = s.read.schema(schema).json(s"$root/json")
      Seq("orc" -> orc, "csv" -> csv, "json" -> json)
        .map { case (fmt, df) =>
          df.groupBy(lit(fmt).as("format"))
            .agg(count(lit(1)).as("n"),
              sum("l_orderkey").as("sum_key"),
              round(sum("l_extendedprice"), 2).as("sum_price"))
        }
        .reduce(_ unionByName _)
    },
    Some("""WITH agg AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
           |    round(sum(l_extendedprice), 2) AS sum_price
           |  FROM lineitem WHERE l_quantity > 45)
           |SELECT f.format, a.n, a.sum_key, a.sum_price
           |FROM (VALUES ('orc'), ('csv'), ('json')) f(format) CROSS JOIN agg a""".stripMargin))

  def all: Seq[QuerySpec] = Seq(q64SessionizeBatch, q65Profile, q66MultiFormat)
}
