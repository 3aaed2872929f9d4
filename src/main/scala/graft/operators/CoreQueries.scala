package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator battery (SURVEY.md §2.1-§2.7) expressed over the
  * driver's TPC-H-ish testdata, one oracle-checked query per operator family.
  *
  * Scale notes (the plans these produce at 100 TB):
  *  - Filters/projections compile to parquet `PushedFilters`/`ReadSchema` —
  *    scans read only the referenced columns and skip row groups.
  *  - Aggregations run partial (map-side) then final hash aggregation; top-k
  *    plans as `TakeOrderedAndProject` (no global sort materialization).
  *  - Dimension joins (nation/region/supplier-sized) broadcast; fact-fact
  *    joins shuffle on the join key with AQE free to re-plan at runtime.
  *  - Pivot uses an explicit value list — no extra distinct-discovery job.
  */
object CoreQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  // ---------------------------------------------------------------- S1/A: scan + agg
  /** TPC-H-Q1-shaped pricing summary: full scan with pushed date predicate,
    * 2-key hash aggregation with 5 aggregates (partial+final). */
  val q01ScanAgg = QuerySpec(
    "q01_scan_agg", "S1 P6 A-agg",
    "filtered full scan + multi-aggregate groupBy (TPC-H Q1 shape)",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          roundStable(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           |  round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  // ---------------------------------------------------------------- S2: projected scan
  /** Projection + predicate — both must reach the parquet reader
    * (ReadSchema of 3 columns, PushedFilters on l_quantity). */
  val q02Projection = QuerySpec(
    "q02_projection", "S2 P1",
    "column-pruned scan with pushed predicate",
    (s, d) =>
      li(s, d)
        .filter(col("l_quantity") > 47)
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
    Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_quantity > 47"))

  // ---------------------------------------------------------------- P9/A3: distinct
  val q03Distinct = QuerySpec(
    "q03_distinct", "P9 A3",
    "multi-column DISTINCT (planned as aggregate)",
    (s, d) => cust(s, d).select("c_mktsegment", "c_nationkey").distinct(),
    Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"))

  // ---------------------------------------------------------------- P3: IN-list
  val q04InFilter = QuerySpec(
    "q04_in_filter", "P3 P6",
    "IN-list predicate + conjunction + aggregation",
    (s, d) =>
      ord(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") && col("o_orderstatus") =!= "P")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total")),
    Some("""SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders
           |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus <> 'P'
           |GROUP BY o_orderpriority""".stripMargin))

  // ---------------------------------------------------------------- F2/F3: CASE encode
  /** Label encoding exactly as the reference's CASE (string-digit outputs,
    * NULL off-vocabulary) — `XGBoost/Predictor.py:30-31`. */
  val q05CaseEncode = QuerySpec(
    "q05_case_encode", "F2 F3 A3",
    "CASE label encoding with NULL off-vocabulary + distinct",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "0")
            .when(col("o_orderstatus") === "O", "1").as("status_code"))
        .groupBy("status_code").agg(count(lit(1)).as("n")),
    Some("""SELECT CASE WHEN o_orderstatus='F' THEN '0' WHEN o_orderstatus='O' THEN '1' END AS status_code,
           |  count(*) AS n
           |FROM orders GROUP BY 1""".stripMargin))

  // ---------------------------------------------------------------- F1: fractional odds
  /** The reference's one idiosyncratic scalar (`DAO/ImpalaCon.py:95-99`) as a
    * native codegen'd Catalyst expression, exercised on synthesized
    * "a/b" strings; stays inside WholeStageCodegen. */
  val q06FracOdds = QuerySpec(
    "q06_frac_odds", "F1 F8",
    "fractional-odds parse 'a/b' → (a+b)/2 via custom codegen Expression",
    (s, d) => {
      val qint = floor(col("l_quantity")).cast("int")
      val oddsStr = when(col("l_linenumber") % 2 === 1,
          concat(qint.cast("string"), lit("/"), (qint + 1).cast("string")))
        .otherwise(qint.cast("string"))
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), oddsStr.as("odds"))
        .withColumn("parsed", parseOdds(col("odds")))
        .filter(col("parsed") > 25.0)
    },
    Some("""WITH t AS (
           |  SELECT l_orderkey, l_linenumber,
           |    CASE WHEN l_linenumber % 2 = 1
           |      THEN concat(CAST(CAST(floor(l_quantity) AS INT) AS VARCHAR), '/',
           |                  CAST(CAST(floor(l_quantity) AS INT) + 1 AS VARCHAR))
           |      ELSE CAST(CAST(floor(l_quantity) AS INT) AS VARCHAR) END AS odds
           |  FROM lineitem)
           |SELECT l_orderkey, l_linenumber, odds,
           |  CASE WHEN odds LIKE '%/%'
           |    THEN (TRY_CAST(string_split(odds,'/')[1] AS DOUBLE) + TRY_CAST(string_split(odds,'/')[2] AS DOUBLE)) / 2.0
           |    ELSE TRY_CAST(odds AS DOUBLE) END AS parsed
           |FROM t
           |WHERE CASE WHEN odds LIKE '%/%'
           |    THEN (TRY_CAST(string_split(odds,'/')[1] AS DOUBLE) + TRY_CAST(string_split(odds,'/')[2] AS DOUBLE)) / 2.0
           |    ELSE TRY_CAST(odds AS DOUBLE) END > 25.0""".stripMargin))

  // ---------------------------------------------------------------- A1: top-k
  /** group-by count + ORDER BY count DESC LIMIT k — plans as partial/final
    * agg + TakeOrderedAndProject (no global sort). Deterministic tie-break
    * on the key (the reference's `limit 10` is tie-unstable; we fix that). */
  val q07TopK = QuerySpec(
    "q07_topk", "A1 §2.5",
    "top-10 suppliers by lineitem count (TakeOrderedAndProject)",
    (s, d) =>
      li(s, d)
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_suppkey").asc)
        .limit(10),
    Some("""SELECT l_suppkey, count(*) AS cnt FROM lineitem
           |GROUP BY l_suppkey ORDER BY cnt DESC, l_suppkey ASC LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------- A2: pivot + mean
  /** Pivot with an EXPLICIT value list (skips the distinct-discovery job the
    * reference also avoided by pre-collecting top-10 companies). */
  val q08PivotAvg = QuerySpec(
    "q08_pivot_avg", "A2 F9",
    "groupBy + pivot(explicit values) + mean aggregation",
    (s, d) =>
      li(s, d)
        .groupBy("l_suppkey")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(
          roundStable(avg("l_quantity"), 4).as("avg_qty"),
          // money avg over EXACT integer cents: the double sum of 2dp values
          // carries ~1e-9 engine-order noise (same scale as the rounding
          // nudge); integer sums are exact and IEEE division of exact
          // operands is deterministic in every engine
          roundStable(
            sum(round(col("l_extendedprice") * 100).cast("long")) /
              count(col("l_extendedprice")) / lit(100.0), 2).as("avg_price")),
    Some("""SELECT l_suppkey,
           |  round(avg(l_quantity)      FILTER (WHERE l_returnflag='A') + 1e-9, 4) AS A_avg_qty,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) FILTER (WHERE l_returnflag='A')
           |        / count(l_extendedprice) FILTER (WHERE l_returnflag='A') / 100.0 + 1e-9, 2) AS A_avg_price,
           |  round(avg(l_quantity)      FILTER (WHERE l_returnflag='N') + 1e-9, 4) AS N_avg_qty,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) FILTER (WHERE l_returnflag='N')
           |        / count(l_extendedprice) FILTER (WHERE l_returnflag='N') / 100.0 + 1e-9, 2) AS N_avg_price,
           |  round(avg(l_quantity)      FILTER (WHERE l_returnflag='R') + 1e-9, 4) AS R_avg_qty,
           |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) FILTER (WHERE l_returnflag='R')
           |        / count(l_extendedprice) FILTER (WHERE l_returnflag='R') / 100.0 + 1e-9, 2) AS R_avg_price
           |FROM lineitem GROUP BY l_suppkey""".stripMargin))

  // ---------------------------------------------------------------- J1/J2: multi-way join
  /** 3-way join: fact⋈fact shuffles on the key, 25-row nation dim broadcasts
    * (Catalyst auto; AQE may convert more at runtime). */
  val q09Join3 = QuerySpec(
    "q09_join3", "J1 J2",
    "customer ⋈ orders ⋈ nation, revenue by nation (broadcast dim)",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue")),
    Some("""SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name""".stripMargin))

  // ---------------------------------------------------------------- J5: semi-join
  /** The reference collected ids to the driver and spliced an IN-list
    * (`XGBoost/Predictor.py:201-208`); the distributed form is a left-semi
    * join — no driver round-trip, no 100 TB IN-list. */
  val q10SemiJoin = QuerySpec(
    "q10_semi_join", "J5 P3",
    "left-semi join (distributed replacement for collect+IN-list)",
    (s, d) =>
      cust(s, d)
        .join(
          ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers")),
    Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
           |GROUP BY c_mktsegment""".stripMargin))

  // ---------------------------------------------------------------- anti-join
  val q11AntiJoin = QuerySpec(
    "q11_anti_join", "J5-dual",
    "left-anti join (NOT EXISTS)",
    (s, d) =>
      cust(s, d)
        .join(
          ord(s, d).filter(col("o_totalprice") > 150000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers")),
    Some("""SELECT c_nationkey, count(*) AS n_customers FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
           |GROUP BY c_nationkey""".stripMargin))

  // ---------------------------------------------------------------- P7: dropna
  /** `na.drop("any")` over constructed nullable columns — the reference's
    * post-pivot dropna (`XGBoost/Predictor.py:48-52`). */
  val q12DropNa = QuerySpec(
    "q12_dropna", "P7 P8",
    "null-row filter: na.drop('any') after nullable projection",
    (s, d) =>
      li(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_returnflag") =!= "R", col("l_returnflag")).as("rf"),
          when(col("l_linestatus") =!= "F", col("l_linestatus")).as("ls"))
        .na.drop("any")
        .groupBy("rf", "ls").agg(count(lit(1)).as("n")),
    Some("""SELECT rf, ls, count(*) AS n FROM (
           |  SELECT l_orderkey, l_linenumber,
           |    CASE WHEN l_returnflag <> 'R' THEN l_returnflag END AS rf,
           |    CASE WHEN l_linestatus <> 'F' THEN l_linestatus END AS ls
           |  FROM lineitem)
           |WHERE rf IS NOT NULL AND ls IS NOT NULL
           |GROUP BY rf, ls""".stripMargin))

  // ---------------------------------------------------------------- window functions
  /** Spark-for-free capability beyond the reference (§2.6): ranked +
    * running-sum window, single shuffle on the partition key serves both. */
  val q13Window = QuerySpec(
    "q13_window", "§2.6-window",
    "row_number + running sum over (customer, date) window, top-3 per customer",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          row_number().over(w).as("rn"),
          round(sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"))
        .filter(col("rn") <= 3)
    },
    Some("""SELECT o_custkey, o_orderkey, order_date, rn, running_total FROM (
           |  SELECT o_custkey, o_orderkey,
           |    strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
           |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
           |  FROM orders)
           |WHERE rn <= 3""".stripMargin))

  // ---------------------------------------------------------------- set ops
  val q14SetOps = QuerySpec(
    "q14_setops", "§2.6-setops",
    "INTERSECT / EXCEPT / UNION ALL composition",
    (s, d) => {
      val seg = cust(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val big = ord(s, d).filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey")).distinct()
      seg.intersect(big).withColumn("tag", lit("both"))
        .unionByName(seg.except(big).withColumn("tag", lit("seg_only")))
    },
    Some("""WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           |     big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
           |SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM seg INTERSECT SELECT * FROM big)
           |UNION ALL
           |SELECT c_custkey, 'seg_only' AS tag FROM (SELECT * FROM seg EXCEPT SELECT * FROM big)""".stripMargin))

  // ---------------------------------------------------------------- rollup
  val q15Rollup = QuerySpec(
    "q15_rollup", "§2.4-rollup",
    "ROLLUP hierarchy aggregation (subtotals + grand total)",
    (s, d) =>
      li(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin))

  // ---------------------------------------------------------------- F5/P4: regex + cast
  /** regexp_extract + string→int cast + range predicate — the reference's
    * match-id extraction (`Spider/GameSpider.py:95-97`) and recency filter
    * (`XGBoost/Predictor.py:129`). */
  val q16RegexExtract = QuerySpec(
    "q16_regex_extract", "F5 P4 P5",
    "regexp_extract match-id + cast(string→int) range filter",
    (s, d) =>
      cust(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).try_cast("int").as("name_id"))
        .filter(col("name_id") % 10 === 3),
    Some("""SELECT c_custkey, TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS INT) AS name_id
           |FROM customer
           |WHERE TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS INT) % 10 = 3""".stripMargin))

  // ---------------------------------------------------------------- F7: split / slice
  val q17Split = QuerySpec(
    "q17_split", "F7 F6",
    "string split with positional access (first/last token)",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          split(col("text"), " ").getItem(0).as("first_tok"),
          element_at(split(col("text"), " "), -1).as("last_tok")),
    Some("""SELECT doc_id,
           |  regexp_extract(text, '^(\S+)', 1) AS first_tok,
           |  regexp_extract(text, '(\S+)$', 1) AS last_tok
           |FROM documents""".stripMargin))

  // ---------------------------------------------------------------- §2.5: sort+limit
  val q18SortLimit = QuerySpec(
    "q18_sort_limit", "§2.5",
    "global top-20 by sort key (TakeOrderedAndProject, deterministic tie-break)",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
    Some("""SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- JSON extraction
  /** Semi-structured props column: native get_json_object on the Spark side
    * (oracle uses a regex to avoid DuckDB extension loading). */
  val q19Json = QuerySpec(
    "q19_json", "§2.7-json",
    "JSON field extraction from props + aggregation",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").try_cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k")),
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k
           |FROM events GROUP BY event_type""".stripMargin))

  // ---------------------------------------------------------------- event-time windows (batch form)
  /** Tumbling event-time window aggregation — batch twin of the streaming
    * pipeline in graft.streaming (same expressions run under readStream
    * with a watermark). */
  val q20EventsWindow = QuerySpec(
    "q20_events_window", "§2.6-stream-batch",
    "tumbling 1-hour event-time window aggregation over events",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value")),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
           |  count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2""".stripMargin))

  val all: Seq[QuerySpec] = Seq(
    q01ScanAgg, q02Projection, q03Distinct, q04InFilter, q05CaseEncode,
    q06FracOdds, q07TopK, q08PivotAvg, q09Join3, q10SemiJoin, q11AntiJoin,
    q12DropNa, q13Window, q14SetOps, q15Rollup, q16RegexExtract, q17Split,
    q18SortLimit, q19Json, q20EventsWindow)
}
