package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-surface depth beyond the reference's own joins/aggregates
  * (SURVEY.md §2.3/§2.4/§2.6): outer and null-safe joins, EXISTS/NOT EXISTS,
  * conditional and statistical aggregates, min_by/max_by, lead/lag/ntile,
  * ordered collect, and nested-struct field access. All oracle-checked.
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial combine; the full-outer and null-safe joins shuffle on their
  * equi-keys (no nested-loop fallback — `<=>` is a sort/hash-merge-able
  * equality in Catalyst); the window queries sort only within user
  * partitions.
  */
object RelationalDepthQueries {

  // ---------------------------------------------------------------- full outer join
  /** Per-nation counts of negative-balance suppliers FULL OUTER per-nation
    * counts of deeply-negative customers: unmatched sides surface as NULLs,
    * coalesced to zero. Both inputs are pre-aggregated (tiny), so the outer
    * join runs on ≤ |nations| rows regardless of corpus size. */
  val q53FullOuter = QuerySpec(
    "q53_full_outer", "§2.3-full-outer",
    "full outer join of per-nation supplier/customer aggregates",
    (s, d) => {
      val sup = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
      val cust = Tables.customer(s, d).filter(col("c_acctbal") < -900)
        .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
      sup.join(cust, col("nk_s") === col("nk_c"), "full_outer")
        .select(
          coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
    },
    Some("""WITH s AS (SELECT s_nationkey AS nk_s, CAST(count(*) AS BIGINT) AS n_supp
           |          FROM supplier WHERE s_acctbal < 0 GROUP BY 1),
           |     c AS (SELECT c_nationkey AS nk_c, CAST(count(*) AS BIGINT) AS n_cust
           |          FROM customer WHERE c_acctbal < -900 GROUP BY 1)
           |SELECT COALESCE(nk_s, nk_c) AS nationkey,
           |  COALESCE(n_supp, 0) AS n_supp, COALESCE(n_cust, 0) AS n_cust
           |FROM s FULL OUTER JOIN c ON nk_s = nk_c""".stripMargin))

  // ---------------------------------------------------------------- null-safe join
  /** `<=>` (null-safe equality) join: NULL keys MATCH each other instead of
    * dropping out. Catalyst plans `<=>` as a normal equi-join key (hash
    * partitionable — NULLs hash to one bucket), not a nested loop. */
  val q54NullSafeJoin = QuerySpec(
    "q54_null_safe_join", "§2.3-null-safe",
    "null-safe (<=>) equi-join where NULL keys pair up",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val a = cust.groupBy(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        .agg(count(lit(1)).as("n_a"))
      val b = cust.groupBy(nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg"))
        .agg(count(lit(1)).as("n_b"))
      a.join(b, a("seg") <=> b("seg"))
        .select(a("seg").as("seg"), col("n_a"), col("n_b"))
    },
    Some("""WITH a AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
           |             CAST(count(*) AS BIGINT) AS n_a FROM customer GROUP BY 1),
           |     b AS (SELECT nullif(c_mktsegment, 'MACHINERY') AS seg,
           |             CAST(count(*) AS BIGINT) AS n_b FROM customer GROUP BY 1)
           |SELECT a.seg AS seg, a.n_a, b.n_b
           |FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg""".stripMargin))

  // ---------------------------------------------------------------- EXISTS / NOT EXISTS
  /** Correlated EXISTS + NOT EXISTS — Catalyst decorrelates both into
    * left-semi / left-anti hash joins (no per-row subquery execution). */
  val q55Exists = QuerySpec(
    "q55_exists", "§2.3-exists SQL-surface",
    "correlated EXISTS and NOT EXISTS over orders per customer",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_q55")
      Tables.orders(s, d).createOrReplaceTempView("orders_q55")
      s.sql("""SELECT c_custkey, c_mktsegment
              |FROM customer_q55 c
              |WHERE EXISTS (SELECT 1 FROM orders_q55 o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
              |  AND NOT EXISTS (SELECT 1 FROM orders_q55 o
              |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin)
    },
    Some("""SELECT c_custkey, c_mktsegment
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin))

  // ---------------------------------------------------------------- conditional aggregates
  /** Filtered/conditional aggregation in one pass over the fact table —
    * the map-side-combine alternative to N separate filtered scans. */
  val q56ConditionalAgg = QuerySpec(
    "q56_conditional_agg", "§2.4-conditional",
    "sum/count/avg over CASE-filtered slices in a single aggregation",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(0.0)), 2)
            .as("hi_disc_price"),
          sum(when(col("l_tax") > 0.04, 1L).otherwise(0L)).as("n_hi_tax"),
          graft.functions.roundStable(avg(when(col("l_returnflag") === "R", col("l_quantity"))), 4)
            .as("avg_qty_returned")),
    Some("""SELECT l_linestatus,
           |  round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS hi_disc_price,
           |  CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_tax,
           |  round(avg(CASE WHEN l_returnflag = 'R' THEN l_quantity END) + 1e-9, 4) AS avg_qty_returned
           |FROM lineitem GROUP BY l_linestatus""".stripMargin))

  // ---------------------------------------------------------------- statistical aggregates
  /** stddev / variance / correlation / covariance — single-pass numerically
    * stable (Welford-style merge) in both engines; rounded with the stable
    * nudge since engine-order summation noise is ~1e-12 relative. */
  val q57StatsAgg = QuerySpec(
    "q57_stats_agg", "§2.4-stats",
    "stddev_samp / var_samp / corr / covar_samp per group",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          graft.functions.roundStable(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          graft.functions.roundStable(var_samp(col("l_tax")), 6).as("var_tax"),
          graft.functions.roundStable(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          graft.functions.roundStable(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc")),
    Some("""SELECT l_returnflag,
           |  round(stddev_samp(l_discount) + 1e-9, 6) AS sd_disc,
           |  round(var_samp(l_tax) + 1e-9, 6) AS var_tax,
           |  round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS corr_qty_price,
           |  round(covar_samp(l_quantity, l_discount) + 1e-9, 4) AS cov_qty_disc
           |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- min_by / max_by
  /** Argmin/argmax without a self-join or window: which order carries each
    * group's price extremum. The sort value folds (price_cents, orderkey,
    * linenumber) into one BIGINT so ties on price break deterministically —
    * identically in both engines. */
  val q58MinByMaxBy = QuerySpec(
    "q58_min_by_max_by", "§2.4-argminmax",
    "min_by / max_by with a composite deterministic sort value",
    (s, d) => {
      val sortVal = (round(col("l_extendedprice") * 100, 0).cast("long") * 1000000000L +
        col("l_orderkey") * 10L + col("l_linenumber")).as("sv")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"), sortVal)
        .groupBy("l_returnflag")
        .agg(
          max_by(col("l_orderkey"), col("sv")).as("priciest_order"),
          min_by(col("l_orderkey"), col("sv")).as("cheapest_order"),
          round(max("l_extendedprice"), 2).as("max_price"))
    },
    Some("""WITH t AS (SELECT l_returnflag, l_orderkey, l_extendedprice,
           |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 1000000000 +
           |    l_orderkey * 10 + l_linenumber AS sv
           |  FROM lineitem)
           |SELECT l_returnflag,
           |  arg_max(l_orderkey, sv) AS priciest_order,
           |  arg_min(l_orderkey, sv) AS cheapest_order,
           |  round(max(l_extendedprice), 2) AS max_price
           |FROM t GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- lead / lag / ntile
  /** Inter-event gaps + quartile bucketing per user. The only sort is
    * within user partitions (shuffle on user_id then local sort) — no
    * global ordering anywhere. */
  val q59LeadLag = QuerySpec(
    "q59_lead_lag", "§2.6-leadlag",
    "lag-based inter-event gap seconds + ntile quartile per user",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts", date_trunc("second", col("ts")))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      ev.select(
          col("user_id"), col("event_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_s"),
          ntile(4).over(w).as("quartile"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts FROM events)
           |SELECT user_id, event_id,
           |  CAST(date_diff('second',
           |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), ts) AS BIGINT) AS gap_s,
           |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INT) AS quartile
           |FROM ev""".stripMargin))

  // ---------------------------------------------------------------- ordered collect
  /** collect_set is unordered by contract — sort_array makes the result
    * deterministic and cross-engine comparable. The sorted set is emitted as
    * a joined scalar string rather than a raw array column: the driver's
    * checker row-sorts results in pandas, and raw array cells are unhashable
    * there (r2's one red row). Semantics are identical — the array is fully
    * determined by the string — and scalar output is the cross-engine-safe
    * shape for collected sets. */
  val q60CollectSorted = QuerySpec(
    "q60_collect_sorted", "§2.4-collect",
    "sorted distinct-value sets per group (deterministic collect)",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n")),
    Some("""SELECT o_orderpriority,
           |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM orders GROUP BY o_orderpriority""".stripMargin))

  // ---------------------------------------------------------------- nested struct access
  /** Builds a struct column and reads fields back out — Catalyst collapses
    * CreateNamedStruct + GetStructField to plain column references
    * (check: the optimized plan has no struct construction), so nesting
    * is free at scan time and the parquet reader still prunes columns. */
  val q61Struct = QuerySpec(
    "q61_struct", "§2.7-struct",
    "nested struct build + field access, optimized away by Catalyst",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp")).as("info"))
        .filter(col("info.tp") > 450000)
        .select(col("o_orderkey"), col("info.st").as("st"),
          round(col("info.tp"), 2).as("tp")),
    Some("""SELECT o_orderkey, o_orderstatus AS st, round(o_totalprice, 2) AS tp
           |FROM orders WHERE o_totalprice > 450000""".stripMargin))

  // ---------------------------------------------------------------- posexplode (ordinality)
  /** Position-aware explode: token position survives the flatten —
    * the UDTF surface (generator functions) with ordinal semantics. */
  val q73Posexplode = QuerySpec(
    "q73_posexplode", "§2.7-generator-ordinality",
    "posexplode: token positions for the first 3 tokens of each doc",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(graft.ext.tokens(graft.ext.normText(col("text")))).as(Seq("pos", "token")))
        .filter(col("pos") < 3)
        .select(col("doc_id"), col("pos"), col("token")),
    Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(
           |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
           |    '\s+') AS toks FROM documents),
           |u AS (SELECT doc_id, unnest(list_transform(generate_series(1, least(3, len(toks))),
           |        i -> struct_pack(i := i, tok := toks[i]))) AS p FROM t)
           |SELECT doc_id, CAST(p.i - 1 AS INT) AS pos, p.tok AS token FROM u""".stripMargin))

  // ---------------------------------------------------------------- unpivot / melt
  /** Native UNPIVOT (melt): wide per-row measures → long (measure, value)
    * rows — the inverse of pivot, a metadata-only Expand (no shuffle). */
  val q74Unpivot = QuerySpec(
    "q74_unpivot", "§2.4-unpivot",
    "unpivot wide measures to long rows, aggregated per measure",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total")),
    Some("""WITH u AS (
           |  SELECT l_orderkey, l_linenumber, measure, value
           |  FROM lineitem
           |  UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax)))
           |SELECT measure, count(*) AS n, round(sum(value), 2) AS total
           |FROM u GROUP BY measure""".stripMargin))

  // ---------------------------------------------------------------- window value functions
  /** first_value / last_value / nth_value with explicit frames +
    * percent_rank / cume_dist — the remaining window-function families. */
  val q75WindowValues = QuerySpec(
    "q75_window_values", "§2.6-value-fns",
    "first/last/nth_value over full frames, percent_rank, cume_dist",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          first(col("o_orderkey")).over(full).as("cheapest_key"),
          last(col("o_orderkey")).over(full).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
          graft.functions.roundStable(percent_rank().over(w), 6).as("pct_rank"),
          graft.functions.roundStable(cume_dist().over(w), 6).as("cdist"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
           |  first_value(o_orderkey) OVER wf AS cheapest_key,
           |  last_value(o_orderkey) OVER wf AS priciest_key,
           |  nth_value(o_orderkey, 2) OVER wf AS second_key,
           |  round(percent_rank() OVER w + 1e-9, 6) AS pct_rank,
           |  round(cume_dist() OVER w + 1e-9, 6) AS cdist
           |FROM orders WHERE o_totalprice > 400000
           |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC),
           |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin))

  // ---------------------------------------------------------------- levenshtein fuzzy match
  /** Edit-distance fuzzy matching — entity-resolution style. BLOCKING is
    * the scale lever: pairing within (brand, last name-word) blocks makes
    * the shuffle key carry both, so the quadratic levenshtein check runs
    * only inside small blocks (brand alone left ~800-row groups → 8M
    * comparisons at sf0.1 and 11 s; the two-part block cuts that ~8×). */
  val q76FuzzyMatch = QuerySpec(
    "q76_fuzzy_match", "§2.7-editdistance",
    "levenshtein near-matches of part names, blocked by (brand, noun)",
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_brand"), col("noun"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("noun"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "noun"))
        .filter(col("key_a") < col("key_b"))
        .select(col("p_brand"), col("key_a"), col("key_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"))
        .filter(col("dist") <= 4)
    },
    Some("""SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
           |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
           |FROM part a JOIN part b
           |  ON a.p_brand = b.p_brand
           | AND (string_split(a.p_name, ' '))[-1] = (string_split(b.p_name, ' '))[-1]
           | AND a.p_partkey < b.p_partkey
           |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin))

  // ---------------------------------------------------------------- output-bound closest pairs
  /** OUTPUT-BOUND closest-pair search — the q76 follow-through for
    * pipelines that only need the K most-similar pairs (entity-resolution
    * review queues, near-dup triage), never the full pair set. The
    * blocked candidate generator is unchanged (pairs exist only inside
    * (brand, noun) blocks), but the consumer is `ORDER BY dist LIMIT K`,
    * which Spark plans as TakeOrderedAndProject: each partition keeps a
    * K-row bounded heap while SCORING its candidates, and the driver
    * merges K-sized partials. The pair set — quadratic in block size,
    * 101× the corpus on a cloned shard (q76's answer-bound blowup at the
    * sf1 probe) — is never sorted, shuffled, or materialized; memory is
    * O(K) per partition and the result is O(K) regardless of corpus
    * size. The deterministic (dist, key_a, key_b) tie-break makes top-K
    * a total order, so the answer is reproducible run-to-run.
    * PlanAuditSpec pins the TakeOrdered shape (no rangepartitioning). */
  val q213TopkPairs = QuerySpec(
    "q213_topk_pairs", "§2.7-topk-pairs",
    "closest-pair top-K: blocked candidates feed a bounded heap, output O(K)",
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_brand"), col("noun"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("noun"),
        col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "noun"))
        .filter(col("key_a") < col("key_b"))
        .select(col("key_a"), col("key_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"))
        .orderBy(col("dist"), col("key_a"), col("key_b"))
        .limit(50)
    },
    Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
           |FROM part a JOIN part b
           |  ON a.p_brand = b.p_brand
           | AND (string_split(a.p_name, ' '))[-1] = (string_split(b.p_name, ' '))[-1]
           | AND a.p_partkey < b.p_partkey
           |ORDER BY dist, key_a, key_b LIMIT 50""".stripMargin))

  // ---------------------------------------------------------------- null handling (fill / replace)
  /** The DataFrameNaFunctions surface: synthesize NULLs, fill them with
    * typed defaults, value-replace a category — row-local, scan-speed. */
  val q82FillReplace = QuerySpec(
    "q82_fill_replace", "§2.2-na-fill",
    "na.fill typed defaults + na.replace category remap",
    (s, d) =>
      Tables.customer(s, d)
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .na.fill(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
        .na.replace("seg", Map("MACHINERY" -> "MACH"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("sum_bal")),
    Some("""WITH t AS (
           |  SELECT CASE COALESCE(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN')
           |           WHEN 'MACHINERY' THEN 'MACH'
           |           ELSE COALESCE(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') END AS seg,
           |    CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal
           |  FROM customer)
           |SELECT seg, count(*) AS n, round(sum(bal), 2) AS sum_bal
           |FROM t GROUP BY seg""".stripMargin))

  def all: Seq[QuerySpec] = Seq(
    q53FullOuter, q54NullSafeJoin, q55Exists, q56ConditionalAgg, q57StatsAgg,
    q58MinByMaxBy, q59LeadLag, q60CollectSorted, q61Struct,
    q73Posexplode, q74Unpivot, q75WindowValues, q76FuzzyMatch, q82FillReplace,
    q213TopkPairs)
}
