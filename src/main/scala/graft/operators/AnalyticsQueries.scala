package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Analytics extensions: cube / grouping sets, exact percentiles,
  * multi-distinct aggregation, as-of join, and the SQL surface with the
  * engine's registered native functions. */
object AnalyticsQueries {

  // ---------------------------------------------------------------- cube
  val q37Cube = QuerySpec(
    "q37_cube", "§2.4-cube",
    "CUBE over two dimensions with grouping_id",
    (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("sum_price")),
    Some("""SELECT l_returnflag, l_linestatus, grouping(l_returnflag, l_linestatus) AS gid,
           |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
           |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin))

  // ---------------------------------------------------------------- grouping sets (SQL surface)
  val q38GroupingSets = QuerySpec(
    "q38_grouping_sets", "§2.4-gsets SQL-surface",
    "GROUPING SETS via the spark.sql surface over a temp view",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              |  round(sum(o_totalprice), 2) AS total
              |FROM orders_v
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           |  round(sum(o_totalprice), 2) AS total
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin))

  // ---------------------------------------------------------------- exact percentiles
  val q39Percentile = QuerySpec(
    "q39_percentile", "§2.4-percentile",
    "exact percentiles (median/p90) per group",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          graft.functions.roundStable(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          graft.functions.roundStable(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price")),
    Some("""SELECT o_orderpriority,
           |  round(quantile_cont(o_totalprice, 0.5) + 1e-9, 2) AS p50,
           |  round(quantile_cont(o_totalprice, 0.9) + 1e-9, 2) AS p90,
           |  round(min(o_totalprice), 2) AS min_price,
           |  round(max(o_totalprice), 2) AS max_price
           |FROM orders GROUP BY o_orderpriority""".stripMargin))

  // ---------------------------------------------------------------- multi-distinct agg
  val q40CountDistinct = QuerySpec(
    "q40_count_distinct", "§2.4-distinct-agg",
    "multiple exact count-distincts in one aggregation (Expand-based)",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_suppkey").as("n_supp"),
          countDistinct("l_partkey").as("n_part"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
           |  count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
           |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- as-of join
  /** For every purchase event, the most recent prior error by the same
    * user — the union+window as-of composition (see [[AsOf]]). */
  val q41AsOfJoin = QuerySpec(
    "q41_asof_join", "§2.3-asof",
    "as-of join: latest error at-or-before each purchase, per user",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts")
      AsOf.lastTimestampBefore(purchases, errors, Seq("user_id"), "ts", "last_error_ts")
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("last_error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"))
    },
    Some("""WITH tagged AS (
           |  SELECT event_id, user_id, ts, 1 AS side FROM events WHERE event_type = 'purchase'
           |  UNION ALL
           |  SELECT NULL AS event_id, user_id, ts, 0 AS side FROM events WHERE event_type = 'error'),
           |w AS (
           |  SELECT *, max(CASE WHEN side = 0 THEN ts END)
           |    OVER (PARTITION BY user_id ORDER BY ts ASC, side ASC
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
           |  FROM tagged)
           |SELECT event_id, user_id,
           |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           |  strftime(last_error_ts, '%Y-%m-%d %H:%M:%S') AS error_ts
           |FROM w WHERE side = 1""".stripMargin))

  // ---------------------------------------------------------------- as-of join with tolerance
  /** The tolerance variant of the as-of join ([[AsOf.lastTimestampWithin]]):
    * a match older than 1 hour is nulled out — the standard
    * point-in-time-join contract for feature lookup (a stale feature is
    * worse than no feature). Same single-shuffle union+window plan as q41;
    * the tolerance is a row-local post-filter on the carried timestamp, in
    * truncated epoch seconds on BOTH engines. */
  val q92AsOfTolerance = QuerySpec(
    "q92_asof_tolerance", "§2.3-asof-tolerance",
    "as-of join with 1-hour tolerance: stale matches nulled, per user",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts")
      AsOf.lastTimestampWithin(purchases, errors, Seq("user_id"), "ts",
          "last_error_ts", toleranceSec = 3600)
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("last_error_ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          col("last_error_ts").isNotNull.as("has_recent_error"))
    },
    Some("""WITH tagged AS (
           |  SELECT event_id, user_id, ts, 1 AS side FROM events WHERE event_type = 'purchase'
           |  UNION ALL
           |  SELECT NULL AS event_id, user_id, ts, 0 AS side FROM events WHERE event_type = 'error'),
           |w AS (
           |  SELECT *, max(CASE WHEN side = 0 THEN ts END)
           |    OVER (PARTITION BY user_id ORDER BY ts ASC, side ASC
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
           |  FROM tagged),
           |tol AS (
           |  SELECT event_id, user_id, ts,
           |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
           |           - CAST(floor(epoch(last_error_ts)) AS BIGINT) <= 3600
           |         THEN last_error_ts END AS last_error_ts
           |  FROM w WHERE side = 1)
           |SELECT event_id, user_id,
           |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           |  strftime(last_error_ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           |  last_error_ts IS NOT NULL AS has_recent_error
           |FROM tol""".stripMargin))

  // ---------------------------------------------------------------- SQL surface + registered natives
  val q42SqlNative = QuerySpec(
    "q42_sql_native", "SQL-surface F1-registry",
    "spark.sql using the engine's registered native functions",
    (s, d) => {
      graft.functions.Registry.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_orderkey, l_linenumber,
              |  parse_odds(concat(cast(l_linenumber AS string), '/', cast(cast(l_quantity AS int) AS string))) AS parsed
              |FROM lineitem_v WHERE l_quantity > 40""".stripMargin)
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  (l_linenumber + CAST(floor(l_quantity) AS INT)) / 2.0 AS parsed
           |FROM lineitem WHERE l_quantity > 40""".stripMargin))

  // ---------------------------------------------------------------- datetime functions
  val q43Datetime = QuerySpec(
    "q43_datetime", "§2.7-datetime",
    "temporal extraction + date arithmetic (year/month/day, datediff)",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).as("age_days"))
        .groupBy("y", "m")
        .agg(count(lit(1)).as("n"), min("age_days").as("min_age"), max("dom").as("max_dom")),
    Some("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
           |  CAST(min(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS INT) AS min_age,
           |  CAST(max(day(o_orderdate)) AS INT) AS max_dom
           |FROM orders GROUP BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- explode / word count
  val q44WordCount = QuerySpec(
    "q44_wordcount", "§2.7-explode",
    "explode(split(text)) word count, top-20 with stable tie-break",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(graft.ext.tokens(graft.ext.normText(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20),
    Some("""SELECT token, count(*) AS n FROM (
           |  SELECT unnest(regexp_split_to_array(
           |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
           |    '\s+')) AS token
           |  FROM documents)
           |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- IVF ANN
  /** IVF ANN, hash-checked with the q46 sketch+exact pattern: KMeans cell
    * assignment isn't SQL-expressible, so the returned ID SET can't be the
    * oracle contract — instead the output carries (a) EXACT brute-force
    * top-10 cosine statistics, which DuckDB recomputes from the embeddings
    * (q30's arithmetic), and (b) booleans pinning the IVF guarantees:
    * k results returned, recall@10 ≥ 0.5 vs brute force (SimilaritySpec's
    * proven bound), and every IVF-reported cosine bit-equal to the exact
    * cosine of that id (the probe scan reads TRUE vectors — a silent switch
    * to reconstructed/approximated vectors flips it). The oracle emits TRUE
    * literals; a recall or arithmetic regression fails the hash. */
  val q45AnnIvf = QuerySpec(
    "q45_ann_ivf", "EXT-sim-ivf",
    "IVF ANN: k-means cells + nprobe pruned search, recall/cosine bound-checked",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val query = emb.filter(col("vec_id") === 0)
      val qArr = query.select("embedding").collect()(0).getSeq[Float](0).toArray
      val index = graft.ext.Ivf.build(emb.filter(col("vec_id") =!= 0), numCells = 16)
      // both sides are k=10 rows — checkpoint so the joins below don't
      // re-run KMeans transform / the corpus scan per consumer
      // nprobe/numCells = 1/2, the ratio SimilaritySpec proves recall ≥ 0.5
      // at (synthetic uniform embeddings cluster weakly; real corpora allow
      // far more aggressive pruning)
      val ivf = graft.ext.Ivf.search(s, index, qArr, k = 10, nprobe = 8)
        .select(col("vec_id"), col("cos_sim")).localCheckpoint(true)
      val bf = graft.ext.Similarity.bruteForceTopK(emb, query, k = 10)
        .select(col("vec_id"), col("cos_sim").as("bf_cos")).localCheckpoint(true)
      val kReturned = ivf.count()
      val recallHits = ivf.join(bf, Seq("vec_id"), "left_semi").count()
      // exact cosine of every RETURNED id (returned ids need not be in the
      // brute-force top-10, so compare against the full cosine frame)
      val qLit = typedLit(qArr.map(_.toDouble).toSeq)
      val allCos = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(graft.ext.Similarity.cosine(col("embedding").cast("array<double>"), qLit), 4)
            .as("exact_cos"))
      val mismatches = ivf.join(allCos, Seq("vec_id"))
        .filter(col("cos_sim") =!= col("exact_cos")).count()
      bf.agg(max("bf_cos").as("bf_top1_cos"), min("bf_cos").as("bf_top10_min_cos"))
        .select(
          lit(kReturned.toInt).as("k_returned"),
          col("bf_top1_cos"), col("bf_top10_min_cos"),
          lit(recallHits >= 5L).as("recall_ok"),
          lit(mismatches == 0L).as("cos_exact"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
           |cos AS (SELECT vec_id,
           |    round(list_dot_product(embedding::DOUBLE[], qe)
           |      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           |         * sqrt(list_dot_product(qe, qe))), 4) AS c
           |  FROM embeddings CROSS JOIN q WHERE vec_id <> query_id),
           |top AS (SELECT c FROM cos ORDER BY c DESC, vec_id ASC LIMIT 10)
           |SELECT 10 AS k_returned, max(c) AS bf_top1_cos, min(c) AS bf_top10_min_cos,
           |  TRUE AS recall_ok, TRUE AS cos_exact
           |FROM top""".stripMargin))

  // ---------------------------------------------------------------- approximate sketches
  /** Hash-checkable via the sketch+recount pattern (see HeavyHitters): the
    * approximate values themselves are engine-specific (HLL++ / KLL
    * internals), so the output carries (a) the EXACT statistics, which the
    * oracle recomputes, and (b) booleans asserting the sketch landed within
    * its error bound of the exact value. The oracle emits TRUE literals for
    * the booleans — a drifting sketch flips a boolean and fails the hash.
    * HLL with rsd=0.02 is well inside the 5% gate; percentile_approx at
    * accuracy=1000 has rank error 1/1000, checked against the exact
    * interpolated median with a 5% relative-value gate. */
  val q46Approx = QuerySpec(
    "q46_approx_sketches", "§2.4-approx",
    "HLL + percentile sketches, error-bound-checked against exact values",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      // The distinct-style and buffer-style aggregates run as SEPARATE
      // aggregations joined on the tiny group key: mixed in one agg, the
      // distinct rewrite's Expand doubles the scan output feeding the
      // percentile buffers (measured 4.7 s mixed vs 1.6 s split at sf0.1 —
      // two cheap scans overlap across cores and beat one fat one).
      val dist = li.groupBy("l_returnflag").agg(
        countDistinct("l_partkey").as("exact_parts"),
        approx_count_distinct("l_partkey", 0.02).as("_ap"))
      val pct = li.groupBy("l_returnflag").agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("_em"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("_am"))
      dist.join(broadcast(pct), Seq("l_returnflag"))
        .select(
          col("l_returnflag"), col("exact_parts"),
          (abs(col("_ap") - col("exact_parts")).cast("double")
            <= lit(0.05) * col("exact_parts").cast("double")).as("parts_ok"),
          graft.functions.roundStable(col("_em"), 2).as("exact_median"),
          (abs(col("_am") - col("_em")) <= lit(0.05) * col("_em")).as("median_ok"))
    },
    Some("""SELECT l_returnflag,
           |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           |  TRUE AS parts_ok,
           |  round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 2) AS exact_median,
           |  TRUE AS median_ok
           |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- custom top-k-per-group operator
  /** The custom LogicalPlan+Strategy+SparkPlan operator (graft.plans.TopK):
    * bounded per-group heaps in a partial/final pair instead of the window
    * form's full sort — oracle-checked against the row_number equivalent. */
  val q47TopKPerGroup = QuerySpec(
    "q47_topk_per_group", "§2.5-custom-plan",
    "custom two-phase heap top-k-per-group physical operator",
    (s, d) =>
      graft.plans.TopK.perGroup(
        Tables.lineitem(s, d),
        Seq("l_returnflag"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)),
        k = 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
           |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
           |    row_number() OVER (PARTITION BY l_returnflag
           |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
           |  FROM lineitem)
           |WHERE rn <= 5""".stripMargin))

  // ---------------------------------------------------------------- correlated subquery
  val q48Subquery = QuerySpec(
    "q48_subquery", "SQL-surface-subquery",
    "correlated scalar subquery: orders above their customer's average",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v2")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
              |FROM orders_v2 o
              |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders_v2 i
              |                            WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders o
           |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders i
           |                            WHERE i.o_custkey = o.o_custkey)""".stripMargin))

  // ---------------------------------------------------------------- array functions
  val q49Arrays = QuerySpec(
    "q49_arrays", "§2.7-arrays",
    "array construction / sort / containment / flatten over token arrays",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          graft.ext.tokens(graft.ext.normText(col("text"))).as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "spark").as("has_spark"),
          element_at(sort_array(array_distinct(col("toks"))), 1).as("first_alpha")),
    Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(
           |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')),
           |    '\s+') AS toks FROM documents)
           |SELECT doc_id,
           |  CAST(len(toks) AS INT) AS n,
           |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
           |  list_contains(toks, 'spark') AS has_spark,
           |  list_sort(list_distinct(toks))[1] AS first_alpha
           |FROM t""".stripMargin))

  // ---------------------------------------------------------------- range (interval) join
  /** Equi+range join: error events followed by a purchase by the same user
    * within 10 minutes. The equi key (user_id) carries the shuffle; the
    * range predicate filters inside each key group — NOT a cartesian
    * product (check: plan shows a hash/merge join on user_id, no
    * BroadcastNestedLoopJoin on the big sides). */
  val q50RangeJoin = QuerySpec(
    "q50_range_join", "§2.3-range",
    "interval join: purchase within 10 minutes after an error, same user",
    (s, d) => {
      // second-truncated timestamps: Spark reads the nanos column as micros
      // while DuckDB keeps nanos — sub-second bits would flip boundary
      // comparisons between engines
      val ev = Tables.events(s, d).withColumn("ts", date_trunc("second", col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      errors.join(purchases,
        errors("user_id") === purchases("user_id") &&
          col("purchase_ts") > col("error_ts") &&
          col("purchase_ts") <= col("error_ts") + expr("INTERVAL 10 MINUTES"))
        .select(errors("user_id"), col("error_id"), col("purchase_id"),
          date_format(col("error_ts"), "yyyy-MM-dd HH:mm:ss").as("err_t"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("buy_t"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts FROM events)
           |SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id,
           |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_t,
           |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS buy_t
           |FROM ev e JOIN ev p
           |  ON e.user_id = p.user_id
           | AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
           |WHERE e.event_type = 'error' AND p.event_type = 'purchase'""".stripMargin))

  // ---------------------------------------------------------------- KLL quantile sketch
  /** Third custom TypedImperativeAggregate (graft.functions.KllQuantilesAgg):
    * mergeable quantile summaries. Hash-checkable via the q46/q72
    * sketch-vs-exact pattern — the output carries the EXACT interpolated
    * percentiles (oracle recomputes them) plus a boolean per quantile
    * asserting the sketch estimate's true rank is within 5% of the target
    * rank. The rank of each estimate is computed DISTRIBUTEDLY: the 12
    * (flag, p, estimate) rows broadcast back onto lineitem and a single
    * aggregation counts rows at-or-below each estimate — no sort, no
    * collect. */
  val q107KllQuantiles = QuerySpec(
    "q107_kll_quantiles", "EXT-sketch-kll",
    "KLL-style mergeable quantile sketch, rank-error-checked vs exact percentiles",
    (s, d) => {
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val psArr = array(ps.map(lit): _*)
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      val agg = li.groupBy("l_returnflag").agg(
        graft.functions.KllQuantilesAgg(col("l_extendedprice"), ps, 200).as("ests"),
        percentile(col("l_extendedprice"), psArr).as("exacts"),
        count(lit(1)).as("n"))
      val ex = agg
        .select(col("l_returnflag"), col("n"),
          posexplode(arrays_zip(col("ests"), col("exacts"))).as(Seq("i", "z")))
        .select(col("l_returnflag"), col("n"), col("i"),
          col("z.ests").as("est"), col("z.exacts").as("exact_v"))
      li.join(broadcast(ex), Seq("l_returnflag"))
        .groupBy("l_returnflag", "i", "n", "est", "exact_v")
        .agg(sum(when(col("l_extendedprice") <= col("est"), 1L).otherwise(0L)).as("rk"))
        .select(
          col("l_returnflag"),
          element_at(psArr, col("i") + 1).as("p"),
          graft.functions.roundStable(col("exact_v"), 2).as("exact_q"),
          (abs(col("rk").cast("double") / col("n").cast("double")
            - element_at(psArr, col("i") + 1)) <= lit(0.05)).as("rank_ok"))
    },
    Some("""SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS p,
           |  round(quantile_cont(l_extendedprice, 0.25) + 1e-9, 2) AS exact_q, TRUE AS rank_ok
           |FROM lineitem GROUP BY l_returnflag
           |UNION ALL
           |SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS p,
           |  round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 2) AS exact_q, TRUE AS rank_ok
           |FROM lineitem GROUP BY l_returnflag
           |UNION ALL
           |SELECT l_returnflag, CAST(0.75 AS DOUBLE) AS p,
           |  round(quantile_cont(l_extendedprice, 0.75) + 1e-9, 2) AS exact_q, TRUE AS rank_ok
           |FROM lineitem GROUP BY l_returnflag
           |UNION ALL
           |SELECT l_returnflag, CAST(0.95 AS DOUBLE) AS p,
           |  round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 2) AS exact_q, TRUE AS rank_ok
           |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- robust outliers
  /** Median/MAD robust outlier detection per group — the data-cleaning
    * gate that survives what z-scores don't: mean and stddev are
    * themselves dragged by the outliers they are supposed to find, while
    * the median and the median-absolute-deviation have a 50% breakdown
    * point. A value is flagged when `|x - med| > 4.4478 · MAD` (3σ under
    * the 1.4826 normal-consistency constant).
    *
    * Shape at 100 TB: two exact-percentile aggregations with the group
    * medians BROADCAST back between them — the corpus is scanned twice
    * but shuffled zero times (percentile partials merge map-side; the
    * joins are broadcast). Exact medians at that scale would switch to
    * the KLL sketch (q107) — this operator is the exact-tier sibling. */
  val q142RobustOutliers = QuerySpec(
    "q142_robust_outliers", "EXT-robust-outliers",
    "median/MAD outlier gate per group (50% breakdown, broadcast medians)",
    (s, d) => {
      val o = Tables.orders(s, d).select("o_orderpriority", "o_totalprice")
      val med = o.groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
      val withDev = o.join(broadcast(med), "o_orderpriority")
        .withColumn("adev", abs(col("o_totalprice") - col("med")))
      val mad = withDev.groupBy("o_orderpriority")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      withDev.join(broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          count(when(col("adev") > lit(4.4478) * col("mad"), 1)).as("n_outliers"),
          graft.functions.roundStable(first("med"), 2).as("med"),
          graft.functions.roundStable(first("mad"), 2).as("mad"))
    },
    Some("""WITH med AS (SELECT o_orderpriority,
           |    quantile_cont(o_totalprice, 0.5) AS med FROM orders GROUP BY 1),
           |a AS (SELECT o.o_orderpriority, m.med,
           |    abs(o.o_totalprice - m.med) AS adev
           |  FROM orders o JOIN med m USING (o_orderpriority)),
           |mad AS (SELECT o_orderpriority, quantile_cont(adev, 0.5) AS mad
           |  FROM a GROUP BY 1)
           |SELECT a.o_orderpriority, count(*) AS n,
           |  count(CASE WHEN adev > 4.4478 * mad.mad THEN 1 END) AS n_outliers,
           |  round(any_value(a.med) + 1e-9, 2) AS med,
           |  round(any_value(mad.mad) + 1e-9, 2) AS mad
           |FROM a JOIN mad USING (o_orderpriority)
           |GROUP BY a.o_orderpriority""".stripMargin))

  // ---------------------------------------------------------------- pagerank
  /** PageRank ([[Graph.pageRank]], 3 iterations, d = 0.85) over a
    * deterministic directed graph derived from orders (customer residue →
    * order residue classes — a dense reference graph the oracle can
    * rebuild). The oracle UNROLLS the three iterations as chained CTEs,
    * so the engine's iterative join/aggregate loop is value-checked
    * against a closed-form recomputation, not just row-counted. Ranks
    * scale ×100 before the repo-standard round(…, 4): raw ranks sit at
    * 1/N where four decimals would carry only two significant digits. */
  val q144PageRank = QuerySpec(
    "q144_pagerank", "EXT-graph-pagerank",
    "3-iteration PageRank on a derived graph, oracle-unrolled iterations",
    (s, d) => {
      val e = Tables.orders(s, d)
        .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
        .distinct()
      val v = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
      Graph.pageRank(v, e, iters = 3, damping = 0.85)
        .select(col("id").as("node"), round(col("rank") * 100, 4).as("rank_pct"))
    },
    Some("""WITH e AS (SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 50 AS dst
           |  FROM orders),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |n AS (SELECT count(*) AS n FROM v),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
           |r0 AS (SELECT id, 1.0 / n.n AS rank FROM v CROSS JOIN n),
           |r1 AS (SELECT v.id, 0.15 / n.n + 0.85 * coalesce(f.inflow, 0) AS rank
           |  FROM v CROSS JOIN n LEFT JOIN (
           |    SELECT e.dst AS id, sum(r0.rank / deg.outdeg) AS inflow
           |    FROM e JOIN r0 ON r0.id = e.src JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) f ON f.id = v.id),
           |r2 AS (SELECT v.id, 0.15 / n.n + 0.85 * coalesce(f.inflow, 0) AS rank
           |  FROM v CROSS JOIN n LEFT JOIN (
           |    SELECT e.dst AS id, sum(r1.rank / deg.outdeg) AS inflow
           |    FROM e JOIN r1 ON r1.id = e.src JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) f ON f.id = v.id),
           |r3 AS (SELECT v.id, 0.15 / n.n + 0.85 * coalesce(f.inflow, 0) AS rank
           |  FROM v CROSS JOIN n LEFT JOIN (
           |    SELECT e.dst AS id, sum(r2.rank / deg.outdeg) AS inflow
           |    FROM e JOIN r2 ON r2.id = e.src JOIN deg ON deg.src = e.src
           |    GROUP BY e.dst) f ON f.id = v.id)
           |SELECT id AS node, round(rank * 100, 4) AS rank_pct FROM r3""".stripMargin))

  // ---------------------------------------------------------------- recursive CTE
  /** SQL `WITH RECURSIVE` (new in Spark 4.x — executed as an iterative
    * UnionLoop, each step a distributed self-union): ancestor-chain walk
    * over a derived binary hierarchy (parent = key DIV 2), the org-chart /
    * BOM / path-expansion query shape. Contrast q144: PageRank iterates in
    * ENGINE code (checkpointed DataFrame loop) because it re-weights every
    * vertex each round; a recursive CTE is the right tool when the
    * recursion only EXTENDS rows until a predicate dies out. DuckDB runs
    * the identical recursion, so the whole iterative execution is
    * hash-checked. */
  val q147RecursiveCte = QuerySpec(
    "q147_recursive_cte", "§2.5-recursive-cte",
    "WITH RECURSIVE ancestor walk (iterative UnionLoop execution)",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""WITH RECURSIVE anc(node, a, depth) AS (
              |  SELECT c_custkey AS node, c_custkey DIV 2 AS a, 1 AS depth
              |  FROM customer_v WHERE c_custkey BETWEEN 2 AND 200
              |  UNION ALL
              |  SELECT node, a DIV 2, depth + 1 FROM anc WHERE a > 1
              |)
              |SELECT node, count(*) AS n_ancestors, max(depth) AS root_depth,
              |  sum(a) AS anc_sum
              |FROM anc GROUP BY node""".stripMargin)
    },
    Some("""WITH RECURSIVE anc(node, a, depth) AS (
           |  SELECT c_custkey AS node, c_custkey // 2 AS a, 1 AS depth
           |  FROM customer WHERE c_custkey BETWEEN 2 AND 200
           |  UNION ALL
           |  SELECT node, a // 2, depth + 1 FROM anc WHERE a > 1
           |)
           |SELECT node, count(*) AS n_ancestors, max(depth) AS root_depth,
           |  CAST(sum(a) AS BIGINT) AS anc_sum
           |FROM anc GROUP BY node""".stripMargin))

  def all: Seq[QuerySpec] = Seq(
    q37Cube, q38GroupingSets, q39Percentile, q40CountDistinct, q41AsOfJoin, q42SqlNative,
    q92AsOfTolerance,
    q43Datetime, q44WordCount, q45AnnIvf, q46Approx, q47TopKPerGroup, q48Subquery, q49Arrays,
    q50RangeJoin, q107KllQuantiles, q142RobustOutliers, q144PageRank, q147RecursiveCte)
}
