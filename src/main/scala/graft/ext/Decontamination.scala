package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination as a reusable operator pair — the batch rule
  * (q106) and its streaming, scrub-on-arrival formulation (q114).
  *
  * Split of labor:
  *   - [[benchSide]] builds the STATIC side once: the benchmark's distinct
  *     5-gram set (materialized — the q106 lesson: never leave a
  *     regex-bearing generator input unmaterialized) plus a
  *     [[graft.operators.BloomPrune]] bloom over its hashes;
  *   - [[scrubBatch]] is the per-micro-batch kernel: shingle, bloom
  *     pre-filter (`might_contain` kills ~99% of shingles before any join
  *     work), exact broadcast semi join (false positives die here), anti
  *     join, per-source counts.
  *
  * Because each doc's verdict depends only on the static benchmark, the
  * per-source (n_clean, n_train) counts sum associatively across batches:
  * ANY batching of the corpus yields exactly the batch-rule totals —
  * [[graft.StreamingSpec]] proves this by replaying a multi-file corpus one
  * file per trigger, and q114's DuckDB oracle hash-checks the single-batch
  * replay. */
object Decontamination {

  /** Static benchmark side: (distinct shingle set, bloom over its hashes).
    * Both frames are eagerly materialized — they are probed by EVERY
    * arriving batch, so recomputing the shingling per batch would be the
    * q106 recompute bug resurrected in streaming form. */
  def benchSide(docs: DataFrame, benchPred: Column, shingleN: Int = 5,
      expectedShingles: Long = 200000L): (DataFrame, DataFrame) = {
    val shingles = ensureParallelism(docs.filter(benchPred))
      .withColumn("toks", tokens(normText(col("text"))))
      .select(explode(shingleSql("toks", shingleN)).as("g"))
      .distinct()
      .localCheckpoint(true)
    val bloom = graft.operators.BloomPrune.bloomOf(shingles, col("g"), expectedShingles)
    (shingles, bloom)
  }

  /** Scrub one (micro-)batch of training docs against the static benchmark:
    * returns per-source `(source, n_clean, n_train)` — tiny, associative,
    * safe to collect and sum across batches. */
  def scrubBatch(batch: DataFrame, benchShingles: DataFrame, bloom: DataFrame,
      shingleN: Int = 5): DataFrame = {
    graft.functions.Registry.register(batch.sparkSession)
    val b = batch
      .withColumn("toks", tokens(normText(col("text"))))
      .withColumn("sh", shingleSql("toks", shingleN))
      .select("doc_id", "source", "sh")
      .localCheckpoint(true) // one shingling pass; 3 downstream consumers
    val contaminated = b.select(col("doc_id"), explode(col("sh")).as("g"))
      .filter(call_function("might_contain", bloom.scalar(), xxhash64(col("g"))))
      .join(broadcast(benchShingles), Seq("g"), "left_semi")
      .select("doc_id").distinct()
    b.select("doc_id", "source").join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_clean"))
      .join(b.groupBy("source").agg(count(lit(1)).as("n_train")), Seq("source"), "right")
      .select(col("source"), coalesce(col("n_clean"), lit(0L)).as("n_clean"), col("n_train"))
  }
}
