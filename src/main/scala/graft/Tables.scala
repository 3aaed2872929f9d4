package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic testdata tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet from it;
  * predicates/projections declared on the returned DataFrame are pushed into
  * the parquet scan by Catalyst (`PushedFilters`/`ReadSchema`), which is what
  * keeps a 100 TB scan from reading 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema cache, keyed by file path. Every bare
    * `spark.read.parquet` pays a footer-reading schema-inference job (a
    * 1-task Spark job + its driver gap, ~50-100 ms on local[]) per call;
    * the testdata is immutable, so the schema is inferred once and passed
    * explicitly afterwards (optimization guide §1: per-action overhead is
    * pure waste at 243 queries × 2 passes × 1-3 loads each). Plans and
    * results are identical — the schema IS the inferred one. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Test hook: the cache assumes the files under a path never change
    * (the driver's testdata is generated once per SF and immutable); a
    * test that rewrites a table in place must drop the frozen schema. */
  def clearSchemaCache(): Unit = schemaCache.clear()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // inference-affecting conf is pinned HERE, not at call sites: the
    // cache is process-global and keyed by path only, so the first
    // caller's session conf freezes the inferred schema for the JVM
    // lifetime — events.parquet may carry TIMESTAMP(NANOS), which Spark 4
    // only reads (as long) under the legacy conf
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` normalizes to TimestampType (session TZ is pinned UTC
    * everywhere) regardless of how the driver generated the parquet:
    *   - TIMESTAMP(NANOS): Spark 4 refuses to read as a timestamp — read
    *     nanos as long (session-scoped legacy conf) and convert to micros;
    *   - TIMESTAMP_NTZ (pandas `timestamp[us]` without a zone): cast —
    *     under a UTC session the wall-clock micros are unchanged;
    *   - TIMESTAMP: already the target type.
    * DuckDB reads the same file as a naive timestamp at micros either way,
    * so oracle comparisons line up in every generation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
