package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query.
  *
  * @param name    stable key — parquet dump name in Verify, bench key in Bench
  * @param survey  SURVEY.md §2 inventory ids this query covers (judge checklist)
  * @param desc    one-line human description
  * @param fn      (session, sf-dir) → result DataFrame
  * @param oracle  equivalent ANSI SQL for the driver's DuckDB check; None for
  *                ops DuckDB can't express (driver falls back to rows>0 check)
  *
  * Determinism contract: every query's result set must be row-for-row
  * deterministic (total tie-breaks on every limit/top-k, no floats that differ
  * by summation order — double aggregates are rounded in BOTH engines).
  * Column names must match the oracle exactly (driver sorts columns by name
  * and hashes values).
  */
final case class QuerySpec(
    name: String,
    survey: String,
    desc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
