package graft

/** Fixture-declared SETUP/QUERY timing boundary for [[Bench]] reporting.
  *
  * Many bench entries are LIFECYCLE fixtures: they build a fresh table,
  * churn it, refresh a materialized view, and only then run the query the
  * entry actually measures. The fixture setup dominates wall time (the
  * round-9 audit put 19 MV fixtures at 23% of suite wall) and is also the
  * noisiest component (filesystem writes, commit fsyncs), which makes
  * plain per-entry totals a poor drift signal — two rounds of verdicts
  * spent audit time on setup jitter that had nothing to do with query
  * plans.
  *
  * The fixture calls [[mark]]() at the moment its setup ends (after the
  * last table write / churn / refresh, before the queries being
  * measured); Bench records `setup_s` = time from fixture entry to the
  * LAST mark, `query_s` = everything after it (the serve queries, the
  * proof-bit probes, and the result's own execution). A fixture that
  * never marks reports `setup_s` 0 — its whole time is query time, which
  * is exactly right for the plain scan/join/agg entries.
  *
  * Thread-local by design: Bench drives fixtures sequentially on one
  * thread, and the marker must not bleed across concurrently-running
  * Spark jobs. Outside Bench (Verify, ScalaTest) [[begin]] is never
  * called and mark() degrades to a cheap no-op write. */
object BenchSetup {
  private val t0 = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }
  private val setupNs = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** Bench calls this immediately before invoking a fixture. */
  def begin(): Unit = { t0.set(System.nanoTime()); setupNs.set(0L) }

  /** The fixture's setup just ended; everything after is query time.
    * Idempotent in the right way: the LAST call wins, so a fixture with
    * interleaved churn phases can mark after each and the final mark
    * defines the boundary. */
  def mark(): Unit = setupNs.set(System.nanoTime() - t0.get)

  /** Seconds of setup declared since [[begin]] (0 if the fixture never
    * marked). */
  def setupSeconds(): Double = setupNs.get / 1e9
}
