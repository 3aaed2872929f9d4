package graft.streaming

import graft.ext.{normText, shingleSql, tokens}
import graft.functions.MinHashSignature
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (doc, band) row of the streaming LSH index. */
case class BandDoc(band_id: Int, band_hash: Long, doc_id: Long)

/** A near-duplicate candidate: `doc_id` collided with the bucket's
  * canonical (first-seen) document in band `band_id`. */
case class NearDupHit(doc_id: Long, dup_of: Long, band_id: Int)

/** Per-bucket state: the first document that claimed this band bucket. */
case class BucketState(firstId: Long)

/** Incremental (streaming) MinHash-LSH near-duplicate detection.
  *
  * The batch pipeline ([[graft.ext.Dedup.nearDupPairs]]) self-joins band
  * buckets — impossible on an unbounded stream. The streaming formulation
  * replaces the self-join with STATE: each LSH band bucket remembers the
  * first document that claimed it (the canonical doc), and every later
  * arrival in the same bucket emits a candidate pair immediately. New
  * documents are checked against the full history seen so far without ever
  * rescanning the corpus — state size is O(distinct band buckets), ~b longs
  * + one hash per document, the same ~1000× corpus reduction the batch
  * signature cache gives.
  *
  * Scale design: the signature/banding stage is narrow (per-row
  * expressions); the only shuffle is groupByKey on (band_id, band_hash) —
  * identical key distribution to the batch bucket join, so the same skew
  * properties hold. State lives in the distributed state store, partitioned
  * by bucket key. For truly unbounded corpora, bucket state should be
  * TTL'd: swap NoTimeout for ProcessingTimeTimeout and drop buckets idle
  * longer than the dedup horizon (candidates then only form within the
  * horizon, the standard freshness/recall trade).
  *
  * Emission contract (deterministic): the canonical doc of a bucket is the
  * first-seen (arrival order; ties within a micro-batch break by lowest
  * doc_id). A document colliding with the canonical in k bands emits k hits
  * (one per band) — `distinct` on (doc_id, dup_of) downstream collapses
  * them; exact-Jaccard verification stays a downstream batch join as in the
  * batch pipeline.
  */
object StreamingNearDup {

  /** Per-row signature + banding for a streaming docs frame
    * (`idCol` LONG, `textCol` STRING). The input is hash-repartitioned on
    * the id FIRST: a small file scans as one partition (batch or
    * micro-batch alike) and K×shingles hashing is the CPU hot spot — the
    * cheap early shuffle buys full-core parallelism for it (the batch
    * pipeline's ensureParallelism can't be used here: it inspects `.rdd`,
    * which streaming frames forbid). */
  def bandedStream(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, rowsPerBand: Int, shingleN: Int): DataFrame = {
    val sig = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .withColumn("toks", tokens(normText(col(textCol))))
      .withColumn("shingles", shingleSql("toks", shingleN))
      .withColumn("sig", MinHashSignature(col("shingles"), numHashes))
      .select(col(idCol), col("sig"))
    graft.ext.Dedup.bandHashes(sig, numHashes, rowsPerBand)
      .select(col("band_id").cast("int").as("band_id"), col("band_hash"),
        col(idCol).cast("long").as("doc_id"))
  }

  /** Streaming near-dup candidates over a docs stream. Append-mode output:
    * each hit is emitted exactly once, in the micro-batch where the
    * colliding document arrives. */
  def candidates(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 8, shingleN: Int = 3): Dataset[NearDupHit] = {
    import spark.implicits._
    bandedStream(docs, idCol, textCol, numHashes, rowsPerBand, shingleN)
      .as[BandDoc]
      .groupByKey(b => (b.band_id, b.band_hash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandDoc], state: GroupState[BucketState]) =>
          // lowest doc_id first makes intra-batch canonical choice deterministic
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var first = state.getOption.map(_.firstId).getOrElse(-1L)
          val out = Seq.newBuilder[NearDupHit]
          sorted.foreach { b =>
            if (first < 0) first = b.doc_id
            else if (b.doc_id != first) out += NearDupHit(b.doc_id, first, b.band_id)
          }
          state.update(BucketState(first))
          out.result().iterator
      }
  }
}
