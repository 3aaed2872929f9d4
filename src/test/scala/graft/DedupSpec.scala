package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog near the river bank today"), // near dup (first token dropped)
    (4L, "completely different content about spark catalyst optimizer rules and physical plans"),
    (5L, "short doc")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized text, keeps lowest id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("keep_id") === 1L)
    assert(r(0).getAs[Long]("n_copies") === 2L)
  }

  test("minhash signature: identical docs identical sigs; near-dups share most minima") {
    val sigs = Dedup.withMinHash(docs, "text", numHashes = 16, shingleN = 3)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val shared = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared >= 8, s"near-dup shares only $shared/16 minima")
    val sharedFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(sharedFar <= 2, s"unrelated docs share $sharedFar/16 minima")
  }

  test("short doc (< shingle length) gets all-null signature, not a crash") {
    val sig = Dedup.withMinHash(docs.filter(col("doc_id") === 5), "text", 4, 3)
      .select("sig").collect()(0).getSeq[Any](0)
    assert(sig.forall(_ == null))
  }

  test("nearDupPairs finds exact+near dup pairs and no unrelated ones") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      numHashes = 8, rowsPerBand = 2, shingleN = 3, minJaccard = 0.3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard: identical sets 1.0, disjoint 0.0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq("a", "a", "b"), Seq("a", "b"))). // multiset collapses
      toDF("x", "y")
    val got = df.select(Dedup.jaccard(col("x"), col("y")).as("j")).collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(1.0, 0.0, 1.0))
  }

  test("simhash: dup identical; near-dup within small hamming distance; far doc distant") {
    val sh = Dedup.withSimHash(docs, "text")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(sh(1L) === sh(2L))
    assert(hamming(sh(1L), sh(3L)) <= 10, s"near-dup hamming ${hamming(sh(1L), sh(3L))}")
    assert(hamming(sh(1L), sh(4L)) >= 15, s"far-doc hamming ${hamming(sh(1L), sh(4L))}")
    assert(sh.values.forall(_.length === 60))
  }

  test("nearDupClusters: dup group collapses to one cluster keyed by min id") {
    val labels = Dedup.nearDupClusters(docs, "doc_id", "text",
      numHashes = 8, rowsPerBand = 2, shingleN = 3, minJaccard = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === 1L)
    assert(labels(2L) === 1L) // exact dup joins cluster 1
    assert(labels(3L) === 1L) // near dup joins cluster 1
    assert(labels(4L) === 4L) // unrelated doc is its own cluster
  }

  test("fingerprints: normalization collapses case/punct/whitespace") {
    val df = Seq(
      (1L, "Hello, World!  foo"),
      (2L, "hello world foo")).toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprints(df, "text")
      .select("fp_full").collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }
}
