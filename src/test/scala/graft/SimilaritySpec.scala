package graft

import graft.ext.{Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("cosine: identical=1, opposite=-1, orthogonal=0") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 5.0))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(1.0, -1.0, 0.0))
  }

  test("bruteForceTopK: finds planted nearest neighbor first, k rows, ordered") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f)), // nearest
      (2L, Seq(0.5f, 0.5f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), 3).collect()
    assert(top.length === 3)
    assert(top(0).getAs[Long]("vec_id") === 1L)
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.toSeq === sims.sortBy(-_).toSeq)
    assert(!top.map(_.getAs[Long]("vec_id")).contains(0L)) // self excluded
  }

  test("LSH buckets: identical vectors same bucket; opposite vectors differ") {
    val vecs = Seq(
      (0L, Seq.fill(8)(1.0f)),
      (1L, Seq.fill(8)(1.0f)),
      (2L, Seq.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    val b = Similarity.withLshBucket(vecs, numPlanes = 6, dims = 8)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) !== b(2L))
    assert(b(0L).length === 6)
  }

  test("lshCandidates surfaces the identical pair with cosine 1.0") {
    val vecs = Seq(
      (0L, Seq.fill(8)(1.0f)),
      (1L, Seq.fill(8)(1.0f)),
      (2L, Seq.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    val cands = Similarity.lshCandidates(vecs, 6, 8, minCosine = 0.9)
      .select("id1", "id2", "cos_sim").collect()
    assert(cands.length === 1)
    assert((cands(0).getLong(0), cands(0).getLong(1)) === (0L, 1L))
    assert(cands(0).getDouble(2) === 1.0)
  }

  test("multimodal: stub decode batch plumbing produces typed features") {
    val docs = Seq((10L, "hello world", "en", "src1", 11L), (11L, "abc", "en", "src1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 1).collect()
    assert(feats.length === 2)
    val f = feats.find(_.media_id == 10L).get
    assert(f.payload_len === 11)
    assert(f.feature.length === 8)
    assert(f.frame_hash === "hello world".getBytes.map(b => f"$b%02x").mkString)
    // deterministic: same payload -> same features
    val again = Multimodal.extractFeatures(spark, media, batchSize = 64).collect()
      .find(_.media_id == 10L).get
    assert(again.feature.toSeq === f.feature.toSeq)
  }
}
