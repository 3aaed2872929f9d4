package graft.ext

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, as a production ANN stack would have:
  *  - brute-force cosine top-k: exact, one scan + TakeOrderedAndProject;
  *    the right baseline and the verifier for anything approximate.
  *  - random-hyperplane LSH bucketing: signature bits from sign(v·plane);
  *    co-bucketed vectors are candidates, turning O(n²) search into a
  *    bucket-local join. Planes are derived deterministically from md5 so
  *    signatures are reproducible across engines and runs (at production
  *    scale you'd materialize the planes as broadcast literals instead of
  *    recomputing the derivation per row — same plan shape).
  */
object Similarity {

  /** Cosine similarity between two array<double> columns via the native
    * DotProduct expression (compiled loop, no per-element interpretation). */
  def cosine(a: Column, b: Column): Column =
    DotProduct(a, b) / (sqrt(DotProduct(a, a)) * sqrt(DotProduct(b, b)))

  /** Exact top-k neighbors of one query vector: broadcast the 1-row query,
    * scan the corpus once, TakeOrderedAndProject keeps k. */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, k: Int): DataFrame = {
    val q = broadcast(query.select(
      col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb")))
    corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("emb"), col("q_emb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic ±1 hyperplane component for (plane p, dim d): the low bit
    * of md5("p:d")'s 15-hex-digit prefix — identical to what the SQL
    * `conv(substring(md5(..),1,15),16,10) & 1` computes, but evaluated ONCE
    * on the driver and shipped as a literal. Doing the md5 derivation
    * per-row (512 hashes/vector) cost ~10× the dot products themselves. */
  private[ext] def planeLiterals(numPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
        if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
      }
    }
  }

  /** Sign-random-projection LSH: `numPlanes`-bit bucket signature per
    * vector. Vectors in the same bucket are near-duplicate / high-cosine
    * candidates (Charikar SimHash for real vectors). Planes are embedded as
    * a literal constant array — per row only numPlanes dot-product folds. */
  def withLshBucket(df: DataFrame, numPlanes: Int, dims: Int): DataFrame = {
    val planes = planeLiterals(numPlanes, dims)
    val bitCols = planes.map(p =>
      when(DotProduct(col("emb_d"), typedLit(p)) > 0, "1").otherwise("0"))
    ensureParallelism(df)
      .withColumn("emb_d", col("embedding").cast("array<double>"))
      .withColumn("lsh_bucket", concat(bitCols: _*))
      .drop("emb_d")
  }

  /** Bucketed ANN: candidates = same-bucket pairs, verified by exact cosine.
    * The join shuffles on the bucket key only; each bucket joins locally. */
  def lshCandidates(df: DataFrame, numPlanes: Int, dims: Int, minCosine: Double): DataFrame = {
    val b = withLshBucket(df, numPlanes, dims)
      .select(col("vec_id"), col("lsh_bucket"), col("embedding").cast("array<double>").as("emb"))
    val l = b.select(col("vec_id").as("id1"), col("lsh_bucket"), col("emb").as("emb1"))
    val r = b.select(col("vec_id").as("id2"), col("lsh_bucket"), col("emb").as("emb2"))
    l.join(r, Seq("lsh_bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("lsh_bucket"), col("id1"), col("id2"),
        round(cosine(col("emb1"), col("emb2")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}

/** IVF (inverted-file) ANN: k-means coarse quantizer + per-centroid posting
  * lists — the structure FAISS-style systems use, expressed in Spark ops.
  *
  * Build: KMeans (MLlib, seeded) over the corpus → each vector assigned to
  * its nearest centroid (one narrow ML transform). Search: score the query
  * against the k centroids (driver-side, k is small), pick the `nprobe`
  * nearest cells, and scan ONLY those cells' vectors — a partition-pruned
  * fraction of the corpus instead of a full scan. On 100 TB the posting
  * lists are written partitioned by cell id, so probing reads nprobe/k of
  * the data from storage.
  */
object Ivf {
  import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
  import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
  import org.apache.spark.sql.{DataFrame, SparkSession}

  case class Index(model: KMeansModel, assigned: DataFrame)

  /** Fit the coarse quantizer and assign every vector to a cell. */
  def build(df: DataFrame, numCells: Int, seed: Long = 42): Index = {
    val withVec = df.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(withVec)
    Index(model, model.transform(withVec)
      .select(col("vec_id"), col("cell"), col("embedding")))
  }

  /** Top-k cosine within the nprobe nearest cells to the query vector. */
  def search(spark: SparkSession, index: Index, query: Array[Float],
      k: Int, nprobe: Int): DataFrame =
    searchAssigned(index.assigned,
      index.model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) },
      query, k, nprobe)

  /** Nearest-centroid cell assignment as a PURE codegen expression — no
    * model object, no UDF — so the same index serves batch writes AND
    * Structured Streaming plans (model-serving on a stream without the ML
    * runtime in the per-row hot path).
    *
    * argmin_i ||v − c_i||² = argmin_i (||c_i||² − 2·v·c_i), since ||v||² is
    * constant within a row — one native [[DotProduct]] fold per cell, with
    * ||c_i||² precomputed on the driver and shipped as a literal. Ties
    * break to the lower cell id (struct lexicographic `least`), matching
    * KMeans' first-minimum convention. */
  def assignCell(embedding: Column, centroids: Array[(Int, Array[Double])]): Column = {
    require(centroids.nonEmpty, "assignCell needs at least one centroid")
    val v = embedding.cast("array<double>")
    val scored = centroids.map { case (i, c) =>
      struct(
        (lit(c.map(x => x * x).sum) - lit(2.0) * DotProduct(v, typedLit(c.toSeq))).as("score"),
        lit(i).as("cell"))
    }
    (if (scored.length == 1) scored.head else least(scored.toSeq: _*)).getField("cell")
  }

  /** Search over any (vec_id, cell, embedding) posting frame + centroid
    * table: probe-cell choice is driver-side (centroid count is small by
    * construction); the scan touches only the probed cells. */
  def searchAssigned(assigned: DataFrame, centroids: Array[(Int, Array[Double])],
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qd = query.map(_.toDouble)
    val probeCells = centroids
      .map { case (i, c) => (i, cos(qd, c)) }
      .sortBy(-_._2).take(nprobe).map(_._1).toSeq
    val qLit = typedLit(qd.toSeq)
    assigned
      .filter(col("cell").isin(probeCells: _*))  // partition-pruned scan
      .select(col("vec_id"), col("cell"),
        round(Similarity.cosine(col("embedding").cast("array<double>"), qLit), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------------ persistence
  /** Persisted layout: posting lists partitioned BY CELL — on disk each
    * cell is its own partition directory, so a probe of `nprobe` cells is a
    * PartitionFilters-pruned read of nprobe/numCells of the index, never a
    * full scan (the scale contract of IVF). Centroids are a tiny parquet
    * (numCells rows) read to the driver at load. */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    index.assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
    val rows = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
    import spark.implicits._
    rows.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  case class LoadedIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  def load(spark: SparkSession, path: String): LoadedIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    LoadedIndex(centroids, spark.read.parquet(s"$path/assigned"))
  }

  def search(spark: SparkSession, index: LoadedIndex, query: Array[Float],
      k: Int, nprobe: Int): DataFrame =
    searchAssigned(index.assigned, index.centroids, query, k, nprobe)
}
