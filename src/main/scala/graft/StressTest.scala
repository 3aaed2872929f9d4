package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stress the EXT operators at ~20-200× the bench corpus to
  * observe scaling behavior (wall-clock should grow ~linearly; any
  * super-linear jump means a candidate-pair explosion or a recompute). */
object StressTest {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // corpus: sf0.1 documents × mult with id offsets and per-copy token prefix
    val base = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
    val copies = spark.range(mult).select(col("id").as("copy"))
    val corpus = base.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * 1000000).as("doc_id"),
        // each copy mutates the text slightly so near-dup structure is real
        concat(lit("c"), col("copy"), lit(" "), col("text")).as("text"))
      .repartition(64)
    val n = time("materialize corpus")(corpus.persist().count())
    println(s"[stress] corpus docs: $n")

    time("exact dedup")(ext.Dedup.exact(corpus, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("minhash signatures")(ext.Dedup.withMinHash(corpus, "text", 8, 3)
      .write.format("noop").mode("overwrite").save())
    time("simhash")(ext.Dedup.withSimHash(corpus, "text")
      .write.format("noop").mode("overwrite").save())
    val pairs = time("nearDupPairs end-to-end")(
      ext.Dedup.nearDupPairs(corpus, "doc_id", "text", 8, 2, 3, 0.3).count())
    println(s"[stress] near-dup pairs: $pairs")
    val clusters = time("nearDupClusters end-to-end")(
      ext.Dedup.nearDupClusters(corpus, "doc_id", "text", 8, 2, 3, 0.3)
        .filter(col("id") =!= col("cluster_id")).count())
    println(s"[stress] docs assigned to another cluster: $clusters")

    // CC algorithm face-off on a HIGH-DIAMETER graph (the shape where the
    // two algorithms genuinely differ): one chain of length `mult*10000`
    // plus the random near-clique edges above. Label propagation needs
    // O(diameter) iterations (pointer jumping: O(log d) but re-joins the
    // full vertex set every round); star rewriting shuffles only the
    // shrinking edge set.
    {
      val chainN = mult * 10000L
      val verts = spark.range(chainN).select(col("id"))
      val chain = spark.range(chainN - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val jumped = time("chain CC: label prop + pointer jumping")(
        operators.Graph.connectedComponents(verts, chain, maxIters = 40, shortcut = true)
          .filter(col("cluster_id") =!= 0L).count())
      val stars = time("chain CC: large-star/small-star")(
        operators.Graph.connectedComponentsStars(verts, chain, maxIters = 40)
          .filter(col("cluster_id") =!= 0L).count())
      println(s"[stress] unconverged labels — jumped: $jumped, stars: $stars (0 = fully converged)")
    }

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val embBig = emb.crossJoin(copies)
      .select((col("vec_id") + col("copy") * 1000000).as("vec_id"), col("embedding"))
      .repartition(64).persist()
    println(s"[stress] vectors: ${embBig.count()}")
    time("ann brute top-k")(ext.Similarity.bruteForceTopK(
      embBig, embBig.filter(col("vec_id") === 0), 10).collect())
    time("lsh buckets")(ext.Similarity.withLshBucket(embBig, 8, 64)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
