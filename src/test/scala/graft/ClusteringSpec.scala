package graft

import org.apache.spark.sql.functions._
import graft.ext.Clustering

/** K-means (ext.Clustering) semantics on fixtures where the Lloyd
  * trajectory is computable by hand. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("kmeansAssign: separable clusters recover exactly") {
    // two tight groups far apart; seeds (ids 0,1) land one per group
    val df = vecs(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.1f, -0.1f)), (3L, Seq(9.9f, 10.1f)),
      (4L, Seq(-0.2f, 0.1f)), (5L, Seq(10.2f, 9.8f)))
    val out = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(Set(0L, 2L, 4L).map(out) == Set(0L), "group at origin → cluster 0")
    assert(Set(1L, 3L, 5L).map(out) == Set(1L), "group at (10,10) → cluster 1")
  }

  test("kmeansAssign: iteration moves centroids off bad seeds") {
    // both seeds (ids 0,1) start inside the left group; one Lloyd update
    // pulls centroid 1 toward the right group's mass — iters=1 (no update)
    // must differ from iters=3 for the far points
    val df = vecs(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.2f, 0.1f)), (3L, Seq(0.9f, -0.1f)),
      (4L, Seq(20.0f, 0.0f)), (5L, Seq(21.0f, 0.0f)), (6L, Seq(20.5f, 0.4f)))
    val converged = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(4L, 5L, 6L).map(converged).size == 1,
      "the far group ends up in one cluster")
    assert(Set(0L, 2L).map(converged).size == 1 &&
      converged(0L) != converged(4L),
      "after updates the two spatial groups separate")
  }

  test("kmeansAssign: distance ties break toward the lower cluster index") {
    // vector 2 is equidistant from both seeds
    val df = vecs(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
    val out = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(out(2L) == 0L, "midpoint assigns to cluster 0, not 1")
  }

  test("kmeansAssign: deterministic across repeated runs") {
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    val b = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "identical trajectory on identical input")
    assert(a.values.toSet.size > 1, "more than one cluster is populated")
  }

  test("kmeansAssign: invariant under repartitioning (exact integer math)") {
    // float-mean k-means drifts in the last ulp under different partial-sum
    // orders and can flip boundary assignments; the fixed-point trajectory
    // must be bit-identical whatever the partitioning
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Clustering.kmeansAssign(emb.repartition(17), "vec_id", "embedding",
      k = 3, iters = 3).as[(Long, Long)].collect().toMap
    val b = Clustering.kmeansAssign(emb.repartition(2), "vec_id", "embedding",
      k = 3, iters = 3).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("trainedIvfTopK: exhaustive probing equals brute force") {
    // with every trained list probed, IVF scores every candidate — the
    // result must be the exact ranking, independent of how training split
    // the corpus (the sim4 equivalence pin, for the trained quantizer)
    val emb = core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.where(col("vec_id") < 3)
    val exact = ext.Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val ivf = ext.Similarity.trainedIvfTopK(emb, qs, "vec_id", "embedding",
        k = 5, clusters = 4, iters = 2, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(ivf == exact)
  }
}
