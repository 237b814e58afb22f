package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** K-means clustering over an embedding column — the coarse-quantizer
  * training step the similarity tier consumes (IVF inverted lists, SemDeDup
  * cluster-then-dedup, data-mixing by semantic cluster all start from "give
  * every vector a cluster id").
  *
  * EXACT fixed-point arithmetic: vectors quantize once to scaled BIGINT
  * (`round(x · 10⁶)` — round-half-away-from-zero in both Spark and DuckDB,
  * see [[Similarity.quantizeInt8]]'s determinism note), every distance is
  * an integer-valued sum of squares, and centroid updates divide integer
  * sums with truncation-toward-zero — so the fixpoint trajectory is
  * bit-identical on any engine, partitioning, or summation order, and a
  * DuckDB oracle can unroll the identical integer formula (the pr1
  * iterated-math convention; float averaging would diverge in the last ulp
  * and flip assignments near Voronoi boundaries). Quantization at 10⁶ on
  * unit-scale embeddings keeps |q| ≲ 2²⁰, so 64-dim squared distances stay
  * ≲ 2⁴⁷ — exact in both BIGINT and the double space the native dot-product
  * kernel computes in.
  *
  * Scale shape (Lloyd's): the corpus is touched once per iteration —
  * quantized vectors persist behind one fan-out exchange for the training
  * loop (MEMORY_AND_DISK, the MLlib discipline; re-reading 100 TB of
  * parquet per iteration is the naive alternative) and unpersist when the
  * centroids are fit. Assignment is a pure projection: k native dot
  * products against centroid LITERALS (k·dim longs inlined per the bf1
  * literal-probe rule — never a crossJoin with a k-row DataFrame, which
  * would re-extract the centroid arrays per row). The update is one hash
  * aggregate keyed (cluster, dim) — partial aggregation reduces each
  * partition to k·dim rows before the shuffle, so per-iteration driver
  * state and shuffle volume are O(k·dim), independent of corpus size.
  * MLlib's KMeans has the same driver-resident-centroid loop; this one is
  * deterministic and engine-portable.
  */
object Clustering {

  /** Quantize a float/double vector to the scaled-BIGINT grid. */
  def quantize(vec: Column, scale: Long = 1000000L): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  /** Squared L2 distances from a QUANTIZED vector column to each
    * driver-side centroid, expanded as q·q − 2·q·c + c·c so the per-row
    * work is one shared q·q plus one native dot per centroid (never
    * re-walking (q−c)² per element); all three terms are integer-valued
    * and < 2^53, so the double-space kernel is exact and the cast back to
    * long loses nothing. */
  def centroidDists(qvec: Column, cents: Seq[Array[Long]]): Seq[Column] = {
    val qq = dot(qvec, qvec)
    cents.map { c =>
      val cc = c.map(v => v * v).sum
      (qq - lit(2.0) * dot(qvec, typedlit(c.toSeq)) + lit(cc.toDouble))
        .cast("long")
    }
  }

  /** Cluster id (0-based long) of the nearest centroid for a RAW vector
    * column — a pure projection, usable on any frame carrying the vector
    * (this is how a trained quantizer labels a corpus without a join).
    * Ties break toward the lower cluster index (the oracle's row_number
    * ORDER BY dist, cluster). */
  def assignColumn(vec: Column, cents: Seq[Array[Long]],
                   scale: Long = 1000000L): Column = {
    val arr = array(centroidDists(quantize(vec, scale), cents): _*)
    (array_position(arr, array_min(arr)) - 1L).as("cluster")
  }

  /** Fit `k` centroids with `iters` Lloyd rounds and return the centroids
    * the FINAL assignment round uses (c_{iters−1}): initial centroids are
    * the `k` lowest-id vectors (deterministic; callers wanting k-means||
    * seeding can pre-shuffle ids by hash), and rounds 1..iters−1 each
    * assign against the previous centroids then recompute them from the
    * assignment. A cluster that loses all members keeps its previous
    * centroid (cannot occur with data-seeded init unless k exceeds the
    * distinct-vector count). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int, scale: Long = 1000000L): Seq[Array[Long]] = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val q = graft.core.Par.fanOut(df.select(col(idCol).as("vec_id"),
        quantize(col(vecCol), scale).as("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Seq[Array[Long]] = q.orderBy("vec_id").limit(k).collect()
        .map(_.getSeq[Long](1).toArray).toSeq
      require(cents.length == k, s"need at least $k vectors to seed $k clusters")
      for (_ <- 1 until iters) {
        val dists = array(centroidDists(col("qv"), cents): _*)
        // O(k·dim) rows to the driver — bounded centroid state, not data
        val sums = q.select(
            (array_position(dists, array_min(dists)) - 1L).as("cluster"),
            posexplode(col("qv")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect()
        val byCluster = sums.groupBy(_.getAs[Long]("cluster"))
        cents = (0 until k).map { ci =>
          byCluster.get(ci.toLong).fold(cents(ci)) { rows =>
            // Long division truncates toward zero in Scala; the oracle
            // mirrors it as sign-split floor division on the magnitude
            rows.sortBy(_.getAs[Int]("dim"))
              .map(r => r.getAs[Long]("s") / r.getAs[Long]("n")).toArray
          }
        }
      }
      cents
    } finally q.unpersist(blocking = false)
  }

  /** Fit `m` independent per-subspace codebooks (the PQ training step) in
    * LOCKSTEP — bit-identical to `m` separate [[kmeansFit]] calls over
    * `slice(vec, j·sub+1, sub)` (Round16Spec pins the equality), but ONE
    * corpus persist and ONE driver action per Lloyd round for all
    * subspaces together instead of `m` of each (r16, guide §1.2: the
    * m·iters bounded-collect jobs and m fan-out exchanges of the
    * separate fits were the dominant cost of every PQ build at bench
    * scale; the arithmetic is unchanged — element-wise quantization
    * commutes with slicing, seeds are the same k lowest-id vectors, and
    * the per-(subspace, cluster, dim) integer sums are the same numbers
    * the per-subspace aggregates produced). Driver state per round is
    * m·k·sub = k·dims longs — the km1 bounded-collect budget. */
  def kmeansFitSubspaces(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, sub: Int, k: Int, iters: Int,
                         scale: Long = 1000000L): Seq[Seq[Array[Long]]] = {
    require(m >= 1 && k >= 1 && iters >= 1,
      "m, k and iters must be positive")
    val q = graft.core.Par.fanOut(df.select(col(idCol).as("vec_id"),
        quantize(col(vecCol), scale).as("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRows = q.orderBy("vec_id").limit(k).collect()
      require(seedRows.length == k,
        s"need at least $k vectors to seed $k clusters")
      var books: IndexedSeq[IndexedSeq[Array[Long]]] = (0 until m).map { j =>
        seedRows.map(_.getSeq[Long](1).slice(j * sub, (j + 1) * sub).toArray)
          .toIndexedSeq
      }
      for (_ <- 1 until iters) {
        val structs = (0 until m).map { j =>
          val sv = slice(col("qv"), j * sub + 1, sub)
          val dists = array(centroidDists(sv, books(j)): _*)
          struct(lit(j).as("j"),
            (array_position(dists, array_min(dists)) - 1L).as("cluster"),
            sv.as("sv"))
        }
        // one hash aggregate keyed (subspace, cluster, dim): partial
        // aggregation reduces each partition to m·k·sub rows before the
        // shuffle — O(k·dims) driver rows, independent of corpus size
        val sums = q.select(explode(array(structs: _*)).as("e"))
          .select(col("e.j").as("j"), col("e.cluster").as("cluster"),
            posexplode(col("e.sv")).as(Seq("dim", "x")))
          .groupBy("j", "cluster", "dim")
          .agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect()
        books = (0 until m).map { j =>
          val byCluster = sums.filter(_.getAs[Int]("j") == j)
            .groupBy(_.getAs[Long]("cluster"))
          (0 until k).map { ci =>
            byCluster.get(ci.toLong).fold(books(j)(ci)) { rows =>
              rows.sortBy(_.getAs[Int]("dim"))
                .map(r => r.getAs[Long]("s") / r.getAs[Long]("n")).toArray
            }
          }
        }
      }
      books.map(_.toSeq)
    } finally q.unpersist(blocking = false)
  }

  /** GONZALEZ K-CENTER — farthest-first traversal (Gonzalez 1985, the
    * 2-approximation for the k-center objective): minimize the WORST
    * distance from any vector to its center, the coverage objective
    * (pick k representatives so every item is near one) next to k-means'
    * mean distortion (km1) and DBSCAN's density (dbscan1); also the
    * classical deterministic seeding for k-means itself. Engine-exact
    * end-to-end: distances are [[centroidDists]]' integer-valued kernel
    * over the quantized grid (exact in double, cast back to long — the
    * km1 discipline, so no float ranking boundary exists anywhere), the
    * first center is the LOWEST id, each round's next center is the
    * argmax of min-distance-to-selected with ties to the lower id, and
    * the final assignment ties toward the earlier-selected center.
    *
    * Scale shape: k rounds, each ONE bounded TakeOrdered(1) action over
    * the INCREMENTALLY-MAINTAINED running min-distance frame
    * (vec_id, qv, dmin): round r folds only the ONE center round r−1
    * selected — `least(dmin, dist-to-new-center)` against the cached
    * previous frame — so total distance work is O(k·dim·N), not the
    * O(k²·dim·N) a full recompute against all selected centers pays
    * every round (round-12 verdict #2: at k in the hundreds on 100 TB
    * the quadratic term dominates; this is the repo's incremental-
    * relabel discipline applied to distances). min over a set ≡ a fold
    * of pairwise mins and every distance is integer-exact, so the
    * trajectory is unchanged. Each round's frame materializes through
    * an EAGER localCheckpoint, not a persist chain: chained
    * cached-on-cached plans re-canonicalize their whole ancestry on
    * every cache lookup and the per-round cost DOUBLES (measured:
    * 0.25 s/round at r≤10 → 5.9 s at r=16 with a persist chain;
    * flat ~0.25 s with checkpoint truncation — the clusterRoots
    * localCheckpoint lesson, here at every round because the frame is
    * the loop's entire state). Driver state = k·dim
    * longs, the km1 budget; the training cache releases before the
    * assignment pass, which is a pure projection over the raw corpus
    * (the kmeansAssign shape). k must not exceed the DISTINCT-vector
    * count: a round whose max min-distance is 0 would silently
    * re-select an already-chosen point — it fails loudly instead
    * (round-12 ADVICE). Returns (vec_id, center_id, d2) with d2
    * the exact integer squared distance in the scale² grid. */
  def kcenterGonzalez(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1)
    val q = graft.core.Par.fanOut(df.select(
        col(idCol).cast("long").as("vec_id"),
        quantize(col(vecCol), scale).as("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centers = try {
      val first = q.orderBy("vec_id").limit(1).collect()(0)
      var cs = Vector((first.getLong(0), first.getSeq[Long](1).toArray))
      // eager checkpoint: one distance kernel materializes NOW, the
      // lineage truncates to a LogicalRDD (O(1) plan depth per round)
      var cur = q.select(col("vec_id"), col("qv"),
          centroidDists(col("qv"), Seq(cs.head._2)).head.as("dmin"))
        .localCheckpoint()
      for (i <- 2 to k) {
        val next = cur.orderBy(col("dmin").desc, col("vec_id").asc)
          .limit(1).collect()(0)
        require(next.getLong(2) > 0L,
          s"kcenterGonzalez: max min-distance is 0 after ${cs.size} " +
            s"centers — k=$k exceeds the distinct-vector count; every " +
            "further center would duplicate an existing one")
        cs = cs :+ ((next.getLong(0), next.getSeq[Long](1).toArray))
        // the last center needs no further dmin frame: round i's frame is
        // only ever read by round i+1's argmax, so i=k would materialize a
        // full distance pass nobody consumes
        if (i < k) {
          val prev = cur
          cur = cur.select(col("vec_id"), col("qv"),
              least(col("dmin"),
                centroidDists(col("qv"), Seq(cs.last._2)).head).as("dmin"))
            .localCheckpoint()
          // release the superseded round's blocks NOW — localCheckpoint
          // persists outside the cache manager, so relying on the
          // ContextCleaner lets up to k corpus-sized (vec_id, qv, dmin)
          // frames sit in executor storage concurrently (round-13 ADVICE);
          // safe: the new frame is self-contained once eagerly materialized
          org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(prev)
        }
      }
      org.apache.spark.sql.graft.Bridge.freeLocalCheckpoint(cur)
      cs
    } finally q.unpersist(blocking = false)
    val base = graft.core.Par.fanOut(df.select(
      col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("qv2")))
    val ds = array(centroidDists(col("qv2"), centers.map(_._2)): _*)
    base.select(col("vec_id"), ds.as("ds"))
      .select(col("vec_id"),
        (array_position(col("ds"), array_min(col("ds"))) - 1L).as("cidx"),
        array_min(col("ds")).as("d2"))
      .select(col("vec_id"),
        element_at(typedlit(centers.map(_._1)),
          (col("cidx") + 1L).cast("int")).as("center_id"),
        col("d2"))
  }

  /** Fit + label: every vector's cluster after `iters` Lloyd rounds.
    * Returns (vec_id, cluster). The final labeling pass is a projection
    * over the raw corpus (one extra scan vs. reusing the training cache —
    * which is exactly what frees the cache for the caller). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, scale: Long = 1000000L): DataFrame = {
    val cents = kmeansFit(df, idCol, vecCol, k, iters, scale)
    df.select(col(idCol).as("vec_id"), assignColumn(col(vecCol), cents, scale))
  }

  /** DBSCAN density clustering over the cosine-similarity neighborhood
    * (Ester et al. 1996) — the clustering family member k-means cannot
    * be: no k chosen up front, arbitrary cluster shapes, an explicit
    * NOISE class (exactly what near-dup corpus structure looks like —
    * dense duplicate clumps in a sea of singletons). Neighborhood:
    * cos ≥ `minCos` pairs from the LSH-blocked generator
    * ([[Dedup.embeddingNearDupPairsLsh]] — candidate volume ~linear in n
    * at high thresholds, exact verify inside buckets). CORE = ≥ `minPts`
    * neighbors (self excluded); clusters = connected components of the
    * core-core subgraph to CONVERGENCE ([[Graph.connectedComponents]] —
    * engine-free fixpoint semantics), labeled by minimum member id;
    * BORDER = non-core with a core neighbor, attached to the MINIMUM
    * core-neighbor cluster (classic DBSCAN leaves the border assignment
    * order-dependent — the min rule makes it deterministic); NOISE =
    * everything else, cluster −1.
    *
    * Shape at scale: pair generation is the d5 path (distinct-value
    * collapse + banded signatures, no all-pairs); degrees, core filter,
    * border attach are one shuffle each on the PAIR relation (output-
    * sized, ≪ corpus under dedup-regime thresholds); the component
    * fixpoint runs on the core-core subgraph only. The pair list
    * persists for its three consumers. */
  def dbscan(corpus: DataFrame, idCol: String, vecCol: String,
             minCos: Double, minPts: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pairs = Dedup.embeddingNearDupPairsLsh(
        corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        "vec_id", "embedding", minCos)
      .select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    dbscanFromPairs(corpus.select(col(idCol).as("id")), pairs, minPts)
  }

  /** The DBSCAN role/label derivation from an explicit NEIGHBOR-PAIR
    * relation (id_a, id_b, one row per undirected pair) — [[dbscan]]'s
    * second half, public so any neighborhood generator (LSH, exact,
    * precomputed kNN graph) plugs in, and so the border/noise logic is
    * testable against hand-built graphs (the planted cos=1 corpora form
    * cliques and can never exercise a border). */
  def dbscanFromPairs(ids: DataFrame, pairs: DataFrame,
                      minPts: Int): DataFrame = {
    val e = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    val core = e.groupBy("src").agg(count(lit(1)).as("nn"))
      .where(col("nn") >= minPts).select(col("src").as("id"))
    val cc = Graph.connectedComponents(
      e.join(core.select(col("id").as("src")), "src")
        .join(core.select(col("id").as("dst")), "dst")
        .select(col("src"), col("dst")))
    // a core node with no CORE neighbor is its own singleton cluster
    val coreLab = core.join(cc, core("id") === cc("node"), "left_outer")
      .select(core("id"), coalesce(col("component"), core("id")).as("cluster"))
    val border = e
      .join(coreLab.select(col("id").as("dst"), col("cluster")), "dst")
      .join(core.select(col("id").as("src")), Seq("src"), "left_anti")
      .groupBy("src").agg(min(col("cluster")).as("cluster"))
      .select(col("src").as("id"), col("cluster"))
    val labeled = coreLab.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    ids.join(labeled, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
