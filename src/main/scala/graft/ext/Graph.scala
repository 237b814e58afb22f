package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed link analysis — iterative graph computation expressed as
  * DataFrame joins/aggregates (the [[Dedup.clusterRoots]] tier applied to
  * ranking instead of labeling): no driver-side adjacency, no collect, an
  * iteration is one keyed shuffle of the edge list.
  */
object Graph {

  /** Fixed-iteration PageRank in FIXED-POINT arithmetic: every rank is a
    * BIGINT numerator over `scale` (default 10¹⁵), so the whole
    * computation is integer multiply/divide/sum — exact, order-free, and
    * bit-identical in any engine. Floating-point PageRank sums per-node
    * contributions in shuffle arrival order and diverges across engines
    * (and across RUNS of the same engine); the usual decimal-quantization
    * discipline (core.Num) caps error per sum but an ITERATED computation
    * compounds the quantization choice — integer fixed point removes the
    * question entirely, the same way lm1 pins `ln` behind a decimal
    * round. Truncation drift: each division truncates ≤ 1 unit (10⁻¹⁵),
    * compounded over `iterations` — immaterial at rank magnitudes ≥ 1/N
    * for any N below ~10¹², and deterministic regardless.
    *
    * r₀(v) = scale∕N;
    * r_{t+1}(v) = ((100−d)·(scale∕N))∕100 + (d·Σ_{u→v} r_t(u)∕deg(u))∕100
    * with d = `dampingPct` and ∕ integer division. Dangling nodes (no
    * out-edges) leak their mass — the standard simplification; callers
    * needing mass conservation add a sink edge per dangling node.
    *
    * Scale shape: `edges` (src, dst — directed; pass both directions for
    * an undirected walk) joins its out-degree ONCE at build — each
    * iteration then needs a single equi-join of the cached degree-carrying
    * edge list against the rank frame (|nodes| rows, orders of magnitude
    * smaller than the edge list — AQE broadcasts it while it fits) plus
    * one dst-keyed contribution shuffle (map-side combined down to
    * ≤|nodes| rows per partition). The edge list and node list persist
    * MEMORY_AND_DISK (the clusterRoots discipline — flat lineage, no
    * per-iteration recompute of the edge derivation); ranks stay lazy —
    * each r_t appears exactly once in r_{t+1}'s plan. N is ONE bounded
    * driver-side count (the same budget class as d2's cardinality
    * probe); it and the derived constants then ride as literals, which
    * keeps every iteration free of scalar joins. */
  def pageRankFixedPoint(edges: DataFrame, iterations: Int = 3,
                         dampingPct: Int = 85,
                         scale: Long = 1000000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one action: the scalar N (and it materializes both caches, so the
    // iteration plans below read only InMemoryRelations)
    val n = nodes.count()
    val r0 = scale / n
    val base = ((100 - dampingPct).toLong * r0) / 100L
    var r = nodes.select(col("node"), lit(r0).as("r"))
    for (_ <- 1 to iterations) {
      val incoming = eDeg
        .join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), idiv(col("r"), col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inc"))
      r = nodes.join(incoming, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + idiv(lit(dampingPct.toLong) * coalesce(col("inc"), lit(0L)),
            lit(100L))).as("r"))
    }
    r.select(col("node"), col("r").as("rank_fp"))
  }
}
