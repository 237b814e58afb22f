package graft

import org.apache.spark.sql.functions._

/** Guard for the graded fixtures' PLANT-OFFSET CONVENTION (see the ds1
  * comment in SparkEntry).
  *
  * The documents-table fixtures (ds1/ds2/inc1/inc1s/inc2/inc2s/bf1/cur1/
  * cur2/cc1) re-key planted rows as doc_id + k·plantUnit with plantUnit
  * derived from max(doc_id) — collision-free at ANY SF by construction
  * (round-6 verdict #3); this spec pins the derivation's invariants
  * (> max, ≡ 1 mod 3, class disjointness) on every SF dir present.
  *
  * The remaining FIXED offsets on other tables (orders +10⁷, custkey
  * +10⁶, suppkey +10⁹, vec_id +10⁶) still carry ≥20× headroom at every
  * graded SF and stay bound-checked here, so the suite fails loudly
  * BEFORE the oracle gate can flake on a colliding ORDER BY key if a
  * larger SF ever appears (round-5 advice). */
class PlantedFixtureSpec extends SparkSpec {

  private def sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1", "/root/testdata/sf1")
    .filter(d => new java.io.File(d).exists())

  test("derived plantUnit: > max(doc_id), ≡ 1 (mod 3), classes disjoint") {
    assert(sfDirs.nonEmpty, "no testdata SF dirs visible")
    for (d <- sfDirs) {
      val mx = graft.core.Tables.documents(spark, d)
        .agg(max(col("doc_id"))).head.getLong(0)
      val pu = mx / 3 * 3 + 4 // SparkEntry.plantUnit's formula
      assert(pu > mx, s"$d: plantUnit $pu must exceed max doc_id $mx")
      assert(pu % 3 == 1,
        s"$d: plantUnit $pu must be ≡ 1 mod 3 (replay-slice arithmetic)")
      // class k plants live in [k·pu, k·pu + mx] — disjoint from real ids
      // and from each other for every k used (1,2,3,5,6,7) since mx < pu
      for (k <- Seq(1L, 2L, 3L, 5L, 6L, 7L))
        assert(k * pu > mx && (k * pu + mx) < (k + 1) * pu,
          s"$d: class $k plants overlap a neighbor")
    }
  }

  test("no NATURAL embedding pair sits in the LSH-fragile [0.9, 1) band") {
    // d5/sd1/dbscan1 find cos ≥ 0.9 neighborhoods via hyperplane LSH,
    // whose recall for NATURAL pairs near the 0.9 boundary is well under
    // 1.0 — the gates hold because every ≥0.9 pair in the corpus is a
    // PLANTED scalar multiple (deterministic recall: identical hash
    // signs). This pins that margin assumption exactly (round-10
    // ADVICE): an exact all-pairs pass over the BASE embeddings must
    // find no distinct pair with cos ≥ 0.9. Scaled plants preserve
    // cosine (cos(x, c·y) = cos(x, y)), so base-base coverage covers
    // every natural cross-family pair too. Guarded to fixture-scale
    // dirs: the check is O(n²) by design (it is the truth the blocked
    // operators avoid computing).
    for (d <- sfDirs.filter(p => p.endsWith("sf0.001") || p.endsWith("sf0.01"))) {
      val emb = graft.core.Tables.embeddings(spark, d)
        .select(col("vec_id"), ext.Similarity.toDoubleArr(col("embedding")).as("v"))
      val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
      val offenders = a.join(b, col("ia") < col("ib"))
        .where(ext.Similarity.cosine(col("va"), col("vb")) >= 0.9)
        .count()
      assert(offenders == 0L,
        s"$d: $offenders natural embedding pairs at cos >= 0.9 — the " +
          "LSH-recall margin assumption behind d5/sd1/dbscan1 is broken; " +
          "raise LSH tables or regenerate embeddings")
    }
  }

  test("fixed offsets on non-document tables keep their headroom") {
    for (d <- sfDirs) {
      def mx(t: String, c: String) = graft.core.Tables.table(spark, d, t)
        .agg(max(col(c))).head.getLong(0)
      assert(mx("orders", "o_orderkey") < 10000000L,
        s"$d: o_orderkey outgrew the +10^7 plant offset (merge1)")
      assert(mx("customer", "c_custkey") < 1000000L,
        s"$d: c_custkey outgrew the +10^6 plant offset (cdc fixtures)")
      assert(mx("lineitem", "l_suppkey") < 1000000000L,
        s"$d: l_suppkey outgrew the +10^9 shared-id offset (pr1/tri1)")
      assert(mx("embeddings", "vec_id") < 1000000L,
        s"$d: vec_id outgrew the +10^6 plant offset (d5/emb2)")
    }
  }
}
