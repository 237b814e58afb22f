package graft

import org.apache.spark.sql.functions._

/** Guard for the graded fixtures' PLANT-OFFSET CONVENTION (see the ds1
  * comment in SparkEntry): planted rows re-key as real_id + k·100000, which
  * is collision-free only while every graded corpus holds ids < 100000.
  * This spec bound-checks every SF directory present on this machine, so
  * the suite fails loudly BEFORE the oracle gate can flake on a colliding
  * ORDER BY key if a larger SF ever appears (round-5 advice). */
class PlantedFixtureSpec extends SparkSpec {

  private val PlantOffset = 100000L

  test("planted re-key offsets cannot collide with real doc/event ids") {
    val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/root/testdata/sf1")
      .filter(d => new java.io.File(d).exists())
    assert(sfDirs.nonEmpty, "no testdata SF dirs visible")
    for (d <- sfDirs) {
      val maxDoc = graft.core.Tables.documents(spark, d)
        .agg(max(col("doc_id"))).head.getLong(0)
      assert(maxDoc < PlantOffset,
        s"$d: max doc_id $maxDoc >= $PlantOffset — planted-fixture offsets " +
          "(ds1/ds2/inc1/inc2/cur1/cur2/d5) would collide; derive offsets " +
          "from a collected max(doc_id) scalar instead")
    }
  }
}
