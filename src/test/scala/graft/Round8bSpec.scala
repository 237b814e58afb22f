package graft

import org.apache.spark.sql.functions._

/** Round-8 pins, second batch — the stored-index lifecycle and the span
  * corruption operator:
  *  - sim6's probed-list pruning actually prunes: the stored qindex scan
  *    carries a partition filter and reads fewer files than the artifact
  *    holds (the I/O claim the operator's scaladoc makes, asserted from
  *    real scan metrics).
  *  - appendToIvfIndex writes every appended vector exactly once, into
  *    the list an independent argmax-cosine recomputation assigns, and
  *    never rewrites existing rows.
  *  - maskSpans degenerate rates: 100 masks every span (sentinels only,
  *    n_masked = token count), 0 masks nothing (normalized text back,
  *    NULL target — the no-pair contract).
  */
class Round8bSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sim6 stored-index query prunes to the probed list partitions") {
    val emb = core.Tables.embeddings(spark, sf)
    val dir = tmpDir("sim6-prune")
    ext.Similarity.writeIvfIndex(emb, "vec_id", "embedding", "label", dir)
    val q = ext.Similarity.ivfQuantizedTopKFromIndex(
      spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/qindex"),
      emb.select(col("vec_id"), col("embedding").as("v")),
      emb.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 15)
    assert(q.collect().nonEmpty) // finalize THIS plan (adaptive)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(n: SparkPlan): Seq[SparkPlan] = n match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case qs: QueryStageExec => Seq(qs) ++ flatten(qs.plan)
      case o => Seq(o) ++ o.children.flatMap(flatten)
    }
    val scans = flatten(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata("Location").contains("qindex") => f
    }
    assert(scans.nonEmpty, "stored qindex scan missing from the plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"probed lists must reach the scan as partition filters: $scan")
    val nLists = new java.io.File(s"$dir/qindex").listFiles()
      .count(_.getName.startsWith("list="))
    val read = scan.selectedPartitions.partitionCount
    assert(read < nLists,
      s"must read fewer list partitions than the artifact holds: $read of $nLists")
    // ≤ |queries| × nprobe distinct lists by construction
    assert(read <= 3 * 2, s"read $read partitions for 3 queries × nprobe 2")
  }

  test("appendToIvfIndex: one row per appended vector, in the argmax-cosine list, append-only") {
    val emb = core.Tables.embeddings(spark, sf)
    val dir = tmpDir("sim7-append")
    val initial = emb.where(col("vec_id") % 4 =!= 1)
    val appended = emb.where(col("vec_id") % 4 === 1)
    ext.Similarity.writeIvfIndex(initial, "vec_id", "embedding", "label", dir)
    val before = spark.read.parquet(s"$dir/qindex")
      .select("vec_id").as[Long].collect().toSet
    ext.Similarity.appendToIvfIndex(appended, "vec_id", "embedding", dir)
    // appends land as committed SEGMENTS since the round-12 layout — the
    // base qindex stays untouched and reads go through the relation seam
    assert(spark.read.parquet(s"$dir/qindex")
      .select("vec_id").as[Long].collect().toSet == before,
      "append must not touch existing base rows")
    val after = ext.Similarity.ivfIndexRelation(spark, dir)
    // exactly once each, existing rows untouched
    assert(after.count() == emb.count())
    assert(after.select("vec_id").distinct().count() == emb.count())
    assert(before.subsetOf(after.select("vec_id").as[Long].collect().toSet))
    // assignment = independent argmax cosine against the STORED centroids
    val cent = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val appendedVecs = appended
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val gotLists = after.join(appended.select("vec_id"), "vec_id")
      .select(col("vec_id"), col("list")).as[(Long, Int)].collect().toMap
    gotLists.foreach { case (id, list) =>
      val v = appendedVecs(id).toArray
      val want = cent.toSeq.map { case (l, c) => (l, cos(v, c)) }
        .sortBy { case (l, s) => (-s, l) }.head._1
      assert(list == want, s"vec $id: stored list $list, argmax-cosine $want")
    }
  }

  test("curationIngest: rejected docs never enter archive/artifacts or later dedup state") {
    val words = (1 to 24).map(i => s"w$i").mkString(" ")
    val quality = s"the a $words"                  // 26 toks, 2 stop → 0.077
    val noStop = (1 to 26).map(i => s"q$i").mkString(" ") // ratio 0 → rejected
    val b0 = Seq((10L, quality), (11L, noStop)).toDF("doc_id", "text")
    val b1 = Seq(
      (20L, quality + " tail"),       // near-dups archived 10 → drops
      (21L, noStop + " the a"),       // near-dups only the REJECTED 11 → survives
      (22L, "zz yy xx")               // short junk → rejected
    ).toDF("doc_id", "text")
    val arch = tmpDir("curingest-") + "/archive"
    graft.streaming.Replay.slicedSourceReplay(spark, Seq(b0, b1),
        "doc_id BIGINT, text STRING", "curingest-spec-") { (src, d) =>
      graft.streaming.Ingest.curationIngest(src, "doc_id", "text",
        arch, s"$d/ckpt")
    }
    val kept = spark.read.parquet(arch).select("doc_id").as[Long]
      .collect().toSet
    assert(kept == Set(10L, 21L),
      s"expected quality originals only (21 must NOT dedup vs the rejected 11): $kept")
    val sigIds = spark.read.parquet(s"${arch}_sig").select("id").as[Long]
      .collect().toSet
    assert(sigIds == Set(10L, 21L), s"rejected docs leaked into signatures: $sigIds")
    val idxIds = spark.read.parquet(s"${arch}_idx").select("id").as[Long]
      .collect().toSet
    assert(idxIds == Set(10L, 21L), s"rejected docs leaked into the band index: $idxIds")
  }

  test("maskSpans rate=100 masks everything; rate=0 masks nothing") {
    val docs = Seq((1L, "Alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three")).toDF("doc_id", "text")
    val all = ext.TextAnalysis.maskSpans(docs, "doc_id", "text", "s8",
        rate = 100).orderBy("doc_id").collect()
    assert(all(0).getString(1) == "<extra_id_0> <extra_id_1> <extra_id_2>")
    assert(all(0).getString(2) ==
      "<extra_id_0> alpha beta gamma <extra_id_1> delta epsilon zeta <extra_id_2> eta")
    assert(all(0).getLong(3) == 7L)
    assert(all(1).getString(1) == "<extra_id_0>")
    assert(all(1).getLong(3) == 3L)
    val none = ext.TextAnalysis.maskSpans(docs, "doc_id", "text", "s8",
        rate = 0).orderBy("doc_id").collect()
    assert(none(0).getString(1) == "alpha beta gamma delta epsilon zeta eta")
    assert(none(0).isNullAt(2) && none(0).getLong(3) == 0L)
  }
}
