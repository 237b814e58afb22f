package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of pipe2s_decontaminated_pipeline at sf0.1 — the
  * ProfilePipe discipline for the round-15 row (an expensive composed
  * graded unit survives the plan audit only with every second
  * attributed to already-graded per-tier cost classes). pipe2s =
  * pipe1s's five tier classes PLUS the stored-eval decontamination gate
  * (cc3's artifact probed per batch — the cc1/cc3 cost class, a
  * broadcast-postings join over the admitted batch) and the PQ tier
  * (pq3/pq6s's append class per batch, pq4's forget in the takedown).
  * Measured round-15 (warm, round 1): builds ≈ 13.3 s (eval index 0.3,
  * bloom 0.9, decon-screen+postings 2.5, ivf 2.0, pq 5.0 — the m
  * k-means trainings, pq2's build class — knn 2.7); effective batches
  * b0/b2 ≈ 17.6/20.2 s (screen+gate materialize 1.9-2.4 — the cc3
  * probe class — postings 3.5-4.1, ivf 1.7-2.0, pq append 1.6-2.0, knn
  * ingest 7.7-8.8, bloom 0.9-1.1 — each a separately graded per-tier
  * class); redelivered b1 ≈ 3.0 (screen + gate + no-op); takedown
  * ≈ 6.0 over FOUR tiers (knn repair 3.1); compact 2.2; four legs
  * ≈ 4.0. Sum-of-parts, no cross-tier pathology.
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ProfilePipe2 [sfDir]"
  */
object ProfilePipe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipe2-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    import graft.core.{Tables, Scratch}
    import graft.ext.{Dedup, Similarity, Retrieval}
    val s = spark
    for (round <- 0 until 2) {
    println(s"[pipe2-prof] ===== round $round =====")
    val docs = Tables.documents(s, sfDir)
    val emb = Tables.embeddings(s, sfDir)
    val rec = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("label"), col("embedding"))
    val curatedP = col("lang") =!= "zh" && col("n_chars") >= 100
    val dir0 = Scratch.dir("pipe2prof-")
    val evalDir = s"$dir0/evalidx"; val bloomDir = s"$dir0/dedup"
    val postDir = s"$dir0/postings"; val ivfDir = s"$dir0/ivf"
    val pqDir = s"$dir0/pq"; val knnDir = s"$dir0/knn"
    val pu = {
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      mx / 3 * 3 + 4
    }
    val dt = docs.select("doc_id", "text")
    val ev = dt.where(col("doc_id") % 20 === 3)
      .select((col("doc_id") + 5 * pu).as("doc_id"),
        concat(col("text"), lit(" evaltok")).as("text"))
      .union(dt.where(col("doc_id") % 50 === 7)
        .select((col("doc_id") + 6 * pu).as("doc_id"), col("text")))
    t("build: eval index")(
      Dedup.writeContaminationIndex(ev, "doc_id", "text", evalDir))
    val build = rec.where(col("doc_id") % 4 =!= 1)
    t("build: bloom")(Dedup.writeBloomIndex(build, "text", bloomDir))
    val curB = build.where(curatedP)
    val curBuild = curB.join(
      Dedup.contaminationPairsFromIndex(curB, "doc_id", "text", evalDir)
        .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    t("build: decon+postings")(
      Retrieval.writePostingsIndex(curBuild, "doc_id", "text", postDir))
    t("build: ivf")(
      Similarity.writeIvfIndex(curBuild, "doc_id", "embedding", "label", ivfDir))
    t("build: pq")(
      Similarity.writePqIndex(curBuild, "doc_id", "embedding", pqDir,
        dims = 64, m = 4, ksub = 4, iters = 2))
    t("build: knn graph")(
      Similarity.writeKnnGraph(curBuild, "doc_id", "embedding", knnDir, k = 3))
    val takedown = curBuild.where(col("doc_id") % 7 === 3).select("doc_id")
    val q = rec.where(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("embedding"))
    val s0 = q.where(pmod(col("doc_id"), lit(8)) === 1)
    val s1 = s0.unionByName(s0.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text"), col("lang"),
      col("n_chars"), col("embedding")))
    val s2 = q.where(pmod(col("doc_id"), lit(8)) === 5)
    def batch(tag: String, b: org.apache.spark.sql.DataFrame): Unit = {
      val fresh = Dedup.dedupIncrementalBloomFromIndex(b, "doc_id", "text",
        bloomDir).select("doc_id")
      val adm0 = b.join(fresh, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val admCur = adm0.where(curatedP)
        val contaminated = t(s"$tag: decon probe plan")(
          Dedup.contaminationPairsFromIndex(admCur, "doc_id", "text", evalDir)
            .select("doc_id").distinct())
        val cur = admCur.join(contaminated, Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = t(s"$tag: screen+gate materialize")(cur.count())
          if (n > 0) {
            t(s"$tag: postings append")(
              Retrieval.appendToPostingsIndex(cur, "doc_id", "text", postDir))
            t(s"$tag: ivf append")(
              Similarity.appendToIvfIndex(cur, "doc_id", "embedding", ivfDir))
            t(s"$tag: pq append")(
              Similarity.appendToPqIndex(cur, "doc_id", "embedding", pqDir))
            t(s"$tag: knn ingest")(
              Similarity.ingestKnnBatch(cur, "doc_id", "embedding", knnDir))
          }
          t(s"$tag: bloom ingest")(Dedup.ingestBloomBatch(b, "text", bloomDir))
        } finally cur.unpersist(blocking = false)
      } finally adm0.unpersist(blocking = false)
    }
    batch("b0", s0)
    batch("b1", s1)
    t("takedown: postings")(
      Retrieval.forgetFromPostingsIndex(takedown, "doc_id", postDir))
    t("takedown: ivf")(
      Similarity.forgetFromIvfIndex(takedown, "doc_id", ivfDir))
    t("takedown: pq")(
      Similarity.forgetFromPqIndex(takedown, "doc_id", pqDir))
    t("takedown: knn repair")(
      Similarity.forgetFromKnnGraph(takedown, "doc_id", knnDir))
    batch("b2", s2)
    t("compact postings")(Retrieval.compactPostingsIndex(s, postDir))
    t("leg: bm25")(Retrieval.bm25TopKFromIndex(s,
        Seq(0 -> Seq("spark", "join", "table"),
          1 -> Seq("hash", "merge", "sort"),
          2 -> Seq("stream", "window", "batch")), postDir, k = 5)
      .write.format("noop").mode("overwrite").save())
    t("leg: ivf")(Similarity.ivfQuantizedTopKFromIndex(
        s.read.parquet(s"$ivfDir/centroids"),
        Similarity.ivfLivingIndex(s, ivfDir),
        emb.select(col("vec_id"), col("embedding").as("v")),
        emb.where(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nprobe = 3, shortlist = 30)
      .write.format("noop").mode("overwrite").save())
    t("leg: pq")(Similarity.pqTopKFromIndex(s, pqDir,
        emb.select(col("vec_id"), col("embedding").as("v")),
        emb.where(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, shortlist = 30)
      .write.format("noop").mode("overwrite").save())
    t("leg: knn")(Similarity.knnGraphFromIndex(s, knnDir)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    }
    spark.stop()
  }
}
