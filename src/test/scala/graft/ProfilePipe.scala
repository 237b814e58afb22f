package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of pipe1s_composed_pipeline at sf0.1 — the bench
  * records ~43 s for the graded unit; this main splits one run into
  * build / per-batch / takedown / compact / answer-leg costs (two rounds
  * in one JVM — round 1 is the warm attribution). Measured round-15
  * (warm, after the knnBatchStats consolidation): builds 6.3 s (bloom
  * 1.0, postings 2.2, ivf 1.2, knn 2.0); effective batches b0/b2
  * ≈ 14/18 s each dominated by kNN ingest (6.2/6.7, down from round-14's
  * 7.0/10.2 — the guard probes, emptiness check, duplicate count and
  * meta read now ride ONE stats job, measured 4 actions/batch where
  * round 14 paid ~7; the remainder is the tile join + two windows +
  * three version writes, real work) and postings append (3.6/4.3 —
  * whole-store dictionary rebuild, the ret4 contract); redelivered b1
  * ≈ 3.8 s (probe + stats no-op); takedown 4.0 (knn repair 3.2);
  * compact 2.1; legs 2.5. VERDICT: the total is the SUM of the five per-tier graded
  * cost classes × 3 batches (knn5s ≈ 5 s covers build + 2 kNN ingests
  * alone; ret9s 6.7 the postings side; sim11s 4.5 the IVF side; bf3s
  * 4.7 the bloom side; knn3/del3s 4–7 the takedown) — fixed per-job
  * engine overhead, no quadratic or re-evaluation pathology; at real
  * data volumes the same job count amortizes over real work.
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ProfilePipe [sfDir]"
  */
object ProfilePipe {
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
      println(f"[pipe-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    import graft.core.{Tables, Par, Scratch}
    import graft.ext.{Dedup, Similarity, Retrieval}
    val s = spark
    for (round <- 0 until 2) {
    println(s"[pipe-prof] ===== round $round =====")
    val docs = Tables.documents(s, sfDir)
    val emb = Tables.embeddings(s, sfDir)
    val rec = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("lang"), col("n_chars"),
        col("label"), col("embedding"))
    val curatedP = col("lang") =!= "zh" && col("n_chars") >= 100
    val dir0 = Scratch.dir("pipeprof-")
    val bloomDir = s"$dir0/dedup"; val postDir = s"$dir0/postings"
    val ivfDir = s"$dir0/ivf"; val knnDir = s"$dir0/knn"
    val build = rec.where(col("doc_id") % 4 =!= 1)
    t("build: bloom")(Dedup.writeBloomIndex(build, "text", bloomDir))
    val curBuild = build.where(curatedP)
    t("build: postings")(
      Retrieval.writePostingsIndex(curBuild, "doc_id", "text", postDir))
    t("build: ivf")(
      Similarity.writeIvfIndex(curBuild, "doc_id", "embedding", "label", ivfDir))
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
      val fresh = t(s"$tag: dedup probe plan")(
        Dedup.dedupIncrementalBloomFromIndex(b, "doc_id", "text", bloomDir)
          .select("doc_id"))
      val adm = b.join(fresh, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // production shape (r17): ONE aggregate freezes the cache AND
        // answers the curated-emptiness gate; bloom ingest commits LAST
        val nCur = t(s"$tag: adm+gate agg")(
          adm.agg(count(when(curatedP, lit(1)))).head().getLong(0))
        val cur = adm.where(curatedP)
        if (nCur > 0) {
          t(s"$tag: postings append")(
            Retrieval.appendToPostingsIndex(cur, "doc_id", "text", postDir))
          t(s"$tag: ivf append")(
            Similarity.appendToIvfIndex(cur, "doc_id", "embedding", ivfDir))
          val acts = new java.util.concurrent.atomic.AtomicInteger(0)
          val al = new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(f: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                ns: Long): Unit = acts.incrementAndGet()
            override def onFailure(f: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                e: Exception): Unit = ()
          }
          spark.listenerManager.register(al)
          try t(s"$tag: knn ingest")(
            Similarity.ingestKnnBatch(cur, "doc_id", "embedding", knnDir))
          finally {
            Thread.sleep(500) // listener delivery is async
            spark.listenerManager.unregister(al)
            println(s"[pipe-prof] $tag: knn ingest actions = ${acts.get()}" +
              " (budget: stats probe + 1 combined version write = 2)")
          }
        }
        t(s"$tag: bloom ingest")(Dedup.ingestBloomBatch(b, "text", bloomDir))
      } finally adm.unpersist(blocking = false)
    }
    batch("b0", s0)
    batch("b1", s1)
    t("takedown: postings")(
      Retrieval.forgetFromPostingsIndex(takedown, "doc_id", postDir))
    t("takedown: ivf")(
      Similarity.forgetFromIvfIndex(takedown, "doc_id", ivfDir))
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
    t("leg: knn")(Similarity.knnGraphFromIndex(s, knnDir)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    }
    spark.stop()
  }
}
