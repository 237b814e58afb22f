package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "x" * 100),   // 100 bytes → 2 frames of 64
    (2L, "hello"),     // 5 bytes → 1 frame
    (3L, ""),          // empty payload
  ).toDF("doc_id", "text")

  test("decodeMeta: per-partition stub codec, deterministic metadata") {
    val meta = Multimodal.decodeMeta(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).n_bytes == 100 && meta(1L).width == 101 && meta(1L).height == 101)
    assert(meta(3L).format == "empty" && meta(3L).n_bytes == 0)
    // length parity: 100 bytes → png, 5 bytes → jpeg
    assert(meta(1L).format == "png" && meta(2L).format == "jpeg")
  }

  test("extractFeatures: L1-normalized 16-bin byte histogram") {
    val f = Multimodal.extractFeatures(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload")
      .collect().map(b => b.id -> b.features).toMap
    assert(f(1L).length == 16)
    // "x"*100: byte 120 → bin 7; histogram is all mass in bin 7
    assert(f(1L)(7) == 1.0f && f(1L).sum == 1.0f)
    assert(f(3L).sum == 0.0f, "empty payload → zero vector, no NaN")
  }

  test("extractHistogram: integer core consistent with the float features") {
    val h = Multimodal.extractHistogram(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload")
      .collect().map(b => b.id -> b.counts).toMap
    val f = Multimodal.extractFeatures(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload")
      .collect().map(b => b.id -> b.features).toMap
    assert(h(1L).toSeq == Seq.tabulate(16)(i => if (i == 7) 100L else 0L))
    assert(h(3L).forall(_ == 0L))
    for (id <- Seq(1L, 2L, 3L); bin <- 0 until 16) {
      val n = math.max(1, h(id).sum)
      assert(f(id)(bin) == h(id)(bin).toFloat / n,
        s"features must be the normalized histogram (id=$id bin=$bin)")
    }
  }

  test("sampleFrames: chunking math and stride filter") {
    val frames = Multimodal.sampleFrames(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload", 64, 2)
      .select("id", "frame_no").as[(Long, Int)].collect().toSet
    // doc 1: frames 0,1 → stride 2 keeps 0; doc 2: frame 0; doc 3: none
    assert(frames == Set((1L, 0), (2L, 0)))
    val all = Multimodal.sampleFrames(
      Multimodal.withBlob(docs, "text"), "doc_id", "payload", 64, 1)
      .where(col("id") === 1L).select("frame").as[Array[Byte]].collect()
    assert(all.map(_.length).sorted.toSeq == Seq(36, 64), "last frame is the remainder")
  }

  test("repartitionBySize: partition count honored") {
    val out = Multimodal.repartitionBySize(
      Multimodal.withBlob(docs, "text"), "payload", 2)
    assert(out.rdd.getNumPartitions == 2)
    assert(out.count() == 3)
  }
}
