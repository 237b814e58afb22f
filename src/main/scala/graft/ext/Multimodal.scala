package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs beside them. The Spark-side shape — schema, size-balanced
  * partitioning, per-partition batch processing, frame chunking — is real
  * and tested; the codec itself is STUBBED (this container has no image/
  * audio libraries), behind [[StubCodec]], with a deterministic fake so
  * tests and oracles stay exact. Swap [[StubCodec]] for a JNI/javacv codec
  * in production; nothing else changes.
  *
  * Scale design:
  *  - decode work is proportional to BYTES, not rows → spread blobs
  *    ROUND-ROBIN across decode partitions ([[repartitionBySize]]): each
  *    partition gets a statistical mix of sizes (byte-balanced to ~√n
  *    variance). Range-partitioning on size looks smarter but colocates
  *    every large blob in one partition — maximal byte skew.
  *  - per-partition processing (`mapPartitions` on a typed Dataset) is the
  *    Scala analogue of Python's `mapInPandas`: one iterator pass, codec
  *    state (decoder contexts, model weights) initialized once per
  *    partition, not per row.
  *  - outputs are plain columns (struct metadata, float features) so
  *    downstream similarity/dedup operators compose directly.
  */
object Multimodal {

  /** A blob with its id; the typed row the per-partition codecs consume. */
  case class Blob(id: Long, payload: Array[Byte])

  /** Decoded media metadata (what a real image/audio probe would return). */
  case class MediaMeta(id: Long, n_bytes: Long, format: String,
                       width: Int, height: Int)

  /** Fixed-dim feature vector per blob. */
  case class BlobFeatures(id: Long, features: Array[Float])

  /** Integer histogram per blob — the exact (float-free) form of
    * [[BlobFeatures]], used by the oracle-checked surface. */
  case class BlobHistogram(id: Long, counts: Array[Long])

  /** THE STUB: deterministic fake codec standing in for libjpeg/ffmpeg.
    * Every function is a pure function of the bytes, so pipelines built on
    * it are reproducible and oracle-checkable. */
  object StubCodec {
    /** Fake image probe: "format" and dimensions derived from the payload
      * length — a real probe parses the header instead. (Length parity, not
      * first-byte parity: byte-level semantics hold on any charset, so the
      * SQL oracle can mirror it with octet_length alone.) */
    def probe(b: Array[Byte]): (String, Int, Int) = {
      val fmt = if (b.isEmpty) "empty" else if (b.length % 2 == 0) "png" else "jpeg"
      (fmt, (b.length % 640) + 1, (b.length % 480) + 1)
    }
    /** Fake feature extractor's integer core: 16-bin histogram of byte high
      * nibbles. Exact integers — the oracle-checkable form (a SQL engine can
      * mirror it from the hex encoding of the payload, no float involved). */
    def histogram(b: Array[Byte]): Array[Long] = {
      val h = new Array[Long](16)
      var i = 0
      while (i < b.length) { h((b(i) & 0xff) >> 4) += 1L; i += 1 }
      h
    }
    /** Fake feature extractor: 16-bin byte histogram, L1-normalized — a
      * stand-in with real signal (and the exact shape of an embedding). */
    def features(b: Array[Byte]): Array[Float] = {
      val n = math.max(1, b.length).toFloat
      histogram(b).map(_ / n)
    }
  }

  /** Attach a binary payload column derived from text — the test-data stand
    * -in for a real image/audio column (no binary table ships in testdata). */
  def withBlob(df: DataFrame, textCol: String, as: String = "payload"): DataFrame =
    df.withColumn(as, col(textCol).cast("binary"))

  /** Decode-stage repartitioning: ROUND-ROBIN spread of blobs. Range-
    * partitioning on payload size looks "size-aware" but colocates all the
    * LARGEST blobs in one partition (equal row counts per contiguous size
    * range = maximal byte skew — one executor does most of the decode
    * bytes); round-robin gives every partition a statistical mix of sizes,
    * which is byte-balanced to ~√n variance with no extra pass. True
    * cumulative-byte bucketing would need a prefix-sum over sizes — not
    * worth a shuffle+scan for decode batching. The blobCol parameter is
    * kept for call-site readability (what the balancing is FOR). */
  def repartitionBySize(df: DataFrame, blobCol: String, partitions: Int): DataFrame =
    df.repartition(partitions)

  /** Decode metadata per blob — per-partition batch processing through the
    * (stub) codec. */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("id"), col(blobCol).as("payload")).as[Blob]
      .mapPartitions { it =>
        // real codecs initialize decoder context here, once per partition
        it.map { b =>
          val (fmt, w, h) = StubCodec.probe(b.payload)
          MediaMeta(b.id, b.payload.length.toLong, fmt, w, h)
        }
      }
  }

  /** Feature extraction per blob (byte-histogram stub), composable with
    * Similarity.* over the resulting `features` column. */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String): Dataset[BlobFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("id"), col(blobCol).as("payload")).as[Blob]
      .mapPartitions(_.map(b => BlobFeatures(b.id, StubCodec.features(b.payload))))
  }

  /** Integer-histogram extraction per blob — same mapPartitions plumbing as
    * [[extractFeatures]] but an exact (hashable, float-free) output, so the
    * oracle gate can compare it value-for-value against a SQL recomputation
    * of the byte histogram. */
  def extractHistogram(df: DataFrame, idCol: String, blobCol: String): Dataset[BlobHistogram] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("id"), col(blobCol).as("payload")).as[Blob]
      .mapPartitions(_.map(b => BlobHistogram(b.id, StubCodec.histogram(b.payload))))
  }

  /** "Video" frame sampling: chunk the payload into fixed-size frames and
    * keep every `stride`-th — pure column ops (no codec), so the chunking
    * plan stays in whole-stage codegen. Returns (id, frame_no, frame). */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col(blobCol)).cast("double") / frameBytes).cast("int")
    df.select(col(idCol).as("id"), col(blobCol).as("payload"), nFrames.as("nf"))
      .select(col("id"), posexplode(
        when(col("nf") > 0,
          transform(sequence(lit(0), col("nf") - 1),
            i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes))))
          .otherwise(array().cast("array<binary>"))).as(Seq("frame_no", "frame")))
      .where(col("frame_no") % stride === 0)
  }
}
