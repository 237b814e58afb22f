package graft.core

/** The shared SIDE-WRITE + CHECKED-SWAP + READ-SIDE-HEALING commit
  * protocol for derived artifact directories (bloom filters, Misra–Gries
  * summaries, postings dictionaries/meta): the new copy lands at
  * `<target>__tmp`, the live copy moves aside to `<target>__old`, the new
  * copy renames in, the aside deletes — every rename checked (Hadoop
  * reports failure by returning false), so NO crash window ever holds the
  * only copy, and [[heal]] on every read/write entry restores a mid-swap
  * aside. One definition (round-9 review: the protocol had grown three
  * byte-identical copies — a fix to the swap semantics now lands once).
  *
  * Object-store caveat: HDFS/local renames are atomic; S3-style stores
  * rename by copy+delete — deployments there back artifact dirs with a
  * consistent store (or a manifest-pointer swap), same as every other
  * rename-committed Spark output. */
object Artifacts {

  /** Commit `write`'s output (produced into the supplied tmp path) as the
    * new content of `target`, swap-protected. */
  def swapInto(spark: org.apache.spark.sql.SparkSession,
               target: String)(write: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(target), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    heal(spark, target)
    fs.delete(p(target + "__tmp"), true)
    write(target + "__tmp")
    if (fs.exists(p(target)) && !fs.rename(p(target), p(target + "__old")))
      throw new java.io.IOException(
        s"Artifacts.swapInto: could not move $target aside — artifact untouched")
    if (!fs.rename(p(target + "__tmp"), p(target))) {
      val restored = fs.rename(p(target + "__old"), p(target))
      throw new java.io.IOException(
        s"Artifacts.swapInto: could not swap new copy into $target" +
          (if (restored) " — previous copy restored"
           else s" — previous copy left at ${target}__old; the next" +
             " write recovers it"))
    }
    if (fs.exists(p(target + "__old")) && !fs.delete(p(target + "__old"), true))
      throw new java.io.IOException(
        s"Artifacts.swapInto: committed but could not remove the superseded " +
          s"${target}__old — delete it manually")
  }

  /** Commit a NEW artifact directory all-or-nothing: `write` produces into
    * `<target>__tmp`, then ONE checked rename publishes it at `target` —
    * the append-segment counterpart of [[swapInto]] (which replaces an
    * existing artifact; this creates one that must never be observed
    * partially). A crash before the rename leaves only a `__tmp` dir that
    * [[committedChildren]] ignores and the next writer clears; a crash
    * after it leaves the complete segment. This is what makes doc-id /
    * content anti-join idempotence sound for multi-file appends: the
    * anti-join only ever sees COMPLETE segments, so a failed attempt
    * re-runs instead of being half-visible and skipped forever (round-9
    * ADVICE on the postings append). */
  def stageCommit(spark: org.apache.spark.sql.SparkSession,
                  target: String)(write: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(target), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    if (fs.exists(p(target)))
      throw new java.io.IOException(
        s"Artifacts.stageCommit: $target already committed")
    fs.delete(p(target + "__tmp"), true)
    write(target + "__tmp")
    if (!fs.rename(p(target + "__tmp"), p(target)))
      throw new java.io.IOException(
        s"Artifacts.stageCommit: could not publish $target — staged copy " +
          s"left at ${target}__tmp; retry re-stages")
  }

  /** Commit one COUNT-INDEXED append segment (`seg_<index>_<uuid>`) via
    * [[stageCommit]], then VERIFY the single-writer assumption the index
    * derivation rests on: segment ids derive from the committed-segment
    * count, so two concurrent appenders both derive `seg_N` — the UUID
    * suffix keeps their directories from colliding, but
    * [[segmentsAsOf]]'s lexicographic prefix would then order version N
    * vs N+1 by random UUID bytes, silently corrupting every pinned read.
    * Detection is cheap and loud (round-12 ADVICE, round-13 verdict #6):
    * after the commit, list committed siblings sharing the index and
    * throw on a duplicate — the artifact is then known-torn and the
    * operator removes one twin before further as-of reads, instead of
    * pins answering with writer-race-ordered data forever. Batch-id-named
    * segments (the windowed sketch stores) need no such check: their name
    * IS the idempotence key and [[stageCommit]] already refuses a
    * duplicate by name. */
  def commitIndexedSegment(spark: org.apache.spark.sql.SparkSession,
                           segmentsParent: String, index: Int)
                          (write: String => Unit): Unit = {
    stageCommit(spark,
      f"$segmentsParent/seg_$index%06d_${java.util.UUID.randomUUID}")(write)
    val twins = committedChildren(spark, segmentsParent)
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
      .filter(_.startsWith(f"seg_$index%06d_"))
    if (twins.size > 1)
      throw new java.io.IOException(
        s"Artifacts.commitIndexedSegment: ${twins.size} committed segments " +
          s"share index $index under $segmentsParent " +
          s"(${twins.sorted.mkString(", ")}) — concurrent appenders " +
          "detected; segment ids derive from the committed-segment count, " +
          "so as-of version ordering is ambiguous from here on. Serialize " +
          "appends per artifact root (one streaming query per artifact) " +
          "and remove the duplicate before further reads")
  }

  /** Byte-identical driver-side copy of a committed artifact subdir into
    * a staged sibling/root (r17, the kNN meta-copy device shared):
    * PASS-THROUGH state a compact republishes UNCHANGED — trained
    * quantizers, codebooks, 1-row metas, bloom filters — must not pay a
    * Spark read→coalesce→write job per fold; the copy is the same bytes
    * and publishes atomically with the surrounding stage/swap. Only for
    * bounded, immutable-between-folds state (never data relations, whose
    * compaction exists to REWRITE them). */
  def copyDir(spark: org.apache.spark.sql.SparkSession,
              from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(to).getFileSystem(conf)
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, p(from), fs, p(to),
        false, conf))
      throw new java.io.IOException(
        s"Artifacts.copyDir: could not copy $from to $to")
  }

  /** The COMMITTED children of a segment parent dir: every subdirectory
    * except in-flight `__tmp` stages (a crashed [[stageCommit]]'s leftover
    * is invisible here — that is the read-side half of the contract).
    * Missing parent → empty. Also sweeps stale `__tmp` dirs when asked. */
  def committedChildren(spark: org.apache.spark.sql.SparkSession,
                        parent: String,
                        sweepStale: Boolean = false): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(parent), spark.sparkContext.hadoopConfiguration)
    val pp = new org.apache.hadoop.fs.Path(parent)
    if (!fs.exists(pp)) Seq.empty
    else fs.listStatus(pp).toSeq.filter(_.isDirectory).flatMap { st =>
      if (st.getPath.getName.endsWith("__tmp")) {
        if (sweepStale) fs.delete(st.getPath, true)
        None
      } else Some(st.getPath.toString)
    }.sorted
  }

  /** AS-OF version floor of a base+segments artifact: the number of
    * historical versions compaction has FOLDED into the base (version v
    * of such an artifact = base + the first v − floor committed
    * segments; the build is version `floor`, each append adds one).
    * Missing marker = 0, a never-compacted artifact. */
  def asOfFloor(spark: org.apache.spark.sql.SparkSession,
                dir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/asof_floor")
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Record the as-of floor inside an artifact root — called by compact
    * jobs on their STAGED root (the marker then publishes atomically with
    * the fold itself, so no crash point shows folded data under an
    * unfolded floor or vice versa). */
  def setAsOfFloor(spark: org.apache.spark.sql.SparkSession,
                   dir: String, floor: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/asof_floor"), true)
    try out.write(floor.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** TIME-TRAVEL segment selection — [[graft.streaming.Ingest.asOfSnapshot]]'s
    * newest-committed-≤-pin rule lifted to the shared layer for
    * SEGMENTED artifacts (postings, PQ codes): version `asOf` of
    * `artifactDir` is its base plus the first `asOf − floor` committed
    * segments, returned here as the segment-path prefix. Versions are
    * immutable once committed (segments never rewrite), so a pinned read
    * is reproducible forever — until compaction folds history, after
    * which reads of folded versions fail LOUDLY below instead of
    * silently answering with newer data (mv3's retention contract), and
    * reads of not-yet-written versions fail loudly too. */
  def segmentsAsOf(spark: org.apache.spark.sql.SparkSession,
                   artifactDir: String, asOf: Long): Seq[String] = {
    val floor = asOfFloor(spark, artifactDir)
    val segs = committedChildren(spark, s"$artifactDir/segments")
    // Read-side half of the single-writer guard (round-14 ADVICE):
    // commitIndexedSegment's twin check throws only in the SECOND
    // committer's JVM — which may be a dead streaming query whose error
    // nobody reads — so a pinned read of a torn artifact must also fail
    // loudly here rather than order version N vs N+1 by random UUID
    // bytes. Applies only to count-indexed `seg_NNNNNN_<uuid>` names;
    // batch-id-named segments (windowed sketch stores) are unique by
    // name, stageCommit already refuses their duplicates.
    val dupIdx = segs
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
      .flatMap { n =>
        val m = "^(seg_\\d{6})_".r.findFirstMatchIn(n); m.map(_.group(1))
      }
      .groupBy(identity).collect { case (idx, twins) if twins.size > 1 => idx }
    require(dupIdx.isEmpty,
      s"Artifacts.segmentsAsOf: $artifactDir has multiple committed " +
        s"segments sharing index ${dupIdx.toSeq.sorted.mkString(", ")} — " +
        "the artifact was torn by concurrent appenders and version " +
        "ordering past that index is ambiguous; remove the duplicate " +
        "segment(s) before pinned reads")
    require(asOf >= floor,
      s"Artifacts.segmentsAsOf: version $asOf of $artifactDir was folded " +
        s"away by compaction (floor = $floor) — as-of reads of folded " +
        "versions fail loudly; lengthen the compaction window if the " +
        "pipeline needs deeper reproducibility")
    require(asOf - floor <= segs.size,
      s"Artifacts.segmentsAsOf: version $asOf of $artifactDir does not " +
        s"exist yet (head = ${floor + segs.size})")
    segs.take((asOf - floor).toInt)
  }

  /** Restore `target` from `<target>__old` if a crashed swap left it
    * missing; clear the stale aside otherwise. Runs on BOTH the read and
    * the write path — read-side healing is what makes "retry is harmless"
    * true after a mid-swap crash. */
  def heal(spark: org.apache.spark.sql.SparkSession, target: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(target), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    if (fs.exists(p(target + "__old"))) {
      if (!fs.exists(p(target))) {
        if (!fs.rename(p(target + "__old"), p(target)))
          throw new java.io.IOException(
            s"Artifacts.heal: could not restore $target from ${target}__old")
      } else if (!fs.delete(p(target + "__old"), true))
        throw new java.io.IOException(
          s"Artifacts.heal: could not remove stale ${target}__old")
    }
  }
}
