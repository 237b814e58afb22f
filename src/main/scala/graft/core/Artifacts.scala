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
