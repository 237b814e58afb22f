package graft.core

/** Driver-side union-find with MIN-ID roots — the shared kernel behind
  * the ADAPTIVE fast paths of the distributed label-merge fixpoints
  * ([[graft.ext.Dedup.clusterRoots]], Borůvka's per-round meta merge in
  * [[graft.ext.Graph]]): when a pair list is ALREADY materialized (a
  * localCheckpoint) and its counted size fits a documented driver
  * budget, one bounded collect + this merge replaces an entire
  * iterate-to-fixpoint loop of Spark jobs — the AQE runtime-broadcast
  * shape, never a correctness or scale ceiling (above budget the
  * distributed path runs unchanged and computes the identical roots).
  *
  * Union-by-min keeps every set's root equal to its minimum member:
  * roots start as the members themselves and a union only ever points
  * the larger root at the smaller, so by induction the surviving root
  * of any set is its minimum id. Find path-compresses, so total cost is
  * ~O(pairs · α). */
object UnionFind {

  /** (member, minRoot) for every distinct id appearing in `pairs`,
    * unsorted. */
  def minRoots(pairs: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrDefault(root, root) != root)
        root = parent.get(root)
      var c = x
      while (parent.getOrDefault(c, c) != c) {
        val nxt = parent.get(c); parent.put(c, root); c = nxt
      }
      root
    }
    val members = new java.util.HashSet[java.lang.Long]()
    pairs.foreach { case (a, b) =>
      members.add(a); members.add(b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    import scala.jdk.CollectionConverters._
    members.asScala.iterator.map(m => (m.longValue, find(m.longValue))).toSeq
  }
}
