package graft.ext

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.{Encoder, functions}

/** Typed sketch-merge aggregations (the `Aggregator[IN, BUF, OUT]` tier of
  * the extension charter — custom aggregation with a FIXED-SIZE mergeable
  * buffer, where a collect-then-compute aggregate would buffer whole
  * groups).
  *
  * MinHash signatures are exactly mergeable: sig(A ∪ B) =
  * elementwise_min(sig(A), sig(B)) — min over a union is the min of mins,
  * no approximation added by merging. So group-level signatures (per
  * near-dup cluster, per source domain, per shard of a 100 TB corpus)
  * reduce with a `numHashes`-long buffer regardless of group size, and
  * group-vs-group Jaccard estimates come from comparing the reduced
  * signatures — the mergeable-sketch pattern (same family as HLL/GK in
  * apx1) applied to set similarity.
  */
object SketchAggs {

  /** Element-wise minimum of per-row MinHash signatures: the signature of
    * the UNION of the rows' shingle sets. Input rows are `numHashes`-long
    * signatures (graft.functions.MinHashSigExpr output); empty groups
    * yield the neutral all-MaxValue signature. */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(numHashes >= 1)

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      require(sig == null || sig.length == numHashes,
        s"minhash_union: signature length ${sig.length} != $numHashes")
      if (sig != null) {
        var i = 0
        while (i < numHashes) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** DataFrame-facing UDAF: `df.groupBy(g).agg(minhashUnion(128)(col("sig")))`. */
  def minhashUnion(numHashes: Int = 128): UserDefinedFunction =
    functions.udaf(new MinHashUnion(numHashes), ExpressionEncoder[Seq[Long]]())
}
