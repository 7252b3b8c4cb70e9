package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the text-hash family. All math is deterministic
  * integer arithmetic mod 1e9+7, chosen so the DuckDB oracle can replay it
  * exactly with list lambdas (see TrainingQueries):
  *
  *   polyHash(s)      = foldl (acc, cp) -> (acc*31 + codepoint) % P over s
  *   shingle n-gram   = foldl (a, b) -> (a*131 + b) % P over token hashes
  *   minhash_j(x)     = ((2j+1)x + 7919j + 12345) % P, signature = min each
  *   band key         = foldl (acc, x) -> (acc*1000003 + x) % P over slice
  *   simhash bit_i    = majority over tokens of ((hash >> i) & 1) ? +1 : -1
  *
  * These were first written as Catalyst higher-order-function trees
  * (transform/aggregate over split(text)), which are interpreted — ~10 ms
  * per document at 500 chars. The same math as a fused JVM loop is ~3 µs.
  * The Expression wrappers below keep the fused kernels inside whole-stage
  * codegen via static calls. */
object HashOps {
  final val P = 1000000007L

  /** Fold of unicode code points, matching Spark/DuckDB `ascii` per char. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Token hashes of a space-trimmed, single-space-split text — the
    * semantics of transform(split(trim(text), " "), polyHash). */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val toks = s.trim.toString.split(" ", -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = polyHash(UTF8String.fromString(toks(i)))
      i += 1
    }
    out
  }

  /** Distinct n-gram shingle hashes (first-occurrence order). */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(s)
    if (th.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= th.length - n) {
      var acc = th(i)
      var j = 1
      while (j < n) { acc = (acc * 131 + th(i + j)) % P; j += 1 }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ORDERED (non-distinct) n-gram shingle hashes — one hash per k-gram
    * START POSITION, array index = position. The positional variant of
    * shingleHashes for span-level work (exact substring dedup), where
    * WHERE a duplicated n-gram sits in the document matters, not just
    * that it occurs. Same token/fold math as shingleHashes. */
  def seqShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(s)
    if (th.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = th.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = th(i)
      var j = 1
      while (j < n) { acc = (acc * 131 + th(i + j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Feature-hashing text embedding — the "hashing trick" (Weinberger et
    * al., ICML 2009): vec[i] = Σ sign(t) over tokens t with
    * polyHash(t) % d == i, sign(t) = +1 iff (polyHash(t) / d) is even.
    * A model-free dense representation that makes the whole ANN /
    * SemDeDup vector stack applicable to raw text. Counts are exact
    * integers emitted as floats (exact below 2^24), so a second engine
    * replays the embedding bitwise. One fused pass per row — zero
    * shuffle, no token explode. */
  def hashEmbed(s: UTF8String, d: Int): ArrayData = {
    val th = tokenHashes(s)
    val acc = new Array[Int](d)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      val dim = (h % d).toInt
      if (((h / d) % 2L) == 0L) acc(dim) += 1 else acc(dim) -= 1
      i += 1
    }
    val out = new Array[Float](d)
    var j = 0
    while (j < d) { out(j) = acc(j).toFloat; j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** k-min signature over the affine family; null on an empty set (mirrors
    * array_min(empty) = NULL in both engines). */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 1
      val b = 7919L * j + 12345L
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = (a * hashes.getLong(i) + b) % P
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fold each length-`rows` band of the signature into one join key. */
  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) { acc = (acc * 1000003L + sig.getLong(b * rows + r)) % P; r += 1 }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing (MOSS-style): the distinct set of per-window minima over
    * the ORDERED shingle-hash sequence (window size w). Guarantees any
    * shared run of ≥ w+n-1 tokens yields a shared fingerprint, at ~1/w
    * the density of the full shingle set. Ties keep the window minimum
    * (value-based, engine-independent). */
  def winnow(s: UTF8String, n: Int, w: Int): ArrayData = {
    val th = tokenHashes(s)
    if (th.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = th.length - n + 1
    val sh = new Array[Long](m) // ordered (non-distinct) shingle sequence
    var i = 0
    while (i < m) {
      var acc = th(i)
      var j = 1
      while (j < n) { acc = (acc * 131 + th(i + j)) % P; j += 1 }
      sh(i) = acc
      i += 1
    }
    if (m <= w) {
      var mn = sh(0); i = 1
      while (i < m) { if (sh(i) < mn) mn = sh(i); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(mn))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= m - w) {
      var mn = sh(i)
      var j = 1
      while (j < w) { if (sh(i + j) < mn) mn = sh(i + j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Character n-gram hashes (polyHash of each length-n char window, in
    * order; optionally distinct). The char-level analog of shingleHashes
    * for language-ID profiles. */
  def charNgramHashes(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    if (str.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = str.length - n + 1
    if (!distinct) {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var acc = 0L
        var j = 0
        while (j < n) { acc = (acc * 31 + str.charAt(i + j)) % P; j += 1 }
        out(i) = acc
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < m) {
        var acc = 0L
        var j = 0
        while (j < n) { acc = (acc * 31 + str.charAt(i + j)) % P; j += 1 }
        seen.add(acc)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** SimHash over distinct tokens, packed little-endian. */
  def simhash(s: UTF8String, nBits: Int): Long = {
    val th = tokenHashes(s)
    val seen = new java.util.HashSet[java.lang.Long]()
    val votes = new Array[Int](nBits)
    var i = 0
    while (i < th.length) {
      if (seen.add(th(i))) {
        var bit = 0
        while (bit < nBits) {
          votes(bit) += (if (((th(i) >> bit) & 1L) == 1L) 1 else -1)
          bit += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < nBits) { if (votes(bit) > 0) fp |= 1L << bit; bit += 1 }
    fp
  }
}

/** text → BIGINT polynomial rolling hash (document fingerprint). */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** text → ARRAY<BIGINT> of distinct word n-gram shingle hashes. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** text → ARRAY<BIGINT> of ORDERED positional n-gram shingle hashes
  * (index = k-gram start position; non-distinct). */
case class SeqShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_seq_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.seqShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.seqShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): SeqShingleHashesExpr =
    copy(child = newChild)
}

/** text → ARRAY<FLOAT> feature-hashed embedding of dimension d. */
case class HashEmbedExpr(child: Expression, d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.hashEmbed(input.asInstanceOf[UTF8String], d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.hashEmbed($c, $d)")
  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

/** ARRAY<BIGINT> shingle hashes → ARRAY<BIGINT> k-min signature (NULL for
  * an empty shingle set). */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.HashOps.minhashSig($c, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** ARRAY<BIGINT> signature → ARRAY<BIGINT> of banded LSH join keys. */
case class BandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.bandKeys(input.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.bandKeys($c, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

/** text → BIGINT SimHash fingerprint (nBits ≤ 62). */
case class SimHashExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.simhash(input.asInstanceOf[UTF8String], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** text → ARRAY<BIGINT> winnowed fingerprint set (n-gram, window w). */
case class WinnowExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.winnow(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.winnow($c, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** text → ARRAY<BIGINT> char n-gram hashes (ordered; distinct optional). */
case class CharNgramHashesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.charNgramHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.charNgramHashes($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashesExpr =
    copy(child = newChild)
}
