package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector kernels over ARRAY<FLOAT> embedding columns.
  *
  * Determinism contract with the DuckDB oracle: every float element is
  * widened to double (exact), products are summed SEQUENTIALLY in index
  * order (DuckDB side uses list_reduce, which is a left fold), and the
  * LSH plane weights are integers from an explicit LCG formula — so both
  * engines produce bitwise-identical doubles. */
object VecOps {

  /** Cosine similarity; null when either norm is zero. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** Sign-LSH bucket id: bit j set iff dot(plane_j, v) > 0. Plane weights
    * are the LCG w(j,i) = (1103515245*(j*100003 + i + 1) + 12345) mod
    * 1000003 - 500001 — integers, exact in doubles. */
  def signLshBucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val w = ((1103515245L * (j.toLong * 100003L + i + 1) + 12345L) % 1000003L - 500001L).toDouble
        dot += w * v.getFloat(i).toDouble
        i += 1
      }
      if (dot > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Banded sign-LSH: `nBands` independent keys, band t built from planes
    * g = t*planesPerBand .. t*planesPerBand+planesPerBand-1 of the SAME
    * global LCG plane family as [[signLshBucket]] (band 0 with p planes ==
    * signLshBucket(v, p)). Two vectors are near-dup CANDIDATES iff they
    * share ≥1 band key — the banding trick MinHash-LSH uses, applied to
    * sign-LSH: per-band collision prob is (1-θ/π)^p, overall
    * 1-(1-(1-θ/π)^p)^b, so p controls bucket size (2^p buckets/band must
    * grow ~log₂ n) and b buys recall back independently. */
  def signLshBandKeys(v: ArrayData, nBands: Int, planesPerBand: Int): ArrayData = {
    val n = v.numElements()
    val keys = new Array[Long](nBands)
    var t = 0
    while (t < nBands) {
      var key = 0L
      var j = 0
      while (j < planesPerBand) {
        val g = t.toLong * planesPerBand + j
        var dot = 0.0
        var i = 0
        while (i < n) {
          val w = ((1103515245L * (g * 100003L + i + 1) + 12345L) % 1000003L - 500001L).toDouble
          dot += w * v.getFloat(i).toDouble
          i += 1
        }
        if (dot > 0) key |= 1L << j
        j += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
}

/** (ARRAY<FLOAT>, ARRAY<FLOAT>) → DOUBLE cosine similarity (NULL for a
  * zero-norm side). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""java.lang.Double $tmp = graft.functions.VecOps.cosine($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** ARRAY<FLOAT> → ARRAY<BIGINT>: one sign-LSH key per band (see
  * [[VecOps.signLshBandKeys]]). */
case class SignLshBandKeysExpr(child: Expression, nBands: Int, planesPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    VecOps.signLshBandKeys(input.asInstanceOf[ArrayData], nBands, planesPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.signLshBandKeys($c, $nBands, $planesPerBand)")
  override protected def withNewChildInternal(newChild: Expression): SignLshBandKeysExpr =
    copy(child = newChild)
}

/** ARRAY<FLOAT> → BIGINT sign-LSH bucket id over nPlanes hyperplanes. */
case class SignLshBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override protected def nullSafeEval(input: Any): Any =
    VecOps.signLshBucket(input.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.signLshBucket($c, $nPlanes)")
  override protected def withNewChildInternal(newChild: Expression): SignLshBucketExpr =
    copy(child = newChild)
}
