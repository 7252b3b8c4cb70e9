package graft.operators

import org.apache.spark.sql.{graftExpr, Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CosineSimExpr, SignLshBucketExpr}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shapes:
  *  - brute-force: the query set is small by construction → broadcast it;
  *    the corpus streams through one codegen'd projection (cosine kernel)
  *    and a per-query top-k. No corpus shuffle beyond the final top-k agg,
  *    which is bounded by |queries| × k.
  *  - LSH: bucket assignment is a pure projection; candidate generation is
  *    an equi-join on the bucket id (broadcast again for a small query
  *    set). At 100 TB this is the same plan with the corpus side bucketed /
  *    bucket-pruned; recall is tuned by nPlanes and multi-probe.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column =
    graftExpr.column(CosineSimExpr(graftExpr.expression(a), graftExpr.expression(b)))

  def lshBucket(v: Column, nPlanes: Int = 4): Column =
    graftExpr.column(SignLshBucketExpr(graftExpr.expression(v), nPlanes))

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Output: (query_id, vec_id, cos, rank), rank 1..k by (cos desc, id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col("q_vec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: candidates share the query's sign-LSH bucket;
    * exact cosine re-rank within the bucket. Same output shape as
    * bruteForceTopK; recall < 1 by design. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket")))
    val scored = c.join(q, "bucket")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col("q_vec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
