package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Training-data pipeline pack, part 2: similarity search over the
  * `embeddings` table (vec_id, embedding ARRAY<FLOAT>, label).
  *
  * Oracle determinism: the cosine kernel widens each float to double and
  * sums products sequentially; the DuckDB twin uses list_reduce (a left
  * fold) over the same index order, so the doubles are bitwise identical
  * and row_number ranking agrees exactly. */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  /** queries = vec_id < 10 (10 query vectors), k = 5. */
  private val K = 5
  private val NQ = 10
  private val NPlanes = 4

  /** DuckDB sequential dot product of two list columns as doubles. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x + y)"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / NULLIF(sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}), 0)"

  /** Sign-LSH bucket id of an embedding column (LCG plane weights). */
  private def bucketSql(v: String): String =
    s"""list_reduce(list_transform(range(0, $NPlanes), j ->
       |    CASE WHEN list_reduce(list_transform(range(1, len($v)+1),
       |      i -> CAST((1103515245*(j*100003 + i) + 12345) % 1000003 - 500001 AS DOUBLE) * CAST($v[i] AS DOUBLE)),
       |      (x,y) -> x + y) > 0
       |    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END), (x,y) -> x + y)""".stripMargin

  // ---- exact brute-force cosine top-k --------------------------------------
  def simBruteforceTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }
  val simBruteforceTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $NQ),
       |pairs AS (
       |  SELECT q.query_id, e.vec_id, ${cosSql("qe", "e.embedding")} AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT query_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- LSH-bucketed ANN top-k ----------------------------------------------
  def simLshTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, NPlanes)
      .orderBy(col("query_id"), col("rank"))
  }
  val simLshTopkSql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < $NQ),
       |pairs AS (
       |  SELECT q.query_id, e.vec_id, ${cosSql("qe", "e.embedding")} AS cos
       |  FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT query_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------------

  val defs: Map[String, Q] = Map(
    "sim_bruteforce_topk" -> (simBruteforceTopk _),
    "sim_lsh_topk" -> (simLshTopk _))

  val oracle: Map[String, String] = Map(
    "sim_bruteforce_topk" -> simBruteforceTopkSql,
    "sim_lsh_topk" -> simLshTopkSql)
}
