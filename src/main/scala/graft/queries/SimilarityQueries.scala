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

  // ---- IVF-flat ANN: deterministic seed centroids, nprobe=1 ----------------
  // Coarse quantizer: the first NCent vectors act as centroids (seeded,
  // replayable); every vector is assigned to its max-cosine centroid
  // (tie → lower centroid id). A query probes only its own cell and
  // re-ranks exactly. At 100 TB the corpus is bucketed by cell id, so a
  // probe reads one bucket; recall grows with nprobe.
  private val NCent = 8

  def simIvfTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = broadcast(emb.filter(col("vec_id") < NCent)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec")))
    val assign = emb.crossJoin(cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        Similarity.cosine(col("embedding"), col("cent_vec")).as("ccos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    val cells = assign.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val q = cells.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"), col("cell"))
    val scored = cells.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("q_vec"), col("embedding")).as("cos"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w2)).filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }
  val simIvfTopkSql: String =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings WHERE vec_id < $NCent),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id, ${cosSql("e.embedding", "cent_vec")} AS ccos
       |  FROM embeddings e CROSS JOIN cents c
       |), cells AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT vec_id, embedding, cent_id, ccos,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
       |    FROM assign) t WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, cell FROM cells WHERE vec_id < $NQ
       |), pairs AS (
       |  SELECT q.query_id, e.vec_id, ${cosSql("qe", "e.embedding")} AS cos
       |  FROM cells e JOIN q ON e.cell = q.cell AND e.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT query_id, vec_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- embedding-cosine near-dup pairs (LSH-blocked) -----------------------
  private val DupTau = 0.42

  def dedupEmbeddingPairs(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), NPlanes).as("bucket"))
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("bucket"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= DupTau)
      .orderBy(col("id_a"), col("id_b"))
  }
  val dedupEmbeddingPairsSql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.embedding", "b.embedding")} AS cos
       |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.embedding", "b.embedding")} >= $DupTau
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------------

  val defs: Map[String, Q] = Map(
    "sim_bruteforce_topk" -> (simBruteforceTopk _),
    "sim_lsh_topk" -> (simLshTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "dedup_embedding_pairs" -> (dedupEmbeddingPairs _))

  val oracle: Map[String, String] = Map(
    "sim_bruteforce_topk" -> simBruteforceTopkSql,
    "sim_lsh_topk" -> simLshTopkSql,
    "sim_ivf_topk" -> simIvfTopkSql,
    "dedup_embedding_pairs" -> dedupEmbeddingPairsSql)
}
