package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *   - brute-force cosine top-k: the exactness baseline. All vector math is
  *     done in DOUBLE via codegen'd higher-order functions (zip_with +
  *     aggregate) — no UDFs. Output is (query, neighbor, rank): ranks are
  *     stable because random embeddings never produce sub-1e-12 similarity
  *     ties, while raw doubles would differ between engines in the last bit.
  *   - IVF-style bucketed ANN: coarse quantization by nearest of 8 data-derived
  *     centroids (the first 8 vectors), then top-k *within the probe bucket*.
  *     This is the 100 TB path: assignment is a broadcast map-side transform,
  *     the search join is blocked on the bucket id, never all-pairs.
  *
  * Queries are the vectors with vec_id < 10 (self excluded).
  */
object SimilarityQueries {

  private val toDouble = "transform(embedding, x -> CAST(x AS DOUBLE))"
  private def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
  private def norm(a: String): String = s"sqrt(${dot(a, a)})"

  /** Brute-force cosine top-k (k=5) for 10 query vectors. */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings").selectExpr("vec_id", s"$toDouble AS v")
    val queries = emb.filter(col("vec_id") < 10)
      .selectExpr("vec_id AS query_id", "v AS qv")
    val sims = broadcast(queries).join(emb, col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"${dot("qv", "v")} / (${norm("qv")} * ${norm("v")}) AS sim")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
  }

  /** IVF-bucketed ANN: assign every vector to its nearest coarse centroid
    * (max dot over the 8 centroid vectors, lowest id wins ties), then rank
    * neighbors within the query's own bucket.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings").selectExpr("vec_id", s"$toDouble AS v")
    val centroids = emb.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS cid", "v AS cv")
    // bucket assignment: max-dot centroid, deterministic tiebreak on cid
    val assigned = emb.crossJoin(broadcast(centroids))
      .selectExpr("vec_id", "v", "cid", s"${dot("v", "cv")} AS score")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cid").asc)))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cid").as("bucket"))
    val queries = assigned.filter(col("vec_id") < 10)
      .selectExpr("vec_id AS query_id", "v AS qv", "bucket")
    val sims = broadcast(queries)
      .join(assigned, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "bucket", "vec_id AS neighbor_id",
        s"${dot("qv", "v")} / (${norm("qv")} * ${norm("v")}) AS sim")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("bucket").cast("long").as("bucket"),
        col("neighbor_id"), col("rk"))
  }

  /** Array-column surface: dimension, element extraction, label. */
  def embStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").selectExpr(
      "vec_id", "size(embedding) AS dim",
      "element_at(embedding, 1) AS e1", "element_at(embedding, 64) AS e64",
      "label")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> annBruteForce,
    "ann_ivf" -> annIvf,
    "emb_stats" -> embStats,
  )

  private val duckV = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"

  val oracleSql: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, $duckV AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |sims AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |    ${duckDot("qv", "v")} / (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("v", "v")})) AS sim
         |  FROM q JOIN e ON e.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, rk FROM (
         |  SELECT query_id, neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rk
         |  FROM sims) t WHERE rk <= 5""".stripMargin,
    "ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, $duckV AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |assigned AS (
         |  SELECT vec_id, v, cid AS bucket FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckDot("e.v", "c.cv")} DESC, c.cid ASC) AS rk
         |    FROM e CROSS JOIN c) t WHERE rk = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM assigned WHERE vec_id < 10),
         |sims AS (
         |  SELECT q.query_id, q.bucket, a.vec_id AS neighbor_id,
         |    ${duckDot("qv", "a.v")} / (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("a.v", "a.v")})) AS sim
         |  FROM q JOIN assigned a ON a.bucket = q.bucket AND a.vec_id <> q.query_id)
         |SELECT query_id, CAST(bucket AS BIGINT) AS bucket, neighbor_id, rk FROM (
         |  SELECT query_id, bucket, neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rk
         |  FROM sims) t WHERE rk <= 5""".stripMargin,
    "emb_stats" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS e1, embedding[64] AS e64, label
        |FROM embeddings""".stripMargin,
  )
}
