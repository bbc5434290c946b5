package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k (the correctness baseline; the LSH-bucketed
  * scale path lives in graft.operators.Similarity) plus embedding near-dup
  * detection. Dot products fold left-to-right in double on both engines →
  * bit-identical cosines. */
object Vec {
  def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  /** dot(a, b) folded in double, Spark side. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
         s"cast(0 as double), (acc, v) -> acc + v)")

  /** Brute-force cosine top-3: queries = vec_id < 10, candidates = the rest.
    * Rank on rounded cosine with vec_id tie-break (deterministic across
    * engines and partitionings). */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val cos = round(
      dot("qv", "cv") / (sqrt(dot("qv", "qv")) * sqrt(dot("cv", "cv"))), 6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    q.crossJoin(broadcast(c))
      .select(col("q_id"), col("c_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  private val dotSql =
    "list_sum(list_transform(list_zip(%s, %s), p -> p[1]::DOUBLE * p[2]::DOUBLE))"

  val knnBruteSql: String = {
    val dqc = dotSql.format("q.embedding", "c.embedding")
    val dqq = dotSql.format("q.embedding", "q.embedding")
    val dcc = dotSql.format("c.embedding", "c.embedding")
    s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS c_id, embedding FROM embeddings WHERE vec_id >= 10),
      |j AS (SELECT q.q_id, c.c_id,
      |        round($dqc / (sqrt($dqq) * sqrt($dcc)), 6) AS cos
      |      FROM q CROSS JOIN c),
      |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |        ORDER BY cos DESC, c_id ASC) AS rnk FROM j)
      |SELECT q_id, c_id, cos, rnk FROM r WHERE rnk <= 3""".stripMargin
  }

  /** Embedding near-dup pairs: cosine > 0.2 over all pairs (threshold tuned
    * so the synthetic table yields a non-trivial result set). */
  def embNearDup(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    // norms precomputed once per vector (5k rows), not once per pair (12.5M)
    val a = e.select(col("vec_id").as("d1"), col("embedding").as("av"), col("label").as("l1"))
      .withColumn("na", sqrt(dot("av", "av")))
    val b = e.select(col("vec_id").as("d2"), col("embedding").as("bv"), col("label").as("l2"))
      .withColumn("nb", sqrt(dot("bv", "bv")))
    val cos = round(dot("av", "bv") / (col("na") * col("nb")), 6)
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("l1"), col("l2"), cos.as("cos"))
      .filter(col("cos") > 0.2)
  }

  val embNearDupSql: String = {
    val dab = dotSql.format("a.embedding", "b.embedding")
    val daa = dotSql.format("a.embedding", "a.embedding")
    val dbb = dotSql.format("b.embedding", "b.embedding")
    s"""SELECT a.vec_id AS d1, b.vec_id AS d2, a.label AS l1, b.label AS l2,
      |  round($dab / (sqrt($daa) * sqrt($dbb)), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round($dab / (sqrt($daa) * sqrt($dbb)), 6) > 0.2""".stripMargin
  }

  /** Per-label centroid distance: mean vector per label via posexplode →
    * per-dim mean → each vector's cosine to its label centroid, aggregated.
    * (The IVF coarse-quantizer building block.) */
  def centroidCos(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(avg(col("x").cast("double")).as("cx"))
    val centArr = cent.groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("pairs"))
      .select(col("label"), expr("transform(pairs, p -> p.cx)").as("cv"))
    val j = e.join(centArr, Seq("label"))
      .select(col("label"), col("vec_id"), col("embedding").as("ev"), col("cv"))
    val cos = dot("ev", "cv") / (sqrt(dot("ev", "ev")) * sqrt(dot("cv", "cv")))
    j.select(col("label"), col("vec_id"), cos.as("c"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("c")), 6).as("mean_cos"),
           round(min(col("c")), 6).as("min_cos"))
  }

  val centroidCosSql: String = {
    val dec = dotSql.format("e.embedding", "c.cv")
    val dee = dotSql.format("e.embedding", "e.embedding")
    val dcc = dotSql.format("c.cv", "c.cv")
    s"""WITH ex AS (SELECT label, i - 1 AS i, x::DOUBLE AS x
      |           FROM (SELECT label, unnest(embedding) AS x,
      |                        generate_subscripts(embedding, 1) AS i
      |                 FROM embeddings)),
      |cd AS (SELECT label, i, avg(x) AS cx FROM ex GROUP BY label, i),
      |c AS (SELECT label, list(cx ORDER BY i) AS cv FROM cd GROUP BY label),
      |j AS (SELECT e.label, e.vec_id,
      |        $dec / (sqrt($dee) * sqrt($dcc)) AS cos
      |      FROM embeddings e JOIN c ON e.label = c.label)
      |SELECT label, count(*)::BIGINT AS n, round(avg(cos), 6) AS mean_cos,
      |       round(min(cos), 6) AS min_cos
      |FROM j GROUP BY label""".stripMargin
  }
}
