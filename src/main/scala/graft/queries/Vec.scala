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

  /** dot(a, b) — codegen'd left-to-right double fold (graft.functions.VecDot),
    * bit-identical to the interpreted `aggregate(zip_with(...))` form and to
    * DuckDB's `list_sum(list_transform(...))`. */
  def dot(a: String, b: String): Column =
    graft.functions.VecFunctions.vecDot(col(a), col(b))

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
    * so the synthetic table yields a non-trivial result set).
    *
    * Shape: an exact threshold join at cos > 0.2 means angle < 78.5° — a cap
    * so wide that no LSH/blocking scheme can bound the candidate set (the
    * qualifying pairs in the synthetic table go down to cos = 0.200019, and
    * max pair cosine is ~0.6: the data has no clusters for buckets to
    * exploit). The output itself can be Ω(n²), so the honest scale shape is
    * the classic block-pair theta-join (1-bucket-theta): assign each vector
    * to one of B blocks, broadcast the B(B+1)/2 unordered block pairs onto
    * both sides, and equi-join on (bi, bj). Every vector ships ~B/2 times
    * (B ≈ √(2·parallelism) keeps replication at √P), work is evenly spread
    * over B(B+1)/2 hash-join groups, and the plan is a pure
    * BroadcastHashJoin → ShuffledHashJoin pipeline — no
    * BroadcastNestedLoopJoin, no driver collect. For genuinely clustered
    * embeddings at high thresholds (real near-dup), route through the LSH
    * bucket join instead (graft.operators.Similarity.annCosine / q59). */
  def embNearDup(s: SparkSession, d: String): DataFrame = {
    val nBlocks = 8 // ≈ √(2·32 partitions): replication ~B/2 per side
    val e = emb(s, d)
      .withColumn("bid", pmod(col("vec_id"), lit(nBlocks)).cast("int"))
      .withColumn("nrm", sqrt(dot("embedding", "embedding"))) // once per vector, not per pair
    val tasks = s.createDataFrame(
      for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j))
      .toDF("bi", "bj")
    val a = e.join(broadcast(tasks), col("bid") === col("bi"))
      .select(col("bi"), col("bj"), col("vec_id").as("ad"), col("embedding").as("av"),
              col("label").as("al"), col("nrm").as("an"))
    val b = e.join(broadcast(tasks), col("bid") === col("bj"))
      .select(col("bi"), col("bj"), col("vec_id").as("bd"), col("embedding").as("bv"),
              col("label").as("bl"), col("nrm").as("bn"))
    val cos = round(dot("av", "bv") / (col("an") * col("bn")), 6)
    a.join(b, Seq("bi", "bj"))
      // intra-block pairs appear (x,y) and (y,x); cross-block pairs once
      .filter(col("bi") =!= col("bj") || col("ad") < col("bd"))
      .select(col("ad"), col("bd"), col("al"), col("bl"), cos.as("cos"))
      .filter(col("cos") > 0.2)
      // emit with d1 < d2 regardless of block orientation (cos is symmetric)
      .select(least(col("ad"), col("bd")).as("d1"),
              greatest(col("ad"), col("bd")).as("d2"),
              when(col("ad") < col("bd"), col("al")).otherwise(col("bl")).as("l1"),
              when(col("ad") < col("bd"), col("bl")).otherwise(col("al")).as("l2"),
              col("cos"))
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
