package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ANN top-1 recall vs brute force is high; results deterministic") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val c = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("c_id"), col("embedding"))

    val ann = Similarity.annCosine(spark, q, c, k = 1, tables = 16, planes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute-force top-1
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
           s"cast(0 as double), (acc, v) -> acc + v)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    val brute = q.select(col("q_id"), col("embedding").as("qv"))
      .crossJoin(c.select(col("c_id"), col("embedding").as("cv")))
      .select(col("q_id"), col("c_id"),
        (dot("qv", "cv") / (sqrt(dot("qv", "qv")) * sqrt(dot("cv", "cv")))).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val hits = brute.count { case (qid, cid) => ann.get(qid).contains(cid) }
    assert(ann.size == 20)
    assert(hits >= 14, s"recall $hits/20 too low")   // ~93% expected @ 16 tables x 4 planes

    // determinism across partitioning
    val ann2 = Similarity.annCosine(spark, q.repartition(7), c.repartition(3),
        k = 1, tables = 16, planes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann == ann2)
  }

  test("IVF ANN: high top-1 recall vs brute force; partition-stable") {
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val c = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("c_id"), col("embedding"))
    val ivf = Similarity.ivfCosine(spark, q, c, k = 1, nLists = 8, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.size == 20)

    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
           s"cast(0 as double), (acc, v) -> acc + v)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    val brute = q.select(col("q_id"), col("embedding").as("qv"))
      .crossJoin(c.select(col("c_id"), col("embedding").as("cv")))
      .select(col("q_id"), col("c_id"),
        (dot("qv", "cv") / (sqrt(dot("qv", "qv")) * sqrt(dot("cv", "cv")))).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = brute.count { case (qid, cid) => ivf.get(qid).contains(cid) }
    assert(hits >= 12, s"IVF recall $hits/20 too low") // probing half the lists

    val ivf2 = Similarity.ivfCosine(spark, q.repartition(5), c.repartition(9),
        k = 1, nLists = 8, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == ivf2)
  }

  test("bucket keys are deterministic and table-disambiguated") {
    val v = Array.fill(64)(0.5f)
    val k1 = Similarity.bucketKeys(v, 64, 4, 12)
    val k2 = Similarity.bucketKeys(v, 64, 4, 12)
    assert(k1.sameElements(k2))
    assert(k1.map(_ >> 32).toSet.size == 4)   // distinct table ids
  }

  test("connected components: chain + triangle + isolate, in O(log d) rounds") {
    import spark.implicits._
    // a 16-node chain (diameter 15), a triangle, and an isolated node
    val chain = (0 until 15).map(i => (f"c$i%02d", f"c${i + 1}%02d"))
    val tri = Seq(("t0", "t1"), ("t1", "t2"), ("t0", "t2"))
    val edges = (chain ++ tri).toDF("a", "b")
    val nodes = ((0 to 15).map(i => f"c$i%02d") ++ Seq("t0", "t1", "t2", "lonely"))
      .toDF("id")
    val cc = Similarity.connectedComponents(spark, nodes, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 to 15).foreach(i => assert(cc(f"c$i%02d") == "c00"))
    Seq("t0", "t1", "t2").foreach(n => assert(cc(n) == "t0"))
    assert(cc("lonely") == "lonely")
    // doubling bound: a diameter-15 chain must converge well under 15 rounds
    val few = Similarity.connectedComponents(spark, nodes, edges, maxRounds = 6)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(few == cc, "pointer doubling should close a 15-chain within 6 rounds")
    // and an impossible round budget fails LOUDLY, never silently partial
    intercept[IllegalStateException] {
      Similarity.connectedComponents(spark, nodes, edges, maxRounds = 1)
    }
  }

  test("CC: edge endpoints absent from nodes join on first propagation, converge early") {
    import spark.implicits._
    val nodes = Seq("a", "b").toDF("id")
    val edges = Seq(("a", "x"), ("x", "y"), ("b", "b2")).toDF("a", "b")
    // x/y/b2 violate the nodes-superset contract; they must still label
    // correctly and NOT poison convergence detection (regression: a null
    // previous-label must not count as changed forever)
    val cc = Similarity.connectedComponents(spark, nodes, edges, maxRounds = 6)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "x" -> "a", "y" -> "a", "b" -> "b", "b2" -> "b"))
  }

  test("LshBucketKeys/IvfProbe expressions: bit-identical to the scalar spec, no ScalaUDF in plan") {
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 4f))
    }
    val df = vecs.toDF("q_id", "embedding")
    // expression output == Similarity.bucketKeys for every vector
    val got = df.select(col("q_id"),
        graft.functions.AnnFunctions.lshBucketKeys(col("embedding"), 16, 4, 8).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == Similarity.bucketKeys(v, 16, 4, 8).toSeq, s"id $id")
    }
    // probe expression == the (dist, idx)-sorted take-nProbe spec
    val cs = Array.tabulate(5)(c => Array.tabulate(16)(d => (c * d % 7).toDouble / 3))
    val probes = df.select(col("q_id"),
        graft.functions.AnnFunctions.ivfProbe(col("embedding"), cs, 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    vecs.foreach { case (id, v) =>
      val want = cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < cs(c).length && i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        (d, c)
      }.sorted.take(3).map(_._2)
      assert(probes(id) == want, s"id $id")
    }
    // the ANN operator plans carry no ScalaUDF (codegen Expressions only)
    val ann = Similarity.annCosine(spark, df, df.toDF("c_id", "embedding"), k = 2)
    assert(!ann.queryExecution.executedPlan.toString.contains("UDF"),
      "annCosine plan must not contain ScalaUDF")
    val ivf = Similarity.ivfCosine(spark, df, df.toDF("c_id", "embedding"), k = 2, nLists = 4)
    assert(!ivf.queryExecution.executedPlan.toString.contains("UDF"),
      "ivfCosine plan must not contain ScalaUDF")
    // the inverted-list assignment is the nProbe=1 probe expression, not
    // an RDD mapPartitions: no ExistingRDD scan anywhere in the plan
    assert(!ivf.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "ivfCosine lists side must stay in Tungsten rows (no RDD scan node)")
  }
}
