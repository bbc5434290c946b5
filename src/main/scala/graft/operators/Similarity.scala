package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest-neighbor search over an embedding column — the scale
  * path beside the brute-force cosine baseline (graft.queries.Vec.knnBrute).
  *
  * Random-hyperplane LSH (the classic cosine-LSH construction): project each
  * vector onto B seeded hyperplanes, pack the sign bits into a bucket key,
  * equi-join queries to candidates on the key across T independent tables,
  * union the candidate sets, and exactly re-rank by cosine. Deterministic
  * (hyperplanes from a fixed-seed PRNG keyed by (table, plane, dim)), so
  * results are stable across partitionings. Recall rises with T and falls
  * with B; tune B ≈ log2(|C|/bucket_target) so buckets stay small at scale
  * (cost: T equi-joins instead of one O(|Q|·|C|) cross join). */
object Similarity {
  /** Deterministic hyperplane component ~ N(0,1) via Box–Muller on a
    * splitmix-style hash of (table, plane, dim). `private[graft]` so the
    * q93 oracle twin can embed the SAME components as string-cast DuckDB
    * literals (the q84 Goertzel-coefficient technique). */
  private[graft] def gauss(table: Int, plane: Int, dim: Int): Double = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // uniform in (0,1)
      ((z >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    }
    val u1 = mix(table.toLong * 1000003L + plane.toLong * 7919L + dim.toLong * 31L)
    val u2 = mix(table.toLong * 998244353L + plane.toLong * 104729L + dim.toLong * 131L)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.Pi * u2)
  }

  /** Bucket keys for one vector: one key per hash table. */
  def bucketKeys(v: Array[Float], dims: Int, tables: Int, planes: Int): Array[Long] = {
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += v(d) * gauss(t, p, d); d += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      keys(t) = (t.toLong << 32) | key   // table id disambiguates key space
      t += 1
    }
    keys
  }

  /** IVF-flat ANN: a deterministic Lloyd k-means coarse quantizer (init =
    * the nLists lowest-id candidates, fixed iteration count, centroids
    * collected to the driver each round — they are nLists×dims doubles,
    * tiny), candidates bucketed into inverted lists by nearest centroid
    * (one shuffle), queries probe their nProbe nearest centroids and exact
    * cosine re-ranks within the probed lists. The second scale path beside
    * the hyperplane-LSH bucket join (annCosine): lists grow with data while
    * probe cost stays nProbe/nLists of a full scan. Deterministic
    * end-to-end (no RNG), so results are partition-stable. */
  def ivfCosine(spark: SparkSession, queries: DataFrame, candidates: DataFrame,
                k: Int, nLists: Int = 16, nProbe: Int = 4, iters: Int = 5): DataFrame = {
    import graft.functions.VecFunctions.vecDot
    import spark.implicits._

    val cand = candidates.select(col("c_id"), col("embedding").as("cv"))
    // cache scoped to the k-means loop only (iters full passes); the final
    // assignment re-derives the narrow projection once — no leaked blocks
    val candCached = cand.cache()
    // deterministic init: the nLists lowest-id candidates
    var centroids: Array[Array[Double]] = candCached.orderBy(col("c_id")).limit(nLists)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    if (centroids.isEmpty) { // no candidates: empty result, not empty.max
      candCached.unpersist()
      return queries.select(col("q_id"), col("q_id").as("c_id"),
        lit(0.0).as("cos"), lit(0).as("rnk")).limit(0)
    }
    val dims = centroids.map(_.length).max

    def nearest(cs: Array[Array[Double]])(v: Seq[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < cv.length && i < v.length) {
          val t = v(i) - cv(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    // Lloyd step as a map-side partial fold: each task folds its rows into
    // ONE (nLists × dims) sum buffer + count vector, the driver merges the
    // per-partition partials (nLists·dims doubles each — tiny). One narrow
    // pass per iteration; no per-row UDF, no posexplode row blow-up.
    for (_ <- 0 until iters) {
      val cs = centroids
      // per-(list, dim) counts: ragged vectors contribute only to the dims
      // they carry (a whole-row count would shrink tail dims toward zero)
      val (sums, cnts) = candCached.select(col("cv")).rdd.mapPartitions { it =>
        val s = Array.fill(cs.length)(new Array[Double](dims))
        val n = Array.fill(cs.length)(new Array[Long](dims))
        it.foreach { row =>
          val v = row.getSeq[Float](0)
          val l = nearest(cs)(v)
          var i = 0
          while (i < dims && i < v.length) { s(l)(i) += v(i); n(l)(i) += 1; i += 1 }
        }
        Iterator.single((s, n))
      }.reduce { case ((s1, n1), (s2, n2)) =>
        var l = 0
        while (l < s1.length) {
          var i = 0
          while (i < dims) { s1(l)(i) += s2(l)(i); n1(l)(i) += n2(l)(i); i += 1 }
          l += 1
        }
        (s1, n1)
      }
      centroids = centroids.indices.map { l =>
        if (cnts(l).forall(_ == 0L)) centroids(l) // empty lists keep their centroid
        else Array.tabulate(dims)(i => if (cnts(l)(i) == 0) 0.0 else sums(l)(i) / cnts(l)(i))
      }.toArray
    }
    candCached.unpersist()

    val cs = centroids
    // final inverted-list assignment = the probe expression at nProbe=1:
    // ivfProbe orders by (squared distance, index), so element 1 is the
    // lowest-index argmin — the exact tie-break of the `nearest` closure.
    // Keeps the projection in Tungsten rows (the RDD mapPartitions + Row
    // boxing this replaced was the last non-codegen hop in the ANN paths;
    // bit-compat gated by q94).
    val lists = cand.withColumn("list_id",
      element_at(graft.functions.AnnFunctions.ivfProbe(col("cv"), cs, 1), 1))
    // probe = codegen Expression (centroids ride as a reference object) —
    // no ScalaUDF row-conversion fence in the probe projection (the VecDot
    // pattern; bit-compat with the closure it replaced is gated by q94)
    val qk = queries.select(col("q_id"), col("embedding").as("qv"))
      .withColumn("qn", sqrt(vecDot(col("qv"), col("qv"))))
      .withColumn("list_id",
        explode(graft.functions.AnnFunctions.ivfProbe(col("qv"), cs, nProbe)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    qk.join(lists, Seq("list_id"))
      .select(col("q_id"), col("c_id"),
        (vecDot(col("qv"), col("cv")) /
         (col("qn") * sqrt(vecDot(col("cv"), col("cv"))))).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** ANN top-k: queries(q_id, embedding) × candidates(c_id, embedding).
    * Candidate pairs from any shared LSH bucket, exact cosine re-rank,
    * deterministic (cos desc, c_id asc) tie-break. */
  def annCosine(spark: SparkSession, queries: DataFrame, candidates: DataFrame,
                k: Int, tables: Int = 16, planes: Int = 8): DataFrame = {
    import graft.functions.VecFunctions.vecDot
    import graft.functions.AnnFunctions.lshBucketKeys
    val dims = candidates.select(size(col("embedding"))).head().getInt(0)

    // norms once per vector; the bucket join + distinct move only (id, key)
    // rows — the T-times-replicated shuffle never carries the vectors.
    // key computation = codegen Expression (hyperplanes as a codegen
    // reference object), not a ScalaUDF; bucketKeys remains the scalar
    // spec the kernel is tested bit-identical against.
    val qk = queries.select(col("q_id"), col("embedding").as("qv"))
      .withColumn("qn", sqrt(vecDot(col("qv"), col("qv"))))
    val ck = candidates.select(col("c_id"), col("embedding").as("cv"))
      .withColumn("cn", sqrt(vecDot(col("cv"), col("cv"))))
    val qb = qk.select(col("q_id"),
      explode(lshBucketKeys(col("qv"), dims, tables, planes)).as("bkey"))
    val cb = ck.select(col("c_id"),
      explode(lshBucketKeys(col("cv"), dims, tables, planes)).as("bkey"))

    val pairs = qb.join(cb, Seq("bkey"))
      .select(col("q_id"), col("c_id"))
      .distinct()   // union of bucket hits across tables
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    pairs
      .join(qk, Seq("q_id")).join(ck, Seq("c_id"))   // vectors re-attached once per pair
      .select(col("q_id"), col("c_id"),
        (vecDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Connected components over an undirected pair graph — the clustering
    * step every near-dup pipeline needs AFTER the pair join (q24/q26/q28/
    * q56/q82 emit pairs; dedup keeps one canonical doc per component).
    * Min-label propagation WITH pointer doubling: each round every node
    * takes the minimum of its own label, its neighbors' labels (one
    * equi-join + groupBy min — the standard CC shuffle shape at 100 TB),
    * and its label's label (the shortcut join — pointer doubling, the
    * public Kiveris et al. idea), so convergence takes O(log diameter)
    * rounds instead of O(diameter). Measured on the q91 fixture: the
    * 356-node LSH graph has dist-to-min 21 — plain propagation needs 21
    * rounds, doubling converges in 6. Isolated nodes keep their own id.
    *
    * Returns (id, component) with component = min id reachable. */
  def connectedComponents(spark: SparkSession, nodes: DataFrame,
                          edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    import org.apache.spark.sql.functions.{least, min => fmin}
    // symmetrize once; self-loops are harmless to min-propagation
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .cache()
    // per-round lineage MUST be truncated (localCheckpoint, eager), not
    // just cached: the shortcut self-join references the round's plan
    // twice, so an un-truncated logical plan doubles every round — Catalyst
    // analysis of the final plan OOMs the driver long before any data does
    // (measured: 6 rounds over a 356-node graph blew a 16 g heap).
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var round = 0
    var changed = 1L
    while (round < maxRounds && changed > 0) {
      // fresh exprIds for the union's second branch: both branches deriving
      // from the SAME checkpointed plan trip Catalyst's Union constraint
      // rewrite ("key not found: id#N") — createDataFrame over the already-
      // materialized RDD renumbers attributes without recomputing anything
      val labelsFresh = spark.createDataFrame(labels.rdd, labels.schema)
      val viaEdges = sym.join(labelsFresh, sym("a") === labelsFresh("id"))
        .select(col("b").as("id"), col("component"), lit(false).as("self"))
      // prop is checkpointed BEFORE the self-join: self-joining a plan that
      // contains this union trips the same constraint rewrite (observed at
      // Union.rewriteConstraints: the deduplicated branch attributes fall
      // out of the child→output map), and leaves on both join sides also
      // stop the plan from doubling. The round's PREVIOUS label rides along
      // (min over the self-tagged branch) so convergence is detected inside
      // the same materialization instead of a separate join+count job.
      val prop = labels.select(col("id"), col("component"), lit(true).as("self"))
        .unionByName(viaEdges)
        .groupBy(col("id"))
        .agg(fmin(col("component")).as("component"),
             fmin(when(col("self"), col("component"))).as("old"))
        .localCheckpoint(true)
      // shortcut: component := min(component, component(component)) —
      // labels are node ids, so the self-join always finds the row
      val propB = spark.createDataFrame(prop.rdd, prop.schema)
        .select(col("id").as("bid"), col("component").as("bcomp"))
      val nextWide = prop
        .join(propB, col("component") === col("bid"))
        .select(col("id"), least(col("component"), col("bcomp")).as("component"),
                col("old"))
      // change detection folded into the materializing pass: a task retry can
      // only OVER-count (harmless — `changed` gates on >0 and at the fixpoint
      // every task adds exactly 0), never under-count. `old` is null exactly
      // when the id first appears via an edge endpoint absent from `nodes`
      // (round 1 only — prop's output carries it into `labels` thereafter);
      // count that as changed only when it picked up a foreign label, so a
      // nodes-superset contract violation costs one extra round, not
      // maxRounds of spurious non-convergence.
      val acc = spark.sparkContext.longAccumulator(s"cc_changed_r$round")
      val nextRdd = nextWide.rdd.map { r =>
        val moved =
          if (r.isNullAt(2)) r.get(1) != r.get(0)
          else r.get(1) != r.get(2)
        if (moved) acc.add(1L)
        org.apache.spark.sql.Row(r.get(0), r.get(1))
      }
      val next = spark.createDataFrame(nextRdd,
        org.apache.spark.sql.types.StructType(nextWide.schema.fields.take(2)))
        .localCheckpoint(true)
      changed = acc.value
      labels = next
      round += 1
    }
    sym.unpersist()
    // non-convergence must be LOUD: returning partial labels silently
    // corrupts every downstream dedup decision. With the doubling shortcut
    // the default 25 rounds covers diameter ~2^24 — this only fires on a
    // caller-supplied maxRounds that is genuinely too small.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds ($changed labels still moving)")
    labels
  }
}
