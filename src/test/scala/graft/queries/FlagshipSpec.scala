package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TestSpark
import graft.sources.SnapshotTable

/** q97 kill-resume: the flagship training pipeline must resume after losing
  * a stage — recomputing ONLY the missing stage (the loadstack
  * recompute-only-missing contract, malib.py:482-542) — and re-produce the
  * identical keeper manifest through the snapshot catalog. */
class FlagshipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("kill-resume: losing the final stage recomputes only that stage; keeper set identical") {
    val root = s"/tmp/graft_flagship_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val (p1, v1) = Flagship.runStages(spark, sfDir, root)
      assert(p1.computed.toSet == Set("docs_filtered", "text_pairs",
        "text_keepers", "image_keepers", "keepers"))
      val keep1 = SnapshotTable.read(spark, s"$root/snap", asOf = v1)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(keep1.nonEmpty)

      // simulate a crash that lost the LAST stage's output mid-write
      SnapshotTable.deleteRecursively(s"$root/stages/keepers")
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$root/stages/keepers_lineage.json"))

      val (p2, v2) = Flagship.runStages(spark, sfDir, root)
      assert(p2.computed.toSeq == Seq("keepers"),
        s"resume must recompute ONLY the lost stage, got ${p2.computed}")
      assert(v2 == v1 + 1) // the resume run commits a fresh snapshot version
      val keep2 = SnapshotTable.read(spark, s"$root/snap", asOf = v2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(keep2 == keep1, "resumed keeper manifest must be identical")

      // an untouched re-run reuses every stage
      val (p3, _) = Flagship.runStages(spark, sfDir, root)
      assert(p3.computed.isEmpty, s"clean resume recomputed ${p3.computed}")
    } finally SnapshotTable.deleteRecursively(root)
  }

  test("trainingPipeline returns a LAZY snapshot read — parquet scan, not a collected LocalRelation") {
    val out = Flagship.trainingPipeline(spark, sfDir)
    val plan = out.queryExecution.executedPlan
    assert(!plan.toString.contains("LocalTableScan"),
      s"keeper manifest must not be collected to the driver:\n$plan")
    assert(plan.collectLeaves().exists(_.toString.toLowerCase.contains("parquet")),
      s"expected a parquet file scan leaf:\n$plan")
    assert(out.count() > 0)
  }

  test("keeper manifest is consistent: every kind tagged, doc keepers ⊆ filtered docs") {
    val out = Flagship.trainingPipeline(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toSet.subsetOf(Set("doc", "img")))
    val docIds = Flagship.filteredDocs(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0).toString).toSet
    val docKeepers = out.collect { case ("doc", id) => id }
    assert(docKeepers.nonEmpty && docKeepers.forall(docIds))
    // keepers are unique
    assert(out.distinct.length == out.length)
  }
}
