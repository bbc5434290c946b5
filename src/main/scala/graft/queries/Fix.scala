package graft.queries

/** Fixture-scale multiplier for the oracle-pinned synthetic fixtures.
  *
  * The driver's correctness gate runs with the env unset → `mult = 1` →
  * every generator size and twin-SQL series bound is byte-identical to the
  * pinned sf0.01 contract (800 images / 120 polygons / 200 clips). Setting
  * `SPARK_GRAFT_FIX_MULT=k` scales BOTH sides of each fixture oracle —
  * the Spark generators (ImageTable/PolygonTable/AudioTable/VideoTable
  * sizes, and the shared multi-band constant) AND their DuckDB twins'
  * `generate_series` bounds — by the same k, so `tools/compare_oracle.py`
  * re-runs the strict row/schema/hash compare at k× fixture scale. This is
  * the scale-stability evidence for the 48 registry rows whose oracles are
  * fixture closed forms rather than testdata-table queries (the other 58
  * rows get their scale pass from the sf1 table fixture directly).
  *
  * Deliberately NOT scaled (their value is arithmetic depth, not size):
  * the q102/q105 cross-CRS 22-image projection chains, q85's 40-clip DFT
  * bed (naive-DFT twin cost is cubic-ish in clips×bins×samples), q90's
  * first-40-image frequency window, and q57's first-400-image resumable
  * cap (both sides pin 400 via `min(nImages, 400)` / `warpGridSql(399)`).
  */
private[graft] object Fix {
  val mult: Int = sys.env.get("SPARK_GRAFT_FIX_MULT").map(_.toInt).getOrElse(1)
  /** env SET (even to 1) → generators use the pinned oracle sizes × mult,
    * overriding the dir-name bench scaling — lets mixed queries (q97:
    * documents table × image fixture) run against an sf1 table dir with
    * the fixture side still matching its twin. */
  val pinned: Boolean = sys.env.contains("SPARK_GRAFT_FIX_MULT")
  /** ImageTable spread-grid count; twin series bound is `nImg - 1`. */
  val nImg: Int = 800 * mult
  /** PolygonTable kind-cycle count. */
  val nPoly: Int = 120 * mult
  /** Audio clips and video containers (FixtureScale.count base). */
  val nClip: Int = 200 * mult
}
