package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.AudioTable
import graft.operators.Audio

/** Audio-modality queries (q83-q85): the third leg of the multimodal
  * contract next to images (q53/q54/q78/q81) and video frames (q55).
  * Payloads are PCM16-LE binary columns decoded in typed map stages; the
  * synthetic waveforms are integer closed forms (AudioTable), so the DuckDB
  * twins replay the decode→feature chains exactly. */
/** The ONE scale rule for synthetic modality fixtures (audio clips, video
  * containers): fixed 200 everywhere the oracle twins' generate_series(0,
  * 199) must match (the driver gate at sf0.01 AND ad-hoc small dirs), 2000
  * only on the sf0.1 bench path. Shared so the audio and video contracts
  * cannot silently diverge. */
private[queries] object FixtureScale {
  def count(d: String): Int =
    if (Fix.pinned) Fix.nClip // fixture-scale oracle pass (see Fix.scala)
    else if (d.contains("sf1")) 20000
    else if (d.contains("sf0.1")) 2000 else 200
}

object Aud {
  /** Oracle contract: featuresSql/goertzelSql are generated over
    * clipSql(Fix.nClip - 1) — 200 clips at the default mult=1, so every dir
    * except the sf0.1 bench path uses exactly 200 and the twins agree at
    * sf0.01 (the driver's gate) AND any ad-hoc small dir (e.g. the verify
    * recipe's sf0.001). Only the bench (or SPARK_GRAFT_FIX_MULT) scales. */
  def nClips(d: String): Int = FixtureScale.count(d)

  /** q83 — time-domain features over PCM16 payloads; every value a fixed
    * chain of correctly-rounded ops on exact integer sums. */
  def features(s: SparkSession, d: String): DataFrame =
    Audio.features(s, AudioTable.generate(s, nClips(d)))

  /** Shared closed-form clip/sample CTEs (c → smp): the AudioTable.sample
    * integer arithmetic, verbatim. */
  private def clipSql(hi: Int): String =
    s"""c AS (SELECT i, printf('aud_%07d', i) AS audio_id,
       |        16 + (i % 13) * 4 AS p
       |      FROM generate_series(0, $hi) t(i)),
       |smp AS (SELECT c.i, c.audio_id, c.p, g.t,
       |        (abs(2 * (g.t % c.p) - c.p) * 2 - c.p) * 400
       |          + ((g.t * (7 + c.i % 5) + c.i) % 17 - 8) AS v
       |      FROM c, generate_series(0, 1023) g(t))""".stripMargin

  val featuresSql: String =
    s"""WITH ${clipSql(Fix.nClip - 1)},
       |lagd AS (SELECT audio_id, v,
       |           lag(v) OVER (PARTITION BY audio_id ORDER BY t) AS pv
       |         FROM smp),
       |z AS (SELECT audio_id,
       |        coalesce(sum(CASE WHEN pv::BIGINT * v < 0 THEN 1 END), 0)::BIGINT
       |          AS zero_crossings
       |      FROM lagd GROUP BY audio_id),
       |f AS (SELECT audio_id, 8000::INT AS sr, 1024::INT AS n_samples,
       |        max(abs(v))::BIGINT AS peak,
       |        CAST(sum(v) AS DOUBLE) / 1024 AS mean,
       |        sqrt(CAST(sum(v::BIGINT * v) AS DOUBLE) / 1024) AS rms
       |      FROM smp GROUP BY audio_id)
       |SELECT f.*, z.zero_crossings FROM f JOIN z USING (audio_id)""".stripMargin

  /** q84 — Goertzel spectral probe at bins {16, 32, 64}. The per-sample
    * recursion replays bit-exactly in a DuckDB recursive CTE (the q80
    * Butterworth technique); coefficients are interpolated from the SAME
    * runtime values the Spark plan uses, string-cast for a correctly-rounded
    * IEEE parse (DuckDB DECIMAL literals can land 1 ulp off). */
  val GoertzelBins: Seq[Int] = Seq(16, 32, 64)

  def goertzel(s: SparkSession, d: String): DataFrame =
    Audio.goertzel(s, AudioTable.generate(s, nClips(d)), GoertzelBins)

  val goertzelSql: String = {
    def f(x: Double) = s"CAST('${x.toString}' AS DOUBLE)"
    val rows = GoertzelBins
      .map(k => s"(${k}, ${f(Audio.goertzelCoeff(k, AudioTable.N))})")
      .mkString(", ")
    s"""WITH RECURSIVE ${clipSql(Fix.nClip - 1)},
       |kc AS (SELECT * FROM (VALUES $rows) kc(k, cf)),
       |st AS (
       |  SELECT s.i, s.audio_id, kc.k, kc.cf, s.t,
       |         (s.v + kc.cf * 0.0::DOUBLE) - 0.0::DOUBLE AS s1,
       |         0.0::DOUBLE AS s2
       |  FROM smp s, kc WHERE s.t = 0
       |  UNION ALL
       |  SELECT s.i, s.audio_id, w.k, w.cf, s.t,
       |         (s.v + w.cf * w.s1) - w.s2,
       |         w.s1
       |  FROM st w JOIN smp s ON s.i = w.i AND s.t = w.t + 1)
       |SELECT audio_id, k::INT AS k,
       |  ((s1 * s1) + (s2 * s2)) - ((cf * s1) * s2) AS power
       |FROM st WHERE t = 1023""".stripMargin
  }

  /** q85 — FFT dominant bin on a fixed 40-clip fixture (fixture oracle, the
    * q40/q63 precedent): the radix-2 FFT's argmax over |X[k]|², 1 ≤ k < N/2,
    * must agree with DuckDB's naive-DFT argmax. Integer output makes the
    * cross-engine compare robust to ≤1-ulp transcendental differences (the
    * leakage peaks are isolated by construction). */
  def fftDominant(s: SparkSession, d: String): DataFrame =
    Audio.dominantBin(s, AudioTable.generate(s, 40))

  val fftDominantSql: String =
    s"""WITH ${clipSql(39)},
       |mag AS (SELECT s.audio_id, kk.k,
       |    pow(sum(s.v * cos(2 * pi() * kk.k * s.t / 1024.0)), 2)
       |    + pow(sum(s.v * sin(2 * pi() * kk.k * s.t / 1024.0)), 2) AS m2
       |  FROM smp s, generate_series(1, 511) kk(k)
       |  GROUP BY s.audio_id, kk.k)
       |SELECT audio_id, k::INT AS dom_bin
       |FROM (SELECT *, row_number() OVER (PARTITION BY audio_id
       |        ORDER BY m2 DESC, k ASC) AS rn FROM mag)
       |WHERE rn = 1""".stripMargin
}
