package graft.functions

/** timelib's conversion long tail (`timelib.py:519-580`): GPS week/ms,
  * Python ordinal (matplotlib date2num days), Matlab datenum, and
  * year+DOY→datetime — all expressed on epoch microseconds (the engine's
  * integer time axis). */
object TimeLib {
  /** GPS epoch 1980-01-06T00:00:00Z in epoch µs. */
  val GpsEpochUs: Long = 315964800L * 1000000L
  /** Python ordinal (days, ordinal 1 = 0001-01-01) of the Unix epoch. */
  val OrdEpoch1970: Double = 719163.0
  /** Matlab datenum − Python ordinal offset (`timelib.py:527-539`). */
  val MatlabOffset: Double = 366.0

  /** Local mean time at a longitude — `ul_time` `timelib.py:45-50`:
    * UTC + lon·(24/360) hours (the 15°-per-hour offset; the reference's
    * timezone-API and ephem solar variants are out of scope: network /
    * external ephemeris). */
  def ulTimeUs(utcUs: Long, lon: Double): Long =
    utcUs + math.round(lon * (24.0 / 360.0) * 3600.0 * 1e6)

  /** `gps2dt` `timelib.py:519-525`. */
  def gps2us(gpsWeek: Long, gpsMs: Double): Long =
    GpsEpochUs + gpsWeek * 604800L * 1000000L + math.round(gpsMs * 1000.0)

  /** Inverse: (gps_week, gps_ms) of an epoch-µs instant. */
  def us2gps(us: Long): (Long, Double) = {
    val d = us - GpsEpochUs
    val week = math.floorDiv(d, 604800L * 1000000L)
    (week, (d - week * 604800L * 1000000L) / 1000.0)
  }

  /** `dt2o`/`o2dt` `timelib.py:545-562` (matplotlib date2num days). */
  def us2o(us: Long): Double = us / 86400e6 + OrdEpoch1970
  def o2us(o: Double): Long = math.round((o - OrdEpoch1970) * 86400e6)

  /** `mat2dt`/`dt2mat` `timelib.py:527-542`. */
  def mat2us(o: Double): Long = o2us(o - MatlabOffset)
  def us2mat(us: Long): Double = us2o(us) + MatlabOffset

  /** `jd2dt` `timelib.py:496-503`: Julian date → epoch µs. */
  def jd2us(jd: Double): Long = math.round((jd - 2440587.5) * 86400e6)

  /** `decyear2dt` `timelib.py:473-486`: year floor + fraction × the full
    * (leap-aware) year length. */
  def decyear2us(dy: Double): Long = {
    val yr = math.floor(dy).toInt
    val jan1Day = java.time.LocalDate.of(yr, 1, 1).toEpochDay
    val nextDay = java.time.LocalDate.of(yr + 1, 1, 1).toEpochDay
    jan1Day * 86400L * 1000000L + math.round((dy - yr) * (nextDay - jan1Day) * 86400e6)
  }

  /** `doy2dt` `timelib.py:571-580`: year + (fractional, possibly >365) DOY;
    * epoch arithmetic rolls excess days over naturally, like the ordinal
    * form the reference uses. */
  def doy2us(yr: Int, doy: Double): Long = {
    val jan1Us = java.time.LocalDate.of(yr, 1, 1).toEpochDay * 86400L * 1000000L
    jan1Us + math.round((doy - 1.0) * 86400e6)
  }
}
