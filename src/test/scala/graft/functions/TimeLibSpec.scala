package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Srs

class TimeLibSpec extends AnyFunSuite {
  test("GPS week/ms conversions (gps2dt timelib.py:519-525)") {
    assert(TimeLib.gps2us(0, 0.0) == 315964800L * 1000000L) // 1980-01-06
    // 2000 full weeks later = 2018-05-06T00:00Z
    val us = TimeLib.gps2us(2000, 0.0)
    assert(us == (315964800L + 2000L * 604800L) * 1000000L)
    // round trip incl. sub-second ms
    val t = TimeLib.gps2us(2145, 345600123.0)
    val (w, ms) = TimeLib.us2gps(t)
    assert(w == 2145 && math.abs(ms - 345600123.0) < 1e-6)
  }

  test("Python ordinal / Matlab datenum (dt2o/mat2dt timelib.py:527-562)") {
    assert(TimeLib.us2o(0L) == 719163.0)                   // 1970-01-01
    assert(TimeLib.o2us(719163.5) == 43200L * 1000000L)    // noon that day
    assert(TimeLib.us2mat(0L) == 719529.0)                 // Matlab datenum epoch offset
    assert(TimeLib.o2us(TimeLib.us2o(1705276800000000L)) == 1705276800000000L)
    assert(TimeLib.mat2us(TimeLib.us2mat(86400000000L)) == 86400000000L)
  }

  test("doy2dt handles leap years, fractions, and day overflow (timelib.py:571-580)") {
    def dt(y: Int, m: Int, d: Int, h: Int = 0): Long =
      java.time.LocalDateTime.of(y, m, d, h, 0).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(TimeLib.doy2us(2024, 60.5) == dt(2024, 2, 29, 12)) // leap: doy 60 = Feb 29
    assert(TimeLib.doy2us(2023, 60.0) == dt(2023, 3, 1))      // non-leap: Mar 1
    assert(TimeLib.doy2us(2023, 400.0) == dt(2024, 2, 4))     // >365 rolls over
  }

  test("jd2dt / decyear2dt inverses (timelib.py:473-503)") {
    assert(TimeLib.jd2us(2440587.5) == 0L)                 // 1970-01-01
    assert(TimeLib.jd2us(2440588.0) == 43200L * 1000000L)
    assert(TimeLib.decyear2us(2024.0) ==
      java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L * 1000000L)
    // 2024 is leap: mid-year = jan1 + 183 days
    assert(TimeLib.decyear2us(2024.5) ==
      (java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L + 183L * 86400L) * 1000000L)
  }

  test("dd2dm faithful to the reference's form (geolib.py:286-291)") {
    val (d, m, s) = Srs.dd2dm(-12.5125)
    assert(d == -12.0)
    assert(math.abs(s - 45.0) < 1e-9)
    assert(math.abs(m - (30.0 + 45.0 / 3600.0)) < 1e-9) // sic: reference uses s/3600
  }

  test("ul_time: 15 degrees of longitude = one hour (timelib.py:45-50)") {
    val noon = 1704110400000000L // 2024-01-01T12:00:00Z
    assert(TimeLib.ulTimeUs(noon, 0.0) == noon)
    assert(TimeLib.ulTimeUs(noon, 15.0) == noon + 3600L * 1000000L)
    assert(TimeLib.ulTimeUs(noon, -122.42) ==
      noon + math.round(-122.42 * (24.0 / 360.0) * 3600.0 * 1e6))
  }
}
