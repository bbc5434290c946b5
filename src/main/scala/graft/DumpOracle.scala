package graft

import java.nio.file.{Files, Paths}

/** Dumps `SparkEntry.oracleSql` as JSON without starting Spark — for
  * checking that twin-SQL refactors (e.g. the Fix fixture-scale knob) leave
  * the driver-gate oracle byte-identical at the default mult=1, and for
  * previewing the scaled SQL under SPARK_GRAFT_FIX_MULT=k. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_dump.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"[dump] ${SparkEntry.oracleSql.size} oracles -> $out")
  }
}
