package graft.tools

/** Print one declared oracle's SQL (or dump ALL to a JSON file with
  * `--all <path>`): lets the DuckDB side of a single oracle be iterated
  * without a full Verify round-trip. Usage:
  *   runMain graft.tools.PrintOracle <queryName>
  *   runMain graft.tools.PrintOracle --all <outJson>
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--all")) {
      val m = graft.SparkEntry.oracleSql
      // one escaper for every oracle-JSON emitter (ADVICE r9 #4): the
      // ad-hoc version here missed \r and other control chars, emitting
      // JSON the strict round-trip consumers reject
      val body = m.toSeq.sortBy(_._1).map { case (k, v) =>
        s""" ${graft.Verify.jsonStr(k)}: ${graft.Verify.jsonStr(v)}""" }
        .mkString("{\n", ",\n", "\n}")
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        body.getBytes("UTF-8"))
      println(s"wrote ${m.size} oracles to ${args(1)}")
    } else println(graft.SparkEntry.oracleSql.getOrElse(args(0),
      sys.error(s"no oracle for '${args(0)}'")))
}
