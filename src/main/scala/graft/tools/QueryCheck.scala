package graft.tools

import java.nio.file.{Files, Paths}

/** Dev loop: dump ONLY the named queries (plus a filtered
  * oracle_sql.json) so tools/oracle_check.py can compare a single new
  * query without re-running the whole Verify suite.
  *
  *   sbt "runMain graft.tools.QueryCheck /root/testdata/sf0.01 /tmp/qc q_dedup_resolve"
  *   python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/qc
  */
object QueryCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    require(names.nonEmpty, "pass at least one query name")
    val unknown = names -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.pipeline.GraftSession.build(8, "graft-querycheck")
    new java.io.File(outDir).mkdirs()
    for (name <- names.toSeq.sorted) {
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[querycheck] wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
