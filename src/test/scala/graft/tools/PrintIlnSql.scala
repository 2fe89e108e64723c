package graft.tools

/** Dev aid: print the DuckDB twin of IntLn.iln1e9 for ad-hoc validation
  * against DuckDB (tools/check.py runs the real gate). */
object PrintIlnSql {
  def main(args: Array[String]): Unit =
    println(graft.functions.IntLn.iln1e9Sql(args.headOption.getOrElse("n")))
}
