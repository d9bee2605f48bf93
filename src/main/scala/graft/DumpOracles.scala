package graft

import java.nio.file.{Files, Paths}

/** Dev utility: write each named oracle SQL (default: all) to
  * <outDir>/<name>.sql so the DuckDB twin can be iterated on locally
  * without a full Verify run. No Spark session needed — the oracle map
  * is pure. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/oracles")
    Files.createDirectories(Paths.get(outDir))
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.oracleSql.keys.toSeq
    names.foreach { n =>
      Files.writeString(Paths.get(s"$outDir/$n.sql"), SparkEntry.oracleSql(n))
    }
    println(s"[dump] wrote ${names.length} oracle(s) to $outDir")
  }
}
