package graft
import org.apache.spark.sql.functions._
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    Tables.all.foreach { n => try Tables.load(spark, d, n).count() catch { case _: Throwable => () } }
    def t[A](name: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (p <- 1 to 2) {
      t(s"t_quality p$p")(operators.TextAnalysis.quality(spark, d).count())
      t(s"d_exact p$p")(operators.Dedup.exact(spark, d).count())
      t(s"p_curate p$p")(operators.Pipeline.curate(spark, d).count())
      t(s"q21 p$p")(operators.RelationalExt.q21Approx(spark, d).count())
    }
    spark.stop()
  }
}
