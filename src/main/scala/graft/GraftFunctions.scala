package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL registration of graft's native expressions, so `spark.sql` users
  * get them alongside the Column API:
  *
  *   SELECT djb2(token), minhash_sig(shingles), dot_product(a, b) ...
  *
  * Two entry points:
  *  - [[GraftExtensions]]: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (cluster deploys — functions present in every new session), and
  *  - [[GraftFunctions.register]]: imperative registration on an already
  *    running session (notebooks, the driver harness).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "djb2" -> (es => Djb2(es.head)),
    "djb2_partition" -> (es => Djb2Partition(es.head, es(1).eval().asInstanceOf[Int])),
    "word_shingles" -> (es => WordShingles(es.head, es(1).eval().asInstanceOf[Int],
      if (es.length > 2) es(2).eval().asInstanceOf[Boolean] else true)),
    "minhash_sig" -> (es => MinHashSig(es.head)),
    "band_hashes" -> (es => BandHashes(es.head, es(1).eval().asInstanceOf[Int])),
    "est_jaccard" -> (es => EstJaccard(es.head, es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "dot_product" -> (es => DotProduct(es.head, es(1))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  private[graft] def injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    fns.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
    }
}

/** Plug-in for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach(e.injectFunction)
}
