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

  /** Scalar config arguments (partition counts, shingle k, band rows)
    * must be literals; fail with a descriptive error instead of a
    * ClassCastException/NPE when handed a column reference or an
    * unexpected numeric type. */
  private def foldInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got ${Option(other).getOrElse("NULL")}")
    }
  }

  private def foldBool(fn: String, arg: String, e: Expression): Boolean = {
    require(e.foldable, s"$fn: $arg must be a literal boolean, got non-foldable ${e.sql}")
    e.eval() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal boolean, got ${Option(other).getOrElse("NULL")}")
    }
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "djb2" -> (es => Djb2(es.head)),
    "djb2_partition" -> (es => Djb2Partition(es.head, foldInt("djb2_partition", "numParts", es(1)))),
    "word_shingles" -> (es => WordShingles(es.head, foldInt("word_shingles", "k", es(1)),
      if (es.length > 2) foldBool("word_shingles", "distinct", es(2)) else true)),
    "minhash_sig" -> (es => MinHashSig(es.head)),
    "band_hashes" -> (es => BandHashes(es.head, foldInt("band_hashes", "bandRows", es(1)))),
    "est_jaccard" -> (es => EstJaccard(es.head, es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "winnow_fingerprints" -> (es => WinnowFingerprints(es.head)),
    "cdc_boundaries" -> (es => CdcBoundaries(es.head)),
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
