package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline (SURVEY.md §2 composition demo): the
  * operators composing as a training-data cleaning job — quality filter →
  * exact-dedup canonicalization → token accounting. Each stage is one of
  * the §2 operators; the pipeline is their declarative composition, so
  * Catalyst fuses the scans and the whole job is two shuffles (dedup
  * window + final sort) regardless of how many stages are chained.
  */
object Pipeline {

  def curate(s: SparkSession, d: String): DataFrame = {
    val quality = TextAnalysis.quality(s, d)
      .select("doc_id", "n_tokens", "quality_score")
    val canonical = Dedup.exact(s, d)
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id")
    quality.join(canonical, "doc_id")
      .filter(col("quality_score") >= 0.5)
      .orderBy("doc_id")
  }

  /** Oracle: TextAnalysis's shared quality-score SQL fragments composed
    * with the dedup-canonical window — single source, no formula drift. */
  val curateSql: String = {
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    ${TextAnalysis.nTokensSql} AS n_tokens,
       |    ${TextAnalysis.qualityScoreSql} AS quality_score
       |  FROM documents
       |), canon AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM (
       |    SELECT doc_id, md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))) AS fp
       |    FROM documents
       |  )
       |)
       |SELECT s.doc_id, s.n_tokens, s.quality_score
       |FROM scored s JOIN canon c ON s.doc_id = c.doc_id AND c.doc_id = c.canonical_id
       |WHERE s.quality_score >= 0.5
       |ORDER BY s.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_curate" -> (curate _))

  val oracles: Map[String, String] = Map(
    "p_curate" -> curateSql)
}
