package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the driver's `local[32]` single-JVM harness but
  * the same settings are what we would ship to a 1000-executor cluster:
  * AQE on (runtime shuffle-partition coalescing + skew-join splitting),
  * UTC session time for oracle parity, and a shuffle-partition count that
  * matches available parallelism instead of the legacy 200 default.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // guide §3.1/§9: let the planner pick shuffled-hash over
      // sort-merge when its size conditions fit (broadcast still wins
      // when a side fits under the threshold; explicit merge-hint
      // certificates are unaffected — hints outrank the preference).
      // Array/struct-carrying joins are the measured winners: SMJ sorts
      // the wide side, SHJ builds on the small side and streams.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // static conf: a ~100-query engine blows the default 100-entry
      // generated-class cache and re-compiles plans every pass
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      // constant reader semantics for the whole session (see
      // Tables.ensureLegacyNanos): a NANOS-layout events file infers
      // as long + normalizeTs instead of a reader error
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
