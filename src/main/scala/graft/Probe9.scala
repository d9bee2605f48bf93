package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the t_cdc_minhash 100x blow-up: counts each
  * stage of the CDC->minhash->band pipeline so the quadratic stage is
  * measured, not guessed. Usage: runMain graft.Probe9 <sfDir> */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables.parallelize(Tables.documents(s, d))
      .select(col("doc_id"), col("text"),
        graft.functions.CdcFns.cdc_boundaries(col("text")).as("bounds"))
    val chunks = docs
      .select(col("doc_id"),
        explode(zip_with(
          concat(array(lit(0)), col("bounds")),
          concat(col("bounds"), array(length(col("text")))),
          (a, b) => struct(a.as("off"), (b - a).as("len")))).as("c"), col("text"))
      .select(col("doc_id"),
        md5(to_binary(expr("substr(text, c.off + 1, c.len)"), lit("utf-8"))).as("chunk_hash"))
    println(s"chunk rows: ${chunks.count()}")
    val dis = chunks.distinct()
    println(s"distinct (doc, chunk): ${dis.count()}")
    val sets = dis.groupBy("doc_id")
      .agg(sort_array(collect_set(col("chunk_hash"))).as("chs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs with sets: ${sets.count()}")
    println("chunk-set size distribution (top 10 sizes by docs):")
    sets.select(size(col("chs")).as("k")).groupBy("k").count()
      .orderBy(desc("count")).limit(10).collect().foreach(println)
    val sigs = sets
      .withColumn("sig", graft.functions.MinHashFns.minhash_sig(col("chs")))
      .select(col("doc_id"), col("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"sigs: ${sigs.count()}")
    val groups = operators.Dedup.sigGroups(sigs)
    val reps = groups.filter(col("doc_id") === col("rep"))
    println(s"distinct-signature reps: ${reps.count()}")
    val banded = reps.select(col("doc_id"),
      posexplode(graft.functions.MinHashFns.band_hashes(col("sig"), graft.GraftConf.lshBandRowsVerify)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"banded rows: ${banded.count()}")
    println("largest band buckets:")
    banded.groupBy("band_idx", "band_hash").count()
      .orderBy(desc("count")).limit(10).collect().foreach(println)
    val pairVolume = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("b"))
      .agg(sum(col("b") * (col("b") - 1) / 2).cast("long"))
      .head().getLong(0)
    println(s"priced band-join pair volume: $pairVolume")
    s.stop()
  }
}
