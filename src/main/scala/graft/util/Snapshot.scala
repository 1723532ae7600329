package graft.util

import org.apache.spark.sql.DataFrame

/**
 * Materialize a DataFrame by round-tripping it through parquet under
 * spark.local.dir (tmpfs in the bench environment) and return a reader
 * over it. Serves the same two purposes as localCheckpoint — caching the
 * rows and truncating the logical plan — without MemoryStore unrolling:
 * with local[32], 32 tasks unrolling a cached dataset contend on the
 * global memory-manager lock per element batch, which showed up as >80%
 * SYSTEM cpu in the sf0.1 bench. Parquet writes/readers use their own
 * buffers, compress columnar, and re-read vectorized inside codegen.
 */
object Snapshot {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val base = spark.conf.getOption("spark.local.dir")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
    val dir = s"$base/graft-snap-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }
}
