package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shared memoized caches built up front as their own timed entry, so
    // per-query numbers are steady-state (r1 misattributed the whole
    // supervised pipeline to whichever query ran first)
    val w0 = System.nanoTime()
    try queries.Warmup.run(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    System.err.println(f"[bench] warmup_caches $warmupSec%.2fs")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $dt%.2fs")
      name -> dt
    } ++ Map("warmup_caches" -> warmupSec)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
