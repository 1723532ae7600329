package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run a single SparkEntry query with timing (and optionally
 * print its formatted plan) to profile in isolation. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val buildSec = (System.nanoTime() - tc) / 1e9
    if (explain) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runone] $name rows=$n build=$buildSec%.2fs count=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
