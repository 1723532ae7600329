package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: profile SparkEntry queries in isolation.
 *
 * Usage: runMain graft.RunOne [--warm] [--explain] [--sf DIR] name [name...]
 * With --warm the shared caches are built first (like Bench), so per-query
 * times are steady-state; each query is timed twice (cold plan / reused
 * snapshots vs fully warm). */
object RunOne {
  def main(args: Array[String]): Unit = {
    var warm = false
    var explain = false
    var sfDir = "/root/testdata/sf0.1"
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--warm" => warm = true
        case "--explain" => explain = true
        case "--sf" => sfDir = args(i + 1); i += 1
        case n => names += n
      }
      i += 1
    }
    val spark = graft.util.LocalSession.create()
    if (warm) {
      val t0 = System.nanoTime()
      queries.Warmup.run(spark, sfDir)
      println(f"[runone] warmup ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      val dt1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt2 = (System.nanoTime() - t1) / 1e9
      println(f"[runone] $name rows=$n run1=$dt1%.2fs run2=$dt2%.2fs")
    }
    spark.stop()
  }
}
