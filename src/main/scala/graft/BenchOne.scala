package graft
import org.apache.spark.sql.SparkSession

/** Focused timing harness: same session shape as [[Bench]], optional
  * warmup, then N timed runs of just the named queries — the tool for
  * attributing a run1-vs-steady cliff to codegen, cache eviction, or the
  * query itself without paying a full 251-query bench sweep.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.BenchOne [-nowarm] q1 q2 ...`
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nowarm = args.contains("-nowarm")
    val names = args.filterNot(_.startsWith("-"))
    // fail fast on typos BEFORE paying the (minutes-long) warmup, and
    // list every unknown name instead of aborting at the first
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark = graft.util.LocalSession.create()
    if (!nowarm) {
      val t0 = System.nanoTime()
      queries.Warmup.run(spark, sfDir)
      System.err.println(f"[benchone] warmup ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (name <- names; fn = SparkEntry.queries(name); i <- 1 to 4) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
