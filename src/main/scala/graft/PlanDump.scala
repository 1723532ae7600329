package graft

/** Dev utility: write each named query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.PlanDump [-warm] OUTDIR SUFFIX name [name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warm = args.contains("-warm")
    val rest = args.filterNot(_.startsWith("-"))
    require(rest.length >= 3, "usage: PlanDump [-warm] OUTDIR SUFFIX name...")
    val (outDir, suffix, names) = (rest(0), rest(1), rest.drop(2))
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.util.LocalSession.create()
    if (warm) queries.Warmup.run(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(mode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt " +
        s"(${plan.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
