package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * SparkSessionExtensions integration (graft.plans.GraftExtensions): the
 * SQL-registered functions resolve and agree with their DataFrame twins,
 * and the RangeJoinRule rewrite is (a) applied — binned equi-join, never
 * a nested loop — and (b) lossless against the same query with the rule
 * disabled (which Spark plans as BroadcastNestedLoopJoin).
 */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** Run the same SQL with the rule on and off; both must agree and the
   * enabled plan must be a hash join on the generated bins. */
  private def checkLossless(sql: String): Unit = {
    val on = spark.sql(sql)
    val pOn = plan(on)
    assert(!pOn.contains("NestedLoop"), s"rule did not fire:\n$pOn")
    assert(pOn.contains("Generate"), s"no bin explode in:\n$pOn")
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val off = spark.sql(sql)
      assert(!plan(off).contains("Generate"))
      assert(rows(on) == rows(off), "binned rewrite changed the result")
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  // --- SQL-registered functions -------------------------------------

  test("graft_poly_hash31 resolves in SQL and matches the expression") {
    val h = spark.sql("SELECT graft_poly_hash31('alpha beta') AS h").head.getLong(0)
    assert(h == graft.functions.PolyHash31.hash("alpha beta"))
    assert(spark.sql("SELECT graft_poly_hash31('') AS h").head.getLong(0) == 0L)
  }

  test("graft_vec_dot resolves in SQL on array<float> columns") {
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vd")
    val d = spark.sql("SELECT graft_vec_dot(a, b) AS d FROM vd").head.getDouble(0)
    assert(d == 32.0)
  }

  test("graft_fast_round rounds half away from zero and needs a literal scale") {
    val r = spark.sql("SELECT graft_fast_round(2.5d, 0) AS r").head.getDouble(0)
    assert(r == 3.0)
    assert(spark.sql("SELECT graft_fast_round(1.2345d, 2) AS r").head.getDouble(0) == 1.23)
    val neg = spark.sql("SELECT graft_fast_round(-0.5d, 0) AS r").head.getDouble(0)
    assert(neg == -1.0)
    intercept[Exception] {
      spark.sql("SELECT graft_fast_round(2.675d, CAST(rand() * 2 AS INT)) AS r").collect()
    }
  }

  test("graft_topk: bounded-heap aggregate matches sort-based top-k on any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(i => (i % 13, rnd.nextLong() % 1000))
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.reverse.take(7)
    }
    for (parts <- Seq(1, 4, 17)) {
      val df = rows.toDF("g", "v").repartition(parts)
      df.createOrReplaceTempView("tk")
      val got = spark.sql("SELECT g, graft_topk(v, 7) AS t FROM tk GROUP BY g")
        .as[(Int, Seq[Long])].collect().toMap
      assert(got.view.mapValues(_.toSeq).toMap == expect, s"parts=$parts")
    }
  }

  test("graft_topk: k larger than the group, duplicates, NULLs, empty group") {
    import spark.implicits._
    Seq((1, Some(5L)), (1, Some(5L)), (1, Some(3L)), (2, None), (2, Some(9L)))
      .toDF("g", "v").createOrReplaceTempView("tk2")
    val got = spark.sql("SELECT g, graft_topk(v, 10) AS t FROM tk2 GROUP BY g")
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(5L, 5L, 3L)) // duplicates retained, k > size ok
    assert(got(2) == Seq(9L))         // NULL skipped
    val empty = spark.sql("SELECT graft_topk(v, 3) AS t FROM tk2 WHERE v IS NULL")
      .as[Seq[Long]].head()
    assert(empty.isEmpty)
    intercept[Exception] { // k must be a literal
      spark.sql("SELECT graft_topk(v, CAST(rand()*2 AS INT)) FROM tk2").collect()
    }
  }

  // --- RangeJoinRule ------------------------------------------------

  private def fixtures(): Unit = {
    graft.util.Snapshot(Seq(
      (1L, 0.0), (2L, 5.0), (3L, 9.99), (4L, 10.0), (5L, 63.9),
      (6L, 64.0), (7L, 100.5), (8L, -3.0), (9L, 255.0))
      .toDF("pid", "v")).createOrReplaceTempView("ext_points")
    graft.util.Snapshot(Seq(
      (10L, 0.0, 10.0),    // [0,10)
      (11L, 5.0, 5.0),     // degenerate: empty for <, a point for <=
      (12L, 60.0, 70.0),   // spans a 64-bin boundary
      (13L, 200.0, 100.0), // inverted: matches nothing
      (14L, Double.NaN, 10.0), // NaN lo: comparisons false
      (15L, -10.0, 0.1))
      .toDF("iid", "lo", "hi")).createOrReplaceTempView("ext_iv")
  }

  test("theta range join rewrites to a binned hash join, losslessly (exclusive hi)") {
    fixtures()
    checkLossless(
      "SELECT pid, iid FROM ext_points p JOIN ext_iv i ON p.v >= i.lo AND p.v < i.hi")
  }

  test("inclusive upper bound and point intervals are covered") {
    fixtures()
    checkLossless(
      "SELECT pid, iid FROM ext_points p JOIN ext_iv i ON p.v >= i.lo AND p.v <= i.hi")
  }

  test("strict lower bound and mirrored table order are covered") {
    fixtures()
    checkLossless(
      "SELECT pid, iid FROM ext_iv i JOIN ext_points p ON p.v > i.lo AND p.v < i.hi")
  }

  test("extra cross-side conjuncts survive the rewrite") {
    fixtures()
    checkLossless(
      """SELECT pid, iid FROM ext_points p JOIN ext_iv i
        |ON p.v >= i.lo AND p.v < i.hi AND p.pid + i.iid > 12""".stripMargin)
  }

  test("rule leaves equi-joins alone") {
    fixtures()
    val df = spark.sql(
      "SELECT pid, iid FROM ext_points p JOIN ext_iv i ON p.pid = i.iid AND p.v >= i.lo AND p.v < i.hi")
    assert(!plan(df).contains("__graft_range_bin"))
  }

  test("binWidth 1 and 1000 give identical results (width only shapes cost)") {
    fixtures()
    val sql = "SELECT pid, iid FROM ext_points p JOIN ext_iv i ON p.v >= i.lo AND p.v < i.hi"
    val base = rows(spark.sql(sql))
    for (w <- Seq("1", "1000")) {
      spark.conf.set("spark.graft.rangeJoin.binWidth", w)
      try assert(rows(spark.sql(sql)) == base, s"binWidth=$w diverged")
      finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }
}
