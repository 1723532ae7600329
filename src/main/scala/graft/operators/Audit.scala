package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deequ-style data-quality constraint validation: evaluate a set of named
 * boolean expectations over a table in ONE pass and report violation
 * counts per check. The audit gate every production ingest runs before a
 * batch is admitted downstream.
 *
 * All checks fold into a single aggregate (`sum(violates)` per check +
 * one row count), so a 100 TB table is scanned once with map-side
 * partial aggregation, no matter how many constraints are registered;
 * the per-check result rows come from exploding the 1-row aggregate,
 * never from per-check scans.
 */
object Audit {

  /**
   * `checks` maps a check name to the EXPECTATION (a boolean Column that
   * should hold for every row). NULL expectation results count as
   * violations — a null-valued predicate means the row could not be
   * validated, and admit-on-null would let exactly the malformed rows
   * through. Returns (check, n_rows, n_violations, pass) sorted by name.
   */
  def checkConstraints(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (name, expect) =>
        sum(when(coalesce(expect, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.flatMap { case (name, _) =>
      Seq(lit(name), col(s"__v_$name"))
    }
    one.select(col("n_rows"), map(pairs: _*).as("m"))
      .select(col("n_rows"), explode(col("m")).as(Seq("check", "n_violations")))
      .select(col("check"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy("check")
  }
}
