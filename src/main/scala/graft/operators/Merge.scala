package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC merge operators: MERGE-style upsert and type-2 slowly-changing
 * dimension history — the "apply a change batch to a 100 TB snapshot"
 * building blocks of an incremental lakehouse pipeline.
 *
 * Both are a single hash shuffle on the key columns. The upsert is
 * union + per-key top-1 (a WindowGroupLimit, so each shuffle partition
 * keeps one row per key during the sort — no full materialization of the
 * change history); there is deliberately no join: a join-based MERGE pays
 * the same key shuffle AND a second operator. At scale the base side is
 * the standing table — with both sides bucketed by the key
 * ([[graft.sources.Wrappers.writeBucketed]]) even the shuffle disappears.
 */
object Merge {

  /**
   * MERGE / upsert: one surviving row per key — the one greatest by
   * `ordCols` (e.g. change timestamp, then a unique id as the
   * deterministic tiebreak) across base ∪ updates. New keys insert,
   * existing keys take the freshest version, unmatched base rows carry
   * over — exactly `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`
   * for latest-wins CDC semantics.
   */
  def upsertLatest(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                   ordCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(ordCols.map(_.desc): _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Type-2 SCD history: each change row becomes a validity interval
   * [tsCol, next change's tsCol) per key; the open current version is
   * flagged. `tieCol` breaks equal-timestamp changes (unique id). One
   * window (one shuffle) — lead() over (key, ts) — nothing else.
   */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /**
   * Snapshot diff: compare two per-key states by their version column and
   * report what changed — `added` (key only in b), `removed` (key only in
   * a), `changed` (both, different version); identical keys drop out. One
   * full outer join on the key = one co-partitioned shuffle; with both
   * snapshots bucket-sorted on the key
   * ([[graft.sources.Wrappers.writeBucketed]]) it runs exchange-free.
   * The inverse of [[upsertLatest]]: diff(old, upsert(old, batch))
   * recovers the batch's net effect.
   */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                   versionCol: String): DataFrame = {
    val av = a.select(keyCols.map(col) :+ col(versionCol).as("a_version"): _*)
    val bv = b.select(keyCols.map(col) :+ col(versionCol).as("b_version"): _*)
    av.join(bv, keyCols, "full_outer")
      .withColumn("status",
        when(col("a_version").isNull, lit("added"))
          .when(col("b_version").isNull, lit("removed"))
          .when(col("a_version") =!= col("b_version"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
  }
}
