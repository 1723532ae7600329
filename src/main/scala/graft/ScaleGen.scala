package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic ~K× scale-up of a testdata dir, for the scale-cliff
 * audit: replicate every fact table K times with id-offset copies so
 * the engine sees K× the rows WITHOUT the degenerate structure naive
 * replication creates. Naively copying rows verbatim makes every record
 * an exact duplicate of its K−1 clones, so similarity joins
 * (shingle/LSH/banded) and token blocks grow K² pairs on K× data — a
 * superlinearity of the CORPUS, not the plan, which would drown the
 * signal the audit is after. Instead each copy is made disjoint in the
 * blocking/similarity key space while preserving per-copy distribution:
 *
 *  - documents: every 3rd token of each copy is salted with `~c`, so
 *    3-gram shingles / window hashes / minhash bands of different
 *    copies almost never collide (Jaccard vs base ≈ 0.2, below every
 *    configured threshold) while token-length/quality distributions
 *    stay representative; n_chars re-derived from the salted text;
 *  - embeddings: each copy's vectors are circularly shifted by c dims —
 *    pairwise cosines WITHIN a copy are preserved exactly (the ANN
 *    graph per copy is isometric to the base) while cross-copy cosines
 *    are noise;
 *  - part (the ER profile table): every token of name/brand/type salted
 *    per copy, so token blocking yields K× blocks of the base SIZE
 *    distribution — the shape a real K× corpus has;
 *  - events / TPC-H tables: join keys offset per copy (stride chosen
 *    above each table's key range and below the 1e7 twin-id
 *    convention), preserving per-key densities and join fan-outs;
 *  - nation/region: unreplicated dimensions (their keys are referenced
 *    unscaled, as in any real star schema).
 *
 * Everything is a pure column transform on the driver-provided parquet —
 * seed-free and reproducible. Writes only under `target/` (the testdata
 * dir is read-only).
 *
 * Usage: runMain graft.ScaleGen [srcDir] [outDir] [copies]
 */
object ScaleGen {

  /** Suffix every `every`-th token of a space-tokenized string column
   * with `~c` — distribution-preserving key-space disjointness. */
  private def saltTokens(s: Column, c: Int, every: Int): Column =
    array_join(transform(split(s, " "),
      (t, i) => when(i % every === 0, concat(t, lit(s"~$c"))).otherwise(t)), " ")

  /** Circular left shift of a fixed-width array column by c slots. */
  private def shiftVec(v: Column, c: Int, dim: Int): Column =
    if (c % dim == 0) v
    else concat(slice(v, c % dim + 1, dim - c % dim), slice(v, 1, c % dim))

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def replicated(name: String)(copy: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = table(name)
      (0 until copies).map(c => copy(base, c)).reduce(_ unionByName _)
    }

    write(replicated("documents") { (d, c) =>
      if (c == 0) d
      else d.select((col("doc_id") + c * 100000L).as("doc_id"),
        saltTokens(col("text"), c, 3).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }, "documents")

    write(replicated("embeddings") { (e, c) =>
      e.select((col("vec_id") + c * 100000L).as("vec_id"),
        shiftVec(col("embedding"), c, 64).as("embedding"), col("label"))
    }, "embeddings")

    write(replicated("events") { (e, c) =>
      e.select((col("event_id") + c * 100000000L).as("event_id"), col("ts"),
        (col("user_id") + c * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")

    write(replicated("part") { (p, c) =>
      if (c == 0) p
      else p.select((col("p_partkey") + c * 1000000L).as("p_partkey"),
        saltTokens(col("p_name"), c, 1).as("p_name"),
        saltTokens(col("p_brand"), c, 1).as("p_brand"),
        saltTokens(col("p_type"), c, 1).as("p_type"),
        col("p_size"), col("p_retailprice"))
    }, "part")

    write(replicated("lineitem") { (l, c) =>
      l.withColumn("l_orderkey", col("l_orderkey") + c * 10000000L)
        .withColumn("l_partkey", col("l_partkey") + c * 1000000L)
        .withColumn("l_suppkey", col("l_suppkey") + c * 100000L)
    }, "lineitem")

    write(replicated("orders") { (o, c) =>
      o.withColumn("o_orderkey", col("o_orderkey") + c * 10000000L)
        .withColumn("o_custkey", col("o_custkey") + c * 1000000L)
    }, "orders")

    write(replicated("customer") { (cu, c) =>
      cu.withColumn("c_custkey", col("c_custkey") + c * 1000000L)
    }, "customer")

    write(replicated("supplier") { (su, c) =>
      su.withColumn("s_suppkey", col("s_suppkey") + c * 100000L)
    }, "supplier")

    write(table("nation"), "nation")
    write(table("region"), "region")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/scaledata/x10"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.util.LocalSession.create()
    generate(spark, src, out, copies)
    spark.stop()
  }
}
