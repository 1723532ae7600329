package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.sources.Wrappers
import graft.er.Converters

class WrappersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("CSV loader: header attrs, string coercion, dense ids, real id field") {
    val dir = Files.createTempDirectory("csvw").toFile
    val f = new java.io.File(dir, "d.csv")
    java.nio.file.Files.writeString(f.toPath,
      "rid,name,qty\nr2,beta,2\nr1,alpha,1\nr3,,3\n")
    val p = Wrappers.loadProfilesCsv(spark, f.getAbsolutePath,
      startIdFrom = 10, realIdField = "rid", sourceId = 7)
    val rows = p.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2),
        r.getSeq[org.apache.spark.sql.Row](3).map(kv => (kv.getString(0), kv.getString(1))).toSet))
    // ordered by original_id: r1, r2, r3 -> ids 10, 11, 12
    assert(rows.map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(rows.map(_._2).toSeq == Seq("r1", "r2", "r3"))
    assert(rows.forall(_._3 == 7))
    assert(rows(0)._4 == Set(("name", "alpha"), ("qty", "1")))
    assert(rows(2)._4 == Set(("qty", "3"))) // empty name dropped
  }

  test("Parquet loader: typed columns coerce to string attrs, arrays explode") {
    val dir = Files.createTempDirectory("pqw").toFile.getAbsolutePath + "/p"
    Seq(("r1", 5, Seq("x", "y"), 2.5)).toDF("rid", "n", "tags", "price")
      .write.parquet(dir)
    val p = Wrappers.loadProfilesParquet(spark, dir, startIdFrom = 3,
      realIdField = "rid", sourceId = 1)
    val row = p.collect().head
    assert(row.getLong(0) == 3L && row.getString(1) == "r1" && row.getInt(2) == 1)
    val attrs = Wrappers.toLongLayout(p)
      .select("attribute", "value").as[(String, String)].collect().toSet
    assert(attrs == Set(("n", "5"), ("tags", "x"), ("tags", "y"), ("price", "2.5")))
  }

  test("JSON loader: arrays explode to repeated attributes") {
    val dir = Files.createTempDirectory("jsonw").toFile
    val f = new java.io.File(dir, "d.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"rid":"a","tags":["x","y"],"n":1}""" + "\n")
    val p = Wrappers.loadProfilesJson(spark, f.getAbsolutePath, realIdField = "rid")
    val attrs = Wrappers.toLongLayout(p)
      .select("attribute", "value").as[(String, String)].collect().toSet
    assert(attrs == Set(("tags", "x"), ("tags", "y"), ("n", "1")))
  }

  test("CSV loader: explodeInnerFields splits multi-valued cells") {
    val dir = Files.createTempDirectory("csvx").toFile
    val f = new java.io.File(dir, "d.csv")
    java.nio.file.Files.writeString(f.toPath,
      "rid,actors\nr1,alice;bob;carol\n")
    val p = Wrappers.loadProfilesCsv(spark, f.getAbsolutePath,
      realIdField = "rid", explodeInnerFields = true, innerSeparator = ";")
    val attrs = Wrappers.toLongLayout(p)
      .select("attribute", "value").as[(String, String)].collect().toSet
    assert(attrs == Set(("actors", "alice"), ("actors", "bob"), ("actors", "carol")))
    // without the flag the cell stays one value
    val whole = Wrappers.loadProfilesCsv(spark, f.getAbsolutePath, realIdField = "rid")
    assert(Wrappers.toLongLayout(whole).count() == 1)
  }

  test("JSON loader: fieldsToKeep projects the attribute bag") {
    val dir = Files.createTempDirectory("jsonk").toFile
    val f = new java.io.File(dir, "d.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"rid":"a","keep":"x","drop":"y"}""" + "\n")
    val p = Wrappers.loadProfilesJson(spark, f.getAbsolutePath,
      realIdField = "rid", fieldsToKeep = Seq("keep"))
    val attrs = Wrappers.toLongLayout(p)
      .select("attribute", "value").as[(String, String)].collect().toSet
    assert(attrs == Set(("keep", "x")))
  }

  test("tokenKeys removeStopWords drops stopwords and mixed tokens") {
    val attrs = Seq((1L, 0, "t", "the Quick brown42 fox 99 and"))
      .toDF("profile_id", "source_id", "attribute", "value")
    val keys = graft.er.Blocking.tokenKeys(attrs, removeStopWords = true)
      .select("key").as[String].collect().toSet
    // 'the'/'and' are stopwords; 'brown42' is mixed alpha-digit; kept:
    // quick, fox, 99
    assert(keys == Set("quick", "fox", "99"))
  }

  test("ground-truth loaders") {
    val dir = Files.createTempDirectory("gtw").toFile
    val f = new java.io.File(dir, "gt.csv")
    java.nio.file.Files.writeString(f.toPath, "id1,id2\na,b\nc,d\n")
    val gt = Wrappers.loadGroundTruthCsv(spark, f.getAbsolutePath)
    assert(gt.as[(String, String)].collect().toSet == Set(("a", "b"), ("c", "d")))
  }

  test("converters round-trip blocks <-> profile blocks") {
    val members = Seq(("x", 1L, 0), ("x", 2L, 0), ("y", 2L, 0), ("y", 3L, 0))
      .toDF("key", "profile_id", "source_id")
    val stats = Seq(("x", 2L, 2L), ("y", 2L, 2L)).toDF("key", "size", "comparisons")
    val pb = Converters.blocksToProfileBlocks(members, stats)
    assert(pb.count() == 4)
    val back = Converters.profileBlocksToBlocks(pb, clean = false)
    assert(back.select("key", "profile_id").as[(String, Long)].collect().toSet ==
      members.select("key", "profile_id").as[(String, Long)].collect().toSet)
    val nested = Converters.profileBlocksNested(members, stats)
    val m = nested.collect().map(r => r.getLong(0) -> r.getSeq[Any](1).size).toMap
    assert(m == Map(1L -> 1, 2L -> 2, 3L -> 1))
  }

  test("schema evolution: mergeSchema unions old and new file schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    graft.util.Cleanup.onExitDelete(dir)
    // v1 writer: (doc_id, text); v2 adds a lang column
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = graft.sources.Wrappers.loadParquetMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val rows = merged.select("doc_id", "lang").as[(Long, Option[String])]
      .collect().toMap
    // the v1 file's rows surface the new column as NULL, v2's keep it
    assert(rows == Map(1L -> None, 2L -> Some("en")))
    // the default read picks a footer (order nondeterministic) — its
    // schema never exceeds the merged union
    assert(spark.read.parquet(dir).columns.toSet.subsetOf(merged.columns.toSet))
  }

  test("malformed JSON lines degrade to dropped attributes, never a crash") {
    // Spark's PERMISSIVE default (kept by loadProfilesJson) turns a
    // corrupt line into an all-null row; the profile layout then drops
    // the null attributes, so one bad record costs one profile with no
    // attributes instead of failing a 100 TB ingest
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson_").toString
    graft.util.Cleanup.onExitDelete(dir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "d.json"),
      """{"id": "a", "name": "alice"}
        |{"id": "b", "name": THIS IS NOT JSON}
        |{"id": "c", "name": "carol"}
        |""".stripMargin)
    val profiles = graft.sources.Wrappers.loadProfilesJson(
      spark, s"$dir/d.json", realIdField = "id")
    // the two clean records keep their attributes; the corrupt line
    // contributes nothing (its parse produced only nulls)
    val attrs = profiles
      .select(org.apache.spark.sql.functions.explode(col("attributes")).as("a"))
      .select(col("a.key").as("key"), col("a.value").as("value"))
    val names = attrs.filter(col("key") === "name")
      .select("value").as[String].collect().toSet
    assert(names == Set("alice", "carol"))
    // nothing from the corrupt line leaks into the attribute bag as data
    assert(attrs.filter(col("value").contains("NOT JSON")).count() == 0)
  }
}
