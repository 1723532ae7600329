package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/**
 * Profile loaders — the reference's wrapper surface
 * (python/sparker/wrappers.py: CSVWrapper/JSONWrapper/PandasWrapper and
 * the scala Wrappers package), Spark-native:
 *
 *  - every cell is coerced to string (the reference's schema-free model,
 *    wrappers.py:41,46,166);
 *  - JSON arrays explode into repeated key/value attributes
 *    (wrappers.py:38-43);
 *  - null/empty values are dropped;
 *  - an optional `realIdField` column becomes original_id
 *    (wrappers.py:67-110);
 *  - profile ids are dense longs starting at `startIdFrom`, assigned by
 *    zipWithIndex over a deterministic (original_id, then row content)
 *    order — no single-partition window, scales to any input.
 *
 * Output layouts: the nested API layout
 * (profile_id, original_id, source_id, attributes: array<struct<key,value>>)
 * and the normalized long layout (profile_id, source_id, attribute, value)
 * that the blocking operators consume.
 */
object Wrappers {

  /** Normalized long layout from any string-ish DataFrame: one row per
   * non-null, non-empty (profile, attribute). */
  def toLongLayout(profiles: DataFrame): DataFrame =
    profiles.select(col("profile_id"), col("source_id"),
        explode(col("attributes")).as("kv"))
      .select(col("profile_id"), col("source_id"),
        col("kv.key").as("attribute"), col("kv.value").as("value"))

  /** Attach dense profile ids with zipWithIndex over a deterministic sort
   * of the raw rows. */
  private def withDenseIds(df: DataFrame, startIdFrom: Long,
                           orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = StructType(
      org.apache.spark.sql.types.StructField("profile_id",
        org.apache.spark.sql.types.LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq((startIdFrom + idx) +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  /**
   * CSV -> profiles (CSVWrapper.load_profiles, wrappers.py:67-110).
   * Header row becomes attribute names; all cells cast to string;
   * `realIdField` (if present) is pulled out as original_id and excluded
   * from the attribute bag.
   */
  def loadProfilesCsv(spark: SparkSession, path: String,
                      startIdFrom: Long = 0, separator: String = ",",
                      header: Boolean = true, realIdField: String = "",
                      sourceId: Int = 0,
                      explodeInnerFields: Boolean = false,
                      innerSeparator: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", header.toString).option("sep", separator)
      .csv(path)
    fromDataFrame(raw, startIdFrom, realIdField, sourceId,
      explodeInnerFields = explodeInnerFields, innerSeparator = innerSeparator)
  }

  /** JSON-lines -> profiles (JSONWrapper.load_profiles, wrappers.py:7-54);
   * arrays become repeated attribute values. `fieldsToKeep` projects the
   * attribute bag at load (scala ref JSONWrapper.scala:23,42: key !=
   * realIdField && (fieldsToKeep empty || contains(key))). */
  def loadProfilesJson(spark: SparkSession, path: String,
                       startIdFrom: Long = 0, realIdField: String = "",
                       sourceId: Int = 0,
                       fieldsToKeep: Seq[String] = Nil): DataFrame = {
    // PERMISSIVE parsing (the default) surfaces a malformed line as a
    // row whose only non-null column is the corrupt-record capture; keep
    // the row (ingest never crashes) but DROP that column before the
    // attribute bag — otherwise the raw garbage text becomes a blocking
    // attribute and its tokens seed junk blocks downstream
    val corruptCol = spark.conf.getOption("spark.sql.columnNameOfCorruptRecord")
      .getOrElse("_corrupt_record")
    val raw = spark.read.json(path).drop(corruptCol)
    fromDataFrame(raw, startIdFrom, realIdField, sourceId, fieldsToKeep = fieldsToKeep)
  }

  /**
   * Any DataFrame -> profiles (PandasWrapper analog, wrappers.py:137-182).
   * Array columns explode to multi-valued attributes; everything else is
   * cast to string; null/empty dropped.
   *
   *  - `fieldsToKeep` (non-empty): only these columns enter the attribute
   *    bag (ref JSONWrapper.scala:23,42);
   *  - `explodeInnerFields`/`innerSeparator`: string cells are split on the
   *    (regex) separator into one attribute value per piece — multi-valued
   *    cells like "actor1,actor2" (ref CSVWrapper.scala:26-37 +
   *    WrapperTrait.rowToAttributes:44-53, which passes the separator to
   *    String.split, also regex semantics).
   */
  def fromDataFrame(raw: DataFrame, startIdFrom: Long = 0,
                    realIdField: String = "", sourceId: Int = 0,
                    fieldsToKeep: Seq[String] = Nil,
                    explodeInnerFields: Boolean = false,
                    innerSeparator: String = ","): DataFrame = {
    val attrCols = raw.schema.fields.filter(_.name != realIdField)
      .filter(f => fieldsToKeep.isEmpty || fieldsToKeep.contains(f.name))
    val kvArrays = attrCols.map { f =>
      f.dataType match {
        case ArrayType(_, _) =>
          // array column -> one key/value struct per element
          coalesce(transform(col(f.name).cast(ArrayType(StringType)),
            v => struct(lit(f.name).as("key"), v.as("value"))),
            array().cast("array<struct<key:string,value:string>>"))
        case _ if explodeInnerFields =>
          // multi-valued cell -> one key/value struct per split piece
          coalesce(transform(split(col(f.name).cast(StringType), innerSeparator),
            v => struct(lit(f.name).as("key"), v.as("value"))),
            array().cast("array<struct<key:string,value:string>>"))
        case _ =>
          array(struct(lit(f.name).as("key"),
            col(f.name).cast(StringType).as("value")))
      }
    }
    val allAttrs = filter(concat(scala.collection.immutable.ArraySeq.unsafeWrapArray(kvArrays): _*),
      kv => kv.getField("value").isNotNull && length(kv.getField("value")) > 0)
    val originalId =
      if (realIdField.nonEmpty && raw.columns.contains(realIdField))
        col(realIdField).cast(StringType)
      else lit(null).cast(StringType)
    val combined = raw
      .withColumn("_all_attrs", allAttrs)
      .withColumn("original_id", originalId)
      .select(col("original_id"), col("_all_attrs").as("attributes"))
    val withIds = withDenseIds(
      combined.withColumn("_ord", to_json(col("attributes"))),
      startIdFrom, Seq("original_id", "_ord"))
    withIds
      .select(col("profile_id"),
        coalesce(col("original_id"), col("profile_id").cast(StringType)).as("original_id"),
        lit(sourceId).as("source_id"), col("attributes"))
  }

  /**
   * Parquet -> profiles: the modern replacement for the reference's
   * SerializedObjectLoader/SerializedProfilesLoader
   * (scala/.../Wrappers/SerializedObjectLoader.scala:12-59 — Java-serialized
   * profile arrays re-parallelized in chunks). Columnar parquet already IS
   * the chunked, splittable at-rest profile format; the same schema-free
   * coercion rules as every other loader apply (arrays explode, cells cast
   * to string, null/empty dropped).
   */
  def loadProfilesParquet(spark: SparkSession, path: String,
                          startIdFrom: Long = 0, realIdField: String = "",
                          sourceId: Int = 0,
                          fieldsToKeep: Seq[String] = Nil): DataFrame =
    fromDataFrame(spark.read.parquet(path), startIdFrom, realIdField, sourceId,
      fieldsToKeep = fieldsToKeep)

  /** Ground-truth loaders (wrappers.py:56-64, :112-134): pairs of original
   * ids under fixed column names (id1, id2). */
  def loadGroundTruthCsv(spark: SparkSession, path: String,
                         id1: String = "id1", id2: String = "id2",
                         separator: String = ",", header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("sep", separator)
      .csv(path)
      .select(col(id1).cast(StringType).as("id1"), col(id2).cast(StringType).as("id2"))

  /**
   * Bucketed-table sink: write `df` as a managed parquet table
   * hash-bucketed (and sorted) on `bucketCol`. Two tables bucketed on
   * the same key with the same bucket count join WITHOUT shuffling
   * either side — the physical plan has no Exchange below the
   * SortMergeJoin (pinned by PlanSpec) — which is how a 100 TB fact
   * table joins a co-bucketed dimension repeatedly without paying the
   * shuffle every query. Sorting within buckets also drops the
   * per-query Sort. Bucket count is a layout decision: pick
   * ~(table size / healthy partition size), and keep it EQUAL across
   * tables that join together.
   */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.write.format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite").saveAsTable(table)
  }

  /**
   * Hive-style partitioned parquet sink: one directory per
   * `partitionCol` value. The layout complement of [[writeBucketed]]:
   * bucketing co-locates JOIN keys, partitioning prunes SCANS — a filter
   * on the partition column never opens the other directories at all
   * (the plan's PartitionFilters, pinned by PlanSpec), which at 100 TB
   * is the difference between reading one day and reading the table.
   * Partition by LOW-cardinality operational columns (day, source,
   * event type); high-cardinality keys belong in buckets, not
   * directories.
   */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    df.write.format("parquet")
      .partitionBy(partitionCols: _*)
      .mode("overwrite").save(path)
  }

  /**
   * Schema-evolution reader: parquet files written at different times
   * with different (compatible) schemas read as ONE table under the
   * union schema — columns absent from older files surface as NULL.
   * Spark's default read takes the schema from one footer and silently
   * DROPS columns the other files added, so an evolving 100 TB corpus
   * (new metadata columns over months of ingest) must read through
   * `mergeSchema`. The flag costs a footer read per file at planning
   * time, which is why it isn't the default — use it at the ingest
   * boundary, then Snapshot/compact to the current schema.
   */
  def loadParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /**
   * Small-files compaction: rewrite a parquet directory into
   * ceil(bytes / targetBytes) files. Streaming sinks and incremental
   * appends accrete thousands of KB-sized files; at 100 TB the resulting
   * task-per-file scheduling and NameNode/listing pressure dominate scan
   * cost, so periodic compaction is part of the table's lifecycle. The
   * rewrite uses `coalesce` (narrow — no shuffle; compaction only ever
   * reduces file count) and swaps directories only after the replacement
   * is fully written. Returns the new file count.
   */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path).coalesce(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "__precompact")
    require(fs.rename(hPath, bak), s"compact: cannot stage $path")
    if (!fs.rename(tmp, hPath)) { // restore on failure, never drop data
      fs.rename(bak, hPath)
      sys.error(s"compact: swap failed for $path")
    }
    fs.delete(bak, true)
    parts
  }

  def loadGroundTruthJson(spark: SparkSession, path: String,
                          firstAttr: String = "id1", secondAttr: String = "id2"): DataFrame =
    spark.read.json(path)
      .select(col(firstAttr).cast(StringType).as("id1"),
        col(secondAttr).cast(StringType).as("id2"))
}
