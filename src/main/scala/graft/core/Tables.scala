package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables, plus the
  * KV "cell view" that re-expresses HBase's data model
  * (rowkey → family → qualifier → timestamp → value) relationally.
  *
  * Reference data model: hbase-common/src/main/java/org/apache/hadoop/
  * hbase/KeyValue.java (cell = row, family, qualifier, ts, value).
  */
object Tables {

  /** Serializes the nanosAsLong set/probe/restore in [[load]]: the
    * flag is SESSION-wide conf, so two concurrent events loads raced —
    * thread B could capture thread A's temporary "true" as its
    * restore value (leaking the flag for the session: every later
    * unrelated TIMESTAMP(NANOS) parquet silently decodes as long), or
    * restore-to-unset while A's probe still needed it (r13 core
    * review). The probe is driver-side footer reading — cheap to
    * serialize; the returned DataFrame's execution is outside the
    * lock (the NANOS generation deliberately leaves the flag set,
    * which every serialized probe then captures consistently). */
  private val nanosProbeLock = new Object

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") nanosProbeLock.synchronized {
      // events.parquet has shipped with two ts encodings across data
      // generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
      // rejects — read nanos as long, integer-div to µs; exact, the
      // generator emits µs precision and the DuckDB oracle also
      // truncates ns→µs) and plain TIMESTAMP(MICROS) (usable as-is).
      // Branch on the decoded type so both generations load.
      val flag = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(flag)
      def restore(): Unit = prev match {
        case Some(v) => spark.conf.set(flag, v)
        case None => spark.conf.unset(flag)
      }
      spark.conf.set(flag, "true")
      // Either way normalize to TimestampType (LTZ): watermarks reject
      // TIMESTAMP_NTZ, and the UTC session timezone (set in every
      // entrypoint builder) makes the NTZ→LTZ cast wall-clock exact.
      // A FAILED read restores the flag too — leaking it session-wide
      // would silently decode every later unrelated TIMESTAMP(NANOS)
      // parquet as long columns (r12 core review).
      val df =
        try spark.read.parquet(s"$sfDir/$name.parquet")
        catch { case e: Throwable => restore(); throw e }
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // a NANOS-generation file: the flag must STAY set — the scan
          // consults it again at execution, and restoring it here would
          // fail every task. The session-wide side effect is confined
          // to this data generation and documented: other NANOS parquet
          // in the session reads as long too.
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case other =>
          // MICROS/NTZ generation: the flag was only a schema probe —
          // restore it so an events load doesn't permanently change
          // how UNRELATED parquet decodes TIMESTAMP(NANOS) (r12 review)
          restore()
          if (other == org.apache.spark.sql.types.TimestampNTZType)
            df.withColumn("ts", col("ts").cast("timestamp"))
          else df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Unpivot a wide relational table into HBase-style cells
    * `(rowkey, family, qualifier, value)`. Values are cast to string
    * (HBase cells are untyped bytes). Uses `stack`, which stays inside
    * whole-stage codegen — no shuffle, no UDF.
    *
    * @param families map family name -> qualifiers (columns of `df`).
    *                 Only string/int columns should be included so the
    *                 string cast is engine-portable.
    */
  def toCells(df: DataFrame, rowkeyCol: String,
              families: Seq[(String, Seq[String])]): DataFrame = {
    // family/qualifier names land inside generated stack() SQL — the
    // dqAudit identifier discipline every other splice point follows
    // (a quote in a name would re-tokenize the SQL, r12 core review)
    for ((fam, quals) <- families; name <- fam +: quals)
      Hashes.requireIdentifier(name, "toCells family/qualifier")
    val n = families.map(_._2.size).sum
    val args = families.flatMap { case (fam, quals) =>
      quals.map(q => s"'$fam', '$q', cast(`$q` as string)")
    }.mkString(", ")
    df.select(
      col(rowkeyCol).cast("string").as("rowkey"),
      expr(s"stack($n, $args) as (family, qualifier, value)"))
  }

  /** The standard cell view of `customer` used across filter queries:
    * rowkey = c_custkey, family `id` holds keys, family `info` holds
    * attributes. Mirrors an HBase table with two column families. */
  def customerCells(spark: SparkSession, sfDir: String): DataFrame =
    toCells(load(spark, sfDir, "customer"), "c_custkey",
      Seq("id" -> Seq("c_nationkey"),
          "info" -> Seq("c_name", "c_mktsegment")))

  /** DuckDB-equivalent SQL for [[customerCells]] (UNION ALL unpivot),
    * used as a CTE prefix inside oracle SQL. */
  val customerCellsSql: String =
    """cells AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS rowkey, 'id' AS family, 'c_nationkey' AS qualifier, CAST(c_nationkey AS VARCHAR) AS value FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey AS VARCHAR), 'info', 'c_name', c_name FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey AS VARCHAR), 'info', 'c_mktsegment', c_mktsegment FROM customer
      |)""".stripMargin

  /** Cell view of `supplier` (rowkey = s_suppkey, families like
    * [[customerCells]]) — the second table for multi-table scans. */
  def supplierCells(spark: SparkSession, sfDir: String): DataFrame =
    toCells(load(spark, sfDir, "supplier"), "s_suppkey",
      Seq("id" -> Seq("s_nationkey"),
          "info" -> Seq("s_name")))

  val supplierCellsSql: String =
    """scells AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS rowkey, 'id' AS family, 's_nationkey' AS qualifier, CAST(s_nationkey AS VARCHAR) AS value FROM supplier
      |  UNION ALL
      |  SELECT CAST(s_suppkey AS VARCHAR), 'info', 's_name', s_name FROM supplier
      |)""".stripMargin

  /** Versioned-cell view of `events`: an HBase table where
    * rowkey = user_id, one column family `ev`, qualifier = event_type,
    * version timestamp = ts, value = value. Multi-version semantics
    * (maxVersions / timeRange / TimestampsFilter) run against this. */
  def eventCells(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events").select(
      col("user_id").as("rowkey"),
      lit("ev").as("family"),
      col("event_type").as("qualifier"),
      col("ts"),
      col("value"),
      col("event_id"))

  val eventCellsSql: String =
    """vcells AS (
      |  SELECT user_id AS rowkey, 'ev' AS family, event_type AS qualifier, ts, value, event_id FROM events
      |)""".stripMargin

  /** Two-family variant of [[eventCells]] (family `web` = click/view,
    * `act` = everything else) — the shape per-family time ranges
    * (Get.setColumnFamilyTimeRange) need to mean anything. */
  def eventCellsTwoFamilies(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events").select(
      col("user_id").as("rowkey"),
      when(col("event_type").isin("click", "view"), "web")
        .otherwise("act").as("family"),
      col("event_type").as("qualifier"),
      col("ts"),
      col("value"),
      col("event_id"))

  val eventCellsTwoFamiliesSql: String =
    """vcells2 AS (
      |  SELECT user_id AS rowkey,
      |         CASE WHEN event_type IN ('click', 'view') THEN 'web' ELSE 'act' END AS family,
      |         event_type AS qualifier, ts, value, event_id
      |  FROM events
      |)""".stripMargin
}
