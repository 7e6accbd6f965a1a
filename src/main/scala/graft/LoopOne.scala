package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round scratch tool: materialize one bench query in a
  * loop so a profiler/jstack can sample where per-materialization
  * driver time goes. Not part of any query path. */
object LoopOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 30
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // codegen cache sized to the query surface (Bench.scala r17 note)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.benchQueries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      System.err.println(f"[loop] $i ${(System.nanoTime() - t0) / 1e9}%.3f " +
        s"compiles=${cm.METRIC_COMPILATION_TIME.getCount} " +
        s"compileMs=${cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1e6}")
    }
    spark.stop()
  }
}
