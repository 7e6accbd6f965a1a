package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. One warmup pass (JVM/codegen/IO caches) so
  * cross-round numbers compare steady-state, then one timed pass.
  * Failures are NOT swallowed: each failing query is reported in
  * "failed" and the process exits nonzero, so a regression can't hide
  * as a ~0-second success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (iteration aid; the
    // driver never sets it, so round benches always cover everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val qs = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup: full untimed pass (ignore failures here; the timed pass reports them)
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // the shared shingle/pair/cluster tables must be re-paid INSIDE the
    // timed window (by the first timed consumer) — inheriting them from
    // warmup would time cache probes, not operators. The bucketed/v=N
    // layout guards above stay warm by design: their timed queries still
    // do the join/read work the layout exists for.
    graft.pipeline.PipelineQueries.resetShared()

    var failed = List.empty[String]
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: the f-interpolator uses the default locale, which can
    // emit decimal COMMAS (de_DE etc.) and break the JSON line
    def entries(rs: Seq[(String, Double)]): String = rs.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = String.format(java.util.Locale.ROOT, "%.3f", Double.box(results.map(_._2).sum))
    // The harness keeps only a ~2000-char tail of this process's output;
    // at 90+ queries the full per-query map no longer fits on one line.
    // Inline the slowest 40 (everything interesting), dump the complete
    // map next to the repo for the record.
    val top = results.sortBy(-_._2).take(40).sortBy(_._1)
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","qcount":${results.size},"queries":${entries(results)},"failed":$failedJson,"sf":"$sfDir"}"""
    val compactLine =
      s"""{"metric":"total","value":$total,"unit":"sec","qcount":${results.size},"queries":${entries(top)},"failed":$failedJson,"full":"bench_full.json","sf":"$sfDir"}"""
    // a filtered run must not clobber the round's full record
    if (only.isEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    println(compactLine)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
