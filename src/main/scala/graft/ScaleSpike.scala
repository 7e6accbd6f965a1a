package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side sf1 scale spike (the r6 methodology, now a committed
  * tool): synthesize a 10× corpus from sf0.1 and time named queries
  * against it, printing per-query seconds and the ratio to a supplied
  * sf0.1 time when given. A ratio ≤ 10 for 10× data is at-or-below
  * linear; anything materially above flags a superlinear path (this is
  * how the r6 spike caught IVF's fixed-cell-count quadratic).
  *
  * Synthesis preserves LINEAR scaling of the near-dup structure:
  * - documents: 10 copies, copy c > 0 word-remapped (`w` → `w§c`) so
  *   copies don't form cross-copy near-dup cliques; doc_id offset per
  *   copy. Vocabulary grows 10× — realistic for vocab/top-k paths.
  * - embeddings: 10 copies, copy c > 0 element-wise multiplied by a
  *   deterministic ±1 mask per (copy, dim) — decorrelates cross-copy
  *   cosines; vec_id offset per copy.
  * - every other table is read straight from the source dir (spiking
  *   those is the existing bench's job).
  *
  * Usage: runMain graft.ScaleSpike <srcSfDir> <spikeDir> <q1,q2,...>
  */
object ScaleSpike {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, spikeDir, qlist) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new java.io.File(spikeDir)
    if (!new java.io.File(out, "documents.parquet").exists()) {
      out.mkdirs()
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val copies = (0 until 10).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + c * 10000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"§$c"))), " ").as("text"),
          col("lang"), col("source"),
          // n_chars tracks the remapped text (each word grew 2 chars)
          (col("n_chars") + size(split(col("text"), " ")) * 2).as("n_chars"))
      }
      copies.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$spikeDir/documents.parquet")
      val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val embCopies = (0 until 10).map { c =>
        if (c == 0) emb
        else emb.select(
          (col("vec_id") + c * 10000000L).as("vec_id"),
          // sign mask from hash(dim, copy): copies sharing a parity
          // pattern (a bare (i+c)%2 mask) would be bit-identical
          // cross-copy — hash-derived signs decorrelate every pair
          expr(s"transform(embedding, (v, i) -> CAST(v * (1 - 2 * (abs(hash(i, $c)) % 2)) AS FLOAT))")
            .as("embedding"),
          col("label"))
      }
      embCopies.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$spikeDir/embeddings.parquet")
      // remaining tables: reuse the source files (hard link via copy)
      for (f <- new java.io.File(srcDir).listFiles()
           if f.getName.endsWith(".parquet")
           if f.getName != "documents.parquet" && f.getName != "embeddings.parquet") {
        val tgt = new java.io.File(out, f.getName)
        if (!tgt.exists()) {
          if (f.isDirectory) {
            tgt.mkdirs()
            f.listFiles().foreach(p => java.nio.file.Files.copy(
              p.toPath, new java.io.File(tgt, p.getName).toPath))
          } else java.nio.file.Files.copy(f.toPath, tgt.toPath)
        }
      }
      System.err.println(s"[spike] synthesized 10x corpus at $spikeDir")
    }

    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { n =>
      graft.pipeline.PipelineQueries.resetShared()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.benchQueries(n)(spark, spikeDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[spike] $n%-24s ${sec}%8.2f s   ($cnt rows)")
    }
    spark.stop()
  }
}
