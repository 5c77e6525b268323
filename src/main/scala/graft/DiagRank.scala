package graft

import graft.corpus.CorpusGen
import graft.queries.GraphOps
import org.apache.spark.sql.SparkSession

/** Diagnostic: wall time of q45's hostRank loop on a tier — the harness
  * that attributed the iterative-loop compounding costs (plan growth,
  * AQE re-planning over the cached chain; SURVEY §8c.24). Run with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS; DIAG_AQE=false A/Bs the
  * adaptive-execution cost. */
object DiagRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("DIAG_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = CorpusGen.ensureFor(spark, sfDir)
    val t0 = System.nanoTime()
    val edges = GraphOps.docEdges(spark, d).select("src_host", "dst_host")
    val out = GraphOps.hostRank(edges, 10)
    println(f"[diagrank] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    out.unpersist(false)
    spark.stop()
  }
}
