package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization probe: times minhashLsh's phases cumulatively
  * (each prefix re-executes from the scan, so phase cost = successive
  * difference). Lives in graft.llm to reach the private[llm] pieces.
  * Not part of the declared surface.
  */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Engine.configure(spark)
    val d = graft.Tables.t(spark, sfDir, "documents")
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe2] $name: min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val elems = TextOps.wordShingles(col("text"), 2)
    val k = 32; val bands = 8; val rows = k / bands
    def sigs = d.select(col("doc_id").as("id"), TextOps.minhashSignature(elems, k).as("sig"))
    time("1_sigs_only")(sigs)
    def exploded = sigs
      .select(col("id"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    time("2_banding")(exploded)
    time("3_bucket_stats")(exploded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bw"), min(col("id")).as("__bmin")).filter(col("__bw") > 1))
    def cands = Dedup.bandedCandidates(exploded, Seq("band", "bucket"), Nil, 1000)
    time("4_candidates")(cands)
    time("5_full")(Dedup.minhashLsh(d, "doc_id", elems, 32, 8, 0.8))
    // doc/shingle profile
    val prof = d.select(size(split(col("text"), " ")).as("w")).agg(
      count(lit(1)), sum(col("w")), max(col("w"))).collect()(0)
    println(s"[probe2] docs=${prof.get(0)} words=${prof.get(1)} maxwords=${prof.get(2)}")
    spark.stop()
  }
}
