import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel("org.apache.spark.sql.execution.adaptive", org.apache.logging.log4j.Level.DEBUG)
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    val d = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents").select(col("doc_id"), col("text"))
    val skew = spark.range(4000)
      .select(xxhash64(col("id")).as("doc_id"),
        concat_ws(" ", array_repeat(lit("zz"), 60)).as("text"))
    val corpus = d.unionByName(skew)
    val df = graft.llm.NgramLm.bigramCrossEntropy(corpus, "doc_id", "text", ref = corpus)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("skew=true count: " + "skew=true".r.findAllIn(p).length)
    spark.stop()
  }
}
