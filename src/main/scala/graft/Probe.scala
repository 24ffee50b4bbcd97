package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway micro-probe for the optimization round: quantifies where the
  * single-task scan+agg time goes (decode vs decimal-cast vs agg-buffer)
  * on the 1-row-group sf0.1 lineitem. Not part of the declared surface.
  */
object Probe {
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
    Engine.configure(spark)
    val li = Tables.t(spark, sfDir, "lineitem")
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val fil = li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
    def dsum(p: Int)(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(p, 8))).cast("double")
    def aggs(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      fil.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(f(col("l_quantity")).as("a"),
          f(col("l_extendedprice")).as("b"),
          f(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
          f(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
          f(col("l_discount")).as("e"),
          count(lit(1)).as("n"))
    time("q01_double_sums")(aggs(c => sum(c)))
    time("q01_dec30_sums")(aggs(dsum(30)))
    // cast cost alone: decimal cast per row, then a LONG sum (cheap buffer)
    time("q01_cast_then_longsum")(aggs(c => sum(c.cast(DecimalType(30, 8)).cast("long"))))
    time("q01_dsum8")(
      fil.select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").as("c1"), col("l_extendedprice").as("c2"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c3"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("c4"),
        col("l_discount").as("c5"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr("dsum8(c1)").as("a"), expr("dsum8(c2)").as("b"),
          expr("dsum8(c3)").as("c"), expr("dsum8(c4)").as("d"),
          expr("dsum8(c5)").as("e"), count(lit(1)).as("n")))
    // rollup shape (q67-ish): expand ×4 over 600k rows vs pre-agg then rollup
    val dims = Seq(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
    time("rollup_direct")(
      li.rollup(dims: _*).agg(dsum(30)(col("l_quantity")).as("q"), count(lit(1)).as("n")))
    time("rollup_preagg")(
      li.groupBy(dims: _*)
        .agg(sum(col("l_quantity").cast(DecimalType(30, 8))).as("pq"), count(lit(1)).as("pn"))
        .rollup(dims: _*)
        .agg(sum(col("pq")).cast("double").as("q"), sum(col("pn")).as("n")))
    spark.stop()
  }
}
