package graft.functions
import org.apache.spark.sql.SparkSession
/** Presto-named gap-fill function registry (SURVEY.md §2.1 scalar tables;
  * reference registration list: presto-main/.../metadata/FunctionRegistry.java:403-655).
  * Populated incrementally; registration is idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    Rewrites.register(spark)
    Udfs.register(spark)
  }
}
