package graft.functions
import org.apache.spark.sql.SparkSession
/** Presto-named gap-fill function registry (SURVEY.md §2.1 scalar tables;
  * reference registration list: presto-main/.../metadata/FunctionRegistry.java:403-655).
  * Populated incrementally; registration is idempotent.
  *
  * Round-5 audit: every user-facing scalar name extracted from the
  * reference's `@ScalarFunction` surface resolves in a registered session,
  * with these deliberate exclusions —
  *  - engine internals (`array_constructor`, `combine_hash`, `fail`,
  *    `like_pattern`): Catalyst has its own equivalents;
  *  - color/bar-chart plugin (`bar`, `color`, `render`, `rgb`): out of
  *    scope per SURVEY §2 (terminal-rendering plugin);
  *  - `localtime`: Spark has no TIME type (`current_timestamp` /
  *    `localtimestamp` cover the session-clock surface);
  *  - `spooky_hash_v2_32/64`: the reference delegates to airlift's
  *    SpookyHashV2; with that jar absent and no network there is no
  *    ground truth to verify a from-scratch port against, and an
  *    unverifiable claimed-SpookyHash would be worse than a documented
  *    absence (`xxhash64`/`sha*`/`crc32`/`murmur3` cover the fast-hash
  *    need).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    Rewrites.register(spark)
    Udfs.register(spark)
  }
}
