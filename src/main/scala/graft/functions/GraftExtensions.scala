package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions injector — registers the engine's custom
  * Catalyst expressions as SQL functions at session-build time:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * For an already-built session (tests, spark-shell) use
  * `org.apache.spark.sql.graftx.GraftFunctions.install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(org.apache.spark.sql.graftx.GraftFunctions.longArrayDot)
    ext.injectFunction(org.apache.spark.sql.graftx.GraftFunctions.jaroWinkler)
    ext.injectFunction(org.apache.spark.sql.graftx.GraftFunctions.nfcNormalize)
    ext.injectFunction(org.apache.spark.sql.graftx.GraftFunctions.posTokenize)
    // strength-reduce the ANN norm idiom dot(v, v) → norm2(v)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftx.DotSelfToNorm2)
    // whole-operator extension: native two-phase top-k-per-key
    // (logical TopKPerKey → partial/final bounded-heap physical plan)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftx.TopKStrategy)
  }
}
