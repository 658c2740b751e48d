package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions (`SELECT graft_dot_long(a, b)` works
  * cluster-wide) and the [[org.apache.spark.sql.graft.VectorizeDotProducts]]
  * optimizer rule (HOF dot-product folds auto-rewrite to the native
  * loop). Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * GraftSession / Verify / Bench) or
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.register(ext)
    org.apache.spark.sql.graft.GraftTextFunctions.register(ext)
    org.apache.spark.sql.graft.GraftMediaFunctions.register(ext)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.VectorizeDotProducts)
    org.apache.spark.sql.graft.GraftPlans.register(ext)
  }
}
