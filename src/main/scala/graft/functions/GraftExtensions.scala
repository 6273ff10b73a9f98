package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions so any session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can call them from SQL —
  * the standard extension hook, no session-state mutation required.
  *
  * (`GraftFunctions.register` / `TextHashFunctions.register` remain for
  * registering into an already-running session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in approximate query processing (no-op unless the session sets
    // spark.graft.approxDistinct=true); also injectable into a running
    // session via spark.experimental.extraOptimizations
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite())
    ext.injectFunction((FunctionIdentifier("albers_lon"),
      info("albers_lon", "albers_lon(x, y) - WGS84 longitude of an EPSG:5070 point"),
      (exprs: Seq[Expression]) => AlbersLon(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("albers_lat"),
      info("albers_lat", "albers_lat(x, y) - WGS84 latitude of an EPSG:5070 point"),
      (exprs: Seq[Expression]) => AlbersLat(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("token_hashes"),
      info("token_hashes", "token_hashes(text) - per-token polynomial hashes mod 1e9+7"),
      (exprs: Seq[Expression]) => TokenHashesExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("hashed_ngrams"),
      info("hashed_ngrams", "hashed_ngrams(text, n) - distinct hashed word n-grams"),
      (exprs: Seq[Expression]) => HashedNgramsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A∩B| of two sorted array<bigint>"),
      (exprs: Seq[Expression]) => SortedIntersectCountExpr(exprs(0), exprs(1))))
  }
}
