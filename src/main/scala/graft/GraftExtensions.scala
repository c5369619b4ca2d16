package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{RollingHash, SimHash64}
import graft.plans.ZoneMapPruneRule

/** Spark extension point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) installs:
  *
  *  - SQL functions `graft_rolling_hash(str)` and
  *    `graft_simhash64(array<string>)` — the native Catalyst
  *    fingerprint/SimHash expressions, callable from plain SQL;
  *  - the [[ZoneMapPruneRule]] optimizer rule — transparent index-based
  *    file pruning for registered micro-blocked tables.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[RollingHash].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "graft_rolling_hash(str) - 64-bit polynomial rolling hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(array<string>) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectOptimizerRule(ZoneMapPruneRule(_))
  }
}
