package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project

/** Dataset-API surface for the native [[AsOfJoin]] plan node.
  *
  * {{{
  *   AsOf.joinBackward(purchases, views, by = Seq("user_id"),
  *     leftTime = "ts_us", rightTime = "view_ts_us")
  * }}}
  *
  * attaches to each purchase the latest view with `view_ts_us <=
  * ts_us` for the same user (null columns when none precedes it). The
  * right side's `by` columns are dropped from the output; other
  * same-named columns should be renamed before joining.
  */
object AsOf {

  /** Backward as-of join: latest `right` row per `left` row with equal
    * `by` keys and `rightTime <= leftTime`; with `toleranceUs`, only
    * matches within `leftTime - rightTime <= toleranceUs` (stale
    * observations fall back to null, the pandas `merge_asof` tolerance
    * semantics). Tolerance requires long/timestamp time columns. */
  def joinBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   leftTime: String, rightTime: String,
                   toleranceUs: Option[Long] = None): DataFrame = {
    require(by.nonEmpty,
      "as-of join requires at least one by key (ClusteredDistribution needs a clustering)")
    val spark = left.sparkSession
    // The strategy is injected by graft.GraftExtensions at session build;
    // for sessions built without it, experimental strategies are the
    // public post-hoc registration point.
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // self-join safety: if the two sides share attribute ids (same source
    // table), re-alias the right side so references stay unambiguous
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).nonEmpty)
        Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0
    def resolve(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among [${out.map(_.name).mkString(", ")}]"))
    GraftSqlBridge.ofRows(spark, AsOfJoin(
      lp, rp,
      leftTime = resolve(lp.output, leftTime),
      rightTime = resolve(rp.output, rightTime),
      leftBy = by.map(resolve(lp.output, _)),
      rightBy = by.map(resolve(rp.output, _)),
      toleranceUs = toleranceUs))
  }
}
