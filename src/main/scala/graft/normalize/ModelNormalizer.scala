package graft.normalize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedStar
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, Project}
import org.apache.spark.sql.functions._

/** "Table as SELECT" models (reference model normalizer,
  * dlt/normalize/items_normalizers/model.py:27-172; SqlModel validation
  * dlt/common/libs/sqlglot.py:643-683).
  *
  * A model is a SQL SELECT whose result becomes the table content. The
  * reference validates the statement shape with sqlglot and injects
  * `_dlt_load_id` (literal) and `_dlt_id` expressions into the outer
  * select, rejecting star-selects (libs/sqlglot.py:791) so the produced
  * schema is always explicit. Here the validation walks Spark's parsed
  * logical plan and the injection is two `withColumn`s — the CTAS itself
  * is a plain Catalyst plan, fully optimized/pushed down.
  */
object ModelNormalizer {

  /** Validate + wrap a SQL model. `_dlt_id` is a deterministic content
    * hash of the selected row (stable under retries). */
  def normalize(spark: SparkSession, sql: String, loadId: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    require(!plan.isInstanceOf[Command],
      "model must be a SELECT statement, not a command")
    require(!hasTopLevelStar(plan),
      "star-select is not allowed in a model: enumerate the columns " +
        "(reference dlt/common/libs/sqlglot.py:791)")
    val df = spark.sql(sql)
    df.withColumn(Ids.DltLoadId, lit(loadId))
      .withColumn(Ids.DltId, Ids.rowHash(df.columns.toSeq))
  }

  /** True if the OUTER select projects a bare `*` (stars inside
    * subqueries/CTE bodies are the subquery's concern, as in the
    * reference). */
  private def hasTopLevelStar(plan: LogicalPlan): Boolean = plan match {
    case p: Project => p.projectList.exists(_.isInstanceOf[UnresolvedStar])
    case other if other.children.size == 1 => hasTopLevelStar(other.children.head)
    case _ => false
  }
}
