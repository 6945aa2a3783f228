package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` door graft needs: turning a hand-built
  * [[LogicalPlan]] (graft's `AsOfJoin` node) back into a public
  * [[DataFrame]]. Spark exposes no public constructor for this — every
  * library that injects custom logical operators (Delta, Iceberg,
  * Spark-NLP) ships exactly this shim: a file inside the
  * `org.apache.spark.sql` package namespace re-exporting
  * `Dataset.ofRows`. Nothing else internal is touched here, and the
  * shim adds no behavior.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  def analyzed(df: Dataset[Row]): LogicalPlan = df.queryExecution.analyzed
}
