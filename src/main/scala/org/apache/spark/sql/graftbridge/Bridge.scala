package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one `private[sql]` doorway the custom-operator layer needs:
  * wrap a hand-built LogicalPlan as a DataFrame. Lives in an
  * `org.apache.spark.sql` subpackage for access; everything else in
  * graft.plans uses public Catalyst APIs only. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
