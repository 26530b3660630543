package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}

/**
 * Bridge into Spark's `private[sql]` surface, placed under
 * `org.apache.spark.sql` for access — the same connector pattern the
 * reference uses (paimon-spark keeps shims under org.apache.spark.sql.paimon,
 * e.g. paimon-spark/paimon-spark-common/src/main/scala/org/apache/spark/sql/paimon/shims).
 * Kept to the minimum: plan→DataFrame and Expression→Column for the SQL
 * row-level command rewrites.
 */
object SparkShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def catalogPlugin(spark: SparkSession,
                    name: String): org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager.catalog(name)

  /** Resolve a multipart identifier to (catalog, identifier) with Spark's
    * own lookup rules (current catalog/namespace defaults) — the
    * `private[sql]` LookupCatalog.CatalogAndIdentifier extractor. */
  def catalogAndIdentifier(spark: SparkSession, parts: Seq[String])
      : Option[(org.apache.spark.sql.connector.catalog.CatalogPlugin,
                org.apache.spark.sql.connector.catalog.Identifier)] = {
    val lookup = new org.apache.spark.sql.connector.catalog.LookupCatalog {
      override val catalogManager =
        spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager
    }
    parts match {
      case lookup.CatalogAndIdentifier(cat, ident) => Some((cat, ident))
      case _ => None
    }
  }

  /** Drain the listener bus — lets tests that aggregate task metrics via a
    * SparkListener read a complete total (the bus is async). */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Rebind a streaming micro-batch DataFrame as a plain batch one so it can
    * flow through batch write paths inside `Sink.addBatch` (the pattern of
    * paimon-spark's PaimonUtils.createNewDataFrame /
    * Classic4Api.createDataset: execute the incremental plan, wrap the
    * InternalRow RDD as a non-streaming DataFrame). */
  def unstream(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.sqlContext.asInstanceOf[classic.SQLContext]
      .internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }
}
