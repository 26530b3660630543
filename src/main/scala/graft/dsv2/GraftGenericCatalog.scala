package graft.dsv2

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Collections, Map => JMap}

/**
 * Session-catalog wrapper (capability of paimon's SparkGenericCatalog.java:84,
 * CatalogExtension): install as `spark.sql.catalog.spark_catalog` and the
 * default catalog serves BOTH regular Spark tables (delegated to the built-in
 * session catalog) and graft tables — `CREATE TABLE t (...) USING graft`
 * routes to the embedded [[GraftCatalog]], everything else passes through.
 * Lookups try the session catalog first, then graft (a graft table is
 * invisible to the metastore), mirroring the reference's dispatch.
 *
 * Warehouse: the `warehouse` catalog option, defaulting to
 * `<spark.sql.warehouse.dir>/graft`.
 */
class GraftGenericCatalog extends DelegatingCatalogExtension {

  private val graft = new GraftCatalog()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    super.initialize(name, options)
    val opts = new java.util.HashMap[String, String](options)
    if (!opts.containsKey("warehouse")) {
      val wh = org.apache.spark.sql.SparkSession.active.conf
        .get("spark.sql.warehouse.dir").stripSuffix("/")
      opts.put("warehouse", s"$wh/graft")
    }
    graft.initialize(name, new CaseInsensitiveStringMap(opts))
  }

  private def isGraftProvider(properties: JMap[String, String]): Boolean =
    "graft".equalsIgnoreCase(properties.get(TableCatalog.PROP_PROVIDER))

  private def graftHas(ident: Identifier): Boolean =
    try { graft.loadTable(ident); true } catch { case _: Exception => false }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table =
    if (isGraftProvider(properties)) {
      if (!graft.namespaceExists(ident.namespace()))
        graft.createNamespace(ident.namespace(), Collections.emptyMap())
      graft.createTable(ident, schema, partitions, properties)
    } else super.createTable(ident, schema, partitions, properties)

  // Spark 4 plans CREATE TABLE through the Column[] overload
  override def createTable(ident: Identifier,
                           columns: Array[Column],
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table =
    if (isGraftProvider(properties))
      createTable(ident,
        StructType(columns.map { c =>
          val f = org.apache.spark.sql.types.StructField(
            c.name(), c.dataType(), c.nullable())
          // keep COMMENTs — the __VECTOR_FIELD directive rides on them
          Option(c.comment()).fold(f)(f.withComment)
        }),
        partitions, properties)
    else super.createTable(ident, columns, partitions, properties)

  /** V2ScanPartitioningAndOrdering resolves a scan's reported `bucket`
    * transform by loading the function from the table's catalog with an
    * EMPTY namespace — V2SessionCatalog throws REQUIRES_SINGLE_PART_
    * NAMESPACE on that shape, which would fail ANALYSIS of any graft
    * read reporting KeyGroupedPartitioning through spark_catalog. Serve
    * the engine's bucket function here (same as [[GraftCatalog]]); other
    * lookups delegate. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket" && ident.namespace().isEmpty) GraftBucketFunction
    else super.loadFunction(ident)

  override def loadTable(ident: Identifier): Table =
    try super.loadTable(ident)
    catch {
      case e: NoSuchTableException =>
        try graft.loadTable(ident) catch { case _: Exception => throw e }
    }

  override def loadTable(ident: Identifier, version: String): Table =
    if (graftHas(ident)) graft.loadTable(ident, version)
    else super.loadTable(ident, version)

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    if (graftHas(ident)) graft.loadTable(ident, timestamp)
    else super.loadTable(ident, timestamp)

  override def tableExists(ident: Identifier): Boolean =
    super.tableExists(ident) || graftHas(ident)

  override def dropTable(ident: Identifier): Boolean =
    if (graftHas(ident)) graft.dropTable(ident) else super.dropTable(ident)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    if (graftHas(ident)) graft.alterTable(ident, changes: _*)
    else super.alterTable(ident, changes: _*)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val fromGraft =
      try graft.listTables(namespace) catch { case _: Exception => Array.empty[Identifier] }
    (super.listTables(namespace).toSeq ++ fromGraft.toSeq).distinct.toArray
  }

  override def invalidateTable(ident: Identifier): Unit = {
    if (!graftHas(ident)) super.invalidateTable(ident)
  }
}
