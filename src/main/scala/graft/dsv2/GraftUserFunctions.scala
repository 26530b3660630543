package graft.dsv2

import graft.core.Json
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/**
 * Catalog UDFs — persisted LAMBDA functions (capability of the reference's
 * catalog function surface: CREATE FUNCTION with a lambda definition,
 * docs/docs/concepts/functions.md:33-43, procedure/CreateFunctionProcedure
 * .java), expressed Spark-first as DSv2 FunctionCatalog entries:
 *
 * {{{
 *   CALL sys.create_function(name => 'db.fn', lambda => 'x STRING -> substr(x, 1, 3)')
 *   SELECT graft.db.fn(s) FROM ...
 *   CALL sys.drop_function(name => 'db.fn')
 * }}}
 *
 * The lambda body is ANY Spark SQL scalar expression over the declared
 * parameters. At bind time the body is parsed + analyzed ONCE against the
 * parameter schema and compiled to a bound Catalyst expression; per-row
 * evaluation is `expr.eval(row)` (interpreted, executor-side — the
 * expression ships with the bound function).
 */
object GraftUserFunctions {

  case class FunctionDef(name: String, params: Seq[Seq[String]], body: String)

  def functionPath(warehouse: String, db: String, name: String): Path =
    new Path(warehouse, s"$db.db/.functions/$name.json")

  /** Parse `'x STRING, y INT -> x || y'` into (params, body). */
  def parseLambda(lambda: String): (Seq[(String, String)], String) = {
    val i = lambda.indexOf("->")
    require(i > 0, s"lambda must be '<params> -> <expression>', got: $lambda")
    val params = lambda.take(i).split(',').toSeq.map { p =>
      val parts = p.trim.split("\\s+", 2)
      require(parts.length == 2, s"parameter needs 'name TYPE': ${p.trim}")
      (parts(0), parts(1))
    }
    (params, lambda.drop(i + 2).trim)
  }

  def create(spark: SparkSession, warehouse: String, db: String, name: String,
             lambda: String): Unit = {
    val (params, body) = parseLambda(lambda)
    // validate eagerly: the body must analyze against the declared params
    compile(spark, params, body)
    val p = functionPath(warehouse, db, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(Json.write(FunctionDef(name,
      params.map(x => Seq(x._1, x._2)), body)).getBytes("UTF-8"))
    finally out.close()
  }

  def drop(spark: SparkSession, warehouse: String, db: String, name: String): Boolean = {
    val p = functionPath(warehouse, db, name)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
  }

  def load(spark: SparkSession, warehouse: String, db: String,
           name: String): Option[UnboundFunction] = {
    val p = functionPath(warehouse, db, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val d = try Json.read(new String(in.readAllBytes(), "UTF-8"), classOf[FunctionDef])
            finally in.close()
    Some(GraftLambdaUnbound(d.name, d.params.map(x => (x.head, x(1))), d.body))
  }

  def list(spark: SparkSession, warehouse: String, db: String): Seq[String] = {
    val dir = new Path(warehouse, s"$db.db/.functions")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  /** Parse + analyze the body against the param schema; bind attribute
    * references to parameter ordinals. */
  private[dsv2] def compile(spark: SparkSession, params: Seq[(String, String)],
                            body: String): Expression = {
    val schema = StructType(params.map { case (n, t) =>
      StructField(n, DataType.fromDDL(t)) })
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val analyzed = empty.select(expr(body).as("__r")).queryExecution.analyzed
    val e = analyzed match {
      case Project(Seq(a: Alias), _) => a.child
      case other => throw new IllegalArgumentException(
        s"lambda body did not analyze to a scalar expression: $other")
    }
    e.transform {
      case a: AttributeReference =>
        BoundReference(schema.fieldIndex(a.name), a.dataType, a.nullable)
    }
  }
}

case class GraftLambdaUnbound(fname: String, params: Seq[(String, String)],
                              body: String) extends UnboundFunction {
  override def name(): String = fname
  override def description(): String =
    s"$fname(${params.map(p => s"${p._1} ${p._2}").mkString(", ")}) -> $body"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == params.length,
      s"$fname expects ${params.length} arguments, got ${inputType.length}")
    val compiled = GraftUserFunctions.compile(SparkSession.active, params, body)
    GraftLambdaBound(fname, params.map(p => DataType.fromDDL(p._2)).toArray,
      compiled.dataType, compiled)
  }
}

case class GraftLambdaBound(fname: String, inTypes: Array[DataType],
                            outType: DataType, compiled: Expression)
    extends ScalarFunction[Any] {
  override def name(): String = fname
  override def inputTypes(): Array[DataType] = inTypes
  override def resultType(): DataType = outType
  override def produceResult(input: InternalRow): Any = compiled.eval(input)
}
