package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("expr-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("DotProduct equals the HOF formulation bit-for-bit on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val a = emb.select(col("vec_id").as("ida"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("e").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(5000)
    val hof = aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val native = VectorExpressions.dot_product(col("ea"), col("eb"))
    val diff = pairs.select(col("ida"), col("idb"), hof.as("h"), native.as("n"))
      .where(col("h") =!= col("n")) // bit-exact, not approximate
      .count()
    assert(diff === 0L)
  }

  test("dot_product is registered for the SQL surface") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }

  test("DotProduct codegen path evaluates (whole-stage codegen plan)") {
    val df = spark.range(100).select(
      VectorExpressions.dot_product(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), col("id").cast("double"))).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.agg(sum(col("d"))).collect()(0).getDouble(0) === (0 until 100).map(i => 3.0 * i + 2.0 * i).sum)
  }

  test("null semantics: null array -> null; short arrays use common prefix") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d)) AS b").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 3.0)
  }
}
