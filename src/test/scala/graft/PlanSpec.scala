package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression net: the properties that make these
  * queries scale (broadcast dims, pushed filters, pruned columns)
  * should survive refactors. */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("e3 star join broadcasts every dimension (no sort-merge join)") {
    val p = plan(operators.Relational.q5MultiJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "a dimension fell back to SMJ")
  }

  test("e2 pushes the segment filter into the customer scan") {
    val p = plan(operators.Relational.q3Join(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed:\n$p")
  }

  test("a1 reads only the two needed columns from parquet") {
    val p = plan(operators.VectorQueries.vecL2(spark, sf))
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      s"column pruning lost:\n$p")
  }

  test("optimizer rule folds self-distance to a null-preserving constant") {
    import spark.implicits._
    import graft.functions.VectorFunctions.vec_l2sq
    graft.plans.SimplifyVectorExpressions.install(spark)
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
      .select($"id", vec_l2sq($"v", $"v").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("vec_l2sq"), s"rule did not fire:\n$optimized")
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDouble(1) == 0.0)
    assert(rows(1).isNullAt(1), "null vector must stay null, not 0.0")
  }

  test("e1 aggregation is map-side partial with the date filter applied pre-agg") {
    // (AQE prints isFinalPlan=false before execution, so codegen stage
    // markers aren't visible here — partial aggregation is the
    // scale-critical property)
    val p = plan(operators.Relational.q1Agg(spark, sf))
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
    assert(p.contains("Filter (isnotnull(l_shipdate"), "date filter not before agg")
  }
}
