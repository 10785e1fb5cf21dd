package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the bench queries section's failure-surfacing law (r6 verdict
  * item 3): a throwing query must be timed AND land in the errors list —
  * never silently recorded as if it ran.
  */
class BenchQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ok(name: String): (String, (SparkSession, String) => DataFrame) =
    name -> ((s: SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
    })

  test("a deliberately-broken query shows up in the errs map, others run") {
    val broken: (String, (SparkSession, String) => DataFrame) =
      "q_broken" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("boom"))
    val (results, errs) = Bench.timeQueries(spark, "/nonexistent",
      Seq(ok("q_a"), broken, ok("q_z")), _ => true)
    assert(results.map(_._1) == Seq("q_a", "q_broken", "q_z"))
    assert(results.forall(_._2 >= 0.0)) // the broken query is still timed
    assert(errs == Seq("q_broken" -> "IllegalStateException"))
  }

  test("healthy queries produce an empty errs list") {
    val (results, errs) =
      Bench.timeQueries(spark, "/nonexistent", Seq(ok("q_a"), ok("q_b")), _ => true)
    assert(results.length == 2 && errs.isEmpty)
  }

  test("the between-queries deadline stops the loop but query 0 always runs") {
    val (results, _) =
      Bench.timeQueries(spark, "/nonexistent",
        Seq(ok("q_a"), ok("q_b"), ok("q_c")), _ => false)
    assert(results.map(_._1) == Seq("q_a"))
  }
}
