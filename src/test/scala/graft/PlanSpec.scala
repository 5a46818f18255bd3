package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkTestSession

/** Physical-plan quality gates: the contract queries must keep the plans
  * that survive a 100x scale-up — dimension joins broadcast, filters
  * and column pruning pushed into the parquet scan, no accidental
  * cartesian products.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q2: dimension joins are broadcast, no shuffle join on the fact side") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge:\n" + p.take(800))
  }

  test("q3: predicates reach the parquet scan and columns are pruned") {
    val p = plan("q3_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(500))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"),
      "scan must prune unused columns: " + readSchema)
  }

  test("q1: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q1_agg")
    // two HashAggregate operators around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("Exchange"), p.take(500))
  }

  test("dedup exact: shuffle key is the 32-byte sha, not the document text") {
    val p = graft.ops.Dedup.exact(
      spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("sha2"), p.take(500))
    // partial agg on sha2 means full text never crosses the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("ann brute force: query side is broadcast") {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val p = graft.ops.Similarity.bruteForceTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(800))
  }
}
