package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the bench artifact's parseability: the driver keeps only the last
  * 2,000 bytes of stdout and sbt appends a ~75-byte `[success]` trailer, so
  * the FINAL JSON line must render well under that window. Round 6's line
  * (diagnostics inlined, 4-decimal times) hit ~1,970 bytes and the driver
  * recorded `BENCH_r06.parsed = null`.
  */
class BenchLineSpec extends AnyFunSuite {

  private def engineKeys = Seq("engine_encode" -> 3.994, "engine_decode" -> 0.631)

  test("final line fits the budget with the REAL query suite") {
    // the actual keys the bench will emit this round, worst-case 4-digit
    // second values
    val queries = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1234.567) ++
      engineKeys
    val line = Bench.finalLine(99999.999, queries, "/root/testdata/sf0.1", 32)
    assert(line.length < Bench.FinalLineBudget - 200,
      s"real-suite final line is ${line.length} bytes — growth margin gone:\n$line")
  }

  test("final line self-shrinks under the budget with 15 extra queries") {
    val queries = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1234.567) ++
      engineKeys ++
      (1 to 15).map(i => f"x${i}%02d_future_round_query" -> 1234.567)
    val line = Bench.finalLine(99999.999, queries, "/root/testdata/sf0.1", 32)
    assert(line.length < Bench.FinalLineBudget,
      s"grown-suite final line is ${line.length} bytes:\n$line")
    assert(!line.contains("\n"))
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith("}"))
  }

  test("final line has no diagnostics blobs") {
    val line = Bench.finalLine(1.0, Seq("q1_agg" -> 0.5), "/tmp/sf", 8)
    assert(!line.contains("engine\""))
    assert(!line.contains("codec_microbench"))
    assert(!line.contains("scaling"))
  }
}
