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
    // margin 100 (was 200): the doomsday rung now guarantees a parseable
    // line at ANY suite size, so the margin only protects full per-query
    // resolution — ~4 more queries at worst-case digits before queries
    // start being cut
    assert(line.length < Bench.FinalLineBudget - 100,
      s"real-suite final line is ${line.length} bytes — growth margin gone:\n$line")
  }

  test("bench history resource loads and covers the previous round's suite") {
    // the >4x-of-history re-time guard is only live if the resource parses:
    // it must carry every query key the previous round recorded (new
    // queries legitimately have no entry and fall back to the absolute
    // 2.0 s guard alone)
    val h = Bench.history
    assert(h.nonEmpty, "bench-history.properties missing or unparseable")
    assert(h.contains("q1_agg") && h("q1_agg") > 0)
    assert(h.contains("e4_ann_ivf"))
    assert(h.values.forall(v => v > 0 && v < 1000))
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
    // if the doomsday rung fired, the engine legs must have survived the
    // cut and the cut must be recorded
    if (line.contains("\"_cut\":")) {
      assert(line.contains("\"engine_encode\":"))
      assert(line.contains("\"engine_decode\":"))
    }
  }

  test("doomsday rung: an absurdly grown suite still renders a parseable " +
    "line with engine legs + the slowest queries and a _cut count") {
    val queries = (1 to 300).map(i => f"z$i%03d_q" -> i.toDouble) ++ engineKeys
    val line = Bench.finalLine(9.9, queries, "/tmp/sf0.1", 32)
    assert(line.length < Bench.FinalLineBudget, s"${line.length}:\n$line")
    assert(line.contains("\"_cut\":"))
    assert(line.contains("\"engine_encode\":4"))
    assert(line.contains("\"z300_q\":300"), "the slowest queries must survive")
    assert(!line.contains("\"z001_q\":"), "the fastest queries are cut")
  }

  test("final line has no diagnostics blobs") {
    val line = Bench.finalLine(1.0, Seq("q1_agg" -> 0.5), "/tmp/sf", 8)
    assert(!line.contains("engine\""))
    assert(!line.contains("codec_microbench"))
    assert(!line.contains("scaling"))
  }

  private def engineMap = Map(
    "encode_sec" -> 21.287, "encode_gc_sec" -> 0.123, "encode_cpu_sec" -> 84.5,
    "encode_worst_sec" -> 25.9,
    "decode_sec" -> 7.431, "decode_gc_sec" -> 2.001, "decode_cpu_sec" -> 31.2,
    "decode_worst_sec" -> 9.8)

  test("diag2 + final line fit the driver tail window TOGETHER") {
    // the failure mode this gates: round 7's gc/cpu attribution fields
    // truncated out of the 2,000-byte tail because they rode the big diag
    // line. The worst realistic pairing: real query suite at 4-digit
    // times, three long-named slow queries with 3-digit wall/cpu.
    val queries = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1234.567) ++
      engineKeys
    val fin = Bench.finalLine(99999.999, queries, "/root/testdata/sf0.1", 32)
    val slow = SparkEntry.queries.keys.toSeq.sortBy(-_.length).take(3)
      .map(n => (n, 123.456, 987.654))
    val d2 = Bench.diag2Line(engineMap, slow, Bench.TailBudget - fin.length)
    assert(d2.length + fin.length <= Bench.TailBudget,
      s"diag2(${d2.length}) + final(${fin.length}) exceed the tail window")
    // sbt's [success] trailer is ~75 bytes; the driver window is 2,000
    assert(Bench.TailBudget + 75 + 4 <= 2000)
  }

  test("diag2 carries per-leg gc/cpu/worst and slow-query attribution") {
    val slow = Seq(("e3_embedding_neardup", 16.9, 12.3))
    val d2 = Bench.diag2Line(engineMap, slow, 600)
    assert(d2.startsWith("""{"diag":2,"""))
    assert(d2.contains(""""enc":[21.3,0.1,84.5,25.9]"""), d2)
    assert(d2.contains(""""dec":[7.4,2.0,31.2,9.8]"""), d2)
    assert(d2.contains(""""e3_embedding_neardup":[16.9,12.3]"""), d2)
  }

  test("diag2 self-shrinks to the engine legs under a starved budget") {
    val slow = (1 to 3).map(i => (s"q${i}_very_long_query_name_here", 99.9, 99.9))
    val d2 = Bench.diag2Line(engineMap, slow, 110)
    assert(d2.length <= 110, s"minimal diag2 is ${d2.length} bytes:\n$d2")
    assert(d2.contains(""""enc":["""))
    assert(!d2.contains("slow"))
  }
}
