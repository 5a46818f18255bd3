package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registerAll: every graft function is callable from plain SQL") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq((1L, "the quick brown fox", Array(1.0f, 2.0f), Array(2.0f, 1.0f)))
      .toDF("v", "text", "a", "b").createOrReplaceTempView("gx")
    val row = spark.sql(
      """SELECT
           prefix_varint_len(300L) AS len,
           zigzag_decode(zigzag_encode(-5L)) AS zz,
           decode_prefix_varint(encode_prefix_varint(12345L)) AS rt,
           simhash64(text) AS sh,
           lang_id(text) AS lang,
           size(minhash_sig(word_ngrams(text, 2), 16, 42)) AS lanes,
           sorted_jaccard_ge(word_ngrams(text, 2), word_ngrams(text, 2), 0.5D) AS jac,
           cosine_sim(a, b) AS cos,
           size(lsh_probes(a, 2, 4, 3, 2, 42)) AS probes
         FROM gx""").collect()(0)
    assert(row.getAs[Number]("len").intValue === 2)
    assert(row.getAs[Number]("zz").longValue === -5L)
    assert(row.getAs[Number]("rt").longValue === 12345L)
    assert(row.getAs[Number]("lanes").intValue === 16)
    assert(row.getAs[Double]("jac") === 1.0)
    assert(math.abs(row.getAs[Double]("cos") - 0.8) < 1e-9)
    assert(row.getAs[Number]("probes").intValue === 3 * (1 + 2))
    spark.sql("DROP VIEW IF EXISTS gx")
  }

  test("literal-only builder args fail with a clear analysis error, not a cast crash") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq((1L, "a b c", Array(1.0f, 2.0f))).toDF("v", "text", "a")
      .createOrReplaceTempView("gx2")
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    // a column where a literal is required (numHashes / planes / seed)
    for (q <- Seq(
      "SELECT minhash_sig(word_ngrams(text, 2), CAST(v AS INT), 42) FROM gx2",
      "SELECT lsh_probes(a, 2, CAST(v AS INT), 3, 2, 42) FROM gx2",
      "SELECT minhash_sig(word_ngrams(text, 2), NULL, 42) FROM gx2")) {
      val ex = intercept[Exception](spark.sql(q).collect())
      assert(messages(ex).contains("must be a"), s"for $q got $ex")
    }
    spark.sql("DROP VIEW IF EXISTS gx2")
  }

  test("GraftExtensions injects the whole surface into SparkSessionExtensions") {
    // the config path (`spark.sql.extensions=graft.functions
    // .GraftExtensions`) applies exactly this: instantiate by class name
    // (what Spark does) and inject into a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    val f = Class.forName("graft.functions.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    f(ext) // must inject every builder without throwing
  }
}
