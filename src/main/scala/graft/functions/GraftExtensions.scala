package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Every graft Catalyst expression as one builder table, consumable two
  * ways:
  *
  *  - session-wide injection (the idiomatic Spark mechanism):
  *    {{{
  *    spark.sql.extensions = graft.functions.GraftExtensions
  *    }}}
  *    after which `SELECT cosine_sim(a, b)` etc. work in plain SQL on
  *    every session of the cluster, no per-session registration;
  *  - programmatic: [[GraftFunctions.registerAll]] on an existing
  *    session (what the per-op `register` helpers already do piecemeal).
  */
object GraftFunctions {

  /** name -> (description, builder) for every graft expression. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("prefix_varint_len", "encoded byte length of a u64 under prefix-varint",
      es => PrefixVarintLen(es.head)),
    ("zigzag_encode", "i64 -> u64 zigzag mapping",
      es => ZigZagEncode(es.head)),
    ("zigzag_decode", "u64 -> i64 zigzag inverse",
      es => ZigZagDecode(es.head)),
    ("encode_prefix_varint", "u64 -> canonical prefix-varint bytes",
      es => EncodePrefixVarint(es.head)),
    ("decode_prefix_varint", "prefix-varint bytes -> u64",
      es => DecodePrefixVarint(es.head)),
    ("simhash64", "64-bit simhash of a text",
      es => SimHash64(es.head)),
    ("lang_id", "n-gram/stopword language id of a text",
      es => LangIdExpr(es.head)),
    ("minhash_sig", "minhash signature lanes of a shingle set",
      es => MinHashSig(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].longValue())),
    ("word_ngrams", "distinct sorted word k-shingles of a text",
      es => WordNGrams(es(0), es(1))),
    ("sorted_jaccard_ge", "exact Jaccard of sorted arrays with threshold early-exit",
      es => SortedJaccardGE(es(0), es(1), es(2))),
    ("cosine_sim", "cosine similarity of two float/double vectors",
      es => CosineSim(es(0), es(1))),
    ("lsh_probes", "multi-table sign-LSH buckets with margin-ranked multiprobe",
      es => LshProbes(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue(),
        es(3).eval().asInstanceOf[Number].intValue(),
        es(4).eval().asInstanceOf[Number].intValue(),
        es(5).eval().asInstanceOf[Number].longValue())))

  private lazy val byName: Map[String, Seq[Expression] => Expression] =
    all.map(t => (t._1, t._3)).toMap

  /** Register everything on an existing session's function registry. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, _, _) => registerOne(spark, name) }

  /** One function by name — the per-expression `register` helpers
    * delegate here so this builder table is the SINGLE source of truth
    * (a builder change can't silently diverge between SQL-registered
    * and extension-injected forms).
    */
  def registerOne(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, byName(name), "built-in")
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * whole function surface at session build (survives new sessions,
  * works from pure SQL clients).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, _, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), builder))
    }
}
