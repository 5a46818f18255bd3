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

  /** Evaluate a builder argument that MUST be a literal (signature
    * parameters like numHashes/planes/seed). A non-foldable or null
    * argument raises a clear analysis-time IllegalArgumentException —
    * the repo's controlled-failure convention — instead of the raw
    * ClassCastException/unsupported-eval a bare `eval()` would throw.
    */
  private def litNum(fn: String, arg: String, e: Expression): Number = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n
      case null => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a non-null numeric literal")
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a numeric literal, " +
          s"got ${other.getClass.getSimpleName}")
    }
  }

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
        litNum("minhash_sig", "numHashes", es(1)).intValue(),
        litNum("minhash_sig", "seed", es(2)).longValue())),
    ("word_ngrams", "distinct sorted word k-shingles of a text",
      es => WordNGrams(es(0), es(1))),
    ("sorted_jaccard_ge", "exact Jaccard of sorted arrays with threshold early-exit",
      es => SortedJaccardGE(es(0), es(1), es(2))),
    ("cosine_sim", "cosine similarity of two float/double vectors",
      es => CosineSim(es(0), es(1))),
    ("lsh_probes", "multi-table sign-LSH buckets with margin-ranked multiprobe",
      es => LshProbes(es.head,
        litNum("lsh_probes", "dim", es(1)).intValue(),
        litNum("lsh_probes", "planes", es(2)).intValue(),
        litNum("lsh_probes", "tables", es(3)).intValue(),
        litNum("lsh_probes", "probes", es(4)).intValue(),
        litNum("lsh_probes", "seed", es(5)).longValue())),
    ("ivf_lists", "top-nprobe IVF centroid list ids for a vector",
      es => IvfLists(es.head, litCentroids("ivf_lists", es(1)),
        litNum("ivf_lists", "nprobe", es(2)).intValue())))

  /** Evaluate a builder argument that MUST be a literal
    * `array<array<double>>` — the IVF centroid matrix, which is
    * query-plan data (trained per job), not per-row data.
    */
  private def litCentroids(fn: String, e: Expression): Seq[Seq[Double]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: centroids must be a literal array<array<double>>, got ${e.sql}")
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ()
      case other => throw new IllegalArgumentException(
        s"$fn: centroids must be array<array<double>>, got $other")
    }
    e.eval() match {
      case ad: ArrayData =>
        ad.toObjectArray(ArrayType(DoubleType)).toSeq.map {
          case inner: ArrayData => inner.toDoubleArray().toSeq
          case _ => throw new IllegalArgumentException(
            s"$fn: centroids must contain no null rows")
        }
      case _ => throw new IllegalArgumentException(
        s"$fn: centroids must be a non-null literal array<array<double>>")
    }
  }

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
