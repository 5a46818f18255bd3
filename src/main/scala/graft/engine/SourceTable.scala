package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's input row (BASELINE.json `input_hint`): one file version
  * in an Iceberg-shaped table of source-code repositories.
  */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic synthesizer for the source-code table (FIXTURES.md §1).
  * No external data, no wall clock: every field is a pure function of
  * (seed, rowId), generated distributedly from `spark.range`, so any
  * scale factor reproduces bit-identically across runs and cluster sizes.
  *
  * Repos are zipf-distributed (a few giant repos exercise the skew
  * handling); content is pseudo-source text with per-lang keyword
  * vocabulary and a long-tail size distribution (~0.1-50 KB).
  */
object SourceTable {

  private val Langs = Array("scala", "rust", "py", "java", "c", "cpp",
    "go", "js", "ts", "md", "json", "txt")

  private val Exts = Map(
    "scala" -> "scala", "rust" -> "rs", "py" -> "py", "java" -> "java",
    "c" -> "c", "cpp" -> "cc", "go" -> "go", "js" -> "js", "ts" -> "ts",
    "md" -> "md", "json" -> "json", "txt" -> "txt")

  private val VocabByLang: Map[String, Array[String]] = Map(
    "scala" -> Array("def", "val", "case class", "object", "match", "map", "filter", "implicit", "override", "extends"),
    "rust" -> Array("fn", "let", "mut", "impl", "match", "pub", "struct", "enum", "trait", "unsafe"),
    "py" -> Array("def", "class", "import", "return", "self", "lambda", "yield", "async", "await", "with"),
    "java" -> Array("public", "static", "void", "class", "final", "return", "new", "extends", "implements", "throws"),
    "c" -> Array("int", "char", "void", "struct", "return", "sizeof", "static", "const", "typedef", "union"),
    "cpp" -> Array("template", "class", "namespace", "virtual", "const", "auto", "return", "public", "private", "inline"),
    "go" -> Array("func", "var", "type", "struct", "interface", "defer", "go", "chan", "range", "return"),
    "js" -> Array("function", "const", "let", "return", "async", "await", "export", "import", "class", "new"),
    "ts" -> Array("interface", "type", "const", "function", "export", "import", "enum", "readonly", "extends", "implements"),
    "md" -> Array("#", "##", "the", "a", "build", "install", "usage", "example", "see", "notes"),
    "json" -> Array("\"name\":", "\"value\":", "\"id\":", "\"type\":", "\"items\":", "{", "}", "[", "]", "null"),
    "txt" -> Array("the", "and", "of", "to", "in", "a", "is", "for", "with", "on"))

  final val NumRepos = 50

  // zipf weights 1/rank over NumRepos repos, cumulative for sampling
  private lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(NumRepos)(i => 1.0 / (i + 1))
    val total = w.sum
    val cum = new Array[Double](NumRepos)
    var acc = 0.0
    var i = 0
    while (i < NumRepos) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(NumRepos - 1) = 1.0
    cum
  }

  /** Stateless row generator: everything derives from (seed, id). */
  def row(seed: Long, id: Long): SourceFile = {
    val rnd = new java.util.Random(seed * 1000003L + id * 2654435761L)
    val u = rnd.nextDouble()
    var repoIdx = java.util.Arrays.binarySearch(zipfCum, u)
    if (repoIdx < 0) repoIdx = -repoIdx - 1
    val repo = s"org${repoIdx % 7}/repo$repoIdx"
    val lang = Langs(rnd.nextInt(Langs.length))
    val dirDepth = 1 + rnd.nextInt(4)
    val dirs = (0 until dirDepth).map(d => s"d${rnd.nextInt(8)}").mkString("/")
    val path = s"src/$dirs/file_$id.${Exts(lang)}"
    val nCommits = 1 + (repoIdx * 37 % 100) // fixed per repo, 1..100
    val commitIdx = rnd.nextInt(nCommits)
    val commit = {
      // 40 hex chars from two mixed 64-bit hashes of (repoIdx, commitIdx)
      val h1 = mix(repoIdx.toLong * 31 + commitIdx, seed)
      val h2 = mix(commitIdx.toLong * 131 + repoIdx, seed + 1)
      val h3 = mix(h1 ^ h2, seed + 2)
      f"$h1%016x$h2%016x${h3 & 0xff}%02x".take(40)
    }
    // long-tail content size: most files ~100-2000 chars, tail to ~50KB
    val t = rnd.nextDouble()
    val targetChars = 100 + (t * t * t * t * t * t * t * t * 50000).toInt
    val vocab = VocabByLang(lang)
    val sb = new java.lang.StringBuilder(targetChars + 128)
    while (sb.length < targetChars) {
      val lineLen = 10 + rnd.nextInt(110)
      val start = sb.length
      sb.append("  " * rnd.nextInt(4))
      while (sb.length - start < lineLen && sb.length < targetChars) {
        sb.append(vocab(rnd.nextInt(vocab.length))).append(' ')
          .append('x').append(rnd.nextInt(100)).append(' ')
      }
      sb.append('\n')
    }
    SourceFile(repo, path, commit, lang, sb.toString)
  }

  @inline private def mix(v: Long, seed: Long): Long = {
    var h = v + seed * 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Distributed deterministic synthesis via `spark.range` (Catalyst scan,
    * no RDD): scales to any row count; each task generates its id range.
    */
  def synthesize(spark: SparkSession, rows: Long, partitions: Int = 32,
                 seed: Long = 42L): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, rows, 1L, partitions).map(id => row(seed, id))
  }
}
