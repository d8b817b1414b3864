package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native token statistics over the raw TEXT column.
  *
  * The functions-only compositions (split → array_sort → aggregate HOF
  * for the distinct count, transform+aggregate for summed token length,
  * filter HOF per lexicon) run on Catalyst's interpreted
  * higher-order-function path, allocating intermediate arrays per row.
  * These expressions tokenize once inside whole-stage codegen and fold
  * everything in primitive loops. Tokenization is the SAME
  * `UTF8String.split(" ", -1)` the built-in `split(text, ' ')` uses, so
  * token boundaries (including empty tokens from repeated separators)
  * are identical to the composed forms and to DuckDB's string_split —
  * ExpressionSpec pins native == composed on real documents.
  */
object TextNative {

  private[functions] val Space = UTF8String.fromString(" ")

  def tokenStatsL(text: Column): Column =
    Bridge.column(TokenStatsL(Bridge.expression(text)))

  def lexiconHitsL(text: Column, lexicon: Seq[String]): Column =
    Bridge.column(LexiconHitsL(Bridge.expression(text), lexicon))

  def bigramsL(text: Column): Column =
    Bridge.column(BigramsL(Bridge.expression(text)))

  def ngramHashesL(text: Column, gram: Int): Column =
    Bridge.column(NgramHashesL(Bridge.expression(text), gram))

  /** h32 hashes of all `gram`-token windows in one tokenize pass — the
    * native form of `transform(sequence(1, n-gram+1), i ->
    * h32(array_join(slice(toks, i, gram), ' ')))`, which allocates a
    * slice array + joined string through the interpreted HOF path per
    * window. Hash identity is exact: the same space-joined window
    * string goes through the same [[Md5Prefix32.hash]]. */
  def ngramHashes(s: UTF8String, gram: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val parts = s.split(Space, -1)
    val n = parts.length
    if (n < gram)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val out = new Array[Long](n - gram + 1)
    val window = new Array[UTF8String](gram)
    var i = 0
    while (i <= n - gram) {
      var j = 0
      while (j < gram) { window(j) = parts(i + j); j += 1 }
      out(i) = Md5Prefix32.hash(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def ngramsL(text: Column, gram: Int): Column =
    Bridge.column(NgramsL(Bridge.expression(text), gram))

  /** The I24 generator form of [[ngramHashesL]]+explode — see
    * [[NgramHashExplode]]. Select it directly (Spark plans a Generate
    * node); emits (pos, g) columns. */
  def explodeNgramHashesL(text: Column, gram: Int): Column =
    Bridge.column(NgramHashExplode(Bridge.expression(text), gram))

  def simHashL(text: Column, bits: Int): Column =
    Bridge.column(SimHashL(Bridge.expression(text), bits))

  /** MinHash permutation params — canonical home (graft.ops.Dedup
    * re-exports them): k universal hashes `(a_i·x + b_i) mod P` over
    * one shared 32-bit base hash; P = Mersenne 2³¹−1, a_i·x < 2⁶³. */
  val MinhashP = 2147483647L
  def minhashA(i: Int): Long = 1103515245L + 12345L * i
  def minhashB(i: Int): Long = 1013904223L + 7919L * i

  def minHashSigL(text: Column, gram: Int, k: Int): Column =
    Bridge.column(MinHashSigL(Bridge.expression(text), gram, k))

  /** Fused shingle→h32→k-way running-min MinHash signature in ONE
    * tokenize pass: the native form of explode(shingles) → k
    * aggregated mins, which needs the shingle array materialized, a
    * generator, and a hash aggregate. Here each gram window is hashed
    * as it is formed (same [[Md5Prefix32.hash]] of the same
    * space-joined window) and folded into k running minima — the
    * signature operator becomes a pure MAP, so LSH candidate
    * generation starts with zero corpus shuffles. min over the window
    * MULTISET equals min over the set, so no per-doc dedup is needed;
    * values are bit-identical to the aggregation form (ExpressionSpec).
    * Fewer than `gram` tokens → empty array (callers filter those rows
    * out, as the composed path does). */
  def minHashSig(s: UTF8String, gram: Int, k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val parts = s.split(Space, -1)
    val n = parts.length
    if (n < gram)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val mins = Array.fill(k)(Long.MaxValue)
    val window = new Array[UTF8String](gram)
    var i = 0
    while (i <= n - gram) {
      var j = 0
      while (j < gram) { window(j) = parts(i + j); j += 1 }
      val x = Md5Prefix32.hash(UTF8String.concatWs(Space, window: _*))
      var f = 0
      while (f < k) {
        val v = (minhashA(f) * x + minhashB(f)) % MinhashP
        if (v < mins(f)) mins(f) = v
        f += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  /** Distinct-token majority-vote SimHash in one tokenize pass — the
    * native form of explode→distinct→per-bit vote→two aggregations
    * (which costs two corpus-token-sized shuffles). Distinctness is a
    * per-row HashSet (O(distinct tokens) memory, bounded by document
    * length); each new token's [[Md5Prefix32.hash]] votes ±1 on every
    * bit; bit b of the result is 1 iff its vote sum is > 0 — bit-for-bit
    * the aggregation form's semantics, so the fingerprints are
    * identical and the operator becomes a pure map. */
  def simHash(s: UTF8String, bits: Int): Long = {
    val parts = s.split(Space, -1)
    val seen = new java.util.HashSet[UTF8String](math.max(16, parts.length * 2))
    val votes = new Array[Int](bits)
    var i = 0
    while (i < parts.length) {
      if (seen.add(parts(i))) {
        val h = Md5Prefix32.hash(parts(i))
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Space-joined `gram`-token window array in one tokenize pass — the
    * native form of `transform(sequence(1, n-gram+1), i -> concat_ws(
    * ' ', ts[i-1..i+gram-2]))`, which walks the interpreted HOF path
    * and allocates a lambda frame per element. Fewer than `gram`
    * tokens → empty array (explode then drops the row, matching the
    * composed forms' size prefilters). */
  def ngrams(s: UTF8String, gram: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val parts = s.split(Space, -1)
    val n = parts.length
    val out = new Array[Any](math.max(0, n - gram + 1))
    val window = new Array[UTF8String](gram)
    var i = 0
    while (i <= n - gram) {
      var j = 0
      while (j < gram) { window(j) = parts(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Adjacent-token bigrams — the 2-gram case of [[ngrams]]. */
  def bigrams(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    ngrams(s, 2)

  /** (n_tokens, n_distinct, Σ token length) in one tokenize pass. */
  def tokenStats(s: UTF8String): InternalRow = {
    val parts = s.split(Space, -1)
    val seen = new java.util.HashSet[UTF8String](math.max(16, parts.length * 2))
    var sumLen = 0L
    var i = 0
    while (i < parts.length) {
      seen.add(parts(i))
      sumLen += parts(i).numChars()
      i += 1
    }
    InternalRow(parts.length.toLong, seen.size.toLong, sumLen)
  }

  // Per-JVM lexicon-set cache (lexicons are tiny static vocabularies;
  // executors rebuild identical sets independently).
  private val lexCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[UTF8String]]()

  /** Duplicate-counting lexicon hits (the `len(filter(toks, t ∈ lex))`
    * semantics the DuckDB twins mirror). `key` is the comma-joined
    * lexicon — words never contain commas. */
  def lexHits(s: UTF8String, key: String): Long = {
    val lex = lexCache.computeIfAbsent(key, k => {
      val hs = new java.util.HashSet[UTF8String]()
      k.split(",").foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    })
    val parts = s.split(Space, -1)
    var n = 0L
    var i = 0
    while (i < parts.length) {
      if (lex.contains(parts(i))) n += 1
      i += 1
    }
    n
  }
}

case class TokenStatsL(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("sl", LongType, nullable = false)))
  override def prettyName: String = "token_stats_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.tokenStats(s.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNative.tokenStats($s)")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsL =
    copy(child = newChild)
}

case class BigramsL(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bigrams_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.bigrams(s.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNative.bigrams($s)")

  override protected def withNewChildInternal(newChild: Expression): BigramsL =
    copy(child = newChild)
}

case class NgramsL(child: Expression, gram: Int) extends UnaryExpression {
  require(gram >= 1, "gram must be >= 1")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.ngrams(s.asInstanceOf[UTF8String], gram)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNative.ngrams($s, $gram)")

  override protected def withNewChildInternal(newChild: Expression): NgramsL =
    copy(child = newChild)
}

case class NgramHashesL(child: Expression, gram: Int) extends UnaryExpression {
  require(gram >= 1, "gram must be >= 1")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.ngramHashes(s.asInstanceOf[UTF8String], gram)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextNative.ngramHashes($s, $gram)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesL =
    copy(child = newChild)
}

case class MinHashSigL(child: Expression, gram: Int, k: Int)
    extends UnaryExpression {
  require(gram >= 1 && k >= 1, "gram and k must be >= 1")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.minHashSig(s.asInstanceOf[UTF8String], gram, k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextNative.minHashSig($s, $gram, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigL =
    copy(child = newChild)
}

case class SimHashL(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.simHash(s.asInstanceOf[UTF8String], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNative.simHash($s, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashL =
    copy(child = newChild)
}

case class LexiconHitsL(child: Expression, lexicon: Seq[String])
    extends UnaryExpression {
  require(lexicon.nonEmpty && lexicon.forall(w => !w.contains(",")),
    "lexicon words must be non-empty and comma-free")
  private val key = lexicon.mkString(",")

  override def dataType: DataType = LongType
  override def prettyName: String = "lexicon_hits_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  protected override def nullSafeEval(s: Any): Any =
    TextNative.lexHits(s.asInstanceOf[UTF8String], key)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("lexKey", key, "java.lang.String")
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNative.lexHits($s, $keyRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHitsL =
    copy(child = newChild)
}

/** I24 — custom Catalyst GENERATOR (the last extension shape in the
  * ladder after scalar expressions, TypedImperativeAggregate, and the
  * plan/strategy/exec triple): streams one (pos, g) row per n-gram
  * window through GenerateExec WITHOUT materializing the per-document
  * hash array first. `explode(ngram_hashes_l(text, n))` allocates an
  * 8·(tokens−n+1)-byte array per document before the Generate node
  * unpacks it — on book-length documents that is the allocation the
  * gopher-gate comment calls lethal; this generator tokenizes once and
  * emits windows lazily, so per-row transient state is the token
  * array alone. Hash identity with the array form is exact (same
  * window string, same [[Md5Prefix32.hash]]) — pinned in
  * ExpressionSpec, which is what lets it swap into E24's
  * contamination path with the oracle hash unchanged. */
case class NgramHashExplode(child: Expression, gram: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(gram >= 1, "gram must be >= 1")
  override def prettyName: String = "explode_ngram_hashes"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("g", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val parts = v.asInstanceOf[UTF8String].split(TextNative.Space, -1)
    val n = parts.length
    if (n < gram) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      private val window = new Array[UTF8String](gram)
      override def hasNext: Boolean = i <= n - gram
      override def next(): InternalRow = {
        var j = 0
        while (j < gram) { window(j) = parts(i + j); j += 1 }
        val h = Md5Prefix32.hash(UTF8String.concatWs(TextNative.Space, window: _*))
        val r = InternalRow(i.toLong, h)
        i += 1
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashExplode =
    copy(child = newChild)
}
