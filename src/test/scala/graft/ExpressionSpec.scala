package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.Md5Prefix32
import graft.sources.Tables

/** Native Md5Prefix32 expression: parity with the builtin composition,
  * null handling, SQL registration via GraftExtensions. */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("md5_prefix32 equals conv(substr(md5,1,8),16,10) on real tokens") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    val mismatches = toks
      .select(GraftFunctions.h32(col("t")).as("native"),
        GraftFunctions.h32Builtin(col("t")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(mismatches == 0)
  }

  test("md5_prefix32 is null-safe and handles empty strings") {
    val df = Seq(Some(""), Some("abc"), None).toDF("s")
      .select(GraftFunctions.h32(col("s")).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    // md5("abc") = 900150983c... -> 0x90015098
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 0x90015098L))
  }

  test("dot_l/norm2_l equal the HOF composition on real embeddings") {
    val v = Tables.embeddings(spark, sf)
      .withColumn("svec", transform(col("embedding"),
        x => GraftFunctions.scaled(x)))
    val mismatches = v.select(
      graft.functions.LongVecMath.norm2L(col("svec")).as("native"),
      aggregate(col("svec"), lit(0L), (acc, x) => acc + x * x).as("hof"),
      graft.functions.LongVecMath.dotL(col("svec"), col("svec")).as("dself"))
      .filter(col("native") =!= col("hof") || col("dself") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("quant_stats_l / scaled_norm2_l equal the HOF compositions on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    // scaled_norm2_l vs transform(scaled) + sum-of-squares fold
    val dbl = (x: org.apache.spark.sql.Column) => x.cast("double")
    val n2 = emb
      .withColumn("svec", transform(col("embedding"), x => GraftFunctions.scaled(x)))
      .select(
        graft.functions.FloatVecStats.scaledNorm2L(col("embedding")).as("native"),
        aggregate(col("svec"), lit(0L), (acc, x) => acc + x * x).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(n2 == 0)
    // quant_stats_l vs the max_abs + struct-fold composition
    val qs = emb
      .withColumn("max_abs",
        array_max(transform(col("embedding"), x => abs(dbl(x)))))
      .select(
        graft.functions.FloatVecStats.quantStatsL(col("embedding")).as("native"),
        aggregate(col("embedding"),
          struct(lit(0L).as("s"), lit(Long.MaxValue).as("mn"),
            lit(Long.MinValue).as("mx")),
          (acc, x) => {
            val q = round(dbl(x) * 127d / col("max_abs"))
              .cast(org.apache.spark.sql.types.LongType)
            struct((acc.getField("s") + q).as("s"),
              least(acc.getField("mn"), q).as("mn"),
              greatest(acc.getField("mx"), q).as("mx"))
          }).as("hof"))
      .filter(col("native.s") =!= col("hof.s") ||
        col("native.mn") =!= col("hof.mn") ||
        col("native.mx") =!= col("hof.mx"))
      .count()
    assert(qs == 0)
  }

  test("z_value_l equals the HOF bit-interleave fold") {
    val d = Tables.events(spark, sf).select(
      expr("user_id % 1024").as("d1"),
      expr("(ts_us div 3600000000) % 1024").as("d2"))
    val hof = expr(
      """aggregate(sequence(0, 9), 0L, (acc, i) ->
        |  acc + shiftleft(shiftright(d1, i) & 1L, 2*i)
        |      + shiftleft(shiftright(d2, i) & 1L, 2*i + 1))""".stripMargin)
    val mismatches = d.select(
      graft.functions.ZValue.zValueL(col("d1"), col("d2"), 10).as("native"),
      hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("srp_sig_l equals the composed per-bit fold on real embeddings") {
    val v = Tables.embeddings(spark, sf)
      .withColumn("svec", transform(col("embedding"),
        x => GraftFunctions.scaled(x)))
    val mismatches = v.select(
      graft.functions.SrpSig.sigL(col("svec"), 16).as("native"),
      graft.ops.Ann.srpSigComposed(col("svec"), 16, 64).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
    // signatures actually discriminate (not all vectors in one bucket)
    val distinct = v.select(
      graft.functions.SrpSig.sigL(col("svec"), 16).as("s"))
      .distinct().count()
    assert(distinct > 100)
  }

  test("token_stats_l / lexicon_hits_l equal the composed HOF forms on real docs") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      // exercise empty tokens and an empty string too
      .unionByName(Seq((900001L, "a  b "), (900002L, "")).toDF("doc_id", "text"))
    val toks = split(col("text"), " ")
    val lex = graft.ops.TextAnalysis.Lexicons.flatMap(_._2)
    val mismatches = docs
      .withColumn("ts", graft.functions.TextNative.tokenStatsL(col("text")))
      .select(
        col("ts.n").as("n_native"), size(toks).cast("long").as("n_hof"),
        col("ts.d").as("d_native"), GraftFunctions.nDistinct(toks).as("d_hof"),
        col("ts.sl").as("sl_native"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sl_hof"),
        graft.functions.TextNative.lexiconHitsL(col("text"), lex).as("lx_native"),
        graft.ops.TextAnalysis.lexiconHits(toks, lex).as("lx_hof"))
      .filter(col("n_native") =!= col("n_hof") ||
        col("d_native") =!= col("d_hof") ||
        col("sl_native") =!= col("sl_hof") ||
        col("lx_native") =!= col("lx_hof"))
      .count()
    assert(mismatches == 0)
  }

  test("bigrams_l equals the composed transform(sequence(...)) on real docs") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      // empty tokens, single token, empty string
      .unionByName(Seq((900001L, "a  b "), (900002L, "solo"), (900003L, ""))
        .toDF("doc_id", "text"))
    val ts = split(col("text"), " ")
    val composed = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))
    val mismatches = docs
      .select(graft.functions.TextNative.bigramsL(col("text")).as("nat"),
        composed.as("hof"))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("ngram_hashes_l equals the composed slice+join+h32 HOF on real docs") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "a  b c "), (900002L, "x y"), (900003L, ""))
        .toDF("doc_id", "text"))
    for (gram <- Seq(2, 3)) {
      val ts = split(col("text"), " ")
      val composed = when(size(ts) >= gram,
        transform(sequence(lit(1), size(ts) - (gram - 1)),
          i => GraftFunctions.h32(array_join(slice(ts, i, lit(gram)), " "))))
        .otherwise(array().cast("array<bigint>"))
      val mismatches = docs
        .select(graft.functions.TextNative.ngramHashesL(col("text"), gram).as("nat"),
          composed.as("hof"))
        .filter(col("nat") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"gram=$gram")
    }
  }

  test("simhash_l equals the composed explode+vote aggregation on real docs") {
    // Edge rows: repeated separators (empty tokens), single token, empty
    // string — the same adversarial shapes the other native pins use.
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "a  b a"), (900002L, "solo"), (900003L, ""))
        .toDF("doc_id", "text"))
    val nat = graft.ops.Dedup.simhash(docs)
    val comp = graft.ops.Dedup.simhashComposed(docs)
    assert(nat.exceptAll(comp).isEmpty && comp.exceptAll(nat).isEmpty)
  }

  test("minhash_sig_l equals the explode+min aggregation on real docs") {
    val k = 8
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val composed = graft.ops.Dedup.withMinhashSig(
      graft.ops.Dedup.withShingles(docs, distinct = false), k)
    val native = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("sigarr",
        graft.functions.TextNative.minHashSigL(col("text"), 3, k))
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("sigarr"), i + 1).as(s"sig_$i")): _*)
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
    // short docs (< 3 tokens) yield an empty signature array
    import spark.implicits._
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(graft.functions.TextNative.minHashSigL(col("text"), 3, k).as("s"))
      .collect()
    assert(short.head.getSeq[Long](0).isEmpty)
  }

  test("registered as SQL function through GraftExtensions") {
    val ext = new GraftExtensions
    // register on the shared session's function registry directly
    val spark2 = spark.newSession()
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions {})
    // simplest end-to-end: inject into the live registry
    spark2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", exprs => Md5Prefix32(exprs.head), "built-in")
    val r = spark2.sql("SELECT md5_prefix32('abc') AS h").collect()
    assert(r.head.getLong(0) == 0x90015098L)
  }

  test("every native function answers from pure SQL on the extended session") {
    // The SparkSpec session is built withExtensions(GraftExtensions),
    // so this is the REAL user-facing SQL surface — one smoke call per
    // registered name (incl. the r4 additions srp_sig_l / z_value_l /
    // lexicon_hits_l), each checked against a hand value or invariant.
    val rows = spark.sql("""
      SELECT
        md5_prefix32('abc')                           AS a,
        dot_l(array(1L, 2L), array(3L, 4L))           AS b,
        norm2_l(array(3L, 4L))                        AS c,
        token_stats_l('x y x').n                      AS d,
        token_stats_l('x y x').d                      AS e,
        size(bigrams_l('a b c'))                      AS f,
        size(ngram_hashes_l('a b c d', 3))            AS g,
        size(minhash_sig_l('a b c d e', 3, 4))        AS h,
        simhash_l('a b c d', 16)                      AS i,
        z_value_l(3L, 5L, 4)                          AS j,
        srp_sig_l(array(1000000L, -1000000L), 8)      AS k,
        lexicon_hits_l('spam and ham', 'spam,eggs')   AS l,
        quant_stats_l(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT))).mx AS m,
        scaled_norm2_l(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))    AS n
    """).collect().head
    assert(rows.getLong(0) == 0x90015098L)            // md5 prefix of 'abc'
    assert(rows.getLong(1) == 11L)                    // 1·3 + 2·4
    assert(rows.getLong(2) == 25L)                    // 3² + 4²
    assert(rows.getLong(3) == 3L && rows.getLong(4) == 2L)
    assert(rows.getInt(5) == 2 && rows.getInt(6) == 2)
    assert(rows.getInt(7) == 4)                       // k signature slots
    assert(rows.getLong(9) == 39L)                    // interleave(11,101)=100111
    assert(rows.getLong(10) >= 0L && rows.getLong(10) < 256L) // 8-bit bucket
    assert(rows.getLong(11) == 1L)                    // one lexicon hit
    assert(rows.getLong(12) == 64L)   // int8 max: round(1.0 · 127/2)
    assert(rows.getLong(13) > 0L)
    // the aggregate goes through GROUP BY, not a scalar projection
    val tk = spark.sql(
      "SELECT topk_min_l(v, 2) AS tk FROM VALUES (5L),(1L),(3L) AS t(v)")
      .collect().head.getSeq[Long](0)
    assert(tk == Seq(1L, 3L))
    // the generator goes through a Generate node, from SQL
    val gn = spark.sql(
      "SELECT explode_ngram_hashes(t.s, 2) FROM VALUES ('a b c') AS t(s)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gn.length == 2 && gn.map(_._1).toSeq == Seq(0L, 1L))
  }

  test("I24 generator streams the same (pos, hash) rows as posexplode of the array") {
    import graft.functions.TextNative
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    for (gram <- Seq(2, 3)) {
      val gen = docs
        .select(col("doc_id"), TextNative.explodeNgramHashesL(col("text"), gram))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val arr = docs
        .select(col("doc_id"),
          posexplode(TextNative.ngramHashesL(col("text"), gram)))
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
      assert(gen == arr, s"gram=$gram: generator diverged from array form")
      assert(gen.nonEmpty)
    }
    // short/empty docs emit nothing, matching explode of the empty array
    val none = Seq((1L, "one two"), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextNative.explodeNgramHashesL(col("text"), 3))
      .count()
    assert(none == 0L)
  }

  test("I26: damerau_l — unrestricted DL, threshold contract, SQL path") {
    import graft.functions.DamerauL
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // the OSA discriminator: unrestricted DL edits inside a transposed
    // block ("ca"→"ac"→"abc" = 2); OSA forbids it and answers 3
    assert(DamerauL.dist(u("ca"), u("abc"), 5) == 2L)
    assert(DamerauL.dist(u("abcd"), u("acbd"), 5) == 1L)  // one swap
    assert(DamerauL.dist(u("kitten"), u("sitting"), 5) == 3L)
    assert(DamerauL.dist(u(""), u("ab"), 5) == 2L)
    assert(DamerauL.dist(u("same"), u("same"), 0) == 0L)
    // threshold: -1 past max, including the length-difference fast cut
    assert(DamerauL.dist(u("kitten"), u("sitting"), 2) == -1L)
    assert(DamerauL.dist(u("a"), u("abcdef"), 2) == -1L)
    // column + SQL registration paths agree with the kernel
    val df = Seq(("paspsort", "passport"), ("1234567", "1243567"))
      .toDF("a", "b")
    assert(df.select(DamerauL(col("a"), col("b"), 3)).collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 1L))
    df.createOrReplaceTempView("dl_t")
    assert(spark.sql("SELECT damerau_l(a, b, 3) FROM dl_t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 1L))
  }
}
