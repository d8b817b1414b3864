package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BigramsL, DotL, Md5Prefix32, Norm2L, QuantStatsL, ScaledNorm2L, SimHashL, TokenStatsL}

/** Session extensions: registers the engine's native expressions for SQL
  * use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: the native as-of join's planner strategy
    // (logical AsOfJoinNode → AsOfJoinExec streaming merge).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Macro-node extension: BloomSemiNode expands into the BloomPrune
    // composition at the end of analysis, so the optimizer sees only
    // built-in operators (I16).
    ext.injectPostHocResolutionRule(s => graft.plans.BloomSemiExpandRule(s))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix32(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotL].getName, "dot_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotL(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("norm2_l"),
      new ExpressionInfo(classOf[Norm2L].getName, "norm2_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Norm2L(children.head)))
    ext.injectFunction((
      FunctionIdentifier("quant_stats_l"),
      new ExpressionInfo(classOf[QuantStatsL].getName, "quant_stats_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantStatsL(children.head)))
    ext.injectFunction((
      FunctionIdentifier("scaled_norm2_l"),
      new ExpressionInfo(classOf[ScaledNorm2L].getName, "scaled_norm2_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ScaledNorm2L(children.head)))
    ext.injectFunction((
      FunctionIdentifier("token_stats_l"),
      new ExpressionInfo(classOf[TokenStatsL].getName, "token_stats_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenStatsL(children.head)))
    ext.injectFunction((
      FunctionIdentifier("bigrams_l"),
      new ExpressionInfo(classOf[BigramsL].getName, "bigrams_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BigramsL(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes_l"),
      new ExpressionInfo(classOf[graft.functions.NgramHashesL].getName,
        "ngram_hashes_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NgramHashesL(children.head,
          children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_l"),
      new ExpressionInfo(classOf[graft.functions.MinHashSigL].getName,
        "minhash_sig_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.MinHashSigL(children.head,
          children(1).eval().asInstanceOf[Number].intValue(),
          children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("topk_min_l"),
      new ExpressionInfo(classOf[graft.functions.TopKMinL].getName, "topk_min_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new graft.functions.TopKMinL(children.head,
          children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("damerau_l"),
      new ExpressionInfo(classOf[graft.functions.DamerauL].getName,
        "damerau_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DamerauL(children.head, children(1),
          children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("simhash_l"),
      new ExpressionInfo(classOf[SimHashL].getName, "simhash_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashL(children.head,
          children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("srp_sig_l"),
      new ExpressionInfo(classOf[graft.functions.SrpSigL].getName, "srp_sig_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SrpSigL(children.head,
          children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("z_value_l"),
      new ExpressionInfo(classOf[graft.functions.ZValueL].getName, "z_value_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ZValueL(children.head, children(1),
          children(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("lexicon_hits_l"),
      new ExpressionInfo(classOf[graft.functions.LexiconHitsL].getName,
        "lexicon_hits_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.LexiconHitsL(children.head,
          children(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .toString.split(",").toSeq)))
    // I24 generator — usable as a SQL table-generating function:
    // SELECT doc_id, g FROM docs, LATERAL explode_ngram_hashes(text, 2)
    ext.injectFunction((
      FunctionIdentifier("explode_ngram_hashes"),
      new ExpressionInfo(classOf[graft.functions.NgramHashExplode].getName,
        "explode_ngram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NgramHashExplode(children.head,
          children(1).eval().asInstanceOf[Int])))
  }
}
