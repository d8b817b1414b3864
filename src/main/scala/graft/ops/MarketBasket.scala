package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D60 — frequent co-purchase pairs (Apriori 2-itemsets, Agrawal &
  * Srikant VLDB'94) with exact integer lift: which parts ride in the
  * same order more often than chance. The market-basket staple every
  * warehouse runs over its fact table.
  *
  * Scale posture: the candidate space is pruned BEFORE the pair join by
  * Apriori monotonicity — an item appearing in fewer than `minSupport`
  * orders cannot be in a frequent pair, so the self-join input drops
  * the long singleton tail first (on real catalogs, most of the
  * domain). The self-join is one hash exchange on the order key with
  * per-order fan-out ≤ basket², and baskets are small by nature (TPC-H
  * ≤ 7 lines); the pair aggregate shuffles on (p1, p2), which spreads
  * hot items across reducers — a bestseller pair is one hot KEY, the
  * AQE skew-split case, not a hot partition by construction. Lift is
  * exact ppm: n·N·10⁶ div (n₁·n₂), all BIGINTs (n·N·10⁶ ≤ 10¹⁸ while
  * pair support stays under ~10⁶ · baskets). */
object MarketBasket {

  /** Output: (p1, p2, n_orders, lift_ppm), p1 < p2, support ≥
    * `minSupport` co-occurring orders. */
  def coPurchase(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    // items/freq/kept each feed SEVERAL downstream consumers (freq, the
    // semi-join, tot; both sides of the pair self-join; the two lift
    // joins). Un-materialized, every consumer re-derives its whole
    // subtree from the fact scan — the r14 plan audit measured the
    // un-cut form at 18 parquet scans / 34 exchanges for this one
    // query. Eager localCheckpoints (the I10 discipline) pin each
    // frame once; all three are basket/item-contracted, far below the
    // fact table, so the materialization is the §8 lightweight proxy.
    val items = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("nf"))
      .filter(col("nf") >= minSupport)
      .localCheckpoint(true)
    val kept = items.join(freq.select(col("p")), Seq("p"), "left_semi")
      .localCheckpoint(true)
    val tot = items.select(col("o")).distinct().agg(count(lit(1)).as("tot"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
      .join(freq.select(col("p").as("p1"), col("nf").as("nf1")), Seq("p1"))
      .join(freq.select(col("p").as("p2"), col("nf").as("nf2")), Seq("p2"))
      .crossJoin(broadcast(tot))
      .select(col("p1"), col("p2"), col("n_orders"),
        expr("(n_orders * tot * 1000000L) div (nf1 * nf2)").as("lift_ppm"))
      .orderBy(col("p1"), col("p2"))
  }

  /** D95 — neighbor-overlap LINK PREDICTION over the co-purchase graph
    * (Liben-Nowell & Kleinberg CIKM'03, the common-neighbors /
    * Jaccard family): for part pairs NOT yet co-purchased, score how
    * strongly the graph implies the edge — cn = |Γ(a) ∩ Γ(c)| common
    * co-purchase partners, jaccard_ppm = 10⁶·cn div (deg a + deg c −
    * cn) — the "customers also bought" candidate generator, and the
    * same machinery that proposes entity-resolution merges. Exact
    * integers end-to-end.
    *
    * Scale posture: two hub caps, one per explosion. (1) `maxFreq`
    * drops parts in more than that many baskets BEFORE the pair join —
    * the EDGE BUILD is Σ basket² rows, and under Zipf skew one part in
    * 20% of all orders alone makes that corpus-quadratic (the 10×
    * tier's DuckDB twin filled 75 GB of spill before this cap
    * existed; such a part's degree is far past maxDeg anyway, so at
    * plausible basket shapes it predicts nothing — documented
    * semantics, like the E38 df gate). (2) `maxDeg` drops hub NODES
    * of the support-filtered graph before the wedge join, so candidate
    * volume is ≤ Σ deg(n)² ≤ maxDeg·|E| — linear in edges at fixed
    * cap. After both caps the a<c orientation finds each candidate
    * wedge once, the existing-edge anti-join runs on the wedge output
    * (graph-sized), and the final top-k is one bounded sort. */
  def linkPredict(lineitem: DataFrame, minSupport: Long = 2,
                  maxDeg: Long = 60, topK: Int = 20,
                  maxFreq: Long = 1000): DataFrame = {
    // Same lineage-cut posture as [[coPurchase]], one level deeper: the
    // r14 plan audit measured the un-cut form at 203 parquet scans /
    // 313 exchanges — `edges` alone has four consumers (deg, both adj
    // directions, the existing-edge anti-join) and each re-derivation
    // multiplied the whole basket self-join back in. Every pinned frame
    // is graph-sized (edges/deg/adj), bounded by the caps documented
    // above — the §8 lightweight proxy, never the fact table.
    val items = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    // one basket-count pass serves BOTH gates: Apriori support floor
    // and the hub-frequency ceiling
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("nf"))
      .filter(col("nf") >= minSupport && col("nf") <= maxFreq)
    val kept = items.join(freq.select(col("p")), Seq("p"), "left_semi")
      .localCheckpoint(true)
    val edges = kept.as("a")
      .join(kept.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
      .select(col("p1"), col("p2"))
      .localCheckpoint(true)
    val deg = edges.select(col("p1").as("p"))
      .unionByName(edges.select(col("p2").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg)
      .localCheckpoint(true)
    val adj = edges.select(col("p1").as("x"), col("p2").as("nbr"))
      .unionByName(edges.select(col("p2").as("x"), col("p1").as("nbr")))
      .join(deg.select(col("p").as("x")), Seq("x"), "left_semi")
      .join(deg.select(col("p").as("nbr")), Seq("nbr"), "left_semi")
      .localCheckpoint(true)
    val wedges = adj.select(col("x").as("a"), col("nbr").as("n"))
      .join(adj.select(col("nbr").as("n"), col("x").as("c")), Seq("n"))
      .filter(col("a") < col("c"))
      .groupBy(col("a"), col("c"))
      .agg(count(lit(1)).as("cn"))
    wedges
      .join(edges.select(col("p1").as("a"), col("p2").as("c")),
        Seq("a", "c"), "left_anti")
      .join(deg.select(col("p").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("p").as("c"), col("deg").as("deg_c")), Seq("c"))
      .select(col("a").as("p1"), col("c").as("p2"), col("cn"),
        col("deg_a"), col("deg_c"),
        expr("1000000 * cn div (deg_a + deg_c - cn)").as("jaccard_ppm"))
      .orderBy(col("cn").desc, col("jaccard_ppm").desc, col("p1"),
        col("p2"))
      .limit(topK)
  }
}
