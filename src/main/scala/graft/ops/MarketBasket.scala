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
    val items = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("nf"))
      .filter(col("nf") >= minSupport)
    val kept = items.join(freq.select(col("p")), Seq("p"), "left_semi")
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
}
