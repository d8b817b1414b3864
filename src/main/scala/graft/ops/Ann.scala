package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.functions.GraftFunctions._

/** Similarity search over an embedding column (SURVEY.md §2 E5/E6/E11).
  *
  * Numeric determinism: embedding floats are promoted to double and
  * scaled to exact integer µ-units (`round(x*1e6)`); dot products and
  * norms are then exact BIGINT folds, and the final cosine is a handful
  * of IEEE ops on exact inputs — bit-identical across engines, so even
  * ranking needs no rounding fudge.
  *
  * Scale posture: brute force broadcasts the (small) query set and is
  * one fact scan — the right baseline and the verifier for any ANN
  * index. IVF keeps a tiny centroid table (broadcast), routes each query
  * to its nearest cell, and only scans that cell — at 100 TB the cell
  * assignment is a partition-pruning key (store vectors bucketed by
  * cell id) so a probe touches 1/cells of the data.
  */
object Ann {

  /** Exact scaled-integer vector + its exact norm². Repartitions first:
    * embedding tables arrive as few parquet files, and the downstream
    * dot-product scans are CPU-bound — spread them across all cores. */
  def withScaledVec(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("svec", transform(col(embCol), x => scaled(x)))
      .withColumn("norm2", graft.functions.LongVecMath.norm2L(col("svec")))

  private def dotCol(a: Column, b: Column): Column =
    graft.functions.LongVecMath.dotL(a, b)

  /** DECIMAL(38,0) norm² / dot for GROUP-SUMMED vectors. A cell centroid
    * is the exact integer SUM of its members' svecs; correlated KMeans
    * cells at the 100× tier reach per-component sums ~2×10⁹·µ so the
    * 64-term long sum of squares passes int64 max (~9.2×10¹⁸ — observed
    * cnorm2 up to 3.4×10¹⁹) and the codegen'd long kernel wraps
    * SILENTLY, corrupting cell routing. Rule: per-row svec math
    * (components ≤ ±10⁶·µ, norm² ≤ 6.4×10¹³) stays on the codegen'd
    * long kernels; anything summed over a GROUP routes through these
    * exact DECIMAL(38) folds. The centroid table is ≤ cells rows and
    * the query side ≤ nQueries rows, so the non-codegen lambda cost is
    * irrelevant; the hot member-scan cosine is untouched.
    */
  private val Dec38 = DecimalType(38, 0)
  private val Dec19 = DecimalType(19, 0)
  private def decNorm2(v: Column): Column =
    aggregate(v, lit(0L).cast(Dec38),
      (acc, x) => acc + (x.cast(Dec19) * x.cast(Dec19)).cast(Dec38))
  private def decDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast(Dec19) * y.cast(Dec19)).cast(Dec38)),
      lit(0L).cast(Dec38), (acc, x) => acc + x)

  /** Cosine from exact integer dot and norms (double ops on exact ints). */
  private def cosCol(dot: Column, n1: Column, n2: Column): Column =
    dot.cast("double") / (sqrt(n1.cast("double")) * sqrt(n2.cast("double")))

  /** E5 — brute-force cosine top-k: queries = vec_id < nQueries. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame =
    bruteForceRank(emb, col("vec_id") < nQueries, k)

  /** E5 with an arbitrary query-membership predicate (the E49 fusion
    * path needs queries aligned with the lexical retriever's). */
  def bruteForceRank(emb: DataFrame, qPred: Column, k: Int): DataFrame = {
    val v = withScaledVec(emb).select(
      col("vec_id"), col("svec"), col("norm2"))
    val q = v.filter(qPred).select(
      col("vec_id").as("q_id"), col("svec").as("q_svec"), col("norm2").as("q_norm2"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        cosCol(dotCol(col("q_svec"), col("svec")), col("q_norm2"), col("norm2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Per-cell centroids in scaled-SUM space over an already-scaled
    * frame (cosine is scale-invariant, so the un-normalized exact
    * integer sum vector ranks identically to the mean — no float
    * averaging anywhere). `keyCol` is the coarse cell key. */
  private def centroidsFor(scaled: DataFrame, keyCol: String): DataFrame =
    scaled
      .select(col(keyCol), posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy(col(keyCol), col("pos"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col(keyCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s")).as("cvec"))
      .withColumn("cnorm2", decNorm2(col("cvec")))

  def labelCentroids(emb: DataFrame): DataFrame =
    centroidsFor(withScaledVec(emb), "label")

  /** Shared IVF probe: route each query to its `nprobe` nearest cell
    * centroids (tiny table, broadcast), then exact top-k over only the
    * probed cells' vectors. One corpus scan for centroids (amortized /
    * precomputed in a real index build), one probe scan bounded by
    * nprobe/cells of the data — at 100 TB the cell id is the
    * partition-pruning key, so the probe reads only those partitions. */
  private def ivfProbe(v: DataFrame, cellCol: String,
                       nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val q = v.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("svec").as("q_svec"), col("norm2").as("q_norm2"))
    val cents = centroidsFor(v, cellCol)

    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("ccos").desc, col(cellCol))
    val routed = q.crossJoin(broadcast(cents))
      .withColumn("ccos",
        cosCol(decDot(col("q_svec"), col("cvec")), col("q_norm2"), col("cnorm2")))
      .withColumn("crnk", row_number().over(wq))
      .filter(col("crnk") <= nprobe)
      .select(col("q_id"), col("q_svec"), col("q_norm2"), col(cellCol))

    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    v.join(broadcast(routed), Seq(cellCol))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        cosCol(dotCol(col("q_svec"), col("svec")), col("q_norm2"), col("norm2")))
      .withColumn("rnk", row_number().over(wv).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col(cellCol).cast(LongType).as(cellCol),
        col("vec_id"), col("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** E6 — IVF-style probe with the ground-truth label as the coarse
    * quantizer (the oracle-checkable stand-in; the learned path is
    * [[ivfTopKLearned]]). */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val v = withScaledVec(emb).select(
      col("vec_id"), col("label"), col("svec"), col("norm2"))
    ivfProbe(v, "label", nQueries, k, nprobe = 1)
  }

  /** E6 (learned) — IVF with a LEARNED coarse quantizer: `cells` maps
    * vec_id → cell (e.g. seeded KMeans from
    * [[graft.ml.EmbeddingClustering.assignCells]]), probing the
    * `nprobe` nearest cells per query. KMeans float math isn't
    * cross-engine-reproducible, so this query is rows-only checked; the
    * recall-vs-brute-force contract lives in OpsSpec. */
  def ivfTopKLearned(emb: DataFrame, cells: DataFrame,
                     nQueries: Int = 10, k: Int = 3, nprobe: Int = 2): DataFrame = {
    val v = withScaledVec(emb)
      .select(col("vec_id"), col("svec"), col("norm2"))
      .join(cells.select(col("vec_id"), col("cell")), Seq("vec_id"))
    ivfProbe(v, "cell", nQueries, k, nprobe)
  }

  /** Composed-functions SRP signature (bit j = sign of the j-th ±1
    * projection): the cross-check twin of the native
    * [[graft.functions.SrpSig.sigL]] expression — ExpressionSpec pins
    * them equal; the operator below uses the native single-pass form. */
  private[graft] def srpSigComposed(svec: Column, bits: Int, dim: Int): Column =
    (0 until bits).map { j =>
      val signs = array((0 until dim).map(i =>
        lit(graft.functions.SrpSig.srpSign(j, i))): _*)
      val proj = aggregate(zip_with(svec, signs, (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** E42 — diversity-preserving coreset selection: one representative
    * vector per occupied SRP bucket (min vec_id) plus the bucket's
    * population. The SRP signature partitions the sphere into 2^bits
    * angular cells, so keeping one member per cell prunes redundant
    * dense regions while every occupied direction keeps a witness — a
    * deterministic, embarrassingly-parallel stand-in for greedy
    * k-center selection (whose sequential greedy does not distribute).
    * One signature map + one bucket-keyed aggregation; bucket count is
    * capped at 2^bits regardless of corpus size, and `bits` is the
    * budget knob. */
  def srpCoreset(emb: DataFrame, bits: Int = 16): DataFrame =
    withScaledVec(emb.select(col("vec_id"), col("embedding")))
      .withColumn("sig", graft.functions.SrpSig.sigL(col("svec"), bits))
      .groupBy(col("sig"))
      .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("bucket_size"))
      .orderBy(col("rep_id"))

  /** E-section (embedding-cosine near-dup) — near-duplicate vector pairs
    * by exact cosine ≥ `minCos`, with candidate generation via a
    * `bits`-bit SRP signature: two vectors land in the same bucket iff
    * every signed projection agrees in sign, so near-identical vectors
    * collide and random pairs survive with probability ~(1/2)^bits.
    * MULTIPROBE (`oneBitProbes` = true): the probe side also visits every
    * signature one bit-flip away — Charikar buckets lose a pair whose
    * vectors straddle a single hyperplane, and 1-bit probing recovers
    * exactly those, at 17× probe fan-out and still ~17/2^16 random
    * collision odds. The pair join runs on signature buckets — NEVER
    * all-pairs; the exact-cosine verify touches only bucket collisions.
    * Projections are exact BIGINT sums, so bucket membership and the
    * final cosine are bit-identical cross-engine. `dupMod` injects
    * synthetic exact duplicates (id+10_000_000), the same recall probe
    * minhashLsh uses. */
  def embedCosineDups(emb: DataFrame, bits: Int = 16, dupMod: Long = 100,
                      minCos: Double = 0.999,
                      oneBitProbes: Boolean = true): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    val withDups = base.unionByName(
      base.filter(col("vec_id") % dupMod === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    val v = withScaledVec(withDups).select(col("vec_id"), col("svec"), col("norm2"))
    val sigged = v.withColumn("sig",
      graft.functions.SrpSig.sigL(col("svec"), bits))
    val l = sigged.select(col("sig"), col("vec_id").as("id1"),
      col("svec").as("svec1"), col("norm2").as("norm21"))
    // A pair (a,b) matches via exactly one mask (m = sig_a XOR sig_b when
    // that is 0 or a power of two), so candidates stay duplicate-free.
    val masks = lit(0L) +:
      (if (oneBitProbes) (0 until bits).map(j => lit(1L << j)) else Seq.empty)
    val r = sigged
      .withColumn("m", explode(array(masks: _*)))
      .select(col("sig").bitwiseXOR(col("m")).as("sig"),
        col("vec_id").as("id2"),
        col("svec").as("svec2"), col("norm2").as("norm22"))
    l.join(r, Seq("sig"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos",
        cosCol(dotCol(col("svec1"), col("svec2")), col("norm21"), col("norm22")))
      .filter(col("cos") >= minCos)
      .select(col("id1"), col("id2"), col("cos"))
      .orderBy(col("id1"), col("id2"))
  }

  /** E54 — embedding-space contamination screen: the semantic
    * complement of the E24/I24 n-gram screen, which only catches
    * VERBATIM benchmark leakage — a paraphrased or re-tokenized eval
    * row has no shared n-grams but keeps a near-identical embedding.
    * The held-out eval set is `vec_id % evalMod = 0`; every `leakMod`-th
    * eval vector is re-injected into the training side under a shifted
    * id (+10M — the family's standard synthetic-dup probe), and the
    * screen must recover exactly those: for each eval vector, the
    * count of training vectors with exact cosine ≥ `minCos`, the max
    * cosine, and the lowest-id offender.
    *
    * Candidates come from the E18 SRP discipline, ASYMMETRIC: the eval
    * side (a benchmark suite — bounded by definition) carries the 1-bit
    * probe fan-out and BROADCASTS, so the training corpus is scanned
    * once, joined on exact signature buckets, and never all-pairs. At
    * 100 TB: signature the train side on write, keep it bucketed by
    * sig, and a new benchmark screens in one bucket-pruned pass.
    * Projections/norms are exact BIGINT, so bucket membership and every
    * reported cosine replay bit-identically cross-engine. */
  def embedContamination(emb: DataFrame, evalMod: Long = 50,
                         leakMod: Long = 4, bits: Int = 16,
                         minCos: Double = 0.999): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    val eval0 = base.filter(col("vec_id") % evalMod === 0)
    // train = everything else, plus leaked copies of every leakMod-th
    // eval vector under a shifted id (the contamination to be found)
    val train = base.filter(col("vec_id") % evalMod =!= 0)
      .unionByName(
        eval0.filter(expr(s"(vec_id div $evalMod) % $leakMod") === 0)
          .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    def sigged(df: DataFrame) =
      withScaledVec(df)
        .withColumn("sig", graft.functions.SrpSig.sigL(col("svec"), bits))
    val t = sigged(train).select(col("sig"), col("vec_id").as("train_id"),
      col("svec").as("t_svec"), col("norm2").as("t_norm2"))
    val masks = lit(0L) +: (0 until bits).map(j => lit(1L << j))
    val q = sigged(eval0)
      .withColumn("m", explode(array(masks: _*)))
      .select(col("sig").bitwiseXOR(col("m")).as("sig"),
        col("vec_id").as("eval_id"),
        col("svec").as("q_svec"), col("norm2").as("q_norm2"))
    t.join(broadcast(q), Seq("sig"))
      .withColumn("cos",
        cosCol(dotCol(col("q_svec"), col("t_svec")),
          col("q_norm2"), col("t_norm2")))
      .filter(col("cos") >= minCos)
      // a (eval, train) pair can match through at most one mask
      // (m = sig_q XOR sig_t, 0 or a power of two), so no distinct
      // is needed before the per-eval aggregation
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_leaks"), max(col("cos")).as("max_cos"),
        min(col("train_id")).as("leak_id"))
      .orderBy(col("eval_id"))
  }

  /** E11 — per-label embedding stats, all exact integers. Unlike the
    * ANN paths, nothing downstream needs the scaled array itself, so the
    * norm is folded straight off the float column by the codegen'd
    * [[graft.functions.ScaledNorm2L]] — no intermediate array, no
    * interpreted transform. */
  def labelStats(emb: DataFrame): DataFrame =
    emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .withColumn("norm2",
        graft.functions.FloatVecStats.scaledNorm2L(col("embedding")))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("norm2")).as("sum_norm2"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"))
      .withColumn("label", col("label").cast(LongType))
      .orderBy(col("label"))

  /** H24's fixed-point DCG discount table: w_r = ⌊10⁶/log₂(r+1)⌋ for
    * ranks 1..10 — PINNED LITERALS, not computed, so no engine's log
    * implementation can leak into the hash (log is the one libm call
    * IEEE 754 does not require correctly rounded). */
  private[graft] val NdcgW: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /** H24 — NDCG@k of the E5 brute-force retrieval against the label
    * ground truth (Järvelin & Kekäläinen TOIS'02): each probe's top-k
    * neighbors are "relevant" iff they carry the probe's own label;
    * DCG folds the pinned fixed-point discount table (so gain at rank
    * r is w_r per relevant hit), and IDCG is the discount prefix-sum
    * at min(R, k) where R = same-label corpus vectors minus the probe
    * itself — the ideal ranking puts all R relevant first. ndcg_ppm =
    * 10⁶·DCG div IDCG, exact integers end-to-end; a probe whose label
    * has no other members pins 0 with R visible.
    *
    * Scale: rides E5's one broadcast-probe corpus scan; the per-label
    * relevant counts are a label-domain aggregate, broadcast back. */
  def ndcgAtK(emb: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    require(k <= NdcgW.size, s"discount table pinned to ${NdcgW.size}")
    val wArr = array(NdcgW.take(k).map(lit): _*)
    val pArr = array(NdcgW.take(k).scanLeft(0L)(_ + _).tail.map(lit): _*)
    val labels = emb.select(col("vec_id"), col("label").cast(LongType))
    val relCounts = emb.groupBy(col("label").cast(LongType).as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    bruteForceTopK(emb, nQueries, k)
      .join(broadcast(labels.select(col("vec_id").as("q_id"),
        col("label").as("q_label"))), Seq("q_id"))
      .join(labels.select(col("vec_id"), col("label").as("h_label")),
        Seq("vec_id"))
      .withColumn("rel",
        when(col("h_label") === col("q_label"), 1L).otherwise(0L))
      .groupBy(col("q_id"), col("q_label"))
      .agg(sum(col("rel")).as("n_rel_topk"),
        sum(col("rel") * element_at(wArr, col("rnk").cast("int")))
          .as("dcg_fp"))
      .join(broadcast(relCounts), Seq("q_label"))
      .withColumn("n_rel", col("n_label") - lit(1L))
      .withColumn("idcg_fp",
        when(col("n_rel") <= 0L, lit(0L))
          .otherwise(element_at(pArr,
            least(col("n_rel"), lit(k.toLong)).cast("int"))))
      .select(col("q_id"), col("q_label"), col("n_rel"),
        col("n_rel_topk"), col("dcg_fp"),
        when(col("idcg_fp") <= 0L, lit(0L))
          .otherwise(expr("1000000 * dcg_fp div idcg_fp"))
          .as("ndcg_ppm"))
      .orderBy(col("q_id"))
  }

  /** H25 — recall@k of the E6 IVF index against the E5 brute-force
    * ground truth: THE number an ANN deployment is judged by (how much
    * of the true top-k does the index surface at its probe budget).
    * recall_ppm = 10⁶·|IVF∩brute| div k per probe, with the cells the
    * probe actually searched alongside — single-cell routing (nprobe=1)
    * makes missed mass attributable. Both rankings break cosine ties
    * by vec_id, so the intersection is well-defined cross-engine.
    *
    * Scale: two index probes (each bounded as documented on its op)
    * and one k-row-per-probe join — eval cost is probe cost. */
  def recallAtK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val brute = bruteForceTopK(emb, nQueries, k)
      .select(col("q_id"), col("vec_id"))
    val approx = ivfTopK(emb, nQueries, k)
      .select(col("q_id"), col("vec_id"), col("label"))
    brute
      .join(approx.select(col("q_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_hit"),
        expr(s"1000000 * n_hit div ${k}L").as("recall_ppm"))
      .orderBy(col("q_id"))
  }
}
