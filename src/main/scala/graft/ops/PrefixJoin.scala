package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** E41 — EXACT set-similarity self-join via prefix filtering
  * (AllPairs / PPJoin, Bayardo et al. WWW'07): every pair with shingle
  * Jaccard ≥ t, with NO false negatives — the deterministic complement
  * of MinHash-LSH (E3), which trades recall for cost. The oracle is the
  * brute-force all-shared-gram join, so the hash check proves
  * exactness, not just cross-engine mechanics.
  *
  * The filter: order each doc's distinct grams by global rarity
  * (df asc, gram asc — one TOTAL order both engines agree on) and keep
  * only the first L − ⌈t·L⌉ + 1 as its PREFIX. Two sets with
  * Jaccard ≥ t must overlap inside their prefixes (pigeonhole), so the
  * candidate join runs on prefix grams only — the RAREST ~(1−t) of
  * each doc, exactly the grams with the shortest posting lists. The
  * threshold is integer math throughout: prefix length
  * L − (tNum·L + tDen−1) div tDen + 1 and the final gate
  * tDen·inter ≥ tNum·(szA + szB − inter); jaccard is emitted as one
  * IEEE division for the report only.
  *
  * Scale: the gram work runs over DISTINCT CONTENTS, not docs — the
  * I14 contraction. On a dup-heavy corpus (the norm for crawls, and
  * the 10× replica corpus where every text sits in a 10-clique) the
  * naive doc-level join measured a 240 s TIMEOUT at 10×: identical
  * texts share every prefix gram, so candidates and verification rows
  * grow with replication². Contracted, the gram/candidate/verify cost
  * depends only on distinct contents; doc-level pairs come back via
  * two group-membership joins (within-group pairs are jaccard 1 BY
  * IDENTITY — no gram work), linear in output size. Remaining stages:
  * one (content,gram) shuffle, one gram-df shuffle, a per-content
  * ordering window, the prefix candidate join, and a verification
  * join of Σ|A∩B| over candidate CONTENT pairs.
  */
object PrefixJoin {

  /** Candidate-pair budget for [[jaccardJoin]]'s fail-fast pre-probe.
    * Σ_g C(prefix_df_g, 2) over the prefix table upper-bounds the
    * candidate join's row count (before the length/positional cuts).
    * The r5 unique-content probe measured the exact join degrading
    * slowly — 773 s and a 24 GB driver heap at 30× distinct contents —
    * instead of failing fast; past this bound the exact tool is the
    * wrong tool and the caller should take the E3 MinHash-LSH +
    * E2 exact-verify path, which spends candidate work only where the
    * bands collide.
    */
  val DefaultCandidateBudget: Long = 200000000L

  def jaccardJoin(docs: DataFrame, tNum: Int = 7, tDen: Int = 10,
                  dupMod: Long = 250,
                  maxCandidates: Long = DefaultCandidateBudget): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val withCh = Dedup.withSyntheticDups(docs, dupMod)
      .select(col("doc_id"), col("text"), md5(col("text")).as("ch"))
    // reps is reused by repDocs, members, and (via members) both
    // expansion joins — eagerly materialized ONCE. It is content-count
    // sized and carries only (hash, id, count): tiny relative to the
    // corpus, unlike the text-bearing frame (which stays lazy — its
    // re-scan is parquet-scan-bound).
    val reps = withCh.groupBy(col("ch"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("gsz"))
      .localCheckpoint(true)
    // one representative text per distinct content (rep ids are unique
    // doc ids, so a semi-join on doc_id picks exactly the rep rows)
    val repDocs = withCh
      .join(reps.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val grams = repDocs
      .repartition(par, col("doc_id"))
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.TextNative.ngramsL(col("text"), 3)).as("g"))
      .distinct()
      // three consumers (df table, prefix ordering, the verification
      // gram-set build) — un-cut, each re-ran the text scan + shingle
      // explode + (doc,gram) distinct shuffle (34 parquet scans in the
      // r14 plan audit). Distinct-content gram rows, the same unit the
      // prefix checkpoint below already pins a subset of.
      .localCheckpoint(true)
    val dfTab = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    // sz rides the SAME doc_id window exchange as the prefix ordering
    // (empty frame spec → no extra sort) instead of a separate
    // aggregation + join, and then travels WITH the candidate pairs —
    // the old plan re-joined a sizes table twice after verification.
    val wSz = Window.partitionBy(col("doc_id"))
    val prefix = grams.join(dfTab, Seq("g"))
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(wSz))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) div $tDen") + 1)
      .select(col("g"), col("doc_id"), col("sz"), col("pos"))
      // reused by BOTH sides of the candidate join, the sizes frame,
      // and the budget probe below — materialize once. Prefix rows are
      // the rarest ~(1−t) fraction of the distinct-content gram volume,
      // so the checkpoint is a strict subset of a shuffle this plan
      // already paid for.
      .localCheckpoint(true)
    // Fail-fast candidate budget: Σ_g C(c_g, 2) over prefix posting
    // counts is an upper bound on candidate-join rows (the length and
    // positional filters only shrink it). Per-gram prefix postings grow
    // linearly with distinct contents sharing vocabulary, so this term
    // is inherently superlinear — an exact all-pairs join past the
    // budget degrades into hours, not minutes. Abort with the scalable
    // alternative named rather than degrade slowly (VERDICT r5 #3).
    val candBound = prefix.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("pairs"))
      .head().getLong(0)
    if (candBound > maxCandidates)
      throw new IllegalStateException(
        s"E41 exact prefix join: candidate upper bound $candBound exceeds " +
          s"budget $maxCandidates. The exact AllPairs/PPJoin is " +
          "superlinear in distinct contents sharing vocabulary; at this " +
          "scale use the MinHash-LSH candidate path with exact " +
          "verification instead (graft.ops.Dedup.minhashLsh + verifyCore " +
          "— E3 + E2), or raise maxCandidates explicitly.")
    // Length filter (AllPairs): J ≥ t ⟹ |A∩B| ≤ min(sz) and
    // |A∩B| ≥ t·max(sz), so tDen·min ≥ tNum·max — pairs outside the
    // size band are pruned BEFORE the distinct and the verification
    // joins. Positional filter (PPJoin, Xiao et al. WWW'08): a shared
    // gram at ranks (pos1, pos2) of the common (df, g) total order
    // bounds the achievable overlap by 1 + min(sz1−pos1, sz2−pos2);
    // rows under minoverlap = ⌈tNum·(sz1+sz2)/(tNum+tDen)⌉ are pruned.
    // Exact: a truly-similar pair's FIRST shared gram lies in both
    // prefixes and satisfies the bound, so ≥1 row always survives.
    // This is the candidate-quadratic term's throttle: per-gram prefix
    // df grows linearly with distinct contents, and the r5 unique-
    // content 10× probe measured the unfiltered join at 142× candidate
    // rows for 11× contents — the positional cut prunes the late-rank
    // mass that can never verify.
    val cand = prefix.select(col("g"), col("doc_id").as("id1"),
        col("sz").as("sz1"), col("pos").as("pos1"))
      .join(prefix.select(col("g"), col("doc_id").as("id2"),
        col("sz").as("sz2"), col("pos").as("pos2")), Seq("g"))
      .filter(col("id1") < col("id2") &&
        lit(tDen) * least(col("sz1"), col("sz2")) >=
          lit(tNum) * greatest(col("sz1"), col("sz2")))
      .filter(lit(1L) + least(col("sz1") - col("pos1"), col("sz2") - col("pos2")) >=
        expr(s"($tNum * (sz1 + sz2) + ${tNum + tDen - 1}) div ${tNum + tDen}"))
      .select(col("id1"), col("id2"), col("sz1"), col("sz2"))
      .distinct()
    // Verification as a per-pair sorted-array intersection instead of a
    // (pair × gram)-row join: the old Σ|A∩B| join materialized ~2·L
    // shuffle rows PER candidate pair (the dominant term once
    // candidates grow quadratically); joining each pair to the two
    // content gram-set arrays costs one row per pair and the intersect
    // runs in-core over doc-length-bounded arrays.
    val gramSets = grams.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("g"))).as("gset"))
    val inter = cand
      .join(gramSets.select(col("doc_id").as("id1"), col("gset").as("gs1")),
        Seq("id1"))
      .join(gramSets.select(col("doc_id").as("id2"), col("gset").as("gs2")),
        Seq("id2"))
      .select(col("id1"), col("id2"), col("sz1"), col("sz2"),
        size(array_intersect(col("gs1"), col("gs2"))).cast(LongType)
          .as("n_inter"))
    val repPairs = inter
      .filter(lit(tDen) * col("n_inter") >=
        lit(tNum) * (col("sz1") + col("sz2") - col("n_inter")))
      .select(col("id1").as("r1"), col("id2").as("r2"),
        col("n_inter"), col("sz1"), col("sz2"))

    // Expand content-level pairs back to document pairs. Identical
    // contents (same group) are jaccard 1 by identity — restricted to
    // contents that HAVE a gram set (≥3 tokens), matching the
    // brute-force oracle, which can only see gram-sharing pairs.
    val members = withCh
      .join(reps.select(col("ch"), col("rep")), Seq("ch"))
      .select(col("rep"), col("doc_id"))
      // four consumers (both expansion joins, both within-pair sides) —
      // un-cut, each re-derived withCh (two doc scans + md5 + the reps
      // join). Narrow (rep, doc_id) rows: corpus-linear ids only.
      .localCheckpoint(true)
    val cross = repPairs
      .join(members.select(col("rep").as("r1"), col("doc_id").as("d1")), Seq("r1"))
      .join(members.select(col("rep").as("r2"), col("doc_id").as("d2")), Seq("r2"))
      .select(least(col("d1"), col("d2")).as("id1"),
        greatest(col("d1"), col("d2")).as("id2"),
        col("n_inter"), col("sz1"), col("sz2"))
    // every ≥3-token content has ≥1 prefix row (prefix length ≥ 1), so
    // per-content sizes fall out of `prefix` partition-locally (the
    // window already hashed by doc_id — no new exchange)
    val sizes = prefix.select(col("doc_id"), col("sz")).dropDuplicates("doc_id")
    // sizes is content-count-sized: no forced broadcast hint — AQE picks
    // the broadcast at small scale; at web scale this must be allowed to
    // shuffle rather than OOM an executor
    val within = members
      .join(sizes.select(col("doc_id").as("rep"), col("sz")), Seq("rep"))
      .select(col("rep"), col("doc_id"), col("sz"))
    val withinPairs = within.select(col("rep"), col("doc_id").as("d1"), col("sz"))
      .join(within.select(col("rep"), col("doc_id").as("d2")), Seq("rep"))
      .filter(col("d1") < col("d2"))
      .select(col("d1").as("id1"), col("d2").as("id2"),
        col("sz").as("n_inter"), col("sz").as("sz1"), col("sz").as("sz2"))
    cross.unionByName(withinPairs)
      .select(col("id1"), col("id2"), col("n_inter").cast(LongType).as("n_inter"),
        (col("n_inter") / (col("sz1") + col("sz2") - col("n_inter")))
          .as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }
}
