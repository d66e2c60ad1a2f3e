package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Similarity-search operators over the `embeddings` table
  * (`vec_id BIGINT, embedding ARRAY<FLOAT>, label INT` — 64-dim):
  * brute-force cosine top-k (ground truth), embedding near-dup pairs,
  * sign-random-projection LSH bucketing, and IVF-style centroid
  * assignment — the approximate paths that survive 100 TB.
  *
  * Float determinism: every float is widened to double (exact), products
  * of two 24-bit-mantissa floats are exact in double, and reductions use
  * `aggregate(...)`'s left-to-right fold — the same order DuckDB's
  * `list_dot_product` uses — so cosines match the oracle bit-for-bit
  * before the final 6-dp rounding. Cross-row sums (averages) are rounded
  * per-row then accumulated in DECIMAL, never summed in float.
  *
  * Scale notes: brute-force KNN is O(Q·N) with a broadcast query side —
  * correct as ground truth and for small Q; the LSH bucketer and IVF
  * assignment are the 100 TB designs (candidates only within a bucket /
  * probed cell; both are single-shuffle groupBys).
  */
object Vectors {

  /** Left-to-right double dot product of two float arrays — the codegen'd
    * native expression (graft.functions.FloatDot, registered by
    * GraftExtensions); same reduction order as the oracle's
    * `list_dot_product`.
    */
  def dot(a: String, b: String): Column = expr(s"float_dot($a, $b)")

  private def cosine(dotC: Column, n1: Column, n2: Column): Column =
    dotC / sqrt(n1 * n2)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nsq", dot("embedding", "embedding"))

  /** The declared KNN query set: a FIXED list of ids, so the scored-pair
    * count is O(|Q|·N) with |Q| constant at any corpus scale (a query side
    * defined as a fraction of the corpus — e.g. `vec_id % 50 == 0` —
    * degrades to O(N²/50) at 100 TB). [[ivfKnn]] probes the same set, so
    * the brute form doubles as its recall oracle.
    */
  val KnnQueryIds: Seq[Long] = (0L until 1000L by 50L).toSeq // |Q| = 20

  /** Brute-force cosine top-k over a fixed query-id set: broadcast the
    * (constant-size) query side, score all candidates, keep the top-k per
    * query via rank over (cosine desc, id).
    */
  def knnBrute(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = withNorm(Tables.embeddings(s, dir))
    val q = base.filter(col("vec_id").isin(KnnQueryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nsq").as("qn"))
    val c = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("nsq").as("cn"))
    val scored = broadcast(q).join(c, col("qid") =!= col("neighbor_id"))
      .withColumn("cos", cosine(dot("qe", "ce"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** LANDED brute-force truth table (`vec_knn`): [[knnBrute]] at
    * k=[[TruthK]], materialized once per corpus. The ground truth a
    * vector store evaluates its indexes against is itself an artifact —
    * q40 serves it directly and the q111 scoreboard's three recall
    * joins read it, so the O(|Q|·N) brute scan runs once per corpus,
    * not once per consumer. Only k ≤ TruthK can be served from the
    * landed table; larger-k callers (tests) use [[knnBrute]] directly.
    */
  private val TruthK = 5
  def knnTruth(s: SparkSession, dir: String, k: Int = TruthK): DataFrame = {
    require(k <= TruthK, s"landed truth holds top-$TruthK, asked for $k")
    Materialize.table(s, s"vec_knn_${dir}_$TruthK", dir,
      knnBrute(s, dir, TruthK))
      .filter(col("rnk") <= k)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-label norm statistics. Cross-row aggregation is decimal-exact:
    * each vector's norm is rounded to 6 dp, cast to DECIMAL, summed.
    */
  def normStats(s: SparkSession, dir: String): DataFrame =
    withNorm(Tables.embeddings(s, dir))
      .withColumn("nrm", round(sqrt(col("nsq")), 6))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        round(sum(col("nrm").cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)), 6)
          .as("avg_norm")
      )
      .orderBy(col("label"))

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold; 0.4 captures
    * the top pair tail of this corpus), EXACT — provably the same output
    * as a brute-force all-pairs scan — but planned as equi-joins with a
    * cell-pair pruning bound instead of a nested-loop cross join:
    *
    *  1. assign every vector to its nearest of `cells` coarse centroids
    *     (vec_id < cells, broadcast), keeping the angle θ(x, cell(x));
    *  2. per-cell radius rᵢ = max θ — O(cells) metadata;
    *  3. a pair from cells (i,j) can only reach angle ≤ θ_t if
    *     θ(cᵢ,cⱼ) ≤ θ_t + rᵢ + rⱼ (spherical triangle inequality), so
    *     only those cell pairs are joined — an exact bound: no pair at
    *     the threshold can be lost, whatever the data layout;
    *  4. candidate ids join back to embeddings (hash joins on high-
    *     cardinality ids) for the exact cosine + threshold verify.
    *
    * On clustered corpora (the 100 TB near-dup case) the bound prunes
    * most of the cells² pair space; on isotropic data it degrades to
    * all cell pairs — the same total work as brute force but distributed
    * as a hash join on (cell, block) keys rather than a single
    * BroadcastNestedLoopJoin. `blocks` sub-salts the join key so
    * parallelism is cells·blocks, not cells.
    *
    * The exact pair table lands once per (dir, threshold) via
    * [[Materialize]] — q42 reads it ordered; the q106 recall sweep reads
    * it as ground truth.
    *
    * OFFLINE-TRUTH ONLY at serving scale: the verify stage is
    * O(N²/cells·blocks) in the worst case (all candidates in compatible
    * cell pairs are exactly verified) — inherent to an EXACT oracle.
    * At 100 TB this is the once-per-corpus truth-building job that
    * ground-truths recall; the serving-scale near-dup path is the LSH
    * variant ([[lshBuckets]]/q43 buckets, Text.minhashLshPairs for
    * text). Do not wire a serving query to this stage.
    */
  def embedNearDup(s: SparkSession, dir: String, threshold: Double = 0.4,
      cells: Int = 8, blocks: Int = 8): DataFrame =
    Materialize.table(s, s"vec_exact_${dir}_${threshold}_${cells}_$blocks", dir,
      embedNearDupBuild(s, dir, threshold, cells, blocks))
      .orderBy(col("id1"), col("id2"))

  private[graft] def embedNearDupBuild(s: SparkSession, dir: String, threshold: Double,
      cells: Int, blocks: Int): DataFrame =
    embedNearDupBuildOf(withNorm(Tables.embeddings(s, dir)), threshold,
      cells, blocks)

  /** [[embedNearDupBuild]] over a caller-supplied (possibly sampled)
    * normalized base. The output is EXACT for whatever vector set is
    * passed — the centroid/radius machinery only prunes, so a sampled
    * base yields exactly the sample's true pairs (the property the
    * sampled recall audit rests on: per-vector values are unchanged by
    * dropping other vectors).
    */
  private[graft] def embedNearDupBuildOf(base0: DataFrame, threshold: Double,
      cells: Int, blocks: Int): DataFrame = {
    val s = base0.sparkSession
    val base = base0
    // round(cos,6) >= t keeps raw cos >= t - 5e-7; acos is then padded
    // against double rounding — slack only ever ADMITS extra candidates
    val thetaT = math.acos(threshold - 1e-6) + 1e-6

    // coarse centroids = the `cells` smallest vec_ids PRESENT in the
    // base (on the full corpus exactly the historical `vec_id < cells`
    // pick, ids being contiguous from 0) — never a fixed id filter: a
    // hash-sampled base would usually retain none of ids 0..7, and an
    // EMPTY centroid set silently empties every downstream join (wrong
    // answer, not slow answer). The exactness argument is centroid-
    // agnostic — any nonempty pick only changes the pruning, never the
    // output — and one centroid (all pairs verified) is its floor.
    val cent = base.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nsq").as("cn"))

    // nearest-centroid assignment; the bound in step 3 is valid for
    // WHATEVER cell a vector lands in, so argmax ties are output-safe
    val assign = base.select(col("vec_id"), col("embedding"), col("nsq"))
      .join(broadcast(cent))
      .withColumn("ccos", cosine(dot("embedding", "ce"), col("nsq"), col("cn")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("ccos")), col("ccos")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"),
        acos(least(greatest(col("m.ccos"), lit(-1.0)), lit(1.0))).as("theta"))

    val radii = assign.groupBy(col("cid")).agg(max(col("theta")).as("r"))

    // cells × cells grid of the ACTUAL centroid ids (a broadcast cross
    // of two ≤cells-row frames — O(cells²) metadata, no O(N) work and
    // no driver-side collect). Never a literal 0..cells-1 id grid: that
    // spelling silently matches nothing the moment the centroid pick
    // isn't the contiguous full-corpus ids — a sampled base's compat
    // set came back EMPTY (zero candidate pairs against 80k brute-force
    // true pairs at the sf1 rehearsal sample) with no error anywhere.
    val grid = cent.select(col("cid").as("ci"))
      .crossJoin(broadcast(cent.select(col("cid").as("cj"))))
    val compat = grid
      .join(broadcast(cent.select(col("cid").as("ci"), col("ce").as("cei"),
        col("cn").as("cni"))), "ci")
      .join(broadcast(cent.select(col("cid").as("cj"), col("ce").as("cej"),
        col("cn").as("cnj"))), "cj")
      .withColumn("theta_c", acos(least(greatest(
        cosine(dot("cei", "cej"), col("cni"), col("cnj")), lit(-1.0)), lit(1.0))))
      .join(broadcast(radii.select(col("cid").as("ci"), col("r").as("ri"))), "ci")
      .join(broadcast(radii.select(col("cid").as("cj"), col("r").as("rj"))), "cj")
      .filter(col("theta_c") <= lit(thetaT) + col("ri") + col("rj") + lit(1e-6))
      .select(col("ci"), col("cj"))

    // candidate pairs: slim (id, cell) rows equi-joined on (cell, block)
    val left = assign.select(col("vec_id").as("id1"), col("cid").as("ci"))
      .join(broadcast(compat), "ci")
      .withColumn("blk", explode(array((0 until blocks).map(b => lit(b.toLong)): _*)))
      .select(col("id1"), col("cj"), col("blk"))
    val right = assign.select(col("vec_id").as("id2"), col("cid").as("cj"),
      pmod(col("vec_id"), lit(blocks.toLong)).as("blk"))
    val pairs = left.join(right, Seq("cj", "blk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))

    val a = base.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nsq").as("n1"))
    val b = base.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nsq").as("n2"))
    pairs.join(a, "id1").join(b, "id2")
      .withColumn("cos", round(cosine(dot("e1", "e2"), col("n1"), col("n2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Sign-random-projection LSH: 8 deterministic integer hyperplanes
    * (LCG-generated components, exact in 64-bit on any engine); bit j of a
    * vector's bucket is the sign of its dot product with plane j. Reports
    * bucket occupancy + label spread — the bucketing that bounds candidate
    * generation for ANN at scale.
    */
  def lshBuckets(s: SparkSession, dir: String, planes: Int = 8): DataFrame = {
    Tables.embeddings(s, dir)
      .withColumn("bucket",
        (0 until planes).map(j => planeBit(j, 1L << j)).reduce(_ + _))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
      .orderBy(col("bucket"))
  }

  /** Deterministic LCG hyperplane `j` materialized as a 64-float literal
    * array (components are integers in [-1000, 1000], exact in float).
    */
  private def planeVec(j: Int): Column =
    array((0 until 64).map { i =>
      lit(((1103515245L * (j * 64 + i) + 12345) % 2001 - 1000).toFloat)
    }: _*)

  /** Sign bit of the dot product with deterministic LCG hyperplane `j`,
    * as a power-of-two contribution (shared formula with the oracle).
    * Evaluated through the codegen'd `float_dot` — the plane is a literal
    * column, so the projection stays inside whole-stage codegen instead
    * of running one interpreted higher-order lambda per plane per row.
    * Bit-parity with the oracle's fold: each float widens to double
    * exactly and both reduce left-to-right.
    */
  private def planeBit(j: Int, weight: Long): Column = {
    val d = call_function("float_dot", col("embedding"), planeVec(j))
    when(d >= 0, lit(weight)).otherwise(lit(0L))
  }

  /** Occupancy-targeted SRP depth: the smallest `bits ≥ 3` with expected
    * bucket occupancy `n / 2^bits ≤ targetOcc`. FIXED bits make the
    * per-table bucket self-join O(n²/2^bits) — quadratic; holding
    * occupancy constant instead keeps the enumeration O(n·targetOcc)
    * per table, the standard production-LSH sizing. Integer shift
    * arithmetic, not float log2: `ceil(log2(2000/250))` must be EXACTLY
    * 3 (the reference-scale pin), not 4-by-epsilon. The floor of 3 (and
    * [[scaleTables]]' matching 6) reproduces the reference-scale (6, 3)
    * construction at every driver SF, so the q45/q106 oracles are
    * untouched; the derivation only engages beyond ~2k vectors.
    */
  private[graft] def scaleBits(n: Long, targetOcc: Long = 250L): Int = {
    var b = 3
    while ((targetOcc << b) < n && b < 24) b += 1
    b
  }

  /** Recall-compensating table count: one extra table per extra bit over
    * the reference-scale 3. Deeper buckets cut per-table collision
    * probability (p^bits), so a deployment buys recall back with tables;
    * the full compensation (hold 1−(1−p^bits)^tables constant) would
    * grow tables ~4.6× per decade and re-inflate the enumeration, so
    * this derives the MODEST bump and lets q106's measured recall curve
    * — whose cost no longer depends on the construction — justify or
    * indict it per corpus.
    */
  private[graft] def scaleTables(bits: Int): Int = 6 + (bits - 3)

  /** Corpus-size cache for LSH parameter derivation (one count job per
    * dir per JVM; the count itself is a parquet metadata scan).
    */
  private val nVecCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Resolve the (tables, bits) sentinel 0 → corpus-derived values. */
  private[graft] def resolveLsh(s: SparkSession, dir: String,
      tables: Int, bits: Int): (Int, Int) = {
    if (tables > 0 && bits > 0) (tables, bits)
    else {
      val n = nVecCache.computeIfAbsent(dir,
        d => Tables.embeddings(s, d).count()).longValue()
      val b = if (bits > 0) bits else scaleBits(n)
      (if (tables > 0) tables else scaleTables(b), b)
    }
  }

  /** Embedding near-dup through multi-table LSH — the 100 TB path. A
    * single sign-projection table has vanishing recall at moderate
    * similarity (P[8 bits agree] ≈ 0.63⁸ ≈ 2% at cos 0.4), so this uses
    * the standard multi-table construction: `tables` independent tables
    * of `bits` planes each; candidates are pairs sharing ANY table's
    * bucket (equi-join on (table, bucket) — work scales with bucket
    * occupancy, not n²), then candidates are scored exactly. Precision
    * is exact (same cosine + threshold as [[embedNearDup]]); recall
    * 1−(1−p^bits)^tables is asserted in tests. `tables`/`bits` default
    * to the corpus-derived sizing ([[scaleBits]]/[[scaleTables]]):
    * (6, 3) at every driver SF, deeper-and-wider beyond — at the sf1
    * rehearsal corpus (20k vecs → (10, 7)) the derived construction
    * enumerates 120M candidate rows against fixed-(6, 3)'s 252M at
    * 95.2% measured recall of the cos ≥ 0.4 truth (vs 99.7%).
    */
  def lshNearDup(s: SparkSession, dir: String, threshold: Double = 0.4,
      tables: Int = 0, bits: Int = 0): DataFrame = {
    val (tbl, bts) = resolveLsh(s, dir, tables, bits)
    Materialize.table(s, s"vec_pairs_${dir}_${threshold}_${tbl}_$bts", dir,
      lshNearDupBuild(s, dir, threshold, tbl, bts))
      .orderBy(col("id1"), col("id2"))
  }

  /** Table-`t` bucket key (bits-wide sign pattern) — per-row codegen
    * expressions, so a STREAMING row carries its bucket keys directly.
    */
  private[graft] def bucketCol(t: Int, bits: Int): Column =
    (0 until bits).map(b => planeBit(t * bits + b, 1L << b)).reduce(_ + _)

  /** Static (t, b) bucket index over a corpus — the right-hand side of
    * the streaming semantic near-dup gate's anti-joins. O(tables·vecs)
    * rows before distinct, O(tables·2^bits) after.
    */
  private[graft] def bucketIndexOf(vecs: DataFrame, tables: Int = 6,
      bits: Int = 3): DataFrame = {
    val tb = (0 until tables).map(t =>
      struct(lit(t).as("t"), bucketCol(t, bits).as("b")))
    vecs.select(explode(array(tb: _*)).as("tb"))
      .select(col("tb.t").as("t"), col("tb.b").as("b"))
      .distinct()
  }

  private[graft] def lshNearDupBuild(s: SparkSession, dir: String, threshold: Double,
      tables: Int, bits: Int): DataFrame = {
    val base = withNorm(Tables.embeddings(s, dir))
    val tb = (0 until tables).map { t =>
      struct(lit(t).as("t"), bucketCol(t, bits).as("b"))
    }
    val buckets = base.select(col("vec_id"), explode(array(tb: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = buckets.toDF("id1", "t", "b")
      .join(buckets.toDF("id2", "t", "b"), Seq("t", "b"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val a = base.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nsq").as("n1"))
    val b = base.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nsq").as("n2"))
    cand.join(a, "id1").join(b, "id2")
      .withColumn("cos", round(cosine(dot("e1", "e2"), col("n1"), col("n2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** LSH tuning table (q106): measured recall of the multi-table
    * construction as tables are added — the report a pipeline runs to
    * CHOOSE its LSH parameters instead of trusting the
    * 1−(1−p^bits)^tables formula. Every true pair ([[embedNearDup]]'s
    * exact output at the threshold) is tagged with the FIRST table that
    * would have caught it (min colliding table index); a cumulative
    * count per prefix then gives recall at t = 1..tables in one pass —
    * not `tables` re-runs of the pipeline.
    *
    * Shape at scale: the tag is computed DIRECTLY per true pair — join
    * each side to its O(n) per-vector bucket-signature row and take the
    * least agreeing table index — never by enumerating the bucket
    * self-join's candidate pairs and discarding the ~80% that aren't
    * true pairs (at fixed bits that enumeration is O(n²/2^bits): 106M
    * candidate rows for 20M true pairs at the sf1 rehearsal corpus,
    * 27.6 s warm; the direct tag is linear in the audit's own
    * ground-truth input and identical row-for-row — a pair's min
    * colliding table is a function of the two signatures alone). The
    * sweep itself runs on a `tables`-row histogram — constant-size
    * metadata. Recall math is exact integer micro-units.
    */
  /** Target size for the recall audit's ground-truth vector sample —
    * the q107/RecallSampleTarget discipline for the vector modality:
    * the FULL exact-truth sweep runs up to 2000 vectors (≥ every
    * driver SF, so the q106 oracle is untouched); beyond that
    * [[vecSampleModOf]] doubles the modulus per decade, bounding the
    * sampled exact-pair job — the one intrinsically quadratic stage
    * (vec_exact: ~5 h single-node at the 200k-vec rehearsal corpus) —
    * to a constant independent of corpus size. Recall is a RATIO, so a
    * deterministic 1/mod sample estimates it; q151 oracle-pins the
    * sampled path at an explicit mod, exactly as q150 pins q107.
    */
  private[graft] val VecRecallSampleTarget = 2000L

  private[graft] def vecSampleModOf(nVecs: Long,
      target: Long = VecRecallSampleTarget): Int = {
    var m = 1
    while (nVecs / m > target && m < (1 << 20)) m *= 2
    m
  }

  /** The deterministic 1/mod ground-truth vector sample — the same
    * md5-hash discipline as Text.docSampleIds, so any engine draws the
    * SAME vectors.
    */
  private def sampledBase(s: SparkSession, dir: String, mod: Int): DataFrame =
    withNorm(Tables.embeddings(s, dir))
      .filter(graft.operators.Text.hash60(
        col("vec_id").cast(org.apache.spark.sql.types.StringType))
        % mod === 0)

  def lshRecallSweep(s: SparkSession, dir: String, threshold: Double = 0.4,
      tables: Int = 0, bits: Int = 0, sampleMod: Int = 0): DataFrame = {
    val (tbl, bts) = resolveLsh(s, dir, tables, bits)
    val mod =
      if (sampleMod > 0) sampleMod
      else vecSampleModOf(nVecCache.computeIfAbsent(dir,
        d => Tables.embeddings(s, d).count()).longValue())
    val base = if (mod == 1) withNorm(Tables.embeddings(s, dir))
      else sampledBase(s, dir, mod)
    val modKey = if (mod == 1) "" else s"_s$mod"
    val tagged = Materialize.table(s,
      s"vec_mintag_${dir}_${threshold}_${tbl}_$bts$modKey", dir, {
        def sig(idCol: String, p: String) = base.select(
          col("vec_id").as(idCol) +:
            (0 until tbl).map(t => bucketCol(t, bts).as(s"$p$t")): _*)
        // least(...) skips nulls: min_t = first agreeing table, null if
        // the construction misses the pair — same semantics as the old
        // enumerated LEFT JOIN, in whole-stage codegen
        val minT = least((0 until tbl).map(t =>
          when(col(s"l$t") === col(s"r$t"), lit(t))): _*)
        // full path: the LANDED once-per-corpus exact truth; sampled
        // path: exact truth computed fresh over the (bounded) sample —
        // per-vector values are unchanged by dropping other vectors,
        // so this is exactly the full pipeline run on the sample
        val truth = if (mod == 1)
          embedNearDup(s, dir, threshold).select(col("id1"), col("id2"))
        else embedNearDupBuildOf(base, threshold, 8, 8)
          .select(col("id1"), col("id2"))
        truth
          .join(sig("id1", "l"), "id1").join(sig("id2", "r"), "id2")
          .select(col("id1"), col("id2"), minT.as("min_t"))
      })
    val hist = tagged.groupBy(col("min_t")).agg(count(lit(1)).as("c"))
    val tot = tagged.agg(count(lit(1)).as("n_true"))
    s.range(1, tbl + 1).select(col("id").as("n_tables"))
      .crossJoin(broadcast(hist))
      .groupBy(col("n_tables"))
      .agg(sum(when(col("min_t") < col("n_tables"), col("c"))
        .otherwise(0L)).as("n_found"))
      .crossJoin(broadcast(tot))
      .select(col("n_tables"), col("n_true"), col("n_found"),
        expr("(n_found * 1000000) div n_true").as("recall_micro"))
      .orderBy(col("n_tables"))
  }

  /** Embedding near-dup CLUSTERING: connected components over the
    * multi-table LSH pair graph ([[lshNearDup]] at cosine ≥ 0.4) via the
    * shared [[Graph.connectedComponents]] min-label propagation — the
    * same retention step as text q67, over the vector modality.
    */
  def embedClusters(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    // the landed key carries the RESOLVED construction: the label table
    // derived from a (6,3) pair graph must never be served to a run
    // whose corpus now derives (10,7)
    val (tbl, bts) = resolveLsh(s, dir, 0, 0)
    Materialize.table(s, s"vec_labels_${dir}_${threshold}_${tbl}_$bts", dir,
      Graph.connectedComponents(
        lshNearDup(s, dir, threshold).select(col("id1"), col("id2")), "vec_id"))
      .orderBy(col("vec_id"))
  }

  /** Per-label embedding retention manifest — the vector twin of the
    * text pipeline's q70: keep each [[embedClusters]] cluster's
    * canonical member, unclustered vectors always survive. The decision
    * table semantic dedup actually ships — one left join against the
    * O(clustered-vectors) label table and one keyed aggregation.
    */
  def embedRetention(s: SparkSession, dir: String): DataFrame = {
    val clusters = embedClusters(s, dir)
      .select(col("vec_id"), col("is_canonical"))
    Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
      .join(clusters, Seq("vec_id"), "left")
      .withColumn("keep", coalesce(col("is_canonical"), lit(true)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("keep").cast("long")).as("n_kept"))
      .orderBy(col("label"))
  }

  /** IVF-style cell assignment against TRAINED coarse centroids: each
    * vector joins its max-cosine centroid from [[kmeansCentroids]] (the
    * q75 Lloyd-updated table — an IVF index built from k-means is the
    * production construction; round 6 used the first 8 raw vectors,
    * which is the k-means INIT, not the index). Per-cell occupancy +
    * mean similarity (decimal-exact accumulation). At 100 TB the
    * centroid side stays broadcast and the argmax is the same single
    * aggregation — no extra shuffle of the big side.
    */
  /** (vec_id, cid, cos): each vector's max-cosine coarse centroid —
    * LANDED once per corpus ([[Materialize]]): this is the IVF index a
    * vector store builds once and queries many times; six registry
    * queries (q44/q48/q74/q102/q111 and the retention composites) read
    * it, and rebuilding a corpus-sized assignment per query is exactly
    * the re-derivation the materialized stage graph exists to prevent.
    */
  private def ivfAssignments(s: SparkSession, dir: String): DataFrame =
    Materialize.table(s, s"vec_ivf_$dir", dir, ivfAssignmentsBuild(s, dir))

  /** Trained centroids as DOUBLE vectors with norms: (cid, ce, cn).
    * Components are exact integers/1e6 — both engines perform the
    * identical BIGINT→DOUBLE division, so the centroid doubles (and
    * every cosine against them) are bit-identical.
    */
  private[graft] def centDoubles(s: SparkSession, dir: String): DataFrame =
    kmeansCentroids(s, dir)
      .select(col("cid"),
        expr("transform(cm, v -> v / CAST(1000000.0 AS DOUBLE))").as("ce"))
      .withColumn("cn", expr("float_dot(ce, ce)"))

  private[graft] def ivfAssignmentsBuild(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(Tables.embeddings(s, dir))
    val scored = base.select(col("vec_id"), col("embedding"), col("nsq"))
      .join(broadcast(centDoubles(s, dir)))
      .withColumn("cos", cosine(dot("embedding", "ce"), col("nsq"), col("cn")))
    // argmax by (cos desc, cid): deterministic and engine-portable
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("cid"), col("cos"))
  }

  /** (qid, cid): the `nprobe` highest-cosine cells per KNN query vector —
    * the multi-probe read path of a trained IVF index. k-means balances
    * cells, which splits a query's true neighbors across cell borders
    * more often than the degenerate first-8-raw-vector cells did (one
    * giant cell ≈ accidental brute force); probing the top-2 cells
    * restores and then beats the old recall (measured at sf0.01:
    * IVF 366666 → 500000 micro-recall@3) at 2× the in-cell candidate
    * cost — the classic nprobe knob. O(|Q|·k) work: the query side is
    * the fixed constant-size id set, centroids broadcast.
    */
  private def queryProbes(s: SparkSession, dir: String, nprobe: Int = 2): DataFrame = {
    val base = withNorm(Tables.embeddings(s, dir))
      .filter(col("vec_id").isin(KnnQueryIds: _*))
    val scored = base.select(col("vec_id"), col("embedding"), col("nsq"))
      .join(broadcast(centDoubles(s, dir)))
      .withColumn("cos", cosine(dot("embedding", "ce"), col("nsq"), col("cn")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid"))
  }

  def ivfAssign(s: SparkSession, dir: String): DataFrame = {
    ivfAssignments(s, dir)
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(round(col("cos"), 6).cast(DecimalType(18, 6))).cast(DoubleType)
          / count(lit(1)), 6).as("avg_cos")
      )
      .orderBy(col("cid"))
  }

  /** Product-quantization code assignment — the memory side of ANN at
    * 100 TB (an IVF cell bounds WHERE to scan; PQ bounds what each
    * scanned vector COSTS: 64 floats compress to one code). The vector
    * splits into 4 subspaces of 16 dims; per subspace the 8 fixed coarse
    * vectors (vec_id < 8, the q44 convention) act as the codebook and
    * each subvector takes its argmin-L2 centroid; the 4 codes pack into
    * one integer. Codebooks broadcast; the corpus is touched by one
    * scan + one subspace explode — no shuffle of the embedding side
    * before the tiny argmin window.
    *
    * Determinism: d2 expands to nsq_c + nsq_v − 2·dot, every term a
    * left-to-right [[graft.functions.FloatDot]] fold (bit-identical to
    * DuckDB `list_dot_product`); argmin ties break on centroid id;
    * per-vector quantization error accumulates rounded DECIMALs.
    */
  /** (vec_id, s, c, d2): squared L2 from every vector's subvector `s` to
    * every subspace codeword `c` — the shared stage under [[pqAssign]]
    * (argmin per (vec, s) = the code) and [[pqSearch]] (rows at query ids
    * = the ADC lookup table).
    */
  private[graft] def pqDistances(s: SparkSession, dir: String, subspaces: Int,
                          nCentroids: Int): DataFrame = {
    val subLen = 64 / subspaces
    val base = Tables.embeddings(s, dir)
    val subStructs = (0 until subspaces).map { ss =>
      struct(lit(ss).as("s"),
        expr(s"slice(embedding, ${ss * subLen + 1}, $subLen)").as("v"))
    }
    val sub = base.select(col("vec_id"), explode(array(subStructs: _*)).as("b"))
      .select(col("vec_id"), col("b.s").as("s"), col("b.v").as("v"))
    val cent = sub.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("c"), col("s"), col("v").as("cv"))
    sub.join(broadcast(cent), Seq("s"))
      .withColumn("d2",
        expr("float_dot(cv, cv) + float_dot(v, v) - 2 * float_dot(v, cv)"))
      .select(col("vec_id"), col("s"), col("c"), col("d2"))
  }

  /** (vec_id, s, c, d2): each subvector's argmin-L2 codeword — LANDED
    * once per (corpus, subspaces, nCentroids): the PQ code table IS the
    * compressed index, built once and scanned by every ADC consumer
    * (q72/q74/q102/q111).
    */
  private def pqCodes(s: SparkSession, dir: String, subspaces: Int,
                      nCentroids: Int): DataFrame =
    Materialize.table(s, s"vec_pqcodes_${dir}_${subspaces}_$nCentroids", dir, {
      val w = Window.partitionBy(col("vec_id"), col("s"))
        .orderBy(col("d2"), col("c"))
      pqDistances(s, dir, subspaces, nCentroids)
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id"), col("s"), col("c"), col("d2"))
    })

  def pqAssign(s: SparkSession, dir: String, subspaces: Int = 4,
               nCentroids: Int = 8): DataFrame = {
    pqCodes(s, dir, subspaces, nCentroids)
      .groupBy(col("vec_id"))
      .agg(
        sum(col("c") * expr(
          "CASE s WHEN 0 THEN 1 WHEN 1 THEN 8 WHEN 2 THEN 64 ELSE 512 END"))
          .cast(LongType).as("pq_code"),
        round(sum(round(col("d2"), 6).cast(DecimalType(18, 6)))
          .cast(DoubleType), 6).as("qerr"))
      .orderBy(col("vec_id"))
  }

  /** IVF-PQ ADC search — the two halves of the ANN index composed the way
    * a production vector store runs them: the IVF cell ([[ivfAssignments]])
    * bounds WHERE to scan, and each scanned vector is scored from its PQ
    * code alone via Asymmetric Distance Computation — approx d²(q, x) =
    * Σ_s d²(q_s, codeword(code_s(x))) — so the scan touches one packed
    * code per candidate, never the raw floats.
    *
    * Shape at 100 TB: the ADC lookup table is |Q|·subspaces·nCentroids
    * rows (constant, broadcast); the code table is the compressed corpus
    * (largest side, one scan, map-side joins); the only shuffle is the
    * per-query top-k aggregation over in-cell candidates. Determinism:
    * every d² term is a [[graft.functions.FloatDot]] fold (bit-identical
    * to the oracle), the 4-term ADC sum accumulates rounded DECIMALs
    * (order-free), and ranking orders by the exact DECIMAL with id
    * tiebreak before the final double rounding.
    */
  /** (qid, neighbor_id, adc_dec): every in-cell candidate's DECIMAL ADC
    * score — the stage [[pqSearch]] ranks directly and [[pqRerank]] uses
    * as its shortlist generator. LANDED once per (corpus, PQ config):
    * the eval query set is fixed, so this is the offline evaluation
    * score table — |Q|·(in-cell candidates) rows, smaller than the code
    * table it joins — and q74, q102 and both q111 PQ arms read it
    * instead of replaying the code-table join per consumer (previously
    * 4 computations across 3 queries). DECIMAL(18,6) round-trips
    * parquet exactly, so ranking on the landed column is bit-identical.
    */
  private def adcScores(s: SparkSession, dir: String, subspaces: Int,
                        nCentroids: Int): DataFrame =
    Materialize.table(s, s"vec_adc_${dir}_${subspaces}_$nCentroids", dir,
      adcScoresBuild(s, dir, subspaces, nCentroids))

  private[graft] def adcScoresBuild(s: SparkSession, dir: String, subspaces: Int,
                        nCentroids: Int): DataFrame = {
    val assign = ivfAssignments(s, dir).select(col("vec_id"), col("cid"))
    // multi-probe: candidates come from each query's top-2 cells; every
    // candidate appears once (the index assigns each vector to ONE cell)
    val q = queryProbes(s, dir)
    val cand = broadcast(q).join(assign, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"))
    val lut = pqDistances(s, dir, subspaces, nCentroids)
      .filter(col("vec_id").isin(KnnQueryIds: _*))
      .select(col("vec_id").as("qid"), col("s"), col("c"), col("d2"))
    val codes = pqCodes(s, dir, subspaces, nCentroids)
      .select(col("vec_id").as("neighbor_id"), col("s"), col("c"))
    cand.join(codes, Seq("neighbor_id"))
      .join(broadcast(lut), Seq("qid", "s", "c"))
      .groupBy(col("qid"), col("neighbor_id"))
      .agg(sum(round(col("d2"), 6).cast(DecimalType(18, 6))).as("adc_dec"))
  }

  def pqSearch(s: SparkSession, dir: String, k: Int = 3, subspaces: Int = 4,
               nCentroids: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dec"), col("neighbor_id"))
    adcScores(s, dir, subspaces, nCentroids)
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("neighbor_id"),
        round(col("adc_dec").cast(DoubleType), 6).as("adc"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Two-stage retrieval — the production vector-store read path: the
    * compressed index proposes, the raw floats decide. Stage 1 ranks
    * in-cell candidates by PQ-ADC ([[adcScores]]) and keeps a shortlist
    * of `shortlist` ids per query; stage 2 fetches raw embeddings for
    * ONLY those |Q|·shortlist pairs and re-ranks by exact cosine.
    *
    * Shape at 100 TB: stage 1 never touches raw floats (codes only);
    * stage 2's raw-vector fetch is a semi-join of the corpus against a
    * constant-size id set — the expensive exact math runs on
    * |Q|·shortlist rows regardless of corpus size. Determinism: the
    * shortlist cut ranks (DECIMAL adc, id); the final rank orders by the
    * bit-exact [[graft.functions.FloatDot]] cosine with id tiebreak.
    */
  def pqRerank(s: SparkSession, dir: String, shortlist: Int = 8, k: Int = 3,
               subspaces: Int = 4, nCentroids: Int = 8): DataFrame = {
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dec"), col("neighbor_id"))
    val short = adcScores(s, dir, subspaces, nCentroids)
      .withColumn("srnk", row_number().over(wAdc))
      .filter(col("srnk") <= shortlist)
      .select(col("qid"), col("neighbor_id"))
    val base = withNorm(Tables.embeddings(s, dir))
    val qe = base.filter(col("vec_id").isin(KnnQueryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nsq").as("qn"))
    val ce = base.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("nsq").as("cn"))
    val rer = short.join(ce, Seq("neighbor_id")).join(broadcast(qe), Seq("qid"))
      .withColumn("cos", cosine(dot("qe", "ce"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    rer.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** ANN quality scoreboard (q111): recall@k of every approximate
    * retrieval path against the brute-force ground truth, one row per
    * method — the acceptance report a vector store publishes before a
    * cheaper index replaces a more exact one. Composes the landed
    * operators ([[ivfKnn]], [[pqSearch]], [[pqRerank]], [[knnBrute]])
    * instead of re-deriving them; each method's cost is its own
    * documented story, the scoreboard itself is three tiny id-set
    * joins. Recall in exact integer micro-units.
    */
  def annScoreboard(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // |Q|·k rows read from the LANDED truth table — consumers re-read a
    // tiny parquet instead of replaying the corpus brute-force scan.
    // Optimization round 16 (guide §1.2 — don't run the same work per
    // branch): the per-method spelling ran join+agg+crossJoin THREE
    // times (14 driver jobs for |Q|·k-row inputs — pure scheduling
    // overhead); tag the candidate sets, take ONE join against the
    // truth and ONE groupBy(method). The static 3-row method dim left-
    // joined in keeps a zero-hit method's row, exactly as the old
    // per-method count(1) over an empty join did.
    import s.implicits._
    val brute = knnTruth(s, dir, k).select(col("qid"), col("neighbor_id"))
    val methods = Seq(
      "ivf" -> ivfKnn(s, dir),
      "pq_adc" -> pqSearch(s, dir),
      "pq_rerank" -> pqRerank(s, dir))
    val cand = methods.map { case (n, m) =>
      m.select(lit(n).as("method"), col("qid"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val hits = brute.join(cand, Seq("qid", "neighbor_id"))
      .groupBy(col("method")).agg(count(lit(1)).as("n_hits"))
    methods.map(_._1).toDF("method")
      .join(hits, Seq("method"), "left")
      .na.fill(0L, Seq("n_hits"))
      .crossJoin(broadcast(brute.agg(count(lit(1)).as("n_truth"))))
      .select(col("method"), col("n_truth"), col("n_hits"),
        expr("(n_hits * 1000000) div n_truth").as("recall_micro"))
      .orderBy(col("method"))
  }

  /** Micro-int view used by k-means: xm[d] = floor(x·1e6), exact. */
  private def microVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), expr(
      "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000.0D))"
    ).as("xm"))

  /** Min-L2 assignment of micro vectors to a broadcast centroid table. */
  private def kmAssign(vecs: DataFrame, cent: DataFrame): DataFrame =
    vecs.join(broadcast(cent))
      .withColumn("d2", expr("long_l2(xm, cm)"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("d2")),
        struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** (cid, cm: array<bigint>): the TRAINED coarse centroids — one Lloyd
    * update from the first-k init, in exact integer micro-space (see
    * [[kmeansTrain]] for the determinism story). LANDED once per
    * (corpus, k): this table is the model artifact the IVF index
    * ([[ivfAssignments]]) and the q75 training report both consume —
    * training runs once, not once per consumer.
    */
  private[graft] def kmeansCentroids(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    Materialize.table(s, s"vec_kmcent_${dir}_$k", dir, {
      val vecs = microVecs(s, dir)
      val cent0 = vecs.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("xm").as("cm"))
      val a1 = kmAssign(vecs, cent0)
      // exact integer per-dimension mean; OFF = 2^31 dwarfs any |Σ xm|/n
      vecs.join(a1.select(col("vec_id"), col("cid")), "vec_id")
        .select(col("cid"), posexplode(col("xm")).as(Seq("d", "v")))
        .groupBy(col("cid"), col("d"))
        .agg(expr(s"(sum(v) + count(1) * ${1L << 31}L) div count(1) - ${1L << 31}L")
          .as("cv"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(d, cv))), p -> p.cv)")
          .as("cm"))
    })

  /** q120: per-cell coreset extraction — the diversity-sampling
    * primitive a curation run uses to subsample a corpus by GEOMETRIC
    * coverage rather than by source: for every trained k-means cell,
    * the member count, the centermost member (exact-integer L2 argmin
    * to the trained centroid, ties on lower id — the cell's
    * representative in the coreset), the cell radius (max member
    * distance) and the mean member distance, both in micro² → micro
    * units (d2 div 1e6 summed first, the q75 inertia rule, so the
    * 100 TB sum stays inside a long).
    *
    * Shape at scale: one broadcast of k centroids into the corpus scan
    * (the landed [[kmeansCentroids]] model artifact), one keyed
    * aggregation per cell — no pairwise distances anywhere; the coreset
    * itself is k rows.
    */
  def ivfCoreset(s: SparkSession, dir: String): DataFrame =
    kmAssign(microVecs(s, dir), kmeansCentroids(s, dir))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        min_by(col("vec_id"), struct(col("d2"), col("vec_id"))).as("rep_id"),
        min(col("d2")).as("rep_d2"),
        max(col("d2")).as("radius_d2"),
        sum(expr("d2 div 1000000")).as("spread_mu"))
      .select(col("cid"), col("n_vecs"), col("rep_id"), col("rep_d2"),
        col("radius_d2"), expr("spread_mu div n_vecs").as("avg_d2_mu"))
      .orderBy(col("cid"))

  /** Distributed k-means TRAINING (Lloyd's algorithm) — the step that
    * produces the coarse centroids the IVF consumers (q44/q48/q74/q102/
    * q111) read via [[kmeansCentroids]]. Two assignment passes with one
    * centroid update between them, all in exact integer micro-space so
    * every argmin and
    * every learned centroid is bit-identical on any engine:
    *
    *   - components quantize once to xm[d] = floor(x[d]·10⁶) (one IEEE
    *     multiply + floor — exact, no round-half ambiguity);
    *   - assignment = argmin Σ(xm−cm)², the codegen'd
    *     [[graft.functions.LongL2]], ties on lower cid;
    *   - the updated centroid is the exact integer mean
    *     (Σ xm + n·OFF) div n − OFF per dimension (the OFF shift keeps
    *     the dividend non-negative, where floor- and truncating-division
    *     semantics agree across engines);
    *   - inertia reports Σ d² div 10⁶ per cluster (micro²→micro keeps
    *     the 100 TB sum inside a long).
    *
    * Shape at 100 TB: per pass, the corpus is touched by ONE scan; the
    * k-row centroid table broadcasts to the assignment (map-side, no
    * shuffle of the big side) and the update is one explode +
    * hash-partitioned aggregation per dimension — the classic scalable
    * k-means loop (k·dims partial aggregates per task, then one shuffle
    * of k·dims rows per reducer). Iteration count is a fixed small
    * constant; each extra Lloyd pass is the same two stages again.
    */
  def kmeansTrain(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val cent1 = kmeansCentroids(s, dir, k)
    val a2 = kmAssign(microVecs(s, dir), cent1)
    a2.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("d2 div 1000000")).cast(LongType).as("inertia_mu"))
      .join(cent1.select(col("cid"), expr(
        "aggregate(cm, CAST(0 AS BIGINT), (a, x) -> a + abs(x))").as("cent_l1_mu")),
        "cid")
      .select(col("cid"), col("n_vecs"), col("inertia_mu"), col("cent_l1_mu"))
      .orderBy(col("cid"))
  }

  /** IVF-probed ANN: top-k neighbors searched ONLY within the query's
    * top-2 probed cells ([[queryProbes]]) — the probe path that makes
    * ANN sub-linear at scale (brute force runs per probed cell, never
    * globally). Recall vs. global brute force depends on cell quality
    * and nprobe; precision is exact.
    */
  /** LANDED for the fixed eval query set (same artifact discipline as
    * [[knnTruth]] and the ADC table): q48 serves the landed result and
    * the q111 scoreboard's IVF recall join reads it — the in-cell
    * exact-cosine scan runs once per corpus, not once per consumer.
    */
  def ivfKnn(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    require(k <= 3, s"landed IVF results hold top-3, asked for $k")
    Materialize.table(s, s"vec_ivfknn_${dir}_3", dir, ivfKnnBuild(s, dir, 3))
      .filter(col("rnk") <= k)
      .orderBy(col("qid"), col("rnk"))
  }

  private[graft] def ivfKnnBuild(s: SparkSession, dir: String, k: Int): DataFrame = {
    val assign = ivfAssignments(s, dir).select(col("vec_id"), col("cid"))
    val base = withNorm(Tables.embeddings(s, dir))
    // query side: the fixed id set × its top-2 probed cells (constant
    // size, broadcast); candidate side: the landed one-cell-per-vector
    // index, so each candidate joins a query at most once
    val q = queryProbes(s, dir)
      .join(base.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nsq").as("qn")), "qid")
    val c = base.join(assign, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("nsq").as("cn"), col("cid"))
    val scored = broadcast(q).join(c, Seq("cid"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("cos", cosine(dot("qe", "ce"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Int8 scalar quantization (the SQ8 memory-compression path of a
    * vector index — 4× smaller than float32, cheaper than PQ to build):
    * each vector is min-max quantized to 256 levels and the
    * reconstruction error audited per label. All arithmetic is exact
    * integer micro-space (the q75 trick): components floor to micro
    * units — `floor(double)` is IEEE-identical on any engine — then
    * code/reconstruct/error are pure 64-bit integer ops on non-negative
    * numerators, so truncating and flooring division agree.
    *
    * Shape at scale: a single narrow scan; every lambda is per-row over
    * a 64-element array, no shuffle until the final label aggregation.
    */
  def sq8Error(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("v"))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("rng", array_max(col("v")) - col("vmin"))
      // code ∈ [0,255]; reconstruction snaps back onto the 256-level grid
      .withColumn("errs", expr(
        """transform(v, x -> abs(x - (vmin +
          |  (CASE WHEN rng = 0 THEN 0 ELSE ((x - vmin) * 255) div rng END
          |   * rng) div 255)))""".stripMargin))
      .select(col("label"),
        size(col("errs")).cast(LongType).as("dim"),
        expr("aggregate(errs, 0L, (a, x) -> a + x)").as("sum_err"),
        array_max(col("errs")).as("max_err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        max(col("max_err")).as("max_err_micro"),
        expr("sum(sum_err) div sum(dim)").as("avg_err_micro"))
      .orderBy(col("label"))

  /** Matryoshka (MRL) truncation audit: for the fixed KNN query set,
    * does the top-1 neighbor found with only the first 32 dims agree
    * with the full-64-dim answer? The question a pipeline asks before
    * shipping truncated embeddings (half the memory and FLOPs per
    * query). Reports both neighbors, both cosines, and the agreement
    * flag per query — the aggregate agreement rate is the retrieval
    * headline, the disagreeing rows are the debugging artifact.
    *
    * Same O(|Q|·N)-with-constant-|Q| shape as [[knnBrute]] (broadcast
    * query side, one scan, per-query top-1); the half-dim scoring
    * reuses the same scan — the candidate side is read once and both
    * dots are computed per pair, so truncation costs zero extra I/O.
    */
  def mrlAgreement(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(Tables.embeddings(s, dir))
      .withColumn("eh", expr("slice(embedding, 1, 32)"))
      .withColumn("nh", dot("eh", "eh"))
    val q = base.filter(col("vec_id").isin(KnnQueryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nsq").as("qn"), col("eh").as("qeh"), col("nh").as("qnh"))
    val c = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("nsq").as("cn"), col("eh").as("ceh"), col("nh").as("cnh"))
    val scored = broadcast(q).join(c, col("qid") =!= col("neighbor_id"))
      .withColumn("cos_full", cosine(dot("qe", "ce"), col("qn"), col("cn")))
      .withColumn("cos_half", cosine(dot("qeh", "ceh"), col("qnh"), col("cnh")))
    val wf = Window.partitionBy(col("qid"))
      .orderBy(col("cos_full").desc, col("neighbor_id"))
    val wh = Window.partitionBy(col("qid"))
      .orderBy(col("cos_half").desc, col("neighbor_id"))
    scored
      .withColumn("rf", row_number().over(wf))
      .withColumn("rh", row_number().over(wh))
      .filter(col("rf") === 1 || col("rh") === 1)
      .groupBy(col("qid"))
      .agg(
        max(when(col("rf") === 1, col("neighbor_id"))).as("n1_full"),
        max(when(col("rf") === 1, round(col("cos_full"), 6))).as("cos_full"),
        max(when(col("rh") === 1, col("neighbor_id"))).as("n1_half"),
        max(when(col("rh") === 1, round(col("cos_half"), 6))).as("cos_half"))
      .withColumn("agree", (col("n1_full") === col("n1_half")).cast(LongType))
      .orderBy(col("qid"))
  }

  /** Micro-int view of the embedding: floor(x·1e6) shifted by +1e6 so
    * every value is non-negative — `div` then agrees between engines
    * (floor = truncate on non-negative operands; corpus range is
    * (−1, 1) so the shift is always sufficient). The shift cancels in
    * variances and L2 distances and is subtracted back for means.
    */
  private val MicroShift = 1000000L
  private def microShifted: Column =
    expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) + $MicroShift)")

  /** Per-dimension embedding health stats — the audit a pipeline runs
    * before building an ANN index: a dimension with near-zero variance
    * is dead weight in every distance computation (and a symptom of a
    * collapsed encoder); a shifted mean or clipped min/max flags a
    * normalization bug. Reports exact integer micro-space mean,
    * floor-rounded variance, and min/max per dimension.
    *
    * Scale: posexplode fans out 64 rows per vector, then ONE
    * hash-partitioned aggregation over exactly 64 groups — partial
    * aggregation reduces each task to ≤ 64 rows before the shuffle, so
    * the exchange is O(tasks·64) at any corpus size.
    */
  def dimStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(microShifted).as(Seq("pos", "xs")))
      .groupBy((col("pos") + 1).cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        (expr("sum(xs) div count(1)") - MicroShift).as("mean_micro"),
        (expr("sum(xs * xs) div count(1)") -
          expr("(sum(xs) div count(1)) * (sum(xs) div count(1))")).as("var_micro2"),
        (min(col("xs")) - MicroShift).as("min_micro"),
        (max(col("xs")) - MicroShift).as("max_micro"))
      .orderBy(col("dim"))

  /** Nearest-centroid label probe — the cheapest supervised check of
    * embedding quality: build one centroid per `label` (the mean vector
    * in exact micro-int space), assign every vector to its min-L2
    * centroid, and report the label-vs-predicted confusion counts. A
    * healthy embedding space puts most mass on the diagonal; a specific
    * off-diagonal cell names the pair of classes the encoder confuses.
    *
    * Scale: the centroid table is O(labels) — built by one 64-group-
    * per-label aggregation, reassembled into arrays, and BROADCAST; the
    * corpus is then touched by one scan computing |labels| exact
    * integer L2 distances per row (zip_with + fold, codegen), and the
    * argmin is a keyed min of a (d2, label) struct — no window sort, no
    * second shuffle of the big side. Confusion output is O(labels²).
    */
  def centroidProbe(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), microShifted.as("xs"))
    val cent = base
      .select(col("label").as("clab"), posexplode(col("xs")).as(Seq("pos", "x")))
      .groupBy(col("clab"), col("pos"))
      .agg(expr("sum(x) div count(1)").as("c"))
      .groupBy(col("clab"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), p -> p.c)")
        .as("cv"))
    val d2 = base.join(broadcast(cent))
      // the engine's codegen'd long_l2 — identical exact-integer sum of
      // squared diffs, minus the interpreted HOF lambda per row×label
      .withColumn("d2", expr("long_l2(xs, cv)"))
    d2.groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("d2"), col("clab"))).as("best"))
      .groupBy(col("label"), col("best.clab").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred_label"))
  }
}
