package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.operators.Text.hash60

/** Corpus-curation operators beyond the core dedup/similarity set: word
  * permutation dedup, asymmetric containment, BPE-style merge-candidate
  * mining, temperature-reweighted source sampling, and RAG chunk
  * accounting. Like the rest of the text surface these are mandated-
  * extension operators (SURVEY §7.6), not reference ports — the reference
  * (mainul098/flink-start) has no text pipeline.
  *
  * Cross-engine determinism follows the shared rules: the 60-bit md5
  * hash [[Text.hash60]], integer accumulation with one terminal division,
  * and non-negative integer `div` (Spark) == `//` (DuckDB).
  */
object Curation {

  private def words = split(col("text"), " ")

  /** Bag-of-words deduplication accounting (q54): docs that are word
    * PERMUTATIONS of each other collide once word order is canonicalized
    * by sorting; docs with equal word SETS collide under the stricter
    * set canonicalization (order + multiplicity erased). Template farms
    * and shuffle-augmented near-dups are invisible to exact text hashing
    * (q33) but collapse here.
    *
    * Scale: one narrow projection (three 16-byte hashes per doc) into one
    * hash-partitioned aggregation — same single-shuffle shape as exact
    * dedup, linear in corpus size. The sort is per-row and bounded by doc
    * length; nothing explodes.
    */
  def bowDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        md5(col("text").cast(BinaryType)).as("text_md5"),
        md5(concat_ws(" ", array_sort(words)).cast(BinaryType)).as("bag_md5"),
        md5(concat_ws(" ", array_sort(array_distinct(words))).cast(BinaryType))
          .as("set_md5"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text_md5")).as("n_unique_texts"),
        countDistinct(col("bag_md5")).as("n_unique_bags"),
        countDistinct(col("set_md5")).as("n_unique_sets"),
        (countDistinct(col("text_md5")) - countDistinct(col("bag_md5")))
          .as("n_shuffled_dups"))
      .orderBy(col("lang"))

  /** Asymmetric containment pairs (q55): C(A in B) = |A∩B| / |A| over
    * word-3-gram shingle sets. Symmetric Jaccard (q34) misses the
    * sub-document case — a short doc fully quoted inside a long one has
    * low Jaccard but containment ≈ 1 — which is exactly the
    * quote/wrapper/expansion duplication a curation pass must catch.
    * Emits pairs where either direction's containment ≥ `threshold`.
    *
    * Scale: shares q34's inverted-index equi-join for the intersection
    * counts; pair space is bounded by shared-shingle candidates, never
    * all-pairs. At 100 TB the candidate stage swaps to the banded
    * MinHash join exactly as q35 does for Jaccard (asymmetric recall
    * needs more bands at the same threshold because min-wise signatures
    * estimate Jaccard, which lower-bounds containment).
    */
  /** Asymmetric containment pairs (q55): max(n_common/s1, n_common/s2)
    * ≥ threshold — the "small doc swallowed by a big doc" report that
    * symmetric Jaccard misses.
    *
    * Scale: containment truth is intrinsically quadratic in shingle
    * co-occurrence AND invisible to symmetric MinHash banding (a doc
    * fully contained in one 100× its size has Jaccard ≈ 0.01 — no band
    * can catch it), so past [[Text.RecallSampleTarget]] docs the audit
    * runs on the deterministic fingerprint-stratified 1/mod doc sample
    * (`sampleMod` 0 = derive from corpus size; every driver SF derives
    * 1, so the q55 oracle reads the FULL landed intersection stage and
    * is exact; q153 oracle-pins the sampled path at mod=8). MEASURED
    * motivation, round 15: the full intersection at 500k GenCorpus
    * docs filled the disk with shuffle spill (~1e10 co-occurrence
    * rows, `No space left on device` after ~100 GB) — the same lesson
    * as q150 at sf100, now carried by the derivation instead of a DNF.
    * Containment sampling keeps contained-pair ENDPOINTS together for
    * exact copies and near-copies (shared argmin shingle) but a doc
    * contained in a much larger doc often fingerprints differently —
    * the sampled audit measures the rate among fingerprint-stable
    * pairs, the same honest-bias note as [[Text.docSampleIds]].
    */
  def containmentPairs(s: SparkSession, dir: String,
      threshold: Double = 0.8, sampleMod: Int = 0): DataFrame = {
    val mod =
      if (sampleMod > 0) sampleMod
      else Text.sampleModOf(Text.nDocsOf(s, dir))
    val inter =
      if (mod == 1) Text.shingleInter(s, dir) // the landed full stage
      else Materialize.table(s, s"text_inter_s_${dir}_fp$mod", dir,
        Text.shingleInterOf(
          Text.docShingles(s, dir)
            .join(Text.docSampleIds(s, dir, mod), "doc_id")
            .select(col("doc_id"), col("sh"))))
    inter
      .withColumn("c1", round(col("n_common") / col("s1"), 6))
      .withColumn("c2", round(col("n_common") / col("s2"), 6))
      .filter(greatest(col("c1"), col("c2")) >= threshold)
      .select(col("d1"), col("d2"), col("n_common"), col("c1"), col("c2"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Top-k adjacent-word pair counts (q56) — the statistic behind the
    * first merge round of BPE-style tokenizer training: the most frequent
    * adjacent pair is the next merge. Reports corpus occurrence count and
    * document frequency per pair; ties broken lexicographically so the
    * top-k set is a total order (bit-stable across engines).
    *
    * Scale: explode to (n_words−1) pair rows per doc, then one
    * partial-aggregated groupBy and a TakeOrderedAndProject top-k — no
    * global sort, no join. Real BPE iterates this statistic; each round
    * is the same single-shuffle plan over the re-tokenized corpus.
    */
  def wordBigrams(s: SparkSession, dir: String, k: Int = 32): DataFrame =
    // (doc_id, pair) rows are unique in the landed stage, so the doc
    // count is a plain count — no distinct aggregation needed
    Text.bigramStage(s, dir)
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("n_occ"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(k)

  /** Temperature-reweighted source sampling manifest (q58): resample the
    * corpus TO the α = 0.5 target mixture p_s ∝ √n_s at (near-)constant
    * total size — each source's acceptance rate is min(1, p_s·N/n_s), so
    * tail sources keep everything (capped at 1, no up-sampling) while
    * head sources thin down until the kept mix approaches p_s. Distinct
    * from [[Text.sourceMix]] (q66), which reports PROPORTIONAL thinning
    * (kept fraction = p_s itself, shrinking the corpus by ~|S|×): q58 is
    * the manifest a mixing pass actually executes when the budget is
    * "one corpus worth of tokens at the flattened mixture". Per-doc
    * acceptance is the deterministic hash gate `hash60('smp' ∥ doc_id) %
    * 1e6 < accept_micro`, so the selected subset is reproducible and
    * re-runnable — the same contract as q62's hash sampling.
    *
    * Exactness: weights are integer micro-units of √n_s (IEEE sqrt is
    * correctly rounded, so both engines agree bit-for-bit), the
    * acceptance rate is exact integer arithmetic — DECIMAL(38,0)-widened
    * product, one non-negative `div` (see [[acceptRates]] for the
    * overflow bound) — and no float ever crosses an aggregation.
    *
    * Scale: the rate table is |sources| rows — broadcast back to the
    * corpus scan; one aggregation per side, no shuffle of the corpus
    * beyond its own groupBy.
    */
  /** α = 0.5 acceptance-rate table from per-source counts: (source,
    * n_docs) → (source, accept_micro). accept = min(1, p_s·N/n_s) with
    * p_s = w_s/Σw, all in integer micros:
    * floor((w_micro·N·1e6) / (total_w·n_s)); operands non-negative so
    * Spark `div` == DuckDB `//`. The triple product is widened to
    * DECIMAL(38,0) (oracle: HUGEINT) — in BIGINT it wraps once
    * w_micro·N·1e6 ≳ 9.2e18, i.e. ~8.5e6 docs in one source at corpus
    * N = 1e9 (√8.5e6·1e6 · 1e9 · 1e6 ≈ 2.9e21); DECIMAL(38,0) holds
    * through N ≈ 1e15 docs (product ≈ 3e34 < 1e38). Spark's `div` on
    * decimal operands returns BIGINT, and accept_micro ≤ 1e6, so the
    * output stays a plain long. Past the Long-quotient bound the two
    * engines must degrade identically, so the oracle clamps BEFORE
    * narrowing (least in HUGEINT, then CAST to BIGINT) — mirroring
    * Spark, where an over-Long `div` nulls and `least` skips the null,
    * clamping to 1e6 — instead of raising on the HUGEINT→BIGINT cast.
    */
  private[graft] def acceptRates(perSrc: DataFrame): DataFrame = {
    val weighted = perSrc
      .withColumn("w_micro", round(sqrt(col("n_docs")) * 1e6).cast(LongType))
    val tot = weighted.agg(sum(col("w_micro")).as("total_w"),
      sum(col("n_docs")).as("n_total"))
    weighted.crossJoin(broadcast(tot))
      .withColumn("accept_micro", least(lit(1000000L),
        expr("(CAST(w_micro AS DECIMAL(38,0)) * n_total * 1000000) div " +
          "(CAST(total_w AS DECIMAL(38,0)) * n_docs)")))
      .select(col("source"), col("accept_micro"))
  }

  def tempSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val perSrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val rates = acceptRates(perSrc)
    docs
      .join(broadcast(rates), Seq("source"))
      .withColumn("kept",
        (hash60(concat(lit("smp"), col("doc_id"))) % 1000000L < col("accept_micro"))
          .cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("accept_micro")).as("accept_micro"),
        sum(col("kept")).cast(LongType).as("n_kept"))
      .withColumn("kept_ratio", round(col("n_kept") / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  /** Bigram language-model quality score (q100): per-doc mean surprisal
    * of adjacent word pairs under the corpus bigram distribution with
    * add-1 (Laplace) smoothing — p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V). The
    * step up from the unigram signal (q61): word-salad whose unigrams
    * are all common still scores high surprisal here, which is exactly
    * the gibberish/perplexity filter a curation pass wants. Docs with a
    * single word have no bigrams and are excluded by definition.
    *
    * Determinism: the probability is an exact int-ratio double, one
    * ln() rounds to integer micro-nats per DISTINCT bigram (same
    * contract as q61), and everything after is 64-bit integer sums and
    * one floor division.
    *
    * Scale: bigram scores are keyed by the pair string and joined back
    * by hash equi-join — the score table is O(distinct bigrams), too big
    * to broadcast at 100 TB, and the linear pair-keyed shuffle IS the
    * honest cost of an exact bigram LM. Per-doc pair instances collapse
    * to (doc, pair, n) counts before the join, so the join input is
    * distinct doc-pairs, not token instances.
    */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame = {
    // both corpus-sized inputs are LANDED stages now: per-doc bigram
    // counts from text_bigram, unigram counts rolled up from text_tf.
    // c12 derives from the doc-pair counts (Σn over docs) and V from
    // the unigram table's row count — zero corpus explodes per call.
    val docPairs = Text.bigramStage(s, dir)
    // unigram counts roll up from the landed TF stage — the second
    // corpus token explode this pipeline used to pay is gone.
    // Optimization round 16 (guide §2.4/§5 — the r15 q94 lesson): `uni`
    // was eager-localCheckpoint'd so the vocab count and the score join
    // would not both replay the rollup — a vocab-sized UNEVICTABLE
    // BlockManager table at scale plus a driver-blocking job per run.
    // V is now an uncorrelated scalar subquery over the SAME aggregate
    // subtree, so AQE's stage cache runs the tf-stage scan + term
    // shuffle once and only the cheap post-shuffle final agg replays
    // for the 1-row count branch.
    val uni = Text.tfStage(s, dir)
      .groupBy(col("term")).agg(sum(col("cnt")).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v")).scalar()
    val scores = docPairs.groupBy(col("pair")).agg(sum(col("n")).as("c12"))
      .withColumn("w1", split(col("pair"), " ").getItem(0))
      .join(uni.withColumnRenamed("term", "w1"), Seq("w1"))
      .select(col("pair"),
        round(-log((col("c12") + 1) / (col("c1") + vocab)) * 1e6)
          .cast(LongType).as("surprisal_micro"))
    docPairs
      .join(scores, Seq("pair"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_pairs"),
        sum(col("n") * col("surprisal_micro")).as("sum_surprisal_micro"))
      .withColumn("avg_surprisal_micro",
        expr("sum_surprisal_micro div n_pairs"))
      .orderBy(col("doc_id"))
  }

  /** One-row corpus datasheet (q101) — the "datasheet for datasets"
    * header block every curation report opens with: volume (docs,
    * tokens, chars), diversity (languages, sources, vocabulary), and
    * duplication (exact-dup docs, verified near-dup pairs at 0.5, docs
    * in near-dup clusters). Composes the landed near-dup pair table
    * ([[Text.minhashLshPairs]]) rather than re-deriving it — the whole
    * point of the materialized stage graph.
    */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(words)).cast(LongType).as("n_tokens"),
      sum(col("n_chars")).cast(LongType).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      (count(lit(1)) - countDistinct(md5(col("text").cast(BinaryType))))
        .as("n_exact_dup_docs"))
    val vocab = Text.tfStage(s, dir)
      .agg(countDistinct(col("term")).as("n_vocab"))
    val pairs = Text.minhashLshPairs(s, dir, 0.5)
    val pairStats = pairs.agg(count(lit(1)).as("n_neardup_pairs"))
    val docsInPairs = pairs.select(col("d1").as("d"))
      .union(pairs.select(col("d2").as("d")))
      .agg(countDistinct(col("d")).as("n_neardup_docs"))
    base.crossJoin(broadcast(vocab))
      .crossJoin(broadcast(pairStats))
      .crossJoin(broadcast(docsInPairs))
  }

  /** RAG / training-window chunk accounting (q59): fixed `win`-word
    * chunks at stride `stride` (overlap = win−stride). Per source:
    * how many chunks the corpus shards into, how many tokens the overlap
    * duplicates, and the duplication ratio — the storage/compute bill of
    * a chunking policy, computable without materializing a single chunk.
    * n_chunks = 1 if n ≤ win else ⌈(n−win)/stride⌉+1; duplicated tokens
    * = (n_chunks−1)·(win−stride). Pure closed-form integer math per doc —
    * no explode — then one aggregation.
    */
  def chunkManifest(s: SparkSession, dir: String, win: Int = 64,
      stride: Int = 48): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), size(words).cast(LongType).as("n_words"))
      .withColumn("n_chunks",
        when(col("n_words") <= win, lit(1L))
          .otherwise(expr(s"(n_words - $win + $stride - 1) div $stride") + 1L))
      .withColumn("dup_tokens", (col("n_chunks") - 1L) * (win - stride))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_chunks")).as("total_chunks"),
        sum(col("dup_tokens")).as("total_dup_tokens"))
      .withColumn("avg_chunks", round(col("total_chunks") / col("n_docs"), 6))
      .withColumn("dup_ratio", round(col("total_dup_tokens") / col("total_words"), 6))
      .orderBy(col("source"))

  /** Shuffle-key skew report (q115) — the diagnostics behind every
    * salting decision: for each hot join/aggregation key family, the
    * key cardinality and how much of the row mass the heaviest key and
    * the top-10 keys hold. A max share near 1e6/parallelism means one
    * straggler task; the fix ladder is AQE skew-join → explicit salt →
    * the prefix-filter/LSH redesigns the text ops already ship. Each
    * relation costs one keyed count plus a TakeOrdered over the
    * O(distinct-keys) summary — never a second corpus pass.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    def keyStats(name: String, keyed: DataFrame): DataFrame = {
      // key-count table feeds the top-10 branch AND the summary agg.
      // Both consumers reference the SAME aggregate subtree, so AQE
      // exchange reuse runs the corpus scan + count shuffle once and
      // only the cheap post-shuffle final agg replays per branch (the
      // q94 pattern). r15 eager-localCheckpoint'd this instead, which
      // cost 4 driver-blocking materialization jobs per run (21 jobs
      // total, measured; now 6) and — the round-15 q94 lesson — pinned
      // a vocab-sized table in unevictable BlockManager disk at scale.
      val cnt = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val top = cnt.orderBy(col("c").desc, col("k")).limit(10)
        .agg(sum(col("c")).as("top10"))
      cnt.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("mx"))
        .crossJoin(top)
        .select(lit(name).as("relation"), col("n_keys"),
          col("n_rows").cast(LongType).as("n_rows"),
          expr("(mx * 1000000) div n_rows").as("max_share_micro"),
          expr("(top10 * 1000000) div n_rows").as("top10_share_micro"))
    }
    keyStats("events.user_id",
      Tables.events(s, dir).select(col("user_id").cast(StringType).as("k")))
      .unionByName(keyStats("lineitem.l_suppkey",
        Tables.lineitem(s, dir).select(col("l_suppkey").cast(StringType).as("k"))))
      .unionByName(keyStats("orders.o_custkey",
        Tables.orders(s, dir).select(col("o_custkey").cast(StringType).as("k"))))
      // the shingle family reads the LANDED corpus shingle stage shared
      // with q87/minhash instead of replaying the corpus explode
      .unionByName(keyStats("shingles.sh",
        Text.docShingles(s, dir).select(col("sh").as("k"))))
      .orderBy(col("relation"))
  }

  /** Cross-modal retention (q104): for docs that carry an embedding
    * (doc_id = vec_id), combine the THREE independent curation signals a
    * production pipeline votes with — text near-dup canonicality
    * ([[Text.neardupClusters]], MinHash-LSH CC), semantic near-dup
    * canonicality ([[Vectors.embedClusters]], embedding-LSH CC — the
    * SemDeDup-style signal that catches paraphrases text shingles
    * miss), and the q39 heuristic quality gate — and report per
    * language how each signal and their conjunction cut the corpus.
    *
    * Shape at scale: both label tables are landed O(clustered-id)
    * stages shared with q67/q69 (built once per session, read here);
    * the quality flags are per-row expressions; the joins key on
    * doc_id — one shuffle each, no corpus-sized intermediate.
    */
  def crossmodalRetention(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("w", words)
      .withColumn("n_words", size(col("w")))
      .withColumn("stop_ratio",
        round(size(expr("filter(w, x -> x IN ('the', 'a'))")) / col("n_words"), 6))
      .select(col("doc_id"), col("lang"),
        (col("n_words") >= 15 && col("n_words") <= 90 &&
          col("stop_ratio") <= 0.12).as("qual_keep"))
    val emb = Tables.embeddings(s, dir).select(col("vec_id"))
    val textLab = Text.neardupClusters(s, dir)
      .select(col("doc_id"), col("is_canonical").as("t_can"))
    val vecLab = Vectors.embedClusters(s, dir)
      .select(col("vec_id"), col("is_canonical").as("v_can"))
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .join(textLab, Seq("doc_id"), "left")
      .join(vecLab, Seq("vec_id"), "left")
      .withColumn("text_keep", coalesce(col("t_can"), lit(true)))
      .withColumn("sem_keep", coalesce(col("v_can"), lit(true)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_keep").cast(LongType)).as("n_text_kept"),
        sum(col("sem_keep").cast(LongType)).as("n_sem_kept"),
        sum(col("qual_keep").cast(LongType)).as("n_qual_kept"),
        sum((col("text_keep") && col("sem_keep") && col("qual_keep"))
          .cast(LongType)).as("n_final"))
      .orderBy(col("lang"))
  }
}
