package graft

import graft.operators.Vectors._

/** Embedding / similarity-search inventory over `embeddings` (SURVEY §7.6).
  * Float parity with the oracle: floats widen to double exactly; both
  * engines reduce dot products left-to-right (Spark `aggregate` fold,
  * DuckDB `list_dot_product`); outputs round to 6 dp; cross-row means
  * accumulate rounded DECIMALs, never raw floats.
  */
object VectorQueries {

  private val NSQ = "list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))"

  /** Fixed KNN query-id set — mirrors [[graft.operators.Vectors.KnnQueryIds]]. */
  private val QIDS = graft.operators.Vectors.KnnQueryIds.mkString("(", ", ", ")")

  /** Shared trained-coarse-centroid chain (mirrors
    * [[graft.operators.Vectors.kmeansCentroids]]): the q75 k-means c1
    * table — first-8 init, one exact-integer Lloyd update — surfaced as
    * DOUBLE[] centroids `cent(cid, ce, cn)`. Every IVF consumer
    * (q44/q48/q74/q102/q111) assigns against THESE centroids; the
    * BIGINT/1e6 division is the identical IEEE operation on both
    * engines, so centroid doubles (and cosines against them) match
    * bit-for-bit. CTE names are `k`-prefixed to coexist with each
    * consumer's own CTEs.
    */
  private val KCENT: String = {
    val OFF = 1L << 31
    s"""kxm AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS xm
       |  FROM embeddings),
       |kx AS (SELECT vec_id, d, xm[d] AS v
       |       FROM kxm, UNNEST(generate_series(1, len(xm))) AS u(d)),
       |kc0 AS (SELECT vec_id AS cid, d, v AS cv FROM kx WHERE vec_id < 8),
       |kd1 AS (SELECT kx.vec_id, cid, SUM((v - cv) * (v - cv)) AS d2
       |        FROM kx JOIN kc0 USING (d) GROUP BY 1, 2),
       |ka1 AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
       |  FROM kd1) WHERE rk = 1),
       |kc1 AS (SELECT cid, d,
       |          CAST((SUM(v) + COUNT(*) * $OFF) // COUNT(*) - $OFF AS BIGINT) AS cv
       |        FROM kx JOIN ka1 USING (vec_id) GROUP BY cid, d),
       |kcl AS (SELECT cid, list(cv / 1000000.0 ORDER BY d) AS ce
       |        FROM kc1 GROUP BY cid),
       |cent AS (SELECT cid, ce, list_dot_product(ce, ce) AS cn FROM kcl)""".stripMargin
  }

  /** q69/q98 shared chain: q45's multi-table LSH candidate generation +
    * cosine verify at 0.4, then the recursive reachability walk `r`
    * whose per-node MIN(lab) equals Spark's min-label-propagation
    * fixpoint (mirrors TextQueries.CLUSTER_CTES for the text graph).
    */
  /** Integer k-means chain ending at `a2` = (vec_id, cid, d2): the
    * DuckDB twin of microVecs → one Lloyd update from the first-8 init →
    * trained-centroid assignment (see operators.Vectors.kmeansCentroids).
    * Shared by q75's training report and q120's coreset.
    */
  private def KM_A2_CTES: String = {
    val OFF = 1L << 31
    s"""xm AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS xm
       |  FROM embeddings),
       |x AS (SELECT vec_id, d, xm[d] AS v
       |      FROM xm, UNNEST(generate_series(1, len(xm))) AS u(d)),
       |c0 AS (SELECT vec_id AS cid, d, v AS cv FROM x WHERE vec_id < 8),
       |d1 AS (SELECT x.vec_id, cid, SUM((v - cv) * (v - cv)) AS d2
       |       FROM x JOIN c0 USING (d) GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
       |  FROM d1) WHERE rk = 1),
       |c1 AS (SELECT cid, d,
       |         CAST((SUM(v) + COUNT(*) * $OFF) // COUNT(*) - $OFF AS BIGINT) AS cv
       |       FROM x JOIN a1 USING (vec_id) GROUP BY cid, d),
       |dd2 AS (SELECT x.vec_id, cid, SUM((v - cv) * (v - cv)) AS d2
       |        FROM x JOIN c1 USING (d) GROUP BY 1, 2),
       |a2 AS (SELECT vec_id, cid, d2 FROM (
       |  SELECT vec_id, cid, d2,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
       |  FROM dd2) WHERE rk = 1)""".stripMargin
  }

  /** `p` prefixes every CTE name so this chain can coexist with
    * TextQueries.CLUSTER_CTES (whose names overlap) in ONE combined
    * oracle (q104).
    */
  private[graft] def EMBED_CLUSTER_CTES(p: String = ""): String = {
    def bit(j: Int, weight: Long): String =
      s"""CASE WHEN list_reduce(list_transform(generate_series(0, 63), i ->
         |  CAST(embedding[i+1] AS DOUBLE) *
         |  CAST((CAST(1103515245 AS BIGINT) * ($j*64 + i) + 12345) % 2001 - 1000 AS DOUBLE)),
         |  (a, b) -> a + b) >= 0 THEN CAST($weight AS BIGINT) ELSE 0 END""".stripMargin
    val tableBuckets = (0 until 6).map { t =>
      val b = (0 until 3).map(k => bit(t * 3 + k, 1L << k)).mkString(" + ")
      s"SELECT vec_id, $t AS t, $b AS b FROM embeddings"
    }.mkString("\nUNION ALL\n")
    s"""${p}base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
       |${p}buckets AS (
       |$tableBuckets),
       |${p}cand AS (
       |  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
       |  FROM ${p}buckets x JOIN ${p}buckets y
       |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
       |${p}pairs AS (
       |  SELECT id1, id2
       |  FROM ${p}cand JOIN ${p}base a ON a.vec_id = id1
       |  JOIN ${p}base b ON b.vec_id = id2
       |  WHERE round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) >= 0.4),
       |${p}und AS (SELECT id1 AS a, id2 AS b FROM ${p}pairs
       |        UNION ALL SELECT id2, id1 FROM ${p}pairs),
       |${p}r AS (
       |  SELECT a AS node, a AS lab FROM (SELECT DISTINCT a FROM ${p}und)
       |  UNION
       |  SELECT u.b AS node, rr.lab FROM ${p}r rr JOIN ${p}und u ON u.a = rr.node)""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q40_knn_cosine", (s, d) => knnTruth(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |q AS (SELECT vec_id AS qid, e AS qe, nsq AS qn FROM base WHERE vec_id IN $QIDS),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    list_dot_product(qe, e) / sqrt(qn * nsq) AS cos
         |  FROM q CROSS JOIN base WHERE vec_id != qid),
         |ranked AS (
         |  SELECT qid, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id)
         |      AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, neighbor_id, round(cos, 6) AS cos
         |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // q88: Matryoshka truncation audit — top-1 retrieval agreement
    // between full-64-dim and first-32-dim cosine for the fixed query set.
    QueryDef("q88_mrl_agreement", (s, d) => mrlAgreement(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq,
         |    CAST(embedding AS DOUBLE[])[1:32] AS eh,
         |    list_dot_product(CAST(embedding AS DOUBLE[])[1:32],
         |                     CAST(embedding AS DOUBLE[])[1:32]) AS nh
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, e AS qe, nsq AS qn, eh AS qeh, nh AS qnh
         |      FROM base WHERE vec_id IN $QIDS),
         |scored AS (
         |  SELECT qid, vec_id AS nid,
         |    list_dot_product(qe, e) / sqrt(qn * nsq) AS cf,
         |    list_dot_product(qeh, eh) / sqrt(qnh * nh) AS ch
         |  FROM q CROSS JOIN base WHERE vec_id != qid),
         |r AS (
         |  SELECT qid, nid, cf, ch,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cf DESC, nid) AS rf,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ch DESC, nid) AS rh
         |  FROM scored)
         |SELECT qid,
         |  MAX(CASE WHEN rf = 1 THEN nid END) AS n1_full,
         |  MAX(CASE WHEN rf = 1 THEN round(cf, 6) END) AS cos_full,
         |  MAX(CASE WHEN rh = 1 THEN nid END) AS n1_half,
         |  MAX(CASE WHEN rh = 1 THEN round(ch, 6) END) AS cos_half,
         |  CAST(CASE WHEN MAX(CASE WHEN rf = 1 THEN nid END) =
         |                 MAX(CASE WHEN rh = 1 THEN nid END)
         |       THEN 1 ELSE 0 END AS BIGINT) AS agree
         |FROM r WHERE rf = 1 OR rh = 1
         |GROUP BY qid ORDER BY qid""".stripMargin)),

    QueryDef("q41_norm_stats", (s, d) => normStats(s, d), Some(
      s"""WITH v AS (SELECT label, round(sqrt($NSQ), 6) AS nrm FROM embeddings)
         |SELECT label, COUNT(*) AS n,
         |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
         |  round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
         |FROM v GROUP BY label ORDER BY label""".stripMargin)),

    QueryDef("q42_embed_neardup", (s, d) => embedNearDup(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings)
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) AS cos
         |FROM base a JOIN base b ON a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) >= 0.4
         |ORDER BY id1, id2""".stripMargin)),

    QueryDef("q43_lsh_buckets", (s, d) => lshBuckets(s, d), Some {
      def bit(j: Int): String =
        s"""CASE WHEN list_reduce(list_transform(generate_series(0, 63), i ->
           |  CAST(embedding[i+1] AS DOUBLE) *
           |  CAST((CAST(1103515245 AS BIGINT) * ($j*64 + i) + 12345) % 2001 - 1000 AS DOUBLE)),
           |  (a, b) -> a + b) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END""".stripMargin
      s"""SELECT ${(0 until 8).map(bit).mkString(" + ")} AS bucket,
         |  COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
         |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin
    }),

    QueryDef("q45_lsh_neardup", (s, d) => lshNearDup(s, d), Some {
      def bit(j: Int, weight: Long): String =
        s"""CASE WHEN list_reduce(list_transform(generate_series(0, 63), i ->
           |  CAST(embedding[i+1] AS DOUBLE) *
           |  CAST((CAST(1103515245 AS BIGINT) * ($j*64 + i) + 12345) % 2001 - 1000 AS DOUBLE)),
           |  (a, b) -> a + b) >= 0 THEN CAST($weight AS BIGINT) ELSE 0 END""".stripMargin
      val tableBuckets = (0 until 6).map { t =>
        val b = (0 until 3).map(k => bit(t * 3 + k, 1L << k)).mkString(" + ")
        s"SELECT vec_id, $t AS t, $b AS b FROM embeddings"
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |buckets AS (
         |$tableBuckets),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
         |  FROM buckets x JOIN buckets y
         |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id)
         |SELECT id1, id2,
         |  round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) AS cos
         |FROM cand JOIN base a ON a.vec_id = id1 JOIN base b ON b.vec_id = id2
         |WHERE round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) >= 0.4
         |ORDER BY id1, id2""".stripMargin
    }),

    // q106: LSH tuning table — measured recall per table-count prefix.
    // Every exact pair is tagged with the first table that catches it
    // (min colliding table); cumulative counts per prefix give the
    // recall curve in one pass.
    QueryDef("q106_lsh_recall_sweep", (s, d) => lshRecallSweep(s, d), Some {
      def bit(j: Int, weight: Long): String =
        s"""CASE WHEN list_reduce(list_transform(generate_series(0, 63), i ->
           |  CAST(embedding[i+1] AS DOUBLE) *
           |  CAST((CAST(1103515245 AS BIGINT) * ($j*64 + i) + 12345) % 2001 - 1000 AS DOUBLE)),
           |  (a, b) -> a + b) >= 0 THEN CAST($weight AS BIGINT) ELSE 0 END""".stripMargin
      val tableBuckets = (0 until 6).map { t =>
        val b = (0 until 3).map(k => bit(t * 3 + k, 1L << k)).mkString(" + ")
        s"SELECT vec_id, $t AS t, $b AS b FROM embeddings"
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |exact AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM base a JOIN base b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) >= 0.4),
         |buckets AS (
         |$tableBuckets),
         |mt AS (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2, MIN(x.t) AS min_t
         |  FROM buckets x JOIN buckets y
         |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id
         |  GROUP BY 1, 2),
         |j AS (SELECT exact.id1, exact.id2, mt.min_t
         |      FROM exact LEFT JOIN mt USING (id1, id2)),
         |tot AS (SELECT COUNT(*) AS n_true FROM j),
         |ts AS (SELECT CAST(unnest(generate_series(1, 6)) AS BIGINT) AS n_tables)
         |SELECT n_tables, n_true,
         |  CAST(SUM(CASE WHEN j.min_t < ts.n_tables THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_found,
         |  (CAST(SUM(CASE WHEN j.min_t < ts.n_tables THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // n_true AS recall_micro
         |FROM ts CROSS JOIN tot CROSS JOIN j
         |GROUP BY n_tables, n_true ORDER BY n_tables""".stripMargin
    }),

    // q151: the SAMPLED vector recall sweep — q106's 100 TB spelling,
    // oracle-checked at an EXPLICIT 1/8 md5 vec sample (the q150
    // discipline): beyond the derivation threshold the exact-pair
    // ground truth (vec_exact, ~5 h single-node at the 200k-vec
    // rehearsal corpus) is computed only over a bounded deterministic
    // sample, so the audit's cost stops tracking corpus size; this
    // query gives that sampled path its own exact DuckDB twin at every
    // driver SF.
    QueryDef("q151_lsh_recall_sampled",
      (s, d) => lshRecallSweep(s, d, 0.4, sampleMod = 8), Some {
      def bit(j: Int, weight: Long): String =
        s"""CASE WHEN list_reduce(list_transform(generate_series(0, 63), i ->
           |  CAST(embedding[i+1] AS DOUBLE) *
           |  CAST((CAST(1103515245 AS BIGINT) * ($j*64 + i) + 12345) % 2001 - 1000 AS DOUBLE)),
           |  (a, b) -> a + b) >= 0 THEN CAST($weight AS BIGINT) ELSE 0 END""".stripMargin
      val tableBuckets = (0 until 6).map { t =>
        val b = (0 until 3).map(k => bit(t * 3 + k, 1L << k)).mkString(" + ")
        s"SELECT vec_id, $t AS t, $b AS b FROM emb_s"
      }.mkString("\nUNION ALL\n")
      s"""WITH emb_s AS (
         |  SELECT * FROM embeddings
         |  WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
         |          AS BIGINT) % 8 = 0),
         |base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[])) AS nsq FROM emb_s),
         |exact AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM base a JOIN base b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.e, b.e) / sqrt(a.nsq * b.nsq), 6) >= 0.4),
         |buckets AS (
         |$tableBuckets),
         |mt AS (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2, MIN(x.t) AS min_t
         |  FROM buckets x JOIN buckets y
         |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id
         |  GROUP BY 1, 2),
         |j AS (SELECT exact.id1, exact.id2, mt.min_t
         |      FROM exact LEFT JOIN mt USING (id1, id2)),
         |tot AS (SELECT COUNT(*) AS n_true FROM j),
         |ts AS (SELECT CAST(unnest(generate_series(1, 6)) AS BIGINT) AS n_tables)
         |SELECT n_tables, n_true,
         |  CAST(SUM(CASE WHEN j.min_t < ts.n_tables THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_found,
         |  (CAST(SUM(CASE WHEN j.min_t < ts.n_tables THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // n_true AS recall_micro
         |FROM ts CROSS JOIN tot CROSS JOIN j
         |GROUP BY n_tables, n_true ORDER BY n_tables""".stripMargin
    }),

    // q69: connected components over q45's verified pair graph — the
    // oracle reuses the q45 CTEs and walks the graph with a recursive
    // CTE; min-reachable-vec_id is an engine-independent fixpoint.
    QueryDef("q69_embed_clusters", (s, d) => embedClusters(s, d), Some(
      s"""WITH RECURSIVE ${EMBED_CLUSTER_CTES()}
         |SELECT node AS vec_id, MIN(lab) AS cluster_id,
         |  node = MIN(lab) AS is_canonical
         |FROM r GROUP BY node ORDER BY vec_id""".stripMargin)),

    // q98: per-label embedding retention manifest — the vector twin of
    // q70: keep each q69 cluster's canonical member, unclustered
    // vectors always survive.
    QueryDef("q98_embed_retention", (s, d) => embedRetention(s, d), Some(
      s"""WITH RECURSIVE ${EMBED_CLUSTER_CTES()},
         |labs AS (SELECT node, MIN(lab) AS lab FROM r GROUP BY node)
         |SELECT e.label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN labs.node IS NULL OR labs.node = labs.lab
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM embeddings e LEFT JOIN labs ON labs.node = e.vec_id
         |GROUP BY e.label ORDER BY e.label""".stripMargin)),

    QueryDef("q48_ivf_knn", (s, d) => ivfKnn(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |$KCENT,
         |ascored AS (
         |  SELECT vec_id, cid, list_dot_product(e, ce) / sqrt(nsq * cn) AS cos
         |  FROM base CROSS JOIN cent),
         |probes AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |  FROM ascored WHERE vec_id IN $QIDS) WHERE rnk <= 2),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |    FROM ascored) WHERE rnk = 1),
         |ext AS (SELECT base.vec_id, e, nsq, cid FROM base JOIN assign USING (vec_id)),
         |q AS (SELECT p.vec_id AS qid, e AS qe, nsq AS qn, p.cid
         |      FROM probes p JOIN base ON base.vec_id = p.vec_id),
         |scored AS (
         |  SELECT qid, c.vec_id AS neighbor_id,
         |    list_dot_product(qe, c.e) / sqrt(qn * c.nsq) AS cos
         |  FROM q JOIN ext c USING (cid) WHERE c.vec_id != qid),
         |ranked AS (
         |  SELECT qid, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id)
         |      AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, neighbor_id, round(cos, 6) AS cos
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin)),

    // q72: product-quantization codes — the ANN memory-compression path;
    // same d2 expansion and fold order on both engines, ties on c.
    QueryDef("q72_pq_assign", (s, d) => pqAssign(s, d), Some(
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sub AS (SELECT vec_id, s, list_slice(e, s*16+1, s*16+16) AS v
        |        FROM base, UNNEST(generate_series(0, 3)) AS u(s)),
        |cent AS (SELECT vec_id AS c, s, v AS cv FROM sub WHERE vec_id < 8),
        |d AS (SELECT sub.vec_id, sub.s, c,
        |        list_dot_product(cv, cv) + list_dot_product(v, v)
        |          - 2 * list_dot_product(v, cv) AS d2
        |      FROM sub JOIN cent ON sub.s = cent.s),
        |r AS (SELECT vec_id, s, c, d2,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rk
        |      FROM d),
        |m AS (SELECT vec_id, s, c, d2 FROM r WHERE rk = 1)
        |SELECT vec_id,
        |  CAST(SUM(c * (CASE s WHEN 0 THEN 1 WHEN 1 THEN 8
        |                       WHEN 2 THEN 64 ELSE 512 END)) AS BIGINT)
        |    AS pq_code,
        |  round(CAST(SUM(CAST(round(d2, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS qerr
        |FROM m GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // q74: IVF-PQ ADC search — probe the query's coarse cell (q44/q48
    // convention), score candidates from PQ codes alone (q72 convention)
    // via the per-query lookup table; rank by the exact DECIMAL ADC sum.
    QueryDef("q74_pq_search", (s, d) => pqSearch(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |$KCENT,
         |ascored AS (
         |  SELECT vec_id, cid, list_dot_product(e, ce) / sqrt(nsq * cn) AS cos
         |  FROM base CROSS JOIN cent),
         |probes AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |  FROM ascored WHERE vec_id IN $QIDS) WHERE rnk <= 2),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |    FROM ascored) WHERE rnk = 1),
         |sub AS (SELECT vec_id, s, list_slice(e, s*16+1, s*16+16) AS v
         |        FROM base, UNNEST(generate_series(0, 3)) AS u(s)),
         |centS AS (SELECT vec_id AS c, s, v AS cv FROM sub WHERE vec_id < 8),
         |d AS (SELECT sub.vec_id, sub.s, c,
         |        list_dot_product(cv, cv) + list_dot_product(v, v)
         |          - 2 * list_dot_product(v, cv) AS d2
         |      FROM sub JOIN centS ON sub.s = centS.s),
         |code AS (SELECT vec_id, s, c FROM (
         |  SELECT vec_id, s, c,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rk
         |  FROM d) WHERE rk = 1),
         |q AS (SELECT vec_id AS qid, cid FROM probes),
         |lut AS (SELECT vec_id AS qid, s, c, d2 FROM d WHERE vec_id IN $QIDS),
         |cand AS (SELECT qid, a.vec_id AS neighbor_id
         |         FROM q JOIN assign a USING (cid) WHERE a.vec_id != qid),
         |adc AS (
         |  SELECT cand.qid, neighbor_id,
         |    SUM(CAST(round(l.d2, 6) AS DECIMAL(18,6))) AS adc_dec
         |  FROM cand
         |  JOIN code ON code.vec_id = neighbor_id
         |  JOIN lut l ON l.qid = cand.qid AND l.s = code.s AND l.c = code.c
         |  GROUP BY cand.qid, neighbor_id),
         |ranked AS (
         |  SELECT qid, neighbor_id, adc_dec,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dec, neighbor_id)
         |      AS BIGINT) AS rnk
         |  FROM adc)
         |SELECT qid, rnk, neighbor_id,
         |  round(CAST(adc_dec AS DOUBLE), 6) AS adc
         |FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin)),

    // q102: two-stage retrieval — the q74 ADC scores keep a shortlist of
    // 8 ids per query (compressed index proposes), then ONLY those pairs
    // fetch raw floats for an exact-cosine rerank (raw vectors decide).
    QueryDef("q102_pq_rerank", (s, d) => pqRerank(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |$KCENT,
         |ascored AS (
         |  SELECT vec_id, cid, list_dot_product(e, ce) / sqrt(nsq * cn) AS cos
         |  FROM base CROSS JOIN cent),
         |probes AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |  FROM ascored WHERE vec_id IN $QIDS) WHERE rnk <= 2),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |    FROM ascored) WHERE rnk = 1),
         |sub AS (SELECT vec_id, s, list_slice(e, s*16+1, s*16+16) AS v
         |        FROM base, UNNEST(generate_series(0, 3)) AS u(s)),
         |centS AS (SELECT vec_id AS c, s, v AS cv FROM sub WHERE vec_id < 8),
         |d AS (SELECT sub.vec_id, sub.s, c,
         |        list_dot_product(cv, cv) + list_dot_product(v, v)
         |          - 2 * list_dot_product(v, cv) AS d2
         |      FROM sub JOIN centS ON sub.s = centS.s),
         |code AS (SELECT vec_id, s, c FROM (
         |  SELECT vec_id, s, c,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rk
         |  FROM d) WHERE rk = 1),
         |q AS (SELECT vec_id AS qid, cid FROM probes),
         |lut AS (SELECT vec_id AS qid, s, c, d2 FROM d WHERE vec_id IN $QIDS),
         |cand AS (SELECT qid, a.vec_id AS neighbor_id
         |         FROM q JOIN assign a USING (cid) WHERE a.vec_id != qid),
         |adc AS (
         |  SELECT cand.qid, neighbor_id,
         |    SUM(CAST(round(l.d2, 6) AS DECIMAL(18,6))) AS adc_dec
         |  FROM cand
         |  JOIN code ON code.vec_id = neighbor_id
         |  JOIN lut l ON l.qid = cand.qid AND l.s = code.s AND l.c = code.c
         |  GROUP BY cand.qid, neighbor_id),
         |short AS (
         |  SELECT qid, neighbor_id FROM (
         |    SELECT qid, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dec, neighbor_id)
         |        AS srnk
         |    FROM adc) WHERE srnk <= 8),
         |rer AS (
         |  SELECT sh.qid, sh.neighbor_id,
         |    list_dot_product(qb.e, nb.e) / sqrt(qb.nsq * nb.nsq) AS cos
         |  FROM short sh
         |  JOIN base qb ON qb.vec_id = sh.qid
         |  JOIN base nb ON nb.vec_id = sh.neighbor_id),
         |ranked2 AS (
         |  SELECT qid, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id)
         |      AS BIGINT) AS rnk
         |  FROM rer)
         |SELECT qid, rnk, neighbor_id, round(cos, 6) AS cos
         |FROM ranked2 WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin)),

    // q111: ANN quality scoreboard — recall@3 of IVF, PQ-ADC and the
    // two-stage rerank against brute-force truth. The oracle composes
    // the q40/q48/q74/q102 chains in one WITH (renamed where needed).
    QueryDef("q111_ann_scoreboard", (s, d) => annScoreboard(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |q0 AS (SELECT vec_id AS qid, e AS qe, nsq AS qn FROM base WHERE vec_id IN $QIDS),
         |bscored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    list_dot_product(qe, e) / sqrt(qn * nsq) AS cos
         |  FROM q0 CROSS JOIN base WHERE vec_id != qid),
         |bt AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM bscored) WHERE rnk <= 3),
         |$KCENT,
         |ascored AS (
         |  SELECT vec_id, cid, list_dot_product(e, ce) / sqrt(nsq * cn) AS cos
         |  FROM base CROSS JOIN cent),
         |probes AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |  FROM ascored WHERE vec_id IN $QIDS) WHERE rnk <= 2),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |    FROM ascored) WHERE rnk = 1),
         |ext AS (SELECT base.vec_id, e, nsq, cid FROM base JOIN assign USING (vec_id)),
         |qi AS (SELECT p.vec_id AS qid, e AS qe, nsq AS qn, p.cid
         |       FROM probes p JOIN base ON base.vec_id = p.vec_id),
         |iscored AS (
         |  SELECT qid, c.vec_id AS neighbor_id,
         |    list_dot_product(qe, c.e) / sqrt(qn * c.nsq) AS cos
         |  FROM qi JOIN ext c USING (cid) WHERE c.vec_id != qid),
         |it AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM iscored) WHERE rnk <= 3),
         |sub AS (SELECT vec_id, s, list_slice(e, s*16+1, s*16+16) AS v
         |        FROM base, UNNEST(generate_series(0, 3)) AS u(s)),
         |centS AS (SELECT vec_id AS c, s, v AS cv FROM sub WHERE vec_id < 8),
         |d AS (SELECT sub.vec_id, sub.s, c,
         |        list_dot_product(cv, cv) + list_dot_product(v, v)
         |          - 2 * list_dot_product(v, cv) AS d2
         |      FROM sub JOIN centS ON sub.s = centS.s),
         |code AS (SELECT vec_id, s, c FROM (
         |  SELECT vec_id, s, c,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rk
         |  FROM d) WHERE rk = 1),
         |qp AS (SELECT vec_id AS qid, cid FROM probes),
         |lut AS (SELECT vec_id AS qid, s, c, d2 FROM d WHERE vec_id IN $QIDS),
         |cand AS (SELECT qid, a.vec_id AS neighbor_id
         |         FROM qp JOIN assign a USING (cid) WHERE a.vec_id != qid),
         |adc AS (
         |  SELECT cand.qid, neighbor_id,
         |    SUM(CAST(round(l.d2, 6) AS DECIMAL(18,6))) AS adc_dec
         |  FROM cand
         |  JOIN code ON code.vec_id = neighbor_id
         |  JOIN lut l ON l.qid = cand.qid AND l.s = code.s AND l.c = code.c
         |  GROUP BY cand.qid, neighbor_id),
         |pt AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dec, neighbor_id) AS rnk
         |  FROM adc) WHERE rnk <= 3),
         |short AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dec, neighbor_id) AS srnk
         |  FROM adc) WHERE srnk <= 8),
         |rer AS (
         |  SELECT sh.qid, sh.neighbor_id,
         |    list_dot_product(qb.e, nb.e) / sqrt(qb.nsq * nb.nsq) AS cos
         |  FROM short sh
         |  JOIN base qb ON qb.vec_id = sh.qid
         |  JOIN base nb ON nb.vec_id = sh.neighbor_id),
         |rt AS (SELECT qid, neighbor_id FROM (
         |  SELECT qid, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM rer) WHERE rnk <= 3),
         |tot AS (SELECT COUNT(*) AS n_truth FROM bt)
         |SELECT method, n_truth, n_hits,
         |  (n_hits * 1000000) // n_truth AS recall_micro
         |FROM (
         |  SELECT 'ivf' AS method, tot.n_truth,
         |    (SELECT COUNT(*) FROM bt JOIN it USING (qid, neighbor_id)) AS n_hits
         |  FROM tot
         |  UNION ALL SELECT 'pq_adc', tot.n_truth,
         |    (SELECT COUNT(*) FROM bt JOIN pt USING (qid, neighbor_id)) FROM tot
         |  UNION ALL SELECT 'pq_rerank', tot.n_truth,
         |    (SELECT COUNT(*) FROM bt JOIN rt USING (qid, neighbor_id)) FROM tot)
         |ORDER BY method""".stripMargin)),

    // q75: k-means training (Lloyd) — assignment/update/assignment in
    // exact integer micro-space: floor(x*1e6) components, integer argmin
    // distances, exact integer centroid means (OFF-shifted division so
    // floor- and truncating-division agree), integer inertia.
    QueryDef("q75_kmeans_train", (s, d) => kmeansTrain(s, d), Some(
      s"""WITH $KM_A2_CTES,
         |stats AS (SELECT cid, COUNT(*) AS n_vecs,
         |            CAST(SUM(d2 // 1000000) AS BIGINT) AS inertia_mu
         |          FROM a2 GROUP BY cid),
         |l1 AS (SELECT cid, CAST(SUM(abs(cv)) AS BIGINT) AS cent_l1_mu
         |       FROM c1 GROUP BY cid)
         |SELECT cid, n_vecs, inertia_mu, cent_l1_mu
         |FROM stats JOIN l1 USING (cid) ORDER BY cid""".stripMargin)),

    // q120: per-cell coreset — count, centermost representative, radius
    // and mean spread per trained k-means cell, all exact integer math
    // over the shared a2 = (vec_id, cid, d2) chain.
    QueryDef("q120_ivf_coreset", (s, d) => ivfCoreset(s, d), Some(
      s"""WITH $KM_A2_CTES,
         |rep AS (SELECT cid, vec_id, d2 FROM (
         |  SELECT cid, vec_id, d2,
         |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS rk
         |  FROM a2) WHERE rk = 1),
         |stats AS (SELECT cid, COUNT(*) AS n_vecs,
         |            CAST(MAX(d2) AS BIGINT) AS radius_d2,
         |            CAST(SUM(d2 // 1000000) AS BIGINT) AS spread_mu
         |          FROM a2 GROUP BY cid)
         |SELECT stats.cid, n_vecs, rep.vec_id AS rep_id,
         |  CAST(rep.d2 AS BIGINT) AS rep_d2, radius_d2,
         |  spread_mu // n_vecs AS avg_d2_mu
         |FROM stats JOIN rep ON rep.cid = stats.cid
         |ORDER BY stats.cid""".stripMargin)),

    QueryDef("q44_ivf_assign", (s, d) => ivfAssign(s, d), Some(
      s"""WITH base AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e, $NSQ AS nsq FROM embeddings),
         |$KCENT,
         |scored AS (
         |  SELECT vec_id, cid, list_dot_product(e, ce) / sqrt(nsq * cn) AS cos
         |  FROM base CROSS JOIN cent),
         |best AS (
         |  SELECT vec_id, cid, cos,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |  FROM scored)
         |SELECT cid, COUNT(*) AS n_vecs,
         |  round(CAST(SUM(CAST(round(cos, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_cos
         |FROM best WHERE rnk = 1 GROUP BY cid ORDER BY cid""".stripMargin)),

    // q81: int8 scalar quantization (SQ8) reconstruction-error audit —
    // exact integer micro-space, so both engines agree bit-for-bit.
    QueryDef("q81_sq8_error", (s, d) => sq8Error(s, d), Some(
      """WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000000) AS BIGINT)) AS v
        |  FROM embeddings),
        |m AS (SELECT label, v, list_min(v) AS vmin,
        |        list_max(v) - list_min(v) AS rng FROM v),
        |e AS (
        |  SELECT label,
        |    list_transform(v, x -> abs(x - (vmin +
        |      (CASE WHEN rng = 0 THEN 0
        |            ELSE ((x - vmin) * 255) // rng END * rng) // 255))) AS errs
        |  FROM m)
        |SELECT label, COUNT(*) AS n,
        |  CAST(MAX(list_max(errs)) AS BIGINT) AS max_err_micro,
        |  CAST(SUM(list_sum(errs)) AS BIGINT) // CAST(SUM(len(errs)) AS BIGINT)
        |    AS avg_err_micro
        |FROM e GROUP BY label ORDER BY label""".stripMargin)),

    // q96: per-dimension embedding health stats in exact shifted
    // micro-int space (floor(x*1e6)+1e6 keeps every operand of `div`
    // non-negative, where floor = truncate on both engines).
    QueryDef("q96_dim_stats", (s, d) => dimStats(s, d), Some(
      """WITH ex AS (
        |  SELECT unnest(list_transform(CAST(embedding AS DOUBLE[]),
        |           x -> CAST(floor(x * 1000000) AS BIGINT) + 1000000)) AS xs,
        |         unnest(generate_series(1, len(embedding))) AS dim
        |  FROM embeddings)
        |SELECT dim, COUNT(*) AS n_vecs,
        |  CAST(SUM(xs) AS BIGINT) // COUNT(*) - 1000000 AS mean_micro,
        |  CAST(SUM(xs * xs) AS BIGINT) // COUNT(*)
        |    - (CAST(SUM(xs) AS BIGINT) // COUNT(*))
        |      * (CAST(SUM(xs) AS BIGINT) // COUNT(*)) AS var_micro2,
        |  MIN(xs) - 1000000 AS min_micro,
        |  MAX(xs) - 1000000 AS max_micro
        |FROM ex GROUP BY dim ORDER BY dim""".stripMargin)),

    // q97: nearest-centroid label probe — confusion counts from exact
    // integer L2 in the same shifted micro space (shift cancels in
    // distances; centroid = floor-mean per (label, dim)).
    QueryDef("q97_centroid_probe", (s, d) => centroidProbe(s, d), Some(
      """WITH xm AS (
        |  SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000000) AS BIGINT) + 1000000) AS xs
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, label, unnest(xs) AS x,
        |         unnest(generate_series(1, len(xs))) AS pos
        |  FROM xm),
        |cent AS (
        |  SELECT label AS clab, pos, CAST(SUM(x) AS BIGINT) // COUNT(*) AS c
        |  FROM ex GROUP BY label, pos),
        |d AS (
        |  SELECT e.vec_id, e.label, c.clab,
        |    CAST(SUM((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS d2
        |  FROM ex e JOIN cent c USING (pos) GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT vec_id, label, clab,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clab) AS rn
        |  FROM d)
        |SELECT label, clab AS pred_label, COUNT(*) AS n
        |FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
