package graft

import graft.operators.{Curation, EventWindows}

/** Curation-extension inventory (q54–q59): permutation dedup, asymmetric
  * containment, BPE merge mining, interval-join attribution, temperature
  * sampling, chunk accounting. Oracle SQL mirrors the Spark plans
  * mechanically under the shared exactness rules (hash60, BIGINT sums,
  * non-negative integer division).
  */
object CurationQueries {

  /** DuckDB spelling of operators.Text.hash60. */
  private def h60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q54_bow_dedup", (s, d) => Curation.bowDedup(s, d), Some(
      """SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_unique_texts,
        |  COUNT(DISTINCT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')))
        |    AS n_unique_bags,
        |  COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')))
        |    AS n_unique_sets,
        |  COUNT(DISTINCT md5(text))
        |    - COUNT(DISTINCT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')))
        |    AS n_shuffled_dups
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef("q55_containment", (s, d) => Curation.containmentPairs(s, d), Some(
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w)-2),
        |    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, n_common,
        |  round(n_common / s1.n_sh, 6) AS c1,
        |  round(n_common / s2.n_sh, 6) AS c2
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE greatest(round(n_common / s1.n_sh, 6), round(n_common / s2.n_sh, 6)) >= 0.8
        |ORDER BY d1, d2""".stripMargin)),

    // q153: the SAMPLED containment audit — q55's 100 TB spelling,
    // oracle-checked at an EXPLICIT 1/8 fingerprint-stratified sample
    // (the q150/q151 discipline) so the path a production corpus
    // actually runs — where the full intersection's co-occurrence mass
    // filled the disk at 500k docs — has its own exact DuckDB twin at
    // every driver SF.
    QueryDef("q153_containment_sampled",
      (s, d) => Curation.containmentPairs(s, d, sampleMod = 8), Some(
      """WITH sh_all AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w)-2),
        |    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3),
        |fpt AS (SELECT doc_id,
        |          MIN(CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)) AS fp
        |        FROM sh_all GROUP BY doc_id),
        |ids AS (SELECT doc_id FROM fpt WHERE fp % 8 = 0),
        |sh AS (SELECT * FROM sh_all JOIN ids USING (doc_id)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, n_common,
        |  round(n_common / s1.n_sh, 6) AS c1,
        |  round(n_common / s2.n_sh, 6) AS c2
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE greatest(round(n_common / s1.n_sh, 6), round(n_common / s2.n_sh, 6)) >= 0.8
        |ORDER BY d1, d2""".stripMargin)),

    QueryDef("q56_word_bigrams", (s, d) => Curation.wordBigrams(s, d), Some(
      """SELECT pair, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w)-1),
        |    i -> concat_ws(' ', w[i], w[i+1]))) AS pair
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 2)
        |GROUP BY pair
        |ORDER BY n_occ DESC, pair LIMIT 32""".stripMargin)),

    QueryDef("q57_click_attribution", (s, d) => EventWindows.clickAttribution(s, d), Some(
      """SELECT p.user_id, p.event_id,
        |  epoch_ms(p.ts) AS purchase_ms,
        |  COUNT(c.ts) AS n_clicks,
        |  COALESCE(epoch_ms(MAX(c.ts)), -1) AS last_click_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |    AND c.ts > p.ts - INTERVAL 10 MINUTE
        |GROUP BY p.user_id, p.event_id, epoch_ms(p.ts)
        |ORDER BY p.user_id, purchase_ms, p.event_id""".stripMargin)),

    QueryDef("q58_temp_sample", (s, d) => Curation.tempSample(s, d), Some(
      s"""WITH per_src AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(round(sqrt(COUNT(*)) * 1e6) AS BIGINT) AS w_micro
         |  FROM documents GROUP BY source),
         |tot AS (
         |  SELECT CAST(SUM(w_micro) AS BIGINT) AS total_w,
         |    CAST(SUM(n_docs) AS BIGINT) AS n_total
         |  FROM per_src),
         |rates AS (
         |  SELECT source, n_docs,
         |    CAST(least(CAST(1000000 AS HUGEINT),
         |      (CAST(w_micro AS HUGEINT) * n_total * 1000000)
         |        // (CAST(total_w AS HUGEINT) * n_docs)) AS BIGINT)
         |      AS accept_micro
         |  FROM per_src, tot)
         |SELECT d.source, COUNT(*) AS n_docs,
         |  MAX(r.accept_micro) AS accept_micro,
         |  CAST(SUM(CASE WHEN ${h60("concat('smp', d.doc_id)")} % 1000000 < r.accept_micro
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(CAST(SUM(CASE WHEN ${h60("concat('smp', d.doc_id)")} % 1000000 < r.accept_micro
         |    THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*), 6) AS kept_ratio
         |FROM documents d JOIN rates r ON d.source = r.source
         |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    QueryDef("q59_chunk_manifest", (s, d) => Curation.chunkManifest(s, d), Some(
      """WITH per_doc AS (
        |  SELECT source, n_words,
        |    CASE WHEN n_words <= 64 THEN 1
        |         ELSE (n_words - 64 + 47) // 48 + 1 END AS n_chunks
        |  FROM (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |        FROM documents))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS total_words,
        |  CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
        |  CAST(SUM((n_chunks - 1) * 16) AS BIGINT) AS total_dup_tokens,
        |  round(CAST(SUM(n_chunks) AS BIGINT) / COUNT(*), 6) AS avg_chunks,
        |  round(CAST(SUM((n_chunks - 1) * 16) AS BIGINT) / CAST(SUM(n_words) AS BIGINT), 6)
        |    AS dup_ratio
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin)),

    // q115: shuffle-key skew report — cardinality, heaviest-key share
    // and top-10 share for the hot join/aggregation key families.
    QueryDef("q115_skew_report", (s, d) => Curation.skewReport(s, d), Some {
      def block(name: String, cte: String): String =
        s"""SELECT '$name' AS relation, COUNT(*) AS n_keys,
           |  CAST(SUM(c) AS BIGINT) AS n_rows,
           |  (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT)
           |    AS max_share_micro,
           |  (CAST((SELECT SUM(c) FROM
           |     (SELECT c FROM $cte ORDER BY c DESC, k LIMIT 10)) AS BIGINT)
           |    * 1000000) // CAST(SUM(c) AS BIGINT) AS top10_share_micro
           |FROM $cte""".stripMargin
      s"""WITH ${TextQueries.SHINGLES},
         |c1 AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS c
         |       FROM events GROUP BY 1),
         |c2 AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, COUNT(*) AS c
         |       FROM lineitem GROUP BY 1),
         |c3 AS (SELECT CAST(o_custkey AS VARCHAR) AS k, COUNT(*) AS c
         |       FROM orders GROUP BY 1),
         |c4 AS (SELECT sh AS k, COUNT(*) AS c FROM sh GROUP BY 1)
         |SELECT * FROM (
         |${block("events.user_id", "c1")}
         |UNION ALL
         |${block("lineitem.l_suppkey", "c2")}
         |UNION ALL
         |${block("orders.o_custkey", "c3")}
         |UNION ALL
         |${block("shingles.sh", "c4")})
         |ORDER BY relation""".stripMargin
    }),

    // q104: cross-modal retention — text-LSH canonicality × embedding-LSH
    // canonicality × q39 quality, for docs carrying an embedding. The
    // oracle runs BOTH recursive CC walks in one WITH (the embed chain's
    // CTE names are prefixed to avoid collisions).
    QueryDef("q104_crossmodal", (s, d) => Curation.crossmodalRetention(s, d), Some(
      s"""WITH RECURSIVE ${TextQueries.CLUSTER_CTES},
         |tlab AS (SELECT doc, MIN(lab) AS lab FROM r GROUP BY doc),
         |${VectorQueries.EMBED_CLUSTER_CTES("e")},
         |vlab AS (SELECT node, MIN(lab) AS lab FROM er GROUP BY node),
         |m AS (
         |  SELECT d.doc_id, d.lang,
         |    (len(w) >= 15 AND len(w) <= 90 AND
         |     round(len(list_filter(w, x -> x IN ('the', 'a'))) / len(w), 6)
         |       <= 0.12) AS qual_keep
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
         |        FROM documents) d
         |  JOIN embeddings emb ON emb.vec_id = d.doc_id),
         |j AS (
         |  SELECT m.lang, m.qual_keep,
         |    COALESCE(tlab.doc = tlab.lab, TRUE) AS text_keep,
         |    COALESCE(vlab.node = vlab.lab, TRUE) AS sem_keep
         |  FROM m
         |  LEFT JOIN tlab ON tlab.doc = m.doc_id
         |  LEFT JOIN vlab ON vlab.node = m.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN text_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_text_kept,
         |  CAST(SUM(CASE WHEN sem_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sem_kept,
         |  CAST(SUM(CASE WHEN qual_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_qual_kept,
         |  CAST(SUM(CASE WHEN text_keep AND sem_keep AND qual_keep
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef("q100_bigram_lm", (s, d) => Curation.bigramLogprob(s, d), Some(
      """WITH pr AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w)-1), i -> concat_ws(' ', w[i], w[i+1]))) AS pair
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 2),
        |uni AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c1 AS (SELECT term, COUNT(*) AS c1 FROM uni GROUP BY term),
        |v AS (SELECT COUNT(DISTINCT term) AS v FROM uni),
        |scores AS (
        |  SELECT pair,
        |    CAST(round(-ln((c12 + 1) / (c1.c1 + v.v)) * 1e6) AS BIGINT) AS surprisal_micro
        |  FROM (SELECT pair, COUNT(*) AS c12 FROM pr GROUP BY pair) bg
        |  JOIN c1 ON c1.term = string_split(bg.pair, ' ')[1]
        |  CROSS JOIN v),
        |dp AS (SELECT doc_id, pair, COUNT(*) AS n FROM pr GROUP BY doc_id, pair)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_pairs,
        |  CAST(SUM(n * surprisal_micro) AS BIGINT) AS sum_surprisal_micro,
        |  CAST(SUM(n * surprisal_micro) AS BIGINT) // CAST(SUM(n) AS BIGINT)
        |    AS avg_surprisal_micro
        |FROM dp JOIN scores USING (pair)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef("q101_dataset_card", (s, d) => Curation.datasetCard(s, d), Some(
      s"""WITH ${TextQueries.PAIR_CTES},
         |base AS (
         |  SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    COUNT(DISTINCT lang) AS n_langs,
         |    COUNT(DISTINCT source) AS n_sources,
         |    COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dup_docs
         |  FROM documents),
         |vocab AS (
         |  SELECT COUNT(DISTINCT term) AS n_vocab
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)),
         |ps AS (SELECT COUNT(*) AS n_neardup_pairs FROM pairs),
         |pd AS (
         |  SELECT COUNT(DISTINCT d) AS n_neardup_docs
         |  FROM (SELECT d1 AS d FROM pairs UNION ALL SELECT d2 FROM pairs))
         |SELECT * FROM base, vocab, ps, pd""".stripMargin))
  )
}
