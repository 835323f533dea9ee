package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verify-gate entries for the training-data ops: (name, spark plan,
  * DuckDB oracle SQL). Every op's full computation — hashes, signatures,
  * thresholds, tie-breaks — is replayed independently in SQL; both sides
  * are deterministic md5-derived arithmetic, so the compare is exact
  * (doubles rounded to 4 decimals with matched operand order). */
object TrainEntries {

  /** DuckDB twin of TrainOps.h60. */
  private def h60(x: String): String =
    s"CAST(('0x'||substr(md5($x),1,15)) AS BIGINT)"

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private val Dim = 64

  /** Left-to-right double dot product / norms, operand order identical to
    * TrainOps.cosToQuery (element_at products summed in index order). */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
  private def norm2Sql(a: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($a[$i] AS DOUBLE)")
      .mkString(" + ")
  /** Zero-norm convention mirror (TrainOps cosine sites): cos with a
    * zero vector is -1.0, never NaN — NaN orders differently across
    * JVM / Spark SQL / DuckDB. DuckDB division by zero yields NULL, so
    * coalesce(-1.0) implements the convention without duplicating the
    * unrolled norm expressions. */
  private def cosSql(a: String, b: String): String =
    s"coalesce((${dotSql(a, b)}) / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)})), -1.0)"

  /** Unrolled Lloyd-iteration mirror of [[TrainOps.annIvfKmeans]]: the
    * hash-sample init, per-iteration argmax assignment (ties → lower
    * cell) and vec_id-ordered elementwise means (list fold — the same
    * left-to-right double addition the Scala trainer does), then the
    * full-corpus assignment + probe + exact rescore. */
  private def ivfKmeansSql: String = {
    val C = TrainOps.IvfCells
    val S = TrainOps.IvfTrainSample
    def asgCte(name: String, cents: String): String =
      s"""$name AS (SELECT vec_id, cell FROM
         |  (SELECT s.vec_id, c.cell,
         |     row_number() OVER (PARTITION BY s.vec_id ORDER BY
         |       ${cosSql("s.embedding", "c.cvec")} DESC, c.cell) AS rn
         |   FROM samp s CROSS JOIN $cents c) z WHERE rn = 1)""".stripMargin
    def stepCtes(i: Int): String =
      s"""${asgCte(s"asg$i", s"cents${i - 1}")},
         |m$i AS (SELECT a.cell, sv.dim,
         |          list_aggregate(list(sv.v ORDER BY sv.vec_id), 'sum')
         |            / count(*) AS mv
         |        FROM sampv sv JOIN asg$i a USING (vec_id)
         |        GROUP BY a.cell, sv.dim),
         |cents$i AS (SELECT c.cell, coalesce(m.cvec, c.cvec) AS cvec
         |            FROM cents${i - 1} c LEFT JOIN
         |              (SELECT cell, list(mv ORDER BY dim) AS cvec
         |               FROM m$i GROUP BY cell) m USING (cell))""".stripMargin
    val steps = (1 to TrainOps.IvfKmeansIters).map(stepCtes).mkString(",\n")
    val last = s"cents${TrainOps.IvfKmeansIters}"
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |ranked AS (SELECT vec_id, embedding, row_number() OVER (ORDER BY
       |             ${h60("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn
       |           FROM embeddings),
       |samp AS (SELECT vec_id, embedding FROM ranked WHERE rn <= $S),
       |cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
       |           FROM ranked WHERE rn <= $C),
       |sampv AS (SELECT vec_id, dim, CAST(embedding[dim] AS DOUBLE) AS v FROM
       |            (SELECT vec_id, embedding,
       |               generate_subscripts(embedding, 1) AS dim FROM samp) z),
       |$steps,
       |asgf AS (SELECT vec_id, cell FROM
       |  (SELECT e.vec_id, c.cell,
       |     row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |       ${cosSql("e.embedding", "c.cvec")} DESC, c.cell) AS rn
       |   FROM embeddings e CROSS JOIN $last c) z WHERE rn = 1),
       |qcos AS (SELECT c.cell, ${cosSql("q.qv", "c.cvec")} AS cos
       |         FROM $last c CROSS JOIN q),
       |probed AS (SELECT cell FROM
       |             (SELECT cell, row_number() OVER
       |                (ORDER BY cos DESC, cell) AS rn FROM qcos) zz
       |           WHERE rn <= ${TrainOps.IvfProbes}),
       |hits AS (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos
       |         FROM embeddings e
       |              JOIN asgf ON asgf.vec_id = e.vec_id
       |              JOIN probed p ON p.cell = asgf.cell
       |              CROSS JOIN q
       |         WHERE e.vec_id != 0)
       |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id, round(cos, 4) AS cos
       |FROM hits ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  private val shingleCte =
    s"""tokt AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS s
       |       FROM (SELECT doc_id, tk, unnest(generate_series(0, len(tk)-3)) AS i
       |             FROM tokt WHERE len(tk) >= 3) z)""".stripMargin

  /** The df-capped candidate + exact-intersection CTEs shared by the
    * dd_ngram and dd_topk_overlap oracles (mirrors
    * TrainOps.pairOverlaps: candidates from below-cap shingles, counts
    * over ALL shared shingles). */
  private val pairOverlapCte =
    s"""kept AS (SELECT sh.* FROM sh
       |         JOIN (SELECT s FROM sh GROUP BY s
       |               HAVING count(*) <= ${TrainOps.ShingleDfCap}) ok
       |           USING (s)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM kept x JOIN kept y ON x.s = y.s
       |              AND x.doc_id < y.doc_id),
       |inter AS (SELECT cand.a, cand.b, count(*) AS i
       |          FROM cand JOIN sh sa ON sa.doc_id = cand.a
       |               JOIN sh sb ON sb.doc_id = cand.b AND sa.s = sb.s
       |          GROUP BY cand.a, cand.b)""".stripMargin

  private val minhashCte =
    s"""$shingleCte,
       |mh AS (SELECT doc_id, j,
       |         min(${h60("CAST(j AS VARCHAR) || ':' || s")}) AS minh
       |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0,${TrainOps.MinHashFns - 1})) AS j) js
       |       GROUP BY doc_id, j)""".stripMargin

  private val simhashCte =
    s"""tokd AS (SELECT DISTINCT doc_id, unnest($tokSql) AS t FROM documents),
       |bits AS (SELECT doc_id, k,
       |           sum(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |         FROM (SELECT doc_id, ${h60("t")} AS h FROM tokd) z
       |              CROSS JOIN (SELECT unnest(generate_series(0,59)) AS k) ks
       |         GROUP BY doc_id, k),
       |simh AS (SELECT doc_id,
       |           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS simhash
       |         FROM bits GROUP BY doc_id)""".stripMargin

  /** The full MinHash-LSH pair pipeline up to intersection counts —
    * shared by dd_minhash (jaccard output) and dd_clusters (transitive
    * closure input) so the two gates replay ONE pair definition. */
  private val minhashPairsCte =
    s"""$minhashCte,
       |bk AS (SELECT doc_id, j // ${TrainOps.BandRows} AS band,
       |         ${h60("array_to_string(list_sort(list(CAST(j AS VARCHAR) || '=' || CAST(minh AS VARCHAR))), ',')")} AS bkey
       |       FROM mh GROUP BY doc_id, j // ${TrainOps.BandRows}),
       |bkok AS (SELECT bk.* FROM bk
       |         JOIN (SELECT band, bkey FROM bk GROUP BY band, bkey
       |               HAVING count(*) <= ${TrainOps.LshBucketCap}) ok
       |           USING (band, bkey)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bkok x JOIN bkok y ON x.band = y.band AND x.bkey = y.bkey
       |              AND x.doc_id < y.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (SELECT cand.a, cand.b, count(*) AS i
       |          FROM cand JOIN sh sa ON sa.doc_id = cand.a
       |               JOIN sh sb ON sb.doc_id = cand.b AND sa.s = sb.s
       |          GROUP BY cand.a, cand.b)""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // ---- deduplication ----
    ("dd_exact",
      (s, d) => TrainOps.dedupExact(s, d),
      s"""WITH t AS (SELECT doc_id,
         |  ${h60(s"array_to_string(($tokSql)[1:8], ' ')")} AS key
         |  FROM documents)
         |SELECT key, min(doc_id) AS canonical_id,
         |       CAST(count(*) AS BIGINT) AS group_size
         |FROM t GROUP BY key HAVING count(*) > 1
         |ORDER BY canonical_id""".stripMargin),

    ("dd_minhash",
      (s, d) => TrainOps.dedupMinhashLsh(s, d),
      s"""WITH $minhashPairsCte
         |SELECT a, b, round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) AS jac
         |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
         |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5
         |ORDER BY a, b""".stripMargin),

    // ---- near-dup clusters: transitive closure over the verified pairs ----
    ("dd_clusters",
      (s, d) => TrainOps.dedupClusters(s, d),
      s"""WITH RECURSIVE $minhashPairsCte,
         |pairs AS (SELECT a, b
         |          FROM inter JOIN cnt ca ON ca.doc_id = a
         |               JOIN cnt cb ON cb.doc_id = b
         |          WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5),
         |und AS (SELECT a AS x, b AS y FROM pairs
         |        UNION ALL SELECT b, a FROM pairs),
         |reach AS (SELECT x, x AS y FROM (SELECT DISTINCT x FROM und) n
         |          UNION
         |          SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x),
         |lbl AS (SELECT x AS doc_id, min(y) AS canonical_id
         |        FROM reach GROUP BY x),
         |sz AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
         |       FROM lbl GROUP BY canonical_id)
         |SELECT l.doc_id, l.canonical_id, sz.cluster_size
         |FROM lbl l JOIN sz USING (canonical_id)
         |ORDER BY l.canonical_id, l.doc_id""".stripMargin),

    ("dd_ngram",
      (s, d) => TrainOps.dedupNgramJaccard(s, d),
      s"""WITH $shingleCte,
         |$pairOverlapCte,
         |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id)
         |SELECT a, b, round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) AS jac
         |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
         |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5
         |ORDER BY a, b""".stripMargin),

    // top-k overlap join: same candidate rule + exact counts, ordered by
    // shared-shingle count (integer — no float-hash concerns) with the
    // deterministic (overlap desc, a, b) tie-break
    ("dd_topk_overlap",
      (s, d) => TrainOps.topkOverlap(s, d),
      s"""WITH $shingleCte,
         |$pairOverlapCte
         |SELECT a, b, i AS overlap FROM inter
         |ORDER BY overlap DESC, a, b LIMIT 10""".stripMargin),

    // adaptive prefix-growing top-k: the engine side early-terminates
    // with a certificate; the oracle brute-forces the SAME exact
    // (uncapped) answer — the strongest check an adaptive algorithm can
    // get, since any recall loss from the prefix filter would surface
    ("dd_topk_adaptive",
      (s, d) => TrainOps.topkOverlapAdaptive(s, d),
      s"""WITH $shingleCte,
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM sh x JOIN sh y
         |            ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, i AS overlap FROM inter
         |ORDER BY overlap DESC, a, b LIMIT 10""".stripMargin),

    ("dd_embed",
      (s, d) => TrainOps.dedupEmbedCosine(s, d),
      s"""WITH $shingleCte,
         |th AS (SELECT doc_id, ${h60("s")} AS h FROM sh),
         |emb AS (SELECT doc_id, CAST(h % ${TrainOps.EmbedDim} AS INTEGER) AS dim,
         |          CAST(sum(CASE WHEN (h >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
         |        FROM th GROUP BY doc_id, h % ${TrainOps.EmbedDim}),
         |nrm AS (SELECT doc_id, sum(v*v) AS n2 FROM emb GROUP BY doc_id
         |        HAVING sum(v*v) > 0),
         |planes AS (SELECT p, dim,
         |             CASE WHEN ${h60("'w:'||CAST(p AS VARCHAR)||':'||CAST(dim AS VARCHAR)")} & 1 = 1
         |                  THEN 1 ELSE -1 END AS w
         |           FROM (SELECT unnest(generate_series(0,${TrainOps.SrpPlanes - 1})) AS p) ps
         |                CROSS JOIN (SELECT unnest(generate_series(0,${TrainOps.EmbedDim - 1})) AS dim) ds),
         |bits AS (SELECT e.doc_id, pl.p,
         |           CASE WHEN sum(e.v * pl.w) > 0 THEN 1 ELSE 0 END AS b
         |         FROM emb e JOIN nrm USING (doc_id)
         |              JOIN planes pl USING (dim)
         |         GROUP BY e.doc_id, pl.p),
         |bands0 AS (SELECT doc_id, p // ${TrainOps.SrpBandBits} AS band,
         |            sum(b * (CAST(1 AS BIGINT) << CAST(p % ${TrainOps.SrpBandBits} AS INTEGER))) AS bkey
         |          FROM bits GROUP BY doc_id, p // ${TrainOps.SrpBandBits}),
         |bands AS (SELECT bands0.* FROM bands0
         |          JOIN (SELECT band, bkey FROM bands0 GROUP BY band, bkey
         |                HAVING count(*) <= ${TrainOps.SrpBucketCap}) ok
         |            USING (band, bkey)),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM bands x JOIN bands y ON x.band = y.band
         |              AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |dots AS (SELECT a, b, sum(ea.v * eb.v) AS dot
         |         FROM cand JOIN emb ea ON ea.doc_id = a
         |              JOIN emb eb ON eb.doc_id = b AND ea.dim = eb.dim
         |         GROUP BY a, b)
         |SELECT a, b,
         |  round(coalesce(dot / (sqrt(na.n2) * sqrt(nb.n2)), -1.0), 4) AS cos
         |FROM dots JOIN nrm na ON na.doc_id = a JOIN nrm nb ON nb.doc_id = b
         |WHERE coalesce(dot / (sqrt(na.n2) * sqrt(nb.n2)), -1.0) >= ${TrainOps.EmbedCosThreshold}
         |ORDER BY a, b""".stripMargin),

    ("dd_simhash",
      (s, d) => TrainOps.simhash(s, d),
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM simh ORDER BY doc_id""".stripMargin),

    ("dd_simhash_pairs",
      (s, d) => TrainOps.dedupSimhash(s, d),
      s"""WITH $simhashCte,
         |reps AS (SELECT simhash, min(doc_id) AS doc_id
         |         FROM simh GROUP BY simhash),
         |ch AS (SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS chunk
         |       FROM reps CROSS JOIN (SELECT unnest(generate_series(0,3)) AS c) cs),
         |keep AS (SELECT c, chunk FROM ch GROUP BY c, chunk
         |         HAVING count(*) <= ${TrainOps.SimhashChunkCap}),
         |chk AS (SELECT ch.* FROM ch JOIN keep USING (c, chunk)),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |                x.simhash AS sa, y.simhash AS sb
         |         FROM chk x JOIN chk y ON x.c = y.c AND x.chunk = y.chunk
         |              AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY a, b""".stripMargin),

    // nearest-centroid label-consistency (mislabel detector): centroids
    // from EXACT 1e6-quantized integer sums (fold-order-free), cosine
    // re-assignment, (label, pred) confusion matrix
    ("tx_label_confusion",
      (s, d) => TrainOps.labelConfusion(s, d),
      s"""WITH expl AS (
         |  SELECT label, dim,
         |         CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT label, unnest(embedding) AS x,
         |               generate_subscripts(embedding, 1) AS dim
         |        FROM embeddings) z),
         |cent AS (
         |  SELECT label AS clabel,
         |         list(CAST(s AS DOUBLE) / (n * 1000000.0) ORDER BY dim) AS cvec
         |  FROM (SELECT label, dim, sum(q) AS s, count(*) AS n
         |        FROM expl GROUP BY label, dim) g
         |  GROUP BY label),
         |scored AS (
         |  SELECT e.vec_id, e.label, c.clabel,
         |         ${cosSql("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cent c),
         |pred AS (
         |  SELECT vec_id, label, clabel AS pred FROM
         |    (SELECT *, row_number() OVER (PARTITION BY vec_id
         |       ORDER BY cos DESC, clabel) AS rn FROM scored) zz
         |  WHERE rn = 1)
         |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
         |FROM pred GROUP BY label, pred ORDER BY label, pred""".stripMargin),

    // schema-on-read JSON extraction (events.props) with exact-integer
    // roll-ups per event type
    ("tx_json",
      (s, d) => TrainOps.jsonStats(s, d),
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(k) AS BIGINT) AS k_min,
        |       CAST(max(k) AS BIGINT) AS k_max,
        |       CAST(sum(k) AS BIGINT) AS k_sum
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) z
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // event-time gap sessionization over the (otherwise untouched)
    // events table — exact microsecond gap math + integer-cent sums,
    // so the window algebra replays bit-identically
    ("tx_sessions",
      (s, d) => TrainOps.sessionize(s, d),
      s"""WITH lagd AS (SELECT event_id, ts, user_id, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |marks AS (SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
         |    ELSE 0 END AS brk FROM lagd),
         |sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM marks)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
         |FROM sess GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin),

    // ---- similarity search ----
    // hybrid lexical+vector query-by-example fused by RRF: fusion is
    // rank arithmetic (1/(60+rank)), so no float comparison crosses
    // engines; the lexical per-doc sum folds in term order on BOTH
    // sides (the ft_fuzzy_like lesson)
    ("ann_hybrid_rrf",
      (s, d) => TrainOps.hybridRrf(s, d),
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         |              FROM documents),
         |tok AS (SELECT * FROM toks WHERE term != ''),
         |lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
         |qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |        WHERE term IN ('merge', 'sort', 'dup') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |       WHERE term IN ('merge', 'sort', 'dup') AND doc_id != 0
         |       GROUP BY doc_id, term),
         |contrib AS (SELECT t.doc_id, t.term,
         |    ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
         |      * ((t.tf * 2.2) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS c
         |  FROM tf t JOIN qdf d USING (term) JOIN lens l USING (doc_id)
         |       CROSS JOIN stats s),
         |lex AS (SELECT doc_id, sum(c ORDER BY term) AS score
         |        FROM contrib GROUP BY doc_id),
         |lextop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
         |  FROM lex ORDER BY score DESC, doc_id LIMIT 20),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cosd AS (SELECT e.vec_id AS doc_id, ${cosSql("e.embedding", "q.qv")} AS cos
         |         FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0),
         |vectop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS vec_rank
         |  FROM cosd ORDER BY cos DESC, doc_id LIMIT 20),
         |fused AS (SELECT doc_id, coalesce(lex_rank, 0) AS lex_rank,
         |                 coalesce(vec_rank, 0) AS vec_rank
         |          FROM lextop FULL OUTER JOIN vectop USING (doc_id)),
         |rrfd AS (SELECT doc_id, lex_rank, vec_rank,
         |    (CASE WHEN lex_rank > 0 THEN 1.0 / (60.0 + lex_rank) ELSE 0.0 END)
         |  + (CASE WHEN vec_rank > 0 THEN 1.0 / (60.0 + vec_rank) ELSE 0.0 END) AS rrf
         |  FROM fused)
         |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
         |       doc_id, round(rrf, 6) AS rrf, lex_rank, vec_rank
         |FROM rrfd ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin),
    ("ann_brute",
      (s, d) => TrainOps.annBruteForce(s, d),
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |hits AS (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos
         |         FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0)
         |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
         |       vec_id, round(cos, 4) AS cos
         |FROM hits ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin),

    // Hard-negative mining: per query, top-5 by cosine BELOW the
    // near-positive band (0.3 on this diffuse synthetic space, so the
    // exclusion provably removes the closest vectors); self excluded.
    ("ann_hardneg",
      (s, d) => TrainOps.annHardNegatives(s, d, Seq(0L, 1L, 2L, 3L),
        k = 5, simHi = 0.3),
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |           FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
         |hits AS (SELECT q.qid, e.vec_id,
         |           ${cosSql("e.embedding", "q.qv")} AS cos
         |         FROM embeddings e CROSS JOIN q
         |         WHERE e.vec_id != q.qid),
         |band AS (SELECT * FROM hits WHERE cos < 0.3),
         |r AS (SELECT qid, vec_id, cos,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY cos DESC, vec_id) AS rank
         |      FROM band)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
         |       round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    ("ann_srp",
      (s, d) => TrainOps.annSrp(s, d),
      {
        // per-plane dot as a LITERAL-SIGN unrolled sum — left-to-right
        // double adds in index order, bit-identical to annSrpBands' loop
        def planeDot(p: Int, c: String): String =
          (0 until TrainOps.AnnDim).map { i =>
            s"${TrainOps.annSrpWeight(p, i)} * CAST($c[${i + 1}] AS DOUBLE)"
          }.mkString(" + ")
        def bitCols(c: String): String =
          (0 until TrainOps.AnnSrpPlanes).map(p =>
            s"CASE WHEN (${planeDot(p, c)}) > 0 THEN 1 ELSE 0 END AS b$p")
            .mkString(",\n         |  ")
        val bandKeys = (0 until
          TrainOps.AnnSrpPlanes / TrainOps.AnnSrpBandBits).map { band =>
          val terms = (0 until TrainOps.AnnSrpBandBits).map { b =>
            s"(CAST(b${band * TrainOps.AnnSrpBandBits + b} AS BIGINT) << $b)"
          }.mkString(" + ")
          s"$terms AS k$band"
        }.mkString(",\n         |  ")
        val nBands = TrainOps.AnnSrpPlanes / TrainOps.AnnSrpBandBits
        val anyBand = (0 until nBands)
          .map(b => s"v.k$b = qb.k$b").mkString(" OR ")
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           |vbits AS (SELECT vec_id,
           |  ${bitCols("embedding")}
           |  FROM embeddings),
           |vbands AS (SELECT vec_id,
           |  $bandKeys
           |  FROM vbits),
           |qb AS (SELECT * FROM vbands WHERE vec_id = 0),
           |cand AS (SELECT v.vec_id FROM vbands v, qb
           |         WHERE v.vec_id != 0 AND ($anyBand)),
           |hits AS (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos
           |         FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q)
           |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
           |       vec_id, round(cos, 4) AS cos
           |FROM hits ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
      }),

    ("ann_ivf",
      (s, d) => TrainOps.annIvf(s, d),
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cvec FROM
         |            (SELECT vec_id, embedding, row_number() OVER (ORDER BY
         |               ${h60("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn
         |             FROM embeddings) zc
         |          WHERE rn <= ${TrainOps.IvfCells}),
         |cellcos AS (SELECT e.vec_id, c.cent_id,
         |              ${cosSql("e.embedding", "c.cvec")} AS cos
         |            FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cent_id AS cell FROM
         |          (SELECT vec_id, cent_id,
         |             row_number() OVER (PARTITION BY vec_id
         |               ORDER BY cos DESC, cent_id) AS rn
         |           FROM cellcos) zz WHERE rn = 1),
         |qcos AS (SELECT c.cent_id, ${cosSql("q.qv", "c.cvec")} AS cos
         |         FROM cents c CROSS JOIN q),
         |probed AS (SELECT cent_id FROM
         |             (SELECT cent_id, row_number() OVER
         |                (ORDER BY cos DESC, cent_id) AS rn FROM qcos) zz
         |           WHERE rn <= ${TrainOps.IvfProbes}),
         |hits AS (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos
         |         FROM embeddings e
         |              JOIN asg ON asg.vec_id = e.vec_id
         |              JOIN probed p ON p.cent_id = asg.cell
         |              CROSS JOIN q
         |         WHERE e.vec_id != 0)
         |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
         |       vec_id, round(cos, 4) AS cos
         |FROM hits ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin),

    ("ann_ivf_kmeans",
      (s, d) => TrainOps.annIvfKmeans(s, d),
      ivfKmeansSql),

    // the PERSISTED IVF index (train once, cell-partitioned layout,
    // probes = partition pruning) must satisfy the SAME oracle as the
    // on-the-fly variant — vector storage must be invisible too
    ("ann_ivf_seg",
      (s, d) => AnnIndex.queryGate(s, d),
      ivfKmeansSql),

    // ---- text analysis ----
    ("tx_tokens",
      (s, d) => TrainOps.tokenCounts(s, d),
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),

    ("tx_quality",
      (s, d) => TrainOps.qualityScore(s, d),
      s"""WITH $qualityCtes
         |SELECT doc_id, quality FROM q ORDER BY doc_id""".stripMargin),

    // Rare-trigram LM filter (integerized KenLM/CCNet analog): count of
    // character-trigram instances whose corpus frequency is at or below
    // greatest(absolute floor, ppm of total instances). The oracle
    // rebuilds the same corpus model, total and rare set in SQL.
    ("tx_lm_rare",
      (s, d) => TrainOps.lmRareScore(s, d),
      s"""WITH d AS (SELECT doc_id,
         |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
         |      AS s
         |  FROM documents),
         |tri AS (SELECT doc_id, substring(s, i, 3) AS tg
         |        FROM (SELECT doc_id, s,
         |                unnest(generate_series(1, length(s) - 2)) AS i
         |              FROM d WHERE length(s) >= 3)),
         |rare AS (SELECT tg FROM tri GROUP BY tg
         |         HAVING count(*) <= greatest(${TrainOps.RareTrigramMax},
         |           (SELECT count(*) FROM tri)
         |             * ${TrainOps.RareTrigramPpm} // 1000000)),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rare
         |        FROM tri JOIN rare USING (tg) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(greatest(length(s) - 2, 0) AS BIGINT) AS n_trigrams,
         |  CAST(COALESCE(p.n_rare, 0) AS BIGINT) AS n_rare
         |FROM d LEFT JOIN per p USING (doc_id)
         |ORDER BY doc_id""".stripMargin),

    ("tx_langid",
      (s, d) => TrainOps.langId(s, d),
      s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |lh AS (
         |  SELECT doc_id, 'en' AS lang, 4 AS prio,
         |    len(list_filter(tk, x -> x IN ('the','and','of','to','is','that','for','with'))) AS hits FROM t
         |  UNION ALL SELECT doc_id, 'de', 3,
         |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) FROM t
         |  UNION ALL SELECT doc_id, 'es', 2,
         |    len(list_filter(tk, x -> x IN ('el','los','las','una','es','que','por','como'))) FROM t
         |  UNION ALL SELECT doc_id, 'fr', 1,
         |    len(list_filter(tk, x -> x IN ('le','les','des','et','est','que','pour','dans'))) FROM t),
         |best AS (SELECT doc_id, lang, hits,
         |           row_number() OVER (PARTITION BY doc_id
         |             ORDER BY hits DESC, prio DESC) AS rn FROM lh)
         |SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    // ---- language-routed token accounting ----
    ("tx_tokens_lang",
      (s, d) => TrainOps.tokensByLang(s, d),
      {
        def inList(set: Set[String]): String =
          set.toSeq.sorted.map(w => s"'${w.replace("'", "''")}'").mkString(",")
        val en = inList(graft.analysis.Analyzer.StopWords)
        val de = inList(graft.analysis.Analyzers.GermanStopWords)
        val es = inList(graft.analysis.Analyzers.SpanishStopWords)
        val fr = inList(graft.analysis.Analyzers.FrenchStopWords)
        s"""WITH t AS (SELECT doc_id, $tokSql AS tk FROM documents),
           |lh AS (
           |  SELECT doc_id, 'en' AS lang, 4 AS prio,
           |    len(list_filter(tk, x -> x IN ('the','and','of','to','is','that','for','with'))) AS hits FROM t
           |  UNION ALL SELECT doc_id, 'de', 3,
           |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) FROM t
           |  UNION ALL SELECT doc_id, 'es', 2,
           |    len(list_filter(tk, x -> x IN ('el','los','las','una','es','que','por','como'))) FROM t
           |  UNION ALL SELECT doc_id, 'fr', 1,
           |    len(list_filter(tk, x -> x IN ('le','les','des','et','est','que','pour','dans'))) FROM t),
           |best AS (SELECT doc_id, lang, hits,
           |           row_number() OVER (PARTITION BY doc_id
           |             ORDER BY hits DESC, prio DESC) AS rn FROM lh),
           |pred AS (SELECT doc_id,
           |           CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang
           |         FROM best WHERE rn = 1)
           |SELECT t.doc_id, p.pred_lang,
           |  CAST(CASE p.pred_lang
           |    WHEN 'en' THEN len(list_filter(tk, x -> NOT x IN ($en)))
           |    WHEN 'de' THEN len(list_filter(tk, x -> NOT x IN ($de)))
           |    WHEN 'es' THEN len(list_filter(tk, x -> NOT x IN ($es)))
           |    WHEN 'fr' THEN len(list_filter(tk, x -> NOT x IN ($fr)))
           |    ELSE len(tk) END AS BIGINT) AS n_kept
           |FROM t JOIN pred p USING (doc_id)
           |ORDER BY t.doc_id""".stripMargin
      }),

    ("tx_fingerprint",
      (s, d) => TrainOps.fingerprint(s, d),
      s"""SELECT doc_id,
         |  ${h60(s"array_to_string($tokSql, ' ')")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- Gopher repetition metrics ----
    ("tx_repetition",
      (s, d) => TrainOps.repetition(s, d),
      s"""WITH t AS (
         |  SELECT doc_id, $tokSql AS tk FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS DOUBLE) AS total
         |  FROM t),
         |g2 AS (
         |  SELECT doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
         |        FROM t WHERE len(tk) >= 2)),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
         |t2 AS (
         |  SELECT doc_id,
         |         CAST(c AS DOUBLE) * length(replace(g, ' ', '')) AS cov,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
         |  FROM c2),
         |top2 AS (SELECT doc_id, cov FROM t2 WHERE rn = 1),
         |g5 AS (
         |  SELECT doc_id, array_to_string(list_slice(tk, i, i + 4), ' ') AS g
         |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
         |        FROM t WHERE len(tk) >= 5)),
         |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
         |d5 AS (
         |  SELECT doc_id,
         |         CAST(sum((c - 1) * length(replace(g, ' ', ''))) AS DOUBLE) AS cov
         |  FROM c5 WHERE c > 1 GROUP BY doc_id)
         |SELECT b.doc_id,
         |  round(coalesce(tp.cov, 0) / (CASE WHEN b.total > 0 THEN b.total ELSE 1 END), 4) AS top2_char_frac,
         |  round(coalesce(d.cov, 0) / (CASE WHEN b.total > 0 THEN b.total ELSE 1 END), 4) AS dup5_char_frac
         |FROM base b LEFT JOIN top2 tp USING (doc_id) LEFT JOIN d5 d USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin),

    // ---- spatial k-NN (contrib Spatial analog) ----
    ("geo_knn",
      (s, d) => Geo.knnGate(s, d, lat0 = 10.0, lon0 = 20.0,
        radiusKm = 2500.0, k = 10),
      Geo.knnOracle(lat0 = 10.0, lon0 = 20.0, radiusKm = 2500.0, k = 10)),

    // the PERSISTED cell-partitioned spatial index (contrib Spatial
    // prefix/tier analog): radius queries route through a covering
    // cell IN-list = partition pruning; same oracle as geo_knn — the
    // tier must be invisible in the rows
    ("geo_cells",
      (s, d) => GeoIndex.knnGate(s, d, lat0 = 10.0, lon0 = 20.0,
        radiusKm = 2500.0, k = 10),
      Geo.knnOracle(lat0 = 10.0, lon0 = 20.0, radiusKm = 2500.0, k = 10)),

    // antimeridian seam: the query box crosses ±180, so far-side
    // neighbors (a point at −179.5° is ~60 km from 179.9°) must come
    // back through BOTH the scan path and the persisted cell path —
    // Δlon wraps in the distance and the bbox splits into two ranges
    ("geo_seam",
      (s, d) => Geo.knnGate(s, d, lat0 = 0.0, lon0 = 179.5,
        radiusKm = 1500.0, k = 10),
      Geo.knnOracle(lat0 = 0.0, lon0 = 179.5, radiusKm = 1500.0, k = 10)),
    ("geo_seam_cells",
      (s, d) => GeoIndex.knnGate(s, d, lat0 = 0.0, lon0 = 179.5,
        radiusKm = 1500.0, k = 10),
      Geo.knnOracle(lat0 = 0.0, lon0 = 179.5, radiusKm = 1500.0, k = 10)),

    // ---- PII redaction over deterministically injected PII ----
    ("tx_redact",
      (s, d) => TrainOps.redactGate(s, d),
      {
        val inj = "text || ' contact doc' || CAST(doc_id AS VARCHAR) || " +
          "'@example.com or 555-123-4567 ssn 123-45-6789 at 10.0.0.' || " +
          "CAST(doc_id % 256 AS VARCHAR)"
        val counts = TrainOps.PiiPatterns.map { case (name, re, _) =>
          s"CAST(len(regexp_extract_all(t, '${re.replace("'", "''")}')) AS BIGINT) AS n_$name"
        }.mkString(",\n         |  ")
        val redacted = TrainOps.PiiPatterns.foldLeft("t") {
          case (c, (_, re, tag)) =>
            s"regexp_replace($c, '${re.replace("'", "''")}', '$tag', 'g')"
        }
        s"""WITH inj AS (SELECT doc_id, $inj AS t FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  ${h60(redacted)} AS rfp
           |FROM inj ORDER BY doc_id""".stripMargin
      }),

    // ---- benchmark 8-gram decontamination ----
    ("dd_decontam",
      (s, d) => TrainOps.decontaminate(s, d),
      {
        val n = TrainOps.DecontamN
        val m = TrainOps.DecontamMod
        s"""WITH toksd AS (
           |  SELECT doc_id, $tokSql AS t FROM documents),
           |grams AS (
           |  SELECT doc_id,
           |         ${h60(s"array_to_string(list_slice(t, i, i + ${n - 1}), ' ')")} AS g
           |  FROM (SELECT doc_id, t,
           |               unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM toksd WHERE len(t) >= $n)),
           |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % $m = 0),
           |scan AS (SELECT doc_id, g FROM grams WHERE doc_id % $m <> 0)
           |SELECT s.doc_id, CAST(count(DISTINCT s.g) AS BIGINT) AS n_hits
           |FROM scan s JOIN bench b USING (g)
           |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin
      }),

    // Cross-document exact-substring duplication: per-doc counts of
    // word 8-grams shared with ANY other document (suffix-array dedup's
    // detection half, integerized). The oracle replays the identical
    // gram extraction and the >= 2-distinct-docs rule.
    ("dd_substring",
      (s, d) => TrainOps.substringDup(s, d),
      {
        val n = TrainOps.DecontamN
        s"""WITH toksd AS (
           |  SELECT doc_id, $tokSql AS t FROM documents),
           |base AS (SELECT doc_id, t FROM toksd WHERE len(t) >= $n),
           |grams AS (
           |  SELECT doc_id,
           |         ${h60(s"array_to_string(list_slice(t, i, i + ${n - 1}), ' ')")} AS g
           |  FROM (SELECT doc_id, t,
           |               unnest(generate_series(1, len(t) - ${n - 1})) AS i
           |        FROM base)),
           |pdg AS (SELECT g, doc_id, CAST(count(*) AS BIGINT) AS m
           |        FROM grams GROUP BY g, doc_id),
           |dup AS (SELECT g FROM pdg GROUP BY g HAVING count(*) >= 2),
           |per AS (SELECT doc_id,
           |          CAST(count(*) AS BIGINT) AS n_dup_grams,
           |          CAST(sum(m) AS BIGINT) AS n_dup_instances
           |        FROM pdg JOIN dup USING (g) GROUP BY doc_id)
           |SELECT b.doc_id,
           |  CAST(len(b.t) - ${n - 1} AS BIGINT) AS n_grams,
           |  CAST(COALESCE(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           |  CAST(COALESCE(p.n_dup_instances, 0) AS BIGINT)
           |    AS n_dup_instances
           |FROM base b LEFT JOIN per p USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }),

    // ---- multimodal plumbing (decode step stubbed — see Multimodal) ----
    ("mm_features",
      (s, d) => Multimodal.features(s, d),
      s"""WITH m AS (SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
         |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |    ${h60("text")} AS h
         |  FROM documents)
         |SELECT doc_id, kind, n_bytes,
         |  CAST(64 + h % 512 AS INTEGER) AS width,
         |  CAST(64 + (h // 512) % 512 AS INTEGER) AS height,
         |  h % 997 AS chk
         |FROM m ORDER BY doc_id""".stripMargin),

    // Real decode over real bytes: blobs are genuine BMP/WAV/Y4M files
    // synthesized from documents.text; the engine parses them back with
    // pure-JVM binary codecs (MediaCodecs) and the oracle recomputes
    // the STRUCTURE each format must carry from the same generator
    // arithmetic (sizes include every header/stride/marker byte, so a
    // mis-parsed header or padding rule breaks the hash). The content
    // feature (mean luma / mean |sample|) is proven by the round-trip
    // spec instead — SQL cannot portably fold UTF-8 bytes.
    ("mm_decode",
      (s, d) => Multimodal.decoded(s, d),
      """WITH p AS (SELECT doc_id,
        |    CAST(doc_id % 3 AS INTEGER) AS k,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |    CAST(8 + doc_id % 16 AS BIGINT) AS w,
        |    CAST(4 + doc_id % 8 AS BIGINT) AS h,
        |    CAST(1 + doc_id % 4 AS BIGINT) AS fr
        |  FROM documents)
        |SELECT doc_id,
        |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |  CAST(CASE k WHEN 0 THEN 54 + ((3 * w + 3) // 4) * 4 * h
        |              WHEN 1 THEN 44 + 2 * n
        |              ELSE 36 + fr * 198 END AS BIGINT) AS n_bytes,
        |  CAST(CASE k WHEN 0 THEN w WHEN 1 THEN 0 ELSE 16 END
        |       AS INTEGER) AS width,
        |  CAST(CASE k WHEN 0 THEN h WHEN 1 THEN 0 ELSE 8 END
        |       AS INTEGER) AS height,
        |  CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE fr END
        |       AS INTEGER) AS frames,
        |  CAST(CASE k WHEN 1 THEN n ELSE 0 END AS BIGINT) AS n_samples,
        |  CAST(CASE k WHEN 1 THEN 8000 ELSE 0 END
        |       AS INTEGER) AS sample_rate,
        |  CAST(CASE k WHEN 0 THEN 0 WHEN 1 THEN n * 1000 // 8000
        |              ELSE fr * 40 END AS BIGINT) AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin),

    // Media transforms: decode -> transform -> RE-ENCODE -> decode.
    // image 2x box downscale (BMP out), audio 2x decimation (WAV out),
    // video frame-0 extraction to a grayscale BMP still. The oracle
    // recomputes the OUTPUT file's structure (dims + exact re-encoded
    // byte size, stride padding included); payload content (box-filter
    // means, even-index picks, frame-0 bytes) is the spec's round-trip.
    ("mm_transform",
      (s, d) => Multimodal.transformed(s, d),
      """WITH p AS (SELECT doc_id,
        |    CAST(doc_id % 3 AS INTEGER) AS k,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |    CAST(8 + doc_id % 16 AS BIGINT) AS w,
        |    CAST(4 + doc_id % 8 AS BIGINT) AS h
        |  FROM documents),
        |q AS (SELECT doc_id, k, w // 2 AS ow, h // 2 AS oh,
        |             (n + 1) // 2 AS n2 FROM p)
        |SELECT doc_id,
        |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |  CASE k WHEN 1 THEN 'audio' ELSE 'image' END AS out_kind,
        |  CAST(CASE k WHEN 0 THEN 54 + ((3 * ow + 3) // 4) * 4 * oh
        |              WHEN 1 THEN 44 + 2 * n2
        |              ELSE 438 END AS BIGINT) AS out_bytes,
        |  CAST(CASE k WHEN 0 THEN ow WHEN 1 THEN 0 ELSE 16 END
        |       AS INTEGER) AS out_width,
        |  CAST(CASE k WHEN 0 THEN oh WHEN 1 THEN 0 ELSE 8 END
        |       AS INTEGER) AS out_height,
        |  CAST(CASE k WHEN 1 THEN n2 ELSE 0 END AS BIGINT) AS out_samples
        |FROM q ORDER BY doc_id""".stripMargin),

    // ---- dataset assembly: split / stratified sample / curation ----
    ("tx_split",
      (s, d) => TrainOps.splitCounts(s, d),
      s"""WITH t AS (SELECT
         |    CASE WHEN ${h60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
         |           THEN 'train'
         |         WHEN ${h60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95
         |           THEN 'val'
         |         ELSE 'test' END AS split,
         |    CAST(len($tokSql) AS BIGINT) AS t
         |  FROM documents)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(t) AS BIGINT) AS n_tokens
         |FROM t GROUP BY split ORDER BY split""".stripMargin),

    // per-source sampling fractions are PARAMETERS (frac × 2^60 embedded
    // as literals below); the verified computation is the salted
    // hash-vs-threshold filter, replayed independently in SQL
    ("tx_sample",
      (s, d) => TrainOps.stratifiedSample(s, d, SampleFracs, SampleDefault),
      s"""SELECT source, doc_id FROM documents
         |WHERE ${h60("'strat:' || CAST(doc_id AS VARCHAR)")}
         |  < (CASE ${SampleFracs.map { case (src, f) =>
              s"WHEN source = '$src' THEN ${sampleThr(f)}" }.mkString(" ")}
         |     ELSE ${sampleThr(SampleDefault)} END)
         |ORDER BY source, doc_id""".stripMargin),

    ("tx_curate",
      (s, d) => TrainOps.curateTopK(s, d, k = 3),
      s"""WITH $qualityCtes,
         |r AS (
         |  SELECT source, doc_id, quality,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rk
         |  FROM q)
         |SELECT source, doc_id, quality, rk FROM r
         |WHERE rk <= 3 ORDER BY source, rk""".stripMargin),
  )

  /** tx_sample parameters: per-source keep fractions + default (defs —
    * referenced from `entries`, which initializes first). */
  private def SampleFracs = Seq("src3" -> 0.6, "src7" -> 0.0)
  private def SampleDefault = 0.25
  private def sampleThr(f: Double): Long = (f * TrainOps.H60Range).toLong

  /** Quality CTE chain (mirrors TrainOps.qualityCol, identical operand
    * order): yields q(source, doc_id, quality) — shared by tx_quality
    * and tx_curate so the formula cannot drift between gates. */
  private lazy val qualityCtes: String =
    s"""t AS (
       |  SELECT source, doc_id, $tokSql AS tk,
       |         CAST(length(text) AS DOUBLE) AS chars,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha
       |  FROM documents),
       |m AS (
       |  SELECT source, doc_id,
       |    CAST(len(tk) AS DOUBLE) AS ntok,
       |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE) AS nstop,
       |    CASE WHEN len(tk) > 0
       |         THEN CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
       |         ELSE 0.0 END AS meanw,
       |    chars, alpha
       |  FROM t),
       |q AS (
       |  SELECT source, doc_id,
       |    round(0.35 * least(chars / 500.0, 1.0)
       |        + 0.25 * least(nstop / greatest(ntok, 1.0) * 4.0, 1.0)
       |        + 0.25 * (alpha / greatest(chars, 1.0))
       |        + 0.15 * least(meanw / 8.0, 1.0), 4) AS quality
       |  FROM m)""".stripMargin
}
