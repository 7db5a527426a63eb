package graft

/** DuckDB oracle SQL for the [[QueriesStats]] registry slice — split from
  * the query map in r13 (VERDICT r12 §next-7: the combined file crossed
  * the two-thousand-line navigation guideline when the r13 agreement/
  * preference queries landed). Every key here matches a
  * [[QueriesStats.queries]] key; the driver enforces the pairing, and
  * RegistrySpec asserts the key sets line up. */
private[graft] object QueriesStatsSql extends OracleSqlHelpers {
  val oracleSql: Map[String, String] = Map(
    "q23_text_stats" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(lower(text)), '\s+') AS lt,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
           FROM documents),
         sc AS (
           SELECT doc_id, text, n_tokens,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh,
             len(lt) AS ntok
           FROM t)
         SELECT doc_id, n_tokens,
                md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
                CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                     WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                     WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                     WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                     WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                     ELSE 'und' END AS lang_id,
                CASE WHEN text IS NULL THEN NULL
                     WHEN length(trim(text)) > 0 THEN
                       0.3 * least(ntok::DOUBLE / 100.0, 1.0)
                       + 0.4 * least(5.0 * (s_en::DOUBLE / ntok::DOUBLE), 1.0)
                       + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE)
                     ELSE 0.0 END AS quality
         FROM sc ORDER BY doc_id""",
    "q26_token_freq" ->
      """SELECT t AS token, count(*) AS n FROM (
           SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents)
         GROUP BY t ORDER BY n DESC, t LIMIT 20""",
    // exact flag-sums replayed; the theta set-operation bounds are
    // asserted Spark-side against the sketch's own 3σ interval, TRUE here
    "q113_theta_sets" ->
      """WITH f AS (SELECT user_id,
                max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY user_id)
         SELECT CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both_exact,
                CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_only_exact,
                TRUE AS ok_intersect, TRUE AS ok_diff
         FROM f""",
    // centroid in per-dim integer-SUM form (exact BIGINT hash-agg); the
    // single rounding is the final nano cosine, ranks ascending — the
    // zero-norm sentinel mirrors the Spark side's -2e9 pin
    "q137_centroid_outliers" ->
      s"""WITH $sqlVecs,
         g AS (SELECT vec_id, vec_id % 8 AS grp, q, nn FROM v),
         e AS (SELECT grp, d, q[d] AS x
               FROM g, unnest(range(1, len(q) + 1)) AS t(d)),
         sums AS (SELECT grp, d, CAST(sum(x) AS BIGINT) AS sx FROM e GROUP BY 1, 2),
         cvec AS (SELECT grp, list(sx ORDER BY d) AS cs FROM sums GROUP BY 1),
         cn AS (SELECT grp, cs, list_sum([y * y for y in cs]) AS cnn FROM cvec),
         scored AS (SELECT g.grp, g.vec_id,
                COALESCE(CAST(round(
                    list_sum([p[1] * p[2] for p in list_zip(g.q, cn.cs)])::DOUBLE
                      / NULLIF(sqrt(g.nn::DOUBLE) * sqrt(cn.cnn::DOUBLE), 0)
                      * 1000000000) AS BIGINT), -2000000000) AS cos_nano
              FROM g JOIN cn ON g.grp = cn.grp),
         rk AS (SELECT grp, vec_id, cos_nano,
                row_number() OVER (PARTITION BY grp
                  ORDER BY cos_nano ASC, vec_id) AS rank
              FROM scored)
         SELECT grp, vec_id, cos_nano, CAST(rank AS BIGINT) AS rank
         FROM rk WHERE rank <= 5 ORDER BY grp, rank""",
    // identical division tree: v = (Σx² − (Σx)²/n)/(n−1), se² = va/na+vb/nb,
    // t = (ma − mb)/√se² — exact cent sums make the doubles engine-equal
    "q150_welch_ab" ->
      """WITH x AS (SELECT event_type AS g,
                CAST(round(value * 100) AS BIGINT)::DOUBLE AS v FROM events),
         s AS (SELECT
                count(CASE WHEN g = 'click' AND v IS NOT NULL THEN 1 END)::DOUBLE AS na,
                sum(CASE WHEN g = 'click' THEN v END) AS sa,
                sum(CASE WHEN g = 'click' THEN v * v END) AS sa2,
                count(CASE WHEN g = 'view' AND v IS NOT NULL THEN 1 END)::DOUBLE AS nb,
                sum(CASE WHEN g = 'view' THEN v END) AS sb,
                sum(CASE WHEN g = 'view' THEN v * v END) AS sb2
               FROM x)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                CASE WHEN na >= 1 THEN sa / na END AS mean_a,
                CASE WHEN nb >= 1 THEN sb / nb END AS mean_b,
                CASE WHEN na >= 2 AND nb >= 2
                      AND (sa2 - sa * sa / na) / (na - 1) / na
                        + (sb2 - sb * sb / nb) / (nb - 1) / nb > 0
                     THEN CAST(round((sa / na - sb / nb)
                          / sqrt((sa2 - sa * sa / na) / (na - 1) / na
                               + (sb2 - sb * sb / nb) / (nb - 1) / nb) * 1e6) AS BIGINT)
                END AS t_micro
         FROM s""",
    // same exact rank-sum identity over distinct score levels; the oracle
    // uses the one-level window (result-identical — the stats are exact
    // longs; the Spark side's two-level shape is a scale choice, not a
    // semantics one)
    "q153_roc_auc" ->
      """WITH x AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
                (o_orderstatus = 'F') AS lbl FROM orders
              WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
         lv AS (SELECT s, count(CASE WHEN lbl THEN 1 END) AS p,
                       count(CASE WHEN NOT lbl THEN 1 END) AS n
                FROM x GROUP BY s),
         w AS (SELECT p, n, COALESCE(sum(n) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
               FROM lv),
         t AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                      CAST(sum(n) AS BIGINT) AS n_neg,
                      CAST(sum(p * (cb * 2 + n)) AS BIGINT) AS auc_num2 FROM w)
         SELECT n_pos, n_neg, auc_num2,
                CASE WHEN n_pos > 0 AND n_neg > 0
                     THEN CAST(round(auc_num2::DOUBLE
                          / (n_pos::DOUBLE * n_neg::DOUBLE * 2) * 1e6) AS BIGINT)
                END AS auc_micro
         FROM t""",
    // same integer flag tree; DuckDB median of BIGINT interpolates the two
    // middles, so 2·median casts back to an exact BIGINT
    "q155_robust_outliers" ->
      """WITH x AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
              FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         m AS (SELECT g, CAST(2 * median(v) AS BIGINT) AS med2 FROM x GROUP BY g),
         d AS (SELECT x.g, v, abs(2 * v - med2) AS d2, med2
               FROM x JOIN m ON x.g = m.g),
         md AS (SELECT g, CAST(2 * median(d2) AS BIGINT) AS mad4 FROM d GROUP BY g)
         SELECT d.g AS lang, CAST(count(*) AS BIGINT) AS n_rows,
                max(med2) AS med_x2, max(mad4) AS mad_x4,
                count(CASE WHEN mad4 > 0 AND 20 * d2 > 35 * mad4 THEN 1 END) AS n_outliers
         FROM d JOIN md ON d.g = md.g GROUP BY 1 ORDER BY 1""",
    // same rank-weighted sum in HUGEINT (the Decimal(38,0) twin), same
    // fixed Gini/share trees
    "q157_concentration" ->
      """WITH pk AS (SELECT o_custkey AS k,
                COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS x
              FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         r AS (SELECT k, x, row_number() OVER (ORDER BY x, k) AS i FROM pk),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                      sum(i::HUGEINT * x::HUGEINT) AS six FROM r),
         tc AS (SELECT COALESCE(sum(x), 0) AS top_x
                FROM r, t WHERE i > n - CAST(floor((n + 9) / 10) AS BIGINT))
         SELECT n AS n_keys, sx AS total,
                CASE WHEN n > 0 AND sx > 0
                     THEN CAST(round((six::DOUBLE * 2 - (n + 1)::DOUBLE * sx::DOUBLE)
                          / (n::DOUBLE * sx::DOUBLE) * 1e6) AS BIGINT)
                END AS gini_micro,
                CASE WHEN sx > 0
                     THEN CAST(round(top_x::DOUBLE / sx::DOUBLE * 1e6) AS BIGINT)
                END AS top10_share_micro
         FROM t, tc""",
    // same exact counts and the shared ln tree, micro-quantized
    "q160_woe_iv" ->
      """WITH d AS (SELECT source, (lang = 'en') AS lbl FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL),
         lv AS (SELECT source, count(CASE WHEN lbl THEN 1 END) AS pos,
                       count(CASE WHEN NOT lbl THEN 1 END) AS neg
                FROM d GROUP BY 1),
         t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
                      CAST(sum(neg) AS BIGINT) AS tn FROM lv)
         SELECT source, CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
                CASE WHEN pos > 0 AND neg > 0
                     THEN CAST(round(ln((pos::DOUBLE / tp::DOUBLE)
                          / (neg::DOUBLE / tn::DOUBLE)) * 1e6) AS BIGINT)
                END AS woe_micro,
                COALESCE(CASE WHEN pos > 0 AND neg > 0
                     THEN CAST(round((pos::DOUBLE / tp::DOUBLE - neg::DOUBLE / tn::DOUBLE)
                          * ln((pos::DOUBLE / tp::DOUBLE) / (neg::DOUBLE / tn::DOUBLE))
                          * 1e6) AS BIGINT) END, 0) AS iv_term_micro
         FROM lv CROSS JOIN t ORDER BY source""",
    // the q171 step-grid machinery with the group as an extra key
    "q181_ks_by_group" ->
      """WITH raw AS (SELECT event_type AS g,
                CAST(round(value * 100) AS BIGINT) AS v, epoch_us(ts) AS t
              FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM raw),
         la AS (SELECT g, v, count(*) AS ca FROM raw, m
                WHERE t < mid AND v IS NOT NULL AND g IS NOT NULL GROUP BY 1, 2),
         lb AS (SELECT g, v, count(*) AS cb FROM raw, m
                WHERE t >= mid AND v IS NOT NULL AND g IS NOT NULL GROUP BY 1, 2),
         gm AS (SELECT COALESCE(la.g, lb.g) AS g, COALESCE(la.v, lb.v) AS v,
                       COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
                FROM la FULL OUTER JOIN lb ON la.g = lb.g AND la.v = lb.v),
         c AS (SELECT g, v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM gm
               WINDOW w AS (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t2 AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(cb) AS BIGINT) AS nb FROM gm GROUP BY 1),
         dm AS (SELECT c.g, max(abs(nb::HUGEINT * cuma::HUGEINT
                              - na::HUGEINT * cumb::HUGEINT)) AS dmax
                FROM c JOIN t2 ON c.g = t2.g GROUP BY 1)
         SELECT t2.g AS event_type, na AS n_a, nb AS n_b,
                CASE WHEN na > 0 AND nb > 0
                     THEN CAST(round(dmax::DOUBLE / (na::DOUBLE * nb::DOUBLE) * 1e6) AS BIGINT)
                END AS ks_micro
         FROM t2 JOIN dm ON t2.g = dm.g ORDER BY event_type""",
    // the identical md5 hex fold (15 chars → 60-bit long) % width gives the
    // same cells; a one-shot build equals Spark's merged half-sketches by
    // the cell-sum identity, so every estimate hash-compares exactly
    "q182_countmin" ->
      """WITH it AS (SELECT user_id::VARCHAR AS it FROM events
                     WHERE user_id IS NOT NULL),
         cells AS (SELECT r,
                list_sum([ (instr('0123456789abcdef',
                                  substr(md5(r::VARCHAR || ':' || it), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)]) % 256 AS b,
                count(*) AS c
              FROM it, range(0, 4) t(r) GROUP BY 1, 2),
         ex AS (SELECT it, count(*) AS c_exact FROM it GROUP BY 1),
         probes AS (SELECT it, r,
                list_sum([ (instr('0123456789abcdef',
                                  substr(md5(r::VARCHAR || ':' || it), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)]) % 256 AS b
              FROM ex, range(0, 4) t(r)),
         est AS (SELECT it, min(COALESCE(c, 0)) AS c_est
                 FROM probes LEFT JOIN cells USING (r, b) GROUP BY 1)
         SELECT CAST(ex.it AS BIGINT) AS user_id, c_exact, c_est,
                c_est - c_exact AS overcount
         FROM ex JOIN est USING (it) ORDER BY user_id""",
    // one global window stands in for the engine's two-level prefix — same
    // exact integer D_i = |n·S_i − i·S_n|, argmax ties to smallest i
    "q183_change_point" ->
      """WITH raw AS (SELECT event_type AS g, epoch_us(ts) AS o, event_id AS id,
                CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL
                AND value IS NOT NULL AND event_id IS NOT NULL),
         c AS (SELECT g, o, id, v, count(*) OVER w AS i, sum(v) OVER w AS si
               FROM raw WINDOW w AS (PARTITION BY g ORDER BY o, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT g, count(*) AS n, sum(v) AS sn FROM raw GROUP BY 1),
         s AS (SELECT c.g, i, o, n,
                      abs(n::HUGEINT * si::HUGEINT - i::HUGEINT * sn::HUGEINT) AS d
               FROM c JOIN t USING (g) WHERE i < n),
         dm AS (SELECT g, max(d) AS dmax FROM s GROUP BY 1),
         best AS (SELECT s.g, min(i) AS split_i
                  FROM s JOIN dm ON s.g = dm.g AND s.d = dm.dmax GROUP BY 1)
         SELECT s.g AS event_type, s.n, best.split_i, s.o AS split_ts_us,
                CAST(round(dm.dmax::DOUBLE
                  / (best.split_i::DOUBLE * (s.n - best.split_i)::DOUBLE) * 1e6)
                  AS BIGINT) AS gap_micro
         FROM s JOIN dm ON s.g = dm.g AND s.d = dm.dmax
                JOIN best ON s.g = best.g AND s.i = best.split_i
         ORDER BY event_type""",
    // HUGEINT products/mods replay the engine's Decimal(38,0) arithmetic;
    // // is exact because budget·w − rem is divisible by W by construction
    "q184_apportion" ->
      """WITH pg AS (SELECT source AS g, CAST(sum(n_chars) AS HUGEINT) AS w
                     FROM documents
                     WHERE source IS NOT NULL AND n_chars IS NOT NULL
                       AND n_chars >= 0 GROUP BY 1),
         t AS (SELECT sum(w) AS wt FROM pg),
         j AS (SELECT g, w, (100000::HUGEINT * w) % wt AS rem,
                      (100000::HUGEINT * w) // wt AS fq
               FROM pg, t WHERE wt > 0),
         l AS (SELECT 100000 - sum(fq) AS lf FROM j),
         r AS (SELECT g, w, fq, rem,
                      row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j)
         SELECT g AS source, CAST(w AS BIGINT) AS w,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS alloc
         FROM r, l ORDER BY source""",
    // same exact Σx/Σx² sums (HUGEINT ≡ Decimal(38,0)), same one sqrt
    // expression, the q184 Hamilton tail on the integer N·σ weights
    "q251_neyman_allocation" ->
      """WITH pg AS (SELECT o_orderpriority AS g,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS s1,
                sum(CAST(round(o_totalprice * 1e6) AS BIGINT)::HUGEINT
                  * CAST(round(o_totalprice * 1e6) AS BIGINT)::HUGEINT) AS s2
               FROM orders
               WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
               GROUP BY 1),
         sdx AS (SELECT g, n_rows,
                  CASE WHEN n_rows > 1 THEN
                    sqrt(greatest(0, (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE
                      / n_rows::DOUBLE) / (n_rows - 1)::DOUBLE))
                  ELSE 0 END AS sd
                 FROM pg),
         st AS (SELECT g, n_rows,
                 CAST(round(sd) AS BIGINT) AS sd_micro,
                 CAST(round(n_rows::DOUBLE * sd) AS HUGEINT) AS w
                FROM sdx),
         t AS (SELECT sum(w) AS wt FROM st),
         j AS (SELECT g, n_rows, sd_micro, w,
                 (1000::HUGEINT * w) % wt AS rem,
                 (1000::HUGEINT * w) // wt AS fq
               FROM st, t WHERE wt > 0),
         l AS (SELECT 1000 - sum(fq) AS lf FROM j),
         r AS (SELECT g, n_rows, sd_micro, w, fq, rem,
                row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j)
         SELECT g AS o_orderpriority, n_rows, sd_micro, CAST(w AS BIGINT) AS w,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS alloc
         FROM r, l ORDER BY o_orderpriority""",
    // same md5-60-bit 5-band fold rule as q231, the same exact cell sums
    // and fold-excluded prior, one mirrored double expression for enc
    "q253_target_encoding" ->
      s"""WITH h AS (SELECT o_orderpriority AS c,
              CAST(round(o_totalprice * 1e6) AS BIGINT) AS t,
              list_sum([ (instr('0123456789abcdef', substr(md5(o_orderkey::VARCHAR), k, 1)) - 1)
                         * pow(16, 15 - k)::BIGINT for k in range(1, 16)]) AS h
             FROM orders
             WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
               AND o_orderkey IS NOT NULL),
         f AS (SELECT c, t,
                CASE WHEN h < ${graft.operators.Ops.hashBandEdge(0.2)} THEN 0
                     WHEN h < ${graft.operators.Ops.hashBandEdge(0.4)} THEN 1
                     WHEN h < ${graft.operators.Ops.hashBandEdge(0.6)} THEN 2
                     WHEN h < ${graft.operators.Ops.hashBandEdge(0.8)} THEN 3
                     ELSE 4 END AS fold
               FROM h),
         cells AS (SELECT c, fold, CAST(count(*) AS BIGINT) AS nf,
                    CAST(sum(t) AS BIGINT) AS sf
                   FROM f GROUP BY 1, 2),
         cats AS (SELECT c, sum(nf) AS nc, sum(sf) AS sc FROM cells GROUP BY 1),
         ft AS (SELECT fold, sum(nf) AS nft, sum(sf) AS sft FROM cells GROUP BY 1),
         tt AS (SELECT sum(nf) AS n, sum(sf) AS s FROM cells),
         folds AS (SELECT unnest(range(5)) AS fold),
         dense AS (SELECT cats.c, folds.fold,
             cats.nc - coalesce(cells.nf, 0) AS n_oof,
             cats.sc - coalesce(cells.sf, 0) AS so,
             tt.n - coalesce(ft.nft, 0) AS ng,
             tt.s - coalesce(ft.sft, 0) AS sg
           FROM cats CROSS JOIN folds
           LEFT JOIN cells ON cells.c = cats.c AND cells.fold = folds.fold
           LEFT JOIN ft ON ft.fold = folds.fold
           CROSS JOIN tt)
         SELECT c AS o_orderpriority, CAST(fold AS BIGINT) AS fold,
                CAST(n_oof AS BIGINT) AS n_oof,
                CASE WHEN ng > 0 THEN
                  CAST(round((so::DOUBLE + 10 * (sg::DOUBLE / ng::DOUBLE))
                    / (n_oof + 10)::DOUBLE) AS BIGINT)
                END AS enc_micro
         FROM dense ORDER BY o_orderpriority, fold""",
    // the clamp-and-redistribute rounds unrolled as MATERIALIZED CTEs -
    // pure HUGEINT Hamilton per round, bit-identical to the Decimal path
    "q252_apportion_capped" ->
      """
       WITH g0 AS MATERIALIZED (
         SELECT o_orderpriority AS g,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS w,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0
                 WHEN o_orderpriority = '2-HIGH' THEN
                   CASE WHEN o_orderkey % 30 = 0 THEN 1 ELSE 0 END
                 ELSE 1 END) AS BIGINT) AS cap
         FROM orders
         WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
           AND o_totalprice >= 0
         GROUP BY 1),
       s0 AS MATERIALIZED (SELECT g, w, cap, FALSE AS capped,
              CAST(0 AS BIGINT) AS alloc FROM g0),
         cb1 AS MATERIALIZED (SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0) AS cb FROM s0),
         un1 AS MATERIALIZED (SELECT g, w FROM s0 WHERE NOT capped),
         t1 AS (SELECT sum(w) AS wt FROM un1),
         j1 AS MATERIALIZED (SELECT un1.g, un1.w,
                greatest(0, 5000 - cb) AS rb,
                (greatest(0, 5000 - cb)::HUGEINT * w) % wt AS rem,
                (greatest(0, 5000 - cb)::HUGEINT * w) // wt AS fq
               FROM un1, t1, cb1 WHERE wt > 0),
         l1 AS (SELECT max(rb) - sum(fq) AS lf FROM j1),
         r1 AS (SELECT g, fq, rem,
                row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j1),
         a1 AS MATERIALIZED (SELECT g,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS au
               FROM r1, l1),
         s1 AS MATERIALIZED (
           SELECT p.g, p.w, p.cap,
             p.capped OR coalesce(a1.au > p.cap, FALSE) AS capped,
             CASE WHEN p.capped OR coalesce(a1.au > p.cap, FALSE) THEN p.cap
                  ELSE coalesce(a1.au, 0) END AS alloc
           FROM s0 p LEFT JOIN a1 USING (g)),
         cb2 AS MATERIALIZED (SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0) AS cb FROM s1),
         un2 AS MATERIALIZED (SELECT g, w FROM s1 WHERE NOT capped),
         t2 AS (SELECT sum(w) AS wt FROM un2),
         j2 AS MATERIALIZED (SELECT un2.g, un2.w,
                greatest(0, 5000 - cb) AS rb,
                (greatest(0, 5000 - cb)::HUGEINT * w) % wt AS rem,
                (greatest(0, 5000 - cb)::HUGEINT * w) // wt AS fq
               FROM un2, t2, cb2 WHERE wt > 0),
         l2 AS (SELECT max(rb) - sum(fq) AS lf FROM j2),
         r2 AS (SELECT g, fq, rem,
                row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j2),
         a2 AS MATERIALIZED (SELECT g,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS au
               FROM r2, l2),
         s2 AS MATERIALIZED (
           SELECT p.g, p.w, p.cap,
             p.capped OR coalesce(a2.au > p.cap, FALSE) AS capped,
             CASE WHEN p.capped OR coalesce(a2.au > p.cap, FALSE) THEN p.cap
                  ELSE coalesce(a2.au, 0) END AS alloc
           FROM s1 p LEFT JOIN a2 USING (g)),
         cb3 AS MATERIALIZED (SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0) AS cb FROM s2),
         un3 AS MATERIALIZED (SELECT g, w FROM s2 WHERE NOT capped),
         t3 AS (SELECT sum(w) AS wt FROM un3),
         j3 AS MATERIALIZED (SELECT un3.g, un3.w,
                greatest(0, 5000 - cb) AS rb,
                (greatest(0, 5000 - cb)::HUGEINT * w) % wt AS rem,
                (greatest(0, 5000 - cb)::HUGEINT * w) // wt AS fq
               FROM un3, t3, cb3 WHERE wt > 0),
         l3 AS (SELECT max(rb) - sum(fq) AS lf FROM j3),
         r3 AS (SELECT g, fq, rem,
                row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j3),
         a3 AS MATERIALIZED (SELECT g,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS au
               FROM r3, l3),
         s3 AS MATERIALIZED (
           SELECT p.g, p.w, p.cap,
             p.capped OR coalesce(a3.au > p.cap, FALSE) AS capped,
             CASE WHEN p.capped OR coalesce(a3.au > p.cap, FALSE) THEN p.cap
                  ELSE coalesce(a3.au, 0) END AS alloc
           FROM s2 p LEFT JOIN a3 USING (g))
       SELECT g AS o_orderpriority, w, cap, capped, CAST(alloc AS BIGINT) AS alloc
       FROM s3 ORDER BY o_orderpriority""",
    // same normalize/tokenize as the LM family; the only division is the
    // final r* ratio over exact integer counts
    "q185_good_turing" ->
      """WITH toks AS (SELECT unnest(string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                '\s+')) AS token FROM documents),
         c AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
         ff AS (SELECT c AS r, count(*) AS n_r FROM c GROUP BY 1),
         nx AS (SELECT r - 1 AS r, n_r AS n_next FROM ff)
         SELECT ff.r, ff.n_r,
                CASE WHEN n_next IS NOT NULL
                     THEN CAST(round((ff.r + 1)::DOUBLE * n_next::DOUBLE
                                     / ff.n_r::DOUBLE * 1e6) AS BIGINT)
                END AS r_star_micro
         FROM ff LEFT JOIN nx USING (r) ORDER BY r""",
    // one md5 per ROW → (w0, w1) words; replicate uniforms via the
    // Kirsch–Mitzenmacher (w0 + r·w1) mod (2³¹−1), SAME literal CDF
    // thresholds; lo/hi indices fixed at ceil(0.025·64) = 2
    "q190_bootstrap" ->
      """WITH base AS (SELECT event_id::VARCHAR AS id,
                CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
         hw AS (SELECT v,
                list_sum([ (instr('0123456789abcdef', substr(md5(id), k, 1)) - 1)
                           * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                list_sum([ (instr('0123456789abcdef', substr(md5(id), k + 8, 1)) - 1)
                           * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
              FROM base),
         wts AS (SELECT r, v,
                CASE WHEN u < 790015083 THEN 0
                     WHEN u < 1580030167 THEN 1
                     WHEN u < 1975037709 THEN 2
                     WHEN u < 2106706890 THEN 3
                     WHEN u < 2139624185 THEN 4
                     WHEN u < 2146207644 THEN 5
                     WHEN u < 2147304887 THEN 6
                     ELSE 7 END AS w
              FROM (SELECT r, v, (w0 + w1 * r) % 2147483647 AS u
                    FROM hw, range(0, 64) t(r)) t),
         rs AS (SELECT r, CAST(round(sum(w * v)::DOUBLE / sum(w)::DOUBLE * 1e6)
                               AS BIGINT) AS m
                FROM wts GROUP BY r HAVING sum(w) > 0),
         rk AS (SELECT r, m, row_number() OVER (ORDER BY m, r) AS ra,
                       row_number() OVER (ORDER BY m DESC, r DESC) AS rd FROM rs),
         ci AS (SELECT count(*) AS nb,
                       max(CASE WHEN ra = 2 THEN m END) AS lo,
                       max(CASE WHEN rd = 2 THEN m END) AS hi,
                       sum(m::HUGEINT) AS sm,
                       sum(m::HUGEINT * m::HUGEINT) AS sm2 FROM rk),
         f AS (SELECT count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sv FROM base)
         SELECT n_rows,
                CASE WHEN n_rows > 0
                     THEN CAST(round(sv::DOUBLE / n_rows::DOUBLE * 1e6) AS BIGINT)
                END AS mean_micro,
                lo AS boot_lo_micro, hi AS boot_hi_micro,
                CASE WHEN nb >= 2
                     THEN CAST(round(sqrt((sm2::DOUBLE - sm::DOUBLE * sm::DOUBLE
                                           / nb::DOUBLE) / (nb::DOUBLE - 1)))
                               AS BIGINT)
                END AS boot_se_micro
         FROM f, ci""",
    // the q187 run pair + the SAME literal RBO weights (k=10, p=0.9),
    // one lookup at the worse rank per shared item
    "q194_rbo" ->
      s"""WITH $sqlVecs,
         v16 AS (SELECT vec_id, q[1:16] AS q,
                        list_sum([qq * qq for qq in q[1:16]]) AS nn FROM v),
         truth AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v q JOIN v c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         sys AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v16 q JOIN v16 c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         sh AS (SELECT s.query_id,
                ([235416,135416,90416,63416,45191,32069,22228,14636,8657,3874])
                  [greatest(s.rank, t.rank)::INT] AS w
              FROM sys s JOIN truth t
                ON s.query_id = t.query_id AND s.nbr_id = t.nbr_id),
         ag AS (SELECT query_id, count(*) AS n_shared,
                       CAST(sum(w) AS BIGINT) AS rbo_micro FROM sh GROUP BY 1),
         qs AS (SELECT DISTINCT query_id FROM
                (SELECT query_id FROM sys UNION SELECT query_id FROM truth) u)
         SELECT qs.query_id, COALESCE(n_shared, 0) AS n_shared,
                COALESCE(rbo_micro, 0) AS rbo_micro
         FROM qs LEFT JOIN ag ON qs.query_id = ag.query_id
         ORDER BY qs.query_id""",
    // the same normalize/tokenize; smallest covering checkpoint via a
    // filtered list min; running sums over the checkpoint table
    "q195_vocab_growth" ->
      """WITH cps AS (SELECT unnest([16, 64, 256, 1024, 4096, 16384]) AS k),
         toks AS (SELECT doc_id AS id,
                unnest(string_split_regex(trim(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents WHERE doc_id IS NOT NULL),
         ft AS (SELECT k, count(*) AS new_types FROM (
                  SELECT list_min([c for c in [16, 64, 256, 1024, 4096, 16384]
                                   if c >= fid]) AS k
                  FROM (SELECT token, min(id) AS fid FROM toks GROUP BY 1) t) u
                WHERE k IS NOT NULL GROUP BY 1),
         tm AS (SELECT k, count(*) AS new_tokens FROM (
                  SELECT list_min([c for c in [16, 64, 256, 1024, 4096, 16384]
                                   if c >= id]) AS k FROM toks) u
                WHERE k IS NOT NULL GROUP BY 1),
         cur AS (SELECT cps.k,
                sum(COALESCE(new_tokens, 0)) OVER (ORDER BY cps.k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_tokens,
                sum(COALESCE(new_types, 0)) OVER (ORDER BY cps.k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types
              FROM cps LEFT JOIN ft ON cps.k = ft.k
                       LEFT JOIN tm ON cps.k = tm.k)
         SELECT CAST(k AS BIGINT) AS k, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(n_types AS BIGINT) AS n_types,
                CASE WHEN n_tokens > 0
                     THEN CAST(round(n_types::DOUBLE / n_tokens::DOUBLE * 1e6)
                               AS BIGINT)
                END AS ttr_micro
         FROM cur ORDER BY k""",
    // same censoring cut, level grid, rounded-ln terms, shared exp tree
    "q179_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         sp AS (SELECT user_id, min(t) AS f, max(t) AS l FROM e GROUP BY 1),
         g AS (SELECT min(t) AS gmin, max(t) AS gmax FROM e),
         obs AS (SELECT ((l - f) - (l - f) % 3600000000) / 3600000000 AS dur,
                        l < gmax - CAST(floor((gmax - gmin) / 10.0) AS BIGINT) AS ev
                 FROM sp, g),
         lv AS (SELECT CAST(dur AS BIGINT) AS dur,
                       CAST(count(CASE WHEN ev THEN 1 END) AS BIGINT) AS d,
                       CAST(count(CASE WHEN NOT ev THEN 1 END) AS BIGINT) AS c
                FROM obs GROUP BY 1),
         l2 AS (SELECT dur, d, c, d + c AS tot FROM lv),
         t2 AS (SELECT CAST(sum(tot) AS BIGINT) AS N FROM l2),
         r AS (SELECT dur, d, c,
                CAST(N - COALESCE(sum(tot) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
               FROM l2, t2),
         s AS (SELECT dur, d, c, n_risk,
                CASE WHEN d > 0 AND d < n_risk
                     THEN CAST(round(ln(1 - d::DOUBLE / n_risk::DOUBLE) * 1e6) AS BIGINT)
                END AS term,
                CASE WHEN d = n_risk THEN 1 ELSE 0 END AS pin
               FROM r),
         cum AS (SELECT dur, n_risk, d, c,
                CAST(sum(term) OVER win AS BIGINT) AS ls, max(pin) OVER win AS dead
               FROM s WINDOW win AS (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT dur, n_risk, d AS n_events, c AS n_censored,
                CASE WHEN dead = 0 THEN ls END AS logsurv_micro,
                CASE WHEN dead = 1 THEN 0
                     WHEN ls IS NULL THEN 1000000
                     ELSE CAST(round(exp(ls::DOUBLE / 1e6) * 1e6) AS BIGINT)
                END AS surv_micro
         FROM cum ORDER BY dur""",
    // same mid split, merged step grid, HUGEINT cross products, max once
    "q171_ks_drift" ->
      """WITH raw AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                epoch_us(ts) AS t FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM raw),
         la AS (SELECT v, count(*) AS ca FROM raw, m
                WHERE t < mid AND v IS NOT NULL GROUP BY 1),
         lb AS (SELECT v, count(*) AS cb FROM raw, m
                WHERE t >= mid AND v IS NOT NULL GROUP BY 1),
         g AS (SELECT COALESCE(la.v, lb.v) AS v, COALESCE(ca, 0) AS ca,
                      COALESCE(cb, 0) AS cb
               FROM la FULL OUTER JOIN lb ON la.v = lb.v),
         c AS (SELECT v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM g
               WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t2 AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(cb) AS BIGINT) AS nb FROM g),
         dm AS (SELECT max(abs(nb::HUGEINT * cuma::HUGEINT
                             - na::HUGEINT * cumb::HUGEINT)) AS dmax
                FROM c CROSS JOIN t2)
         SELECT na AS n_a, nb AS n_b,
                CASE WHEN na > 0 AND nb > 0
                     THEN CAST(round(dmax::DOUBLE / (na::DOUBLE * nb::DOUBLE) * 1e6) AS BIGINT)
                END AS ks_micro
         FROM t2 CROSS JOIN dm""",
    // same doubled tie-averaged ranks and the shared Pearson tree
    "q172_spearman" ->
      """WITH r0 AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         lx AS (SELECT x AS v, count(*) AS c FROM r0 GROUP BY 1),
         cx AS (SELECT v, 2 * COALESCE(sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
                FROM lx),
         ly AS (SELECT y AS v, count(*) AS c FROM r0 GROUP BY 1),
         cy AS (SELECT v, 2 * COALESCE(sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
                FROM ly),
         rr AS (SELECT cx.r AS rx, cy.r AS ry
                FROM r0 JOIN cx ON r0.x = cx.v JOIN cy ON r0.y = cy.v),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
                      sum(rx::HUGEINT * rx::HUGEINT) AS sxx,
                      sum(ry::HUGEINT * ry::HUGEINT) AS syy,
                      sum(rx::HUGEINT * ry::HUGEINT) AS sxy FROM rr)
         SELECT n AS n_rows,
                CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
                      AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0
                     THEN CAST(round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                          / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                           * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
                          * 1e6) AS BIGINT)
                END AS rho_micro
         FROM s""",
    // same exact split point, full-outer level grid, and shared ln tree
    "q166_psi_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM e),
         la AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
                FROM e, m WHERE t < mid AND event_type IS NOT NULL GROUP BY 1),
         lb AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_b
                FROM e, m WHERE t >= mid AND event_type IS NOT NULL GROUP BY 1),
         lv AS (SELECT COALESCE(la.event_type, lb.event_type) AS event_type,
                       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
                FROM la FULL OUTER JOIN lb ON la.event_type = lb.event_type),
         t2 AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                       CAST(sum(n_b) AS BIGINT) AS tb FROM lv)
         SELECT event_type, n_a, n_b, (n_a = 0 OR n_b = 0) AS one_sided,
                CASE WHEN n_a > 0 AND n_b > 0
                     THEN CAST(round((n_a::DOUBLE / ta::DOUBLE - n_b::DOUBLE / tb::DOUBLE)
                          * ln((n_a::DOUBLE / ta::DOUBLE) / (n_b::DOUBLE / tb::DOUBLE))
                          * 1e6) AS BIGINT)
                END AS psi_term_micro
         FROM lv CROSS JOIN t2 ORDER BY event_type""",
    // the same decimal-string leading digit and micro trees
    "q167_benford" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         d AS (SELECT CAST(substr(c::VARCHAR, 1, 1) AS BIGINT) AS digit,
                      CAST(count(*) AS BIGINT) AS n
               FROM v WHERE c IS NOT NULL AND c > 0 GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM d)
         SELECT digit, n,
                CAST(round(n::DOUBLE / tt::DOUBLE * 1e6) AS BIGINT) AS share_micro,
                CAST(round(ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0) * 1e6) AS BIGINT) AS benford_micro,
                CAST(round(n::DOUBLE / tt::DOUBLE * 1e6) AS BIGINT)
                  - CAST(round(ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0) * 1e6) AS BIGINT) AS dev_micro
         FROM d CROSS JOIN t ORDER BY digit""",
    // the q23 lang-id CTE verbatim, then the exact-marginal kappa identity
    "q168_kappa" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(lower(text)), '\s+') AS lt
           FROM documents),
         sc AS (
           SELECT doc_id,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh
           FROM t),
         lbl AS (
           SELECT d.lang AS la,
                CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                     WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                     WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                     WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                     WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                     ELSE 'und' END AS lb
           FROM sc JOIN documents d ON d.doc_id = sc.doc_id
           WHERE d.lang IS NOT NULL),
         j AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS c FROM lbl GROUP BY 1, 2),
         ra AS (SELECT la, CAST(sum(c) AS BIGINT) AS r FROM j GROUP BY 1),
         cb AS (SELECT lb, CAST(sum(c) AS BIGINT) AS cc FROM j GROUP BY 1),
         rc AS (SELECT COALESCE(sum(r::HUGEINT * cc::HUGEINT), 0::HUGEINT) AS src
                FROM ra JOIN cb ON ra.la = cb.lb),
         b AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS agree
               FROM j)
         SELECT n AS n_rows, agree AS n_agree,
                CASE WHEN n::HUGEINT * n::HUGEINT <> src
                     THEN CAST(round((n::DOUBLE * agree::DOUBLE - src::DOUBLE)
                          / (n::DOUBLE * n::DOUBLE - src::DOUBLE) * 1e6) AS BIGINT)
                END AS kappa_micro
         FROM b CROSS JOIN rc""",
    "q64_sketch_distinct" ->
      """SELECT CAST(8 AS BIGINT) AS n_shards,
                CAST(count(DISTINCT t) AS BIGINT) AS n_exact,
                TRUE AS within_5pct
         FROM (SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
               FROM documents)""",
    "q84_quantile_bins" ->
      """WITH vc AS (SELECT l_quantity AS v, count(*) AS n FROM lineitem
                     WHERE l_quantity IS NOT NULL GROUP BY 1),
         b AS (SELECT v,
                      CAST((coalesce(sum(n) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 8)
                        // sum(n) OVER () AS BIGINT) AS bin
               FROM vc)
         SELECT bin, count(*) AS n, min(l_quantity) AS lo, max(l_quantity) AS hi
         FROM lineitem JOIN b ON l_quantity = b.v
         GROUP BY 1 ORDER BY 1""",
    "q76_corr_exact" ->
      """WITH a AS (
           SELECT l_returnflag,
                  sum(l_quantity) AS sx, sum(l_linenumber::DOUBLE) AS sy,
                  sum(l_quantity * l_linenumber::DOUBLE) AS sxy,
                  sum(l_quantity * l_quantity) AS sx2,
                  sum(l_linenumber::DOUBLE * l_linenumber::DOUBLE) AS sy2,
                  count(*)::DOUBLE AS n
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
                CASE WHEN n >= 2 AND n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
                     THEN (n * sxy - sx * sy)
                          / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy))
                END AS corr_qty_line
         FROM a ORDER BY l_returnflag""",
    // exact percentiles replayed (q105's tree); the KLL bracket booleans
    // are asserted Spark-side and emitted TRUE here (q64's contract for
    // merge-tree-specific sketch values)
    "q110_kll_quantiles" ->
      """WITH x AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT l_returnflag, cents,
                      row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS cnt
               FROM x)
         SELECT l_returnflag,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p50_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.9 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p90_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.99 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p99_cents,
                TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",
    // same doubled-midrank identity over distinct cent levels, HUGEINT
    // rank/tie sums (the Decimal(38,0) twin), the identical z tree
    "q200_mann_whitney" ->
      """WITH x AS (SELECT (event_type = 'click') AS isa,
                CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE event_type IN ('click', 'view')
                AND value IS NOT NULL),
         lv AS (SELECT v, count(CASE WHEN isa THEN 1 END) AS ca,
                       count(CASE WHEN NOT isa THEN 1 END) AS cb
                FROM x GROUP BY v),
         w AS (SELECT ca, cb, ca + cb AS tot,
                      COALESCE(sum(ca + cb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
               FROM lv),
         t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
                      sum(ca::HUGEINT * (below * 2 + tot + 1)::HUGEINT) AS r2a,
                      sum(tot::HUGEINT * tot::HUGEINT * tot::HUGEINT - tot::HUGEINT) AS ties
               FROM w)
         SELECT na AS n_a, nb AS n_b,
                CAST(r2a - na::HUGEINT * (na + 1)::HUGEINT AS BIGINT) AS u2_a,
                CASE WHEN na > 0 AND nb > 0
                      AND (na::DOUBLE + nb::DOUBLE + 1)
                        - ties::DOUBLE / ((na::DOUBLE + nb::DOUBLE) * (na::DOUBLE + nb::DOUBLE - 1)) > 0
                     THEN CAST(round(((r2a - na::HUGEINT * (na + 1)::HUGEINT)::DOUBLE
                            - na::DOUBLE * nb::DOUBLE)
                          / (2 * sqrt(na::DOUBLE * nb::DOUBLE
                              * ((na::DOUBLE + nb::DOUBLE + 1)
                                - ties::DOUBLE / ((na::DOUBLE + nb::DOUBLE) * (na::DOUBLE + nb::DOUBLE - 1)))
                              / 12)) * 1e6) AS BIGINT)
                END AS z_micro
         FROM t""",
    // per-group term tree micro-quantized then BIGINT-summed, identical
    // to the Spark side's quantize-then-sum; one tie division at the end
    "q201_kruskal_wallis" ->
      """WITH gv AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v, count(*) AS c
              FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
              GROUP BY 1, 2),
         lv AS (SELECT v, sum(c) AS tot FROM gv GROUP BY v),
         rk AS (SELECT v, 2 * COALESCE(sum(tot) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + tot + 1 AS r2
                FROM lv),
         tt AS (SELECT CAST(sum(tot) AS BIGINT) AS nn,
                       sum(tot::HUGEINT * tot::HUGEINT * tot::HUGEINT - tot::HUGEINT) AS ties
                FROM lv),
         pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
                       sum(c::HUGEINT * r2::HUGEINT) AS r2g
                FROM gv JOIN rk USING (v) GROUP BY g),
         tm AS (SELECT CAST(round(12 * ng::DOUBLE
                    * (r2g::DOUBLE / (2 * ng::DOUBLE) - (nn::DOUBLE + 1) / 2)
                    * (r2g::DOUBLE / (2 * ng::DOUBLE) - (nn::DOUBLE + 1) / 2)
                    / (nn::DOUBLE * (nn::DOUBLE + 1)) * 1e6) AS BIGINT) AS t_micro,
                   nn, ties
                FROM pg, tt),
         agg AS (SELECT nn, ties, CAST(count(*) AS BIGINT) AS k,
                    CAST(sum(t_micro) AS BIGINT) AS h
                 FROM tm GROUP BY nn, ties)
         SELECT k AS n_groups, nn AS n_total, k - 1 AS dof,
                CASE WHEN nn >= 2
                      AND 1 - ties::DOUBLE / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE) > 0
                     THEN h END AS h_micro,
                CASE WHEN nn >= 2
                      AND 1 - ties::DOUBLE / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE) > 0
                     THEN CAST(round(h::DOUBLE
                          / (1 - ties::DOUBLE / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE))) AS BIGINT)
                END AS h_tie_micro
         FROM agg""",
    // the q200 machinery with the segment as an extra key on every
    // level/window/aggregate - identical z tree per segment
    "q205_mw_by_group" ->
      """WITH x AS (SELECT source AS g, (lang = 'en') AS isa,
                CAST(n_chars AS BIGINT) AS v
              FROM documents WHERE source IS NOT NULL
                AND lang IN ('en', 'de') AND n_chars IS NOT NULL),
         lv AS (SELECT g, v, count(CASE WHEN isa THEN 1 END) AS ca,
                       count(CASE WHEN NOT isa THEN 1 END) AS cb
                FROM x GROUP BY 1, 2),
         w AS (SELECT g, ca, cb, ca + cb AS tot,
                      COALESCE(sum(ca + cb) OVER (PARTITION BY g ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
               FROM lv),
         t AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
                      sum(ca::HUGEINT * (below * 2 + tot + 1)::HUGEINT) AS r2a,
                      sum(tot::HUGEINT * tot::HUGEINT * tot::HUGEINT - tot::HUGEINT) AS ties
               FROM w GROUP BY g)
         SELECT g AS source, na AS n_a, nb AS n_b,
                CAST(r2a - na::HUGEINT * (na + 1)::HUGEINT AS BIGINT) AS u2_a,
                CASE WHEN na > 0 AND nb > 0
                      AND (na::DOUBLE + nb::DOUBLE + 1)
                        - ties::DOUBLE / ((na::DOUBLE + nb::DOUBLE) * (na::DOUBLE + nb::DOUBLE - 1)) > 0
                     THEN CAST(round(((r2a - na::HUGEINT * (na + 1)::HUGEINT)::DOUBLE
                            - na::DOUBLE * nb::DOUBLE)
                          / (2 * sqrt(na::DOUBLE * nb::DOUBLE
                              * ((na::DOUBLE + nb::DOUBLE + 1)
                                - ties::DOUBLE / ((na::DOUBLE + nb::DOUBLE) * (na::DOUBLE + nb::DOUBLE - 1)))
                              / 12)) * 1e6) AS BIGINT)
                END AS z_micro
         FROM t ORDER BY source""",
    // same doubled signed midranks over |diff| levels; HUGEINT sums, the
    // identical z tree with the classical paired variance
    "q207_wilcoxon_signed" ->
      """WITH p AS (SELECT user_id,
                sum(CASE WHEN event_type = 'click' THEN CAST(round(value * 100) AS BIGINT) END) AS x,
                sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) END) AS y
              FROM events GROUP BY user_id),
         d0 AS (SELECT x - y AS d FROM p WHERE x IS NOT NULL AND y IS NOT NULL),
         np AS (SELECT CAST(count(*) AS BIGINT) AS npairs FROM d0),
         lv AS (SELECT abs(d) AS v, count(CASE WHEN d > 0 THEN 1 END) AS cp,
                       count(CASE WHEN d < 0 THEN 1 END) AS cn
                FROM d0 WHERE d <> 0 GROUP BY 1),
         w AS (SELECT cp, cn, cp + cn AS tot,
                      COALESCE(sum(cp + cn) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
               FROM lv),
         t AS (SELECT CAST(sum(tot) AS BIGINT) AS nn,
                      sum(cp::HUGEINT * (below * 2 + tot + 1)::HUGEINT) AS w2p,
                      sum(tot::HUGEINT * tot::HUGEINT * tot::HUGEINT - tot::HUGEINT) AS ties
               FROM w)
         SELECT np.npairs AS n_pairs,
                COALESCE(nn, 0) AS n_nonzero,
                CAST(COALESCE(w2p, 0) AS BIGINT) AS w2_plus,
                CASE WHEN nn >= 1
                      AND COALESCE(nn, 0)::DOUBLE * (COALESCE(nn, 0)::DOUBLE + 1) * (COALESCE(nn, 0)::DOUBLE * 2 + 1) / 24
                        - COALESCE(ties, 0)::DOUBLE / 48 > 0
                     THEN CAST(round((COALESCE(w2p::DOUBLE, 0) - COALESCE(nn, 0)::DOUBLE * (COALESCE(nn, 0)::DOUBLE + 1) / 2)
                          / (2 * sqrt(COALESCE(nn, 0)::DOUBLE * (COALESCE(nn, 0)::DOUBLE + 1) * (COALESCE(nn, 0)::DOUBLE * 2 + 1) / 24
                              - COALESCE(ties, 0)::DOUBLE / 48)) * 1e6) AS BIGINT)
                END AS z_micro
         FROM t, np""",
    // one conditional-sum scan over per-user pre/post spend, HUGEINT
    // moments, the identical theta/adjusted-diff/rho^2 trees
    "q208_cuped" ->
      """WITH raw AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
                epoch_us(ts) AS t
              FROM events WHERE user_id IS NOT NULL),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM raw),
         u AS (SELECT user_id,
                  COALESCE(sum(CASE WHEN t < mid THEN cents END), 0) AS x,
                  COALESCE(sum(CASE WHEN t >= mid THEN cents END), 0) AS y,
                  (user_id % 2 = 0) AS tr
               FROM raw, m GROUP BY user_id),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                  sum(x::HUGEINT * y::HUGEINT) AS sxy,
                  sum(x::HUGEINT * x::HUGEINT) AS sxx,
                  sum(y::HUGEINT * y::HUGEINT) AS syy,
                  CAST(count(CASE WHEN tr THEN 1 END) AS BIGINT) AS nt,
                  sum(CASE WHEN tr THEN x::HUGEINT END) AS sxt,
                  sum(CASE WHEN tr THEN y::HUGEINT END) AS syt,
                  CAST(count(CASE WHEN NOT tr THEN 1 END) AS BIGINT) AS nc,
                  sum(CASE WHEN NOT tr THEN x::HUGEINT END) AS sxc,
                  sum(CASE WHEN NOT tr THEN y::HUGEINT END) AS syc
               FROM u),
         f AS (SELECT *, (n::HUGEINT * sxy - sx * sy) AS num,
                  (n::HUGEINT * sxx - sx * sx) AS den,
                  (n::HUGEINT * syy - sy * sy) AS vy FROM s)
         SELECT nt AS n_treat, nc AS n_ctrl,
                CASE WHEN den > 0
                     THEN CAST(round(num::DOUBLE / den::DOUBLE * 1e6) AS BIGINT)
                END AS theta_micro,
                CASE WHEN nt > 0 AND nc > 0
                     THEN CAST(round((syt::DOUBLE / nt::DOUBLE - syc::DOUBLE / nc::DOUBLE) * 1e6) AS BIGINT)
                END AS diff_micro,
                CASE WHEN den > 0 AND nt > 0 AND nc > 0
                     THEN CAST(round(((syt::DOUBLE / nt::DOUBLE
                            - (num::DOUBLE / den::DOUBLE) * (sxt::DOUBLE / nt::DOUBLE - sx::DOUBLE / n::DOUBLE))
                          - (syc::DOUBLE / nc::DOUBLE
                            - (num::DOUBLE / den::DOUBLE) * (sxc::DOUBLE / nc::DOUBLE - sx::DOUBLE / n::DOUBLE))) * 1e6) AS BIGINT)
                END AS diff_cuped_micro,
                CASE WHEN den > 0 AND vy > 0
                     THEN CAST(round(num::DOUBLE * num::DOUBLE / (den::DOUBLE * vy::DOUBLE) * 1e6) AS BIGINT)
                END AS var_reduction_micro
         FROM f""",
    // block-partitioned doubled midranks (every window <= k rows), the
    // identical per-treatment term tree quantize-then-summed
    "q209_friedman" ->
      """WITH cells AS (SELECT user_id AS b, event_type AS t,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
                AND event_type IS NOT NULL
              GROUP BY 1, 2),
         k1 AS (SELECT count(DISTINCT t) AS k FROM cells),
         keepb AS (SELECT b FROM cells, k1 GROUP BY b, k
                   HAVING count(*) = k AND count(DISTINCT t) = k),
         r AS (SELECT cells.* FROM cells JOIN keepb USING (b)),
         lv AS (SELECT b, v, count(*) AS c FROM r GROUP BY 1, 2),
         lvr AS (SELECT b, v, COALESCE(sum(c) OVER (PARTITION BY b ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2 + c + 1 AS r2
                FROM lv),
         pt AS (SELECT t, sum(r2::HUGEINT) AS r2j FROM r JOIN lvr USING (b, v) GROUP BY t),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keepb),
         tt AS (SELECT COALESCE(sum(c::HUGEINT * c::HUGEINT * c::HUGEINT - c::HUGEINT), 0) AS ties FROM lv),
         tm AS (SELECT n, k, ties,
                  CAST(round(3 * (r2j::DOUBLE - n::DOUBLE * (k::DOUBLE + 1))
                       * (r2j::DOUBLE - n::DOUBLE * (k::DOUBLE + 1))
                       / (n::DOUBLE * k::DOUBLE * (k::DOUBLE + 1)) * 1e6) AS BIGINT) AS tmv
                FROM pt, nb, k1, tt),
         agg AS (SELECT n, k, ties, CAST(sum(tmv) AS BIGINT) AS chi2 FROM tm
                 GROUP BY n, k, ties)
         SELECT n AS n_blocks, CAST(k AS BIGINT) AS k, CAST(k - 1 AS BIGINT) AS dof,
                CASE WHEN k >= 2
                      AND 1 - ties::DOUBLE / (n::DOUBLE * k::DOUBLE * (k::DOUBLE * k::DOUBLE - 1)) > 0
                     THEN chi2 END AS chi2_micro,
                CASE WHEN k >= 2
                      AND 1 - ties::DOUBLE / (n::DOUBLE * k::DOUBLE * (k::DOUBLE * k::DOUBLE - 1)) > 0
                     THEN CAST(round(chi2::DOUBLE
                          / (1 - ties::DOUBLE / (n::DOUBLE * k::DOUBLE * (k::DOUBLE * k::DOUBLE - 1)))) AS BIGINT)
                END AS chi2_tie_micro
         FROM agg""",
    // same bounded per-group share tree, HUGEINT global sums, the
    // identical eta^2 -> F derivation from the summed micro long
    "q210_anova" ->
      """WITH x AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
         pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(v::HUGEINT) AS sg
                FROM x GROUP BY g),
         t AS (SELECT CAST(count(*) AS BIGINT) AS nn, sum(v::HUGEINT) AS s,
                      sum(v::HUGEINT * v::HUGEINT) AS sxx FROM x),
         tm AS (SELECT nn, sxx, s,
                  CASE WHEN sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                       THEN CAST(round(ng::DOUBLE
                            * (sg::DOUBLE / ng::DOUBLE - s::DOUBLE / nn::DOUBLE)
                            * (sg::DOUBLE / ng::DOUBLE - s::DOUBLE / nn::DOUBLE)
                            / (sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE) * 1e6) AS BIGINT)
                  END AS tmv
                FROM pg, t),
         agg AS (SELECT nn, sxx, s, CAST(count(*) AS BIGINT) AS k,
                    CAST(sum(tmv) AS BIGINT) AS e2
                 FROM tm GROUP BY nn, sxx, s)
         SELECT nn AS n_total, k, k - 1 AS dof_between, nn - k AS dof_within,
                CASE WHEN sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                     THEN e2 END AS eta2_micro,
                CASE WHEN k >= 2 AND nn > k
                      AND sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                      AND e2 < 1000000
                     THEN CAST(round((e2::DOUBLE / 1e6 / (k::DOUBLE - 1))
                          / ((1 - e2::DOUBLE / 1e6) / (nn::DOUBLE - k::DOUBLE)) * 1e6) AS BIGINT)
                END AS f_micro
         FROM agg""",
    // the q155 exact-2-median idiom feeds doubled deviations into the
    // identical q210 ANOVA chain
    "q211_brown_forsythe" ->
      """WITH x0 AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v0
              FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
         md AS (SELECT g, CAST(2 * median(v0) AS BIGINT) AS med2 FROM x0 GROUP BY g),
         x AS (SELECT x0.g, abs(v0 * 2 - med2) AS v FROM x0 JOIN md ON x0.g = md.g),
         pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(v::HUGEINT) AS sg
                FROM x GROUP BY g),
         t AS (SELECT CAST(count(*) AS BIGINT) AS nn, sum(v::HUGEINT) AS s,
                      sum(v::HUGEINT * v::HUGEINT) AS sxx FROM x),
         tm AS (SELECT nn, sxx, s,
                  CASE WHEN sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                       THEN CAST(round(ng::DOUBLE
                            * (sg::DOUBLE / ng::DOUBLE - s::DOUBLE / nn::DOUBLE)
                            * (sg::DOUBLE / ng::DOUBLE - s::DOUBLE / nn::DOUBLE)
                            / (sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE) * 1e6) AS BIGINT)
                  END AS tmv
                FROM pg, t),
         agg AS (SELECT nn, sxx, s, CAST(count(*) AS BIGINT) AS k,
                    CAST(sum(tmv) AS BIGINT) AS e2
                 FROM tm GROUP BY nn, sxx, s)
         SELECT nn AS n_total, k, k - 1 AS dof_between, nn - k AS dof_within,
                CASE WHEN sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                     THEN e2 END AS eta2_micro,
                CASE WHEN k >= 2 AND nn > k
                      AND sxx::DOUBLE - s::DOUBLE * s::DOUBLE / nn::DOUBLE > 0
                      AND e2 < 1000000
                     THEN CAST(round((e2::DOUBLE / 1e6 / (k::DOUBLE - 1))
                          / ((1 - e2::DOUBLE / 1e6) / (nn::DOUBLE - k::DOUBLE)) * 1e6) AS BIGINT)
                END AS f_micro
         FROM agg""",
    // exact order-statistic bounds in a (value, id) total order, clip,
    // one final division — mirrors Stats.winsorizedMean term for term
    "q227_winsorized_mean" ->
      """WITH e AS (SELECT event_type AS g, event_id AS id,
                CAST(round(value * 1e6) AS BIGINT) AS v
              FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
         p AS (SELECT g, v,
                row_number() OVER (PARTITION BY g ORDER BY v, id) AS p,
                count(*) OVER (PARTITION BY g) AS n
               FROM e),
         nk AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
                 CAST(max(n) * 10 // 100 AS BIGINT) AS k
                FROM p GROUP BY g),
         b AS (SELECT p.g,
                min(CASE WHEN p.p = nk.k + 1 THEN v END) AS lo_micro,
                min(CASE WHEN p.p = nk.n - nk.k THEN v END) AS hi_micro
               FROM p JOIN nk ON p.g = nk.g GROUP BY p.g)
         SELECT e.g AS event_type, nk.n, nk.k, b.lo_micro, b.hi_micro,
                CAST(sum(greatest(least(v, hi_micro), lo_micro)) AS BIGINT)
                  AS wsum_micro,
                CAST(round(sum(greatest(least(v, hi_micro), lo_micro))::DOUBLE
                  / nk.n::DOUBLE) AS BIGINT) AS wmean_micro
         FROM e JOIN b ON e.g = b.g JOIN nk ON e.g = nk.g
         GROUP BY e.g, nk.n, nk.k, b.lo_micro, b.hi_micro
         ORDER BY event_type""",
    // same cell counts, nano floor-divisions (// on non-negatives =
    // Spark's div), exact sums, one mirrored double division for κ
    "q234_fleiss_kappa" ->
      """WITH cells AS (SELECT l_orderkey AS i, l_returnflag AS k,
                CAST(count(*) AS BIGINT) AS c
              FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL
              GROUP BY 1, 2),
         items AS (SELECT i, CAST(sum(c) AS BIGINT) AS ni,
                 CAST(sum(c * c) AS BIGINT) AS ni2
               FROM cells GROUP BY i HAVING sum(c) >= 2),
         pi AS (SELECT i, ni,
                 CAST(((ni2 - ni)::HUGEINT * 1000000000) // (ni * (ni - 1))
                   AS BIGINT) AS pi_nano
                FROM items),
         pb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(ni) AS BIGINT) AS n_ratings,
                 CAST(sum(pi_nano) // count(*) AS BIGINT) AS pbar_nano
                FROM pi),
         marg AS (SELECT k, CAST(sum(c) AS BIGINT) AS nk
                  FROM cells JOIN pi USING (i) GROUP BY k),
         pe AS (SELECT CAST(coalesce(sum((nk::HUGEINT * nk * 1000000000)
                   // (N::HUGEINT * N)), 0) AS BIGINT) AS pe_nano
                FROM marg CROSS JOIN (SELECT n_ratings AS N FROM pb))
         SELECT n_items, n_ratings, pbar_nano, pe_nano,
                CASE WHEN pe_nano <> 1000000000 THEN
                  CAST(round((pbar_nano - pe_nano)::DOUBLE
                    / (1000000000 - pe_nano)::DOUBLE * 1e6) AS BIGINT)
                END AS kappa_micro
         FROM pb CROSS JOIN pe""",
    // same q26 token derivation, same per-row round(1e9*ln(n/1.5)) terms
    // summed exactly, same one final double expression for alpha
    "q239_zipf_alpha" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents),
         cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok
                 WHERE len(t) > 0 GROUP BY t),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
                  CAST(coalesce(sum(CAST(round(ln(n::DOUBLE / 1.5) * 1e9) AS BIGINT)), 0)
                    AS BIGINT) AS sum_ln_nano
                 FROM cnt WHERE n >= 2)
         SELECT n_tail, CAST(2 AS BIGINT) AS x_min, sum_ln_nano,
                CASE WHEN n_tail > 0 AND sum_ln_nano > 0 THEN
                  CAST(round((1 + n_tail::DOUBLE * 1e9 / sum_ln_nano::DOUBLE) * 1e6)
                    AS BIGINT)
                END AS alpha_micro
         FROM agg""",
    // same (value, id) total order, same integer ceil for k, the exact
    // k-th smallest — row_number replays the two-level rank positions
    "q236_conformal_threshold" ->
      """WITH e AS (SELECT event_type AS g, event_id AS id,
                CAST(round(value * 1e6) AS BIGINT) AS v
              FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
         p AS (SELECT g, v,
                row_number() OVER (PARTITION BY g ORDER BY v, id) AS p,
                count(*) OVER (PARTITION BY g) AS n
               FROM e),
         nk AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
                 CAST(((max(n) + 1) * 90 + 99) // 100 AS BIGINT) AS k
                FROM p GROUP BY g)
         SELECT nk.g AS event_type, nk.n, nk.k,
                CASE WHEN nk.k <= nk.n THEN
                  min(CASE WHEN p.p = nk.k THEN v END)
                END AS qhat_micro
         FROM p JOIN nk ON p.g = nk.g
         GROUP BY nk.g, nk.n, nk.k
         ORDER BY event_type""",
    // game construction replayed by the same lead window, then the MM
    // rounds unrolled as MATERIALIZED CTEs — pure HUGEINT floor division,
    // bit-identical to the Decimal(38,0) div path
    "q235_bradley_terry" -> btOracleSql(6),
    // identical to the q235 oracle - the pair table is the BT model's
    // sufficient statistic, so the standing-store fold must reproduce the
    // full-history strengths bit for bit (additive counts, exact longs)
    "q245_bt_incremental" -> btOracleSql(6),
  )

}
