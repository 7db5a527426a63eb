package graft

/** DuckDB oracle SQL for the calibration family (q240/q241/q248/q249/q250
  * + the r15 loop-closers q255/q256/q257) — split from
  * [[QueriesStatsSql]] in r15 (VERDICT r14 next #7: that file crossed the
  * navigation guideline when the r14 calibration oracles landed). Every
  * key matches a [[QueriesStats.queries]] key; the driver enforces the
  * pairing, and RegistrySpec asserts the key sets line up. */
private[graft] object QueriesCalibrationSql {
  /** q248's oracle: the calib rows with o_orderkey carried for the rank
    * tie-break, the same ⌊(pos−1)·nBins/n⌋ rule via row_number. */
  private val calibQuantileOracleSql =
    """WITH e0 AS (SELECT o_orderkey AS id,
            CAST(least(1000000,
              (2001 - year(o_orderdate)) * 150000
              + month(o_orderdate) * 10000) AS BIGINT) AS p,
            (o_orderstatus = 'F') AS y
          FROM orders
          WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL),
       e AS (SELECT id, p, y FROM e0 WHERE p >= 0 AND p <= 1000000),
       r AS (SELECT p, y,
              row_number() OVER (ORDER BY p, id) AS pos,
              count(*) OVER () AS n
             FROM e)
       SELECT (pos - 1) * 10 // n AS bin,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
              CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                AS conf_micro,
              CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                / count(*)::DOUBLE) AS BIGINT) AS acc_micro,
              CAST(min(p) AS BIGINT) AS lo_micro,
              CAST(max(p) AS BIGINT) AS hi_micro
       FROM r GROUP BY 1 ORDER BY bin"""

  /** q240/q241/q257's shared row shape: the calibOrders micro score
    * replayed as a plain integer (the Spark side's double ÷10⁶ → ×10⁶
    * round-trip is exact by construction) plus the boolean outcome. */
  private val calibRowsSql =
    """WITH e0 AS (SELECT CAST(least(1000000,
            (2001 - year(o_orderdate)) * 150000
            + month(o_orderdate) * 10000) AS BIGINT) AS p,
          (o_orderstatus = 'F') AS y
         FROM orders
         WHERE o_orderdate IS NOT NULL AND o_orderstatus IS NOT NULL),
       e AS (SELECT p, y FROM e0 WHERE p >= 0 AND p <= 1000000)"""

  /** Shared by q240 (direct) and q257 (standing bin-state fold) — ONE
    * readout so the store-equivalence gate can never drift: the state is
    * the diagram's sufficient statistic, so the fold must reproduce the
    * full-history bins bit for bit (additive long sums). */
  private val reliabilityBinsOracleSql = calibRowsSql + """
         SELECT least(9, p * 10 // 1000000) AS bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
                CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro
         FROM e GROUP BY 1 ORDER BY bin"""

  /** q250/q255's shared zigzag fixture + PAVA CTEs: the same integer
    * u/threshold label construction, the same bins, the same prefix-sum
    * interval rates and minimax max_{i≤b} min_{j≥b}. `e` and `iso` are
    * MATERIALIZED — q255 references each several times and DuckDB
    * inlines plain CTEs (the q196 fd-exhaustion lesson). */
  private val zigzagIsoCtes =
    """WITH z0 AS (SELECT o_orderkey,
              CAST(least(1000000, (2001 - year(o_orderdate)) * 150000
                + month(o_orderdate) * 10000) AS BIGINT) AS pm
             FROM orders
             WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL),
         e AS MATERIALIZED (SELECT pm AS p,
                ((o_orderkey % 97) * 10309 % 100)
                  < (10 + pm * 60 // 1000000
                     + CASE WHEN (pm * 10 // 1000000) % 2 = 0
                         THEN 8 ELSE 0 END) AS y
               FROM z0 WHERE pm >= 0 AND pm <= 1000000),
         b AS MATERIALIZED (SELECT least(9, p * 10 // 1000000) AS bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
                CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro
               FROM e GROUP BY 1),
         pre AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cn,
                  sum(n_pos) OVER (ORDER BY bin) AS cp
                 FROM b),
         lo AS (SELECT bin AS i,
                 coalesce(lag(cn) OVER (ORDER BY bin), 0) AS cn0,
                 coalesce(lag(cp) OVER (ORDER BY bin), 0) AS cp0
                FROM pre),
         hi AS (SELECT bin AS j, cn AS cn1, cp AS cp1 FROM pre),
         m AS (SELECT i, j,
                CAST(round((cp1 - cp0)::DOUBLE * 1e6
                  / (cn1 - cn0)::DOUBLE) AS BIGINT) AS m
               FROM lo JOIN hi ON i <= j),
         mn1 AS (SELECT b.bin, m.i, min(m.m) AS mn
                 FROM m JOIN b ON m.i <= b.bin AND b.bin <= m.j
                 GROUP BY 1, 2),
         iso AS MATERIALIZED (SELECT bin, max(mn) AS iso_micro
                              FROM mn1 GROUP BY 1)"""

  val oracleSql: Map[String, String] = Map(
    // same integer micro score (the double round-trip is exact), same
    // min(nBins−1, ⌊p·nBins/10⁶⌋) binning, same one-division-per-statistic
    "q240_reliability_bins" -> reliabilityBinsOracleSql,
    // same bins, count-weighted |acc−conf| on HUGEINT (≡ Decimal(38,0)),
    // per-row squared micro residual for Brier, one final division each
    "q241_calibration_summary" -> (calibRowsSql + """,
         b AS (SELECT least(9, p * 10 // 1000000) AS bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
                CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro
               FROM e GROUP BY 1),
         ec AS (SELECT coalesce(sum(n), 0) AS n_rows,
                 coalesce(sum(n_pos), 0) AS n_pos,
                 sum(abs(acc_micro - conf_micro)::HUGEINT * n::HUGEINT) AS en
                FROM b),
         br AS (SELECT sum(((p - CASE WHEN y THEN 1000000 ELSE 0 END)
                  * (p - CASE WHEN y THEN 1000000 ELSE 0 END))::HUGEINT)
                  AS bn,
                 count(*) AS nb
                FROM e)
         SELECT CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_pos AS BIGINT) AS n_pos,
                CASE WHEN n_rows > 0 THEN
                  CAST(round(en::DOUBLE / n_rows::DOUBLE) AS BIGINT)
                END AS ece_micro,
                CASE WHEN nb > 0 THEN
                  CAST(round(bn::DOUBLE / nb::DOUBLE / 1e6) AS BIGINT)
                END AS brier_micro
         FROM ec CROSS JOIN br"""),
    // same rank rule (row_number over (p, id)), same per-bin statistics
    "q248_reliability_quantile" -> calibQuantileOracleSql,
    // same q240 bins, REL as the exact HUGEINT weighted square sum, RES
    // via the same algebraic expansion on the pre-rounded micro ybar
    "q249_brier_decomposition" -> (calibRowsSql + """,
         b AS (SELECT least(9, p * 10 // 1000000) AS bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
                CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro
               FROM e GROUP BY 1),
         a AS (SELECT coalesce(sum(n), 0) AS n_rows,
                coalesce(sum(n_pos), 0) AS n_pos,
                sum((acc_micro - conf_micro)::HUGEINT
                  * (acc_micro - conf_micro)::HUGEINT * n::HUGEINT) AS rel,
                sum(acc_micro::HUGEINT * n::HUGEINT) AS s1,
                sum(acc_micro::HUGEINT * acc_micro::HUGEINT * n::HUGEINT) AS s2
               FROM b),
         yb AS (SELECT *,
                 CASE WHEN n_rows > 0 THEN
                   CAST(round(n_pos::DOUBLE * 1e6 / n_rows::DOUBLE) AS BIGINT)
                 END AS ybar_micro
                FROM a)
         SELECT CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_pos AS BIGINT) AS n_pos, ybar_micro,
                CASE WHEN n_rows > 0 THEN
                  CAST(round(rel::DOUBLE / n_rows::DOUBLE / 1e6) AS BIGINT)
                END AS rel_micro,
                CASE WHEN n_rows > 0 THEN
                  CAST(round((s2 - 2::HUGEINT * ybar_micro::HUGEINT * s1
                      + n_rows::HUGEINT * ybar_micro::HUGEINT * ybar_micro::HUGEINT)::DOUBLE
                    / n_rows::DOUBLE / 1e6) AS BIGINT)
                END AS res_micro,
                CASE WHEN n_rows > 0 THEN
                  CAST(round(ybar_micro::DOUBLE * (1000000 - ybar_micro)::DOUBLE
                    / 1e6) AS BIGINT)
                END AS unc_micro
         FROM yb"""),
    // the zigzag fixture + PAVA minimax, read out as the remap table
    "q250_isotonic_calibration" -> (zigzagIsoCtes + """
         SELECT b.bin, b.n, b.n_pos, b.acc_micro, iso.iso_micro
         FROM b JOIN iso USING (bin) ORDER BY bin"""),
    // the remap APPLIED: every row re-scored by its fit-time bin's
    // iso_micro (the double ÷10⁶ → ×10⁶ round-trip is exact), then the
    // SAME summary re-run on the remapped score — before/after on one row
    "q255_isotonic_apply" -> (zigzagIsoCtes + """,
         be AS (SELECT coalesce(sum(n), 0) AS n_rows,
                 sum(abs(acc_micro - conf_micro)::HUGEINT * n::HUGEINT) AS en
                FROM b),
         bb AS (SELECT sum(((p - CASE WHEN y THEN 1000000 ELSE 0 END)
                  * (p - CASE WHEN y THEN 1000000 ELSE 0 END))::HUGEINT)
                  AS bn,
                 count(*) AS nb
                FROM e),
         ap AS MATERIALIZED (SELECT iso.iso_micro AS p2, e.y
               FROM e JOIN iso ON least(9, e.p * 10 // 1000000) = iso.bin),
         b2 AS (SELECT least(9, p2 * 10 // 1000000) AS bin,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
                CAST(round(sum(p2)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro
               FROM ap GROUP BY 1),
         ae AS (SELECT coalesce(sum(n), 0) AS n_rows,
                 sum(abs(acc_micro - conf_micro)::HUGEINT * n::HUGEINT) AS en
                FROM b2),
         ab AS (SELECT sum(((p2 - CASE WHEN y THEN 1000000 ELSE 0 END)
                  * (p2 - CASE WHEN y THEN 1000000 ELSE 0 END))::HUGEINT)
                  AS bn,
                 count(*) AS nb
                FROM ap)
         SELECT CAST(be.n_rows AS BIGINT) AS n_rows,
                CASE WHEN be.n_rows > 0 THEN
                  CAST(round(be.en::DOUBLE / be.n_rows::DOUBLE) AS BIGINT)
                END AS ece_before,
                CASE WHEN ae.n_rows > 0 THEN
                  CAST(round(ae.en::DOUBLE / ae.n_rows::DOUBLE) AS BIGINT)
                END AS ece_after,
                CASE WHEN bb.nb > 0 THEN
                  CAST(round(bb.bn::DOUBLE / bb.nb::DOUBLE / 1e6) AS BIGINT)
                END AS brier_before,
                CASE WHEN ab.nb > 0 THEN
                  CAST(round(ab.bn::DOUBLE / ab.nb::DOUBLE / 1e6) AS BIGINT)
                END AS brier_after
         FROM be CROSS JOIN ae CROSS JOIN bb CROSS JOIN ab"""),
    // per-lang ECE/Brier from ONE (lang, bin) cell table: same integer
    // binning, the squared micro residual summed per cell on HUGEINT,
    // both rollup divisions once per group
    "q256_calibration_by_group" ->
      """WITH e AS (SELECT lang,
              least(1000000, length(text) * 300) AS p,
              (doc_id % 100) < (least(1000000, length(text) * 300) * 80
                // 1000000 + 10) AS y
             FROM documents
             WHERE lang IS NOT NULL AND text IS NOT NULL
               AND doc_id IS NOT NULL),
         c AS (SELECT lang, least(9, p * 10 // 1000000) AS bin,
                count(*) AS n,
                count(CASE WHEN y THEN 1 END) AS n_pos,
                CAST(round(sum(p)::DOUBLE / count(*)::DOUBLE) AS BIGINT)
                  AS conf_micro,
                CAST(round(count(CASE WHEN y THEN 1 END)::DOUBLE * 1e6
                  / count(*)::DOUBLE) AS BIGINT) AS acc_micro,
                sum(((p - CASE WHEN y THEN 1000000 ELSE 0 END)
                  * (p - CASE WHEN y THEN 1000000 ELSE 0 END))::HUGEINT) AS sq
               FROM e GROUP BY 1, 2)
       SELECT lang, CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(sum(n_pos) AS BIGINT) AS n_pos,
              CAST(round(sum(abs(acc_micro - conf_micro)::HUGEINT
                  * n::HUGEINT)::DOUBLE / sum(n)::DOUBLE) AS BIGINT)
                AS ece_micro,
              CAST(round(sum(sq)::DOUBLE / sum(n)::DOUBLE / 1e6) AS BIGINT)
                AS brier_micro
       FROM c GROUP BY lang ORDER BY lang""",
    // identical to the q240 oracle — the bin state is the diagram's
    // sufficient statistic, so the standing-store fold must reproduce the
    // full-history bins bit for bit (additive counts, exact longs)
    "q257_calibration_ingest" -> reliabilityBinsOracleSql,
    // the zigzag bins + the SAME mirrored Newton rounds: σ micro-rounded
    // per (bin, round) from the fixed z tree, gradient/Hessian as exact
    // HUGEINT sums (≡ Decimal(38,0)), the 2×2 solve and nano update on
    // one shared double tree, unrolled as MATERIALIZED round CTEs
    "q259_platt_scaling" -> (zigzagIsoCtes + plattRoundCtes(6) + """
         SELECT tm.bin, tm.n, tm.n_pos, tm.acc_micro,
                CAST(round(1e6 / (1 + exp(-(r.a::DOUBLE
                    * tm.conf_micro::DOUBLE / 1e15 + r.b2::DOUBLE / 1e9))))
                  AS BIGINT) AS platt_micro
         FROM tm CROSS JOIN r""" + 6 + """ r ORDER BY bin"""),
  )

  /** The [[plattCalibration]] rounds unrolled for DuckDB, appended after
    * a CTE chain that defines `b` (bins with n/n_pos/conf_micro): `tt`
    * holds the totals, `tm` the bins with Platt's smoothed target mass
    * (micro-quantized once), `r0` the (0, base-rate-logit) start, and
    * each round k re-quantizes σ per bin, sums the exact HUGEINT
    * sufficient statistics, and solves the 2×2 Newton step on the same
    * double tree as the Scala side (skipped when the Hessian determinant
    * is not positive). */
  private def plattRoundCtes(rounds: Int): String = {
    val head = """,
         tt AS MATERIALIZED (SELECT coalesce(sum(n), 0) AS nt,
                coalesce(sum(n_pos), 0) AS pt
               FROM b),
         tm AS MATERIALIZED (SELECT bin, n, n_pos, conf_micro, acc_micro,
                CAST(round((n_pos::DOUBLE
                    * ((pt + 1)::DOUBLE / (pt + 2)::DOUBLE)
                  + (n - n_pos)::DOUBLE
                    * (1::DOUBLE / (nt - pt + 2)::DOUBLE)) * 1e6) AS BIGINT)
                  AS t
               FROM b CROSS JOIN tt),
         r0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a,
                CAST(round(ln((pt + 1)::DOUBLE / (nt - pt + 1)::DOUBLE)
                  * 1e9) AS BIGINT) AS b2
               FROM tt)"""
    val steps = (1 to rounds).map { k =>
      s""",
         p$k AS (SELECT tm.*,
                CAST(round(1e6 / (1 + exp(-(r.a::DOUBLE
                    * tm.conf_micro::DOUBLE / 1e15 + r.b2::DOUBLE / 1e9))))
                  AS BIGINT) AS p
               FROM tm CROSS JOIN r${k - 1} r),
         s$k AS (SELECT
                sum(n::HUGEINT * p::HUGEINT - t::HUGEINT) AS gb,
                sum((n::HUGEINT * p::HUGEINT - t::HUGEINT)
                  * conf_micro::HUGEINT) AS ga,
                sum(n::HUGEINT * p::HUGEINT
                  * (1000000::HUGEINT - p::HUGEINT)) AS hbb,
                sum(n::HUGEINT * p::HUGEINT * (1000000::HUGEINT - p::HUGEINT)
                  * conf_micro::HUGEINT) AS hab,
                sum(n::HUGEINT * p::HUGEINT * (1000000::HUGEINT - p::HUGEINT)
                  * conf_micro::HUGEINT * conf_micro::HUGEINT) AS haa
               FROM p$k),
         d$k AS (SELECT r.a, r.b2,
                ga::DOUBLE / 1e12 AS ga2, gb::DOUBLE / 1e6 AS gb2,
                haa::DOUBLE / 1e24 AS haa2, hab::DOUBLE / 1e18 AS hab2,
                hbb::DOUBLE / 1e12 AS hbb2
               FROM s$k CROSS JOIN r${k - 1} r),
         r$k AS MATERIALIZED (SELECT
                CASE WHEN haa2 * hbb2 - hab2 * hab2 > 1e-9 * haa2 * hbb2
                  THEN a - CAST(round((hbb2 * ga2 - hab2 * gb2)
                    / (haa2 * hbb2 - hab2 * hab2) * 1e9) AS BIGINT)
                  ELSE a END AS a,
                CASE WHEN haa2 * hbb2 - hab2 * hab2 > 1e-9 * haa2 * hbb2
                  THEN b2 - CAST(round((haa2 * gb2 - hab2 * ga2)
                    / (haa2 * hbb2 - hab2 * hab2) * 1e9) AS BIGINT)
                  ELSE b2 END AS b2
               FROM d$k)"""
    }.mkString
    head + steps
  }
}
