package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Round-14 queries: the drift→FDR composed pipeline (the advertised
  * chain q164 + q161 were built for, oracle-checked END TO END). */
object Round14 {
  import Tables.t

  /** The q164 one-vs-rest KS CTE chain, factored so a multi-family FDR
    * composition can instantiate it per feature without 40-line
    * duplication. `pfx` namespaces the CTEs; `fromSql` supplies the
    * integerized (g, v) base select. Ends in `${pfx}ks(grp, p_micro)`. */
  private def duckKs(pfx: String, fromSql: String): String =
    s"""${pfx}base AS ($fromSql),
       |${pfx}pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t
       |      FROM ${pfx}base GROUP BY 1),
       |${pfx}pooled AS (SELECT v, CAST(sum(t) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cuma FROM ${pfx}pv),
       |${pfx}grps AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
       |      FROM ${pfx}base GROUP BY 1),
       |${pfx}tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM ${pfx}grps),
       |${pfx}cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |      FROM ${pfx}base GROUP BY 1, 2),
       |${pfx}dense AS (SELECT ${pfx}grps.g AS g, ng, ${pfx}pooled.v AS v,
       |        cuma, coalesce(c, 0) AS c0
       |      FROM ${pfx}grps CROSS JOIN ${pfx}pooled
       |      LEFT JOIN ${pfx}cells ON ${pfx}grps.g = ${pfx}cells.g
       |        AND ${pfx}pooled.v = ${pfx}cells.v),
       |${pfx}cum AS (SELECT g, ng, v, cuma,
       |        CAST(sum(c0) OVER (PARTITION BY g ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS BIGINT) AS cumg
       |      FROM ${pfx}dense),
       |${pfx}nm AS (SELECT g, ng, v, n,
       |        abs(cumg * (n - ng) - (cuma - cumg) * ng) AS num
       |      FROM ${pfx}cum CROSS JOIN ${pfx}tot),
       |${pfx}pick AS (SELECT g, ng, v, num, n,
       |        row_number() OVER (PARTITION BY g
       |          ORDER BY num DESC, v ASC) AS pick
       |      FROM ${pfx}nm),
       |${pfx}ks AS (SELECT g AS grp,
       |    CAST(round(1e6 * least(1.0, 2.0 * exp(
       |      -2.0 * (CAST(ng AS DOUBLE) * (n - ng) / n)
       |      * (CAST(num AS DOUBLE) / (CAST(ng AS DOUBLE) * (n - ng)))
       |      * (CAST(num AS DOUBLE) / (CAST(ng AS DOUBLE) * (n - ng)))
       |      ))) AS BIGINT) AS p_micro
       |  FROM ${pfx}pick WHERE pick = 1 AND ng < n AND ng > 0)""".stripMargin

  def defs: Seq[Q] = Seq(
    // ---- drift audit -> FDR-significant groups, end to end ---------------
    // the composed pipeline q164 and q161 advertise: TWO one-vs-rest KS
    // drift families (per-source document length, per-event-type value)
    // pooled into ONE BH family, adjusted together, significance read at
    // FDR q = 0.05. Scale posture is the components': value-grain KS
    // grids (ENFORCED compact), sharded GlobalRank rank + suffix-min for
    // BH — no corpus-grain window anywhere in the chain.
    Q("q166_drift_fdr", (s, d) => {
      val doclen = Stats.ksDriftOneVsRest(
          t(s, d, "documents"), "source", "n_chars", valScale = 1.0)
        .select(concat(lit("doclen:"), col("grp")).as("grp"),
          col("p_micro"))
      val evval = Stats.ksDriftOneVsRest(
          Tables.events(s, d), "event_type", "value", valScale = 10.0)
        .select(concat(lit("evval:"), col("grp")).as("grp"),
          col("p_micro"))
      Stats.bhAdjust(doclen.unionAll(evval), "grp", "p_micro")
        .withColumn("sig", col("p_adj_micro") <= 50000L)
    }, Some(s"""
      WITH ${duckKs("a", """SELECT CAST(source AS VARCHAR) AS g,
              CAST(round(n_chars * 1.0) AS BIGINT) AS v
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL""")},
      ${duckKs("b", """SELECT CAST(event_type AS VARCHAR) AS g,
              CAST(round(value * 10.0) AS BIGINT) AS v
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL""")},
      p AS (SELECT 'doclen:' || grp AS k, p_micro FROM aks
            UNION ALL
            SELECT 'evval:' || grp AS k, p_micro FROM bks),
      r AS (SELECT k, p_micro,
          CAST(row_number() OVER (ORDER BY p_micro, k) AS BIGINT) AS rn,
          CAST(count(*) OVER () AS BIGINT) AS m
        FROM p),
      v AS (SELECT k, p_micro, rn,
          least(1000000, CAST(round(m * CAST(p_micro AS DOUBLE) / rn)
            AS BIGINT)) AS v
        FROM r)
      SELECT k, p_micro, rn,
        CAST(min(v) OVER (ORDER BY rn DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS p_adj_micro,
        CAST(min(v) OVER (ORDER BY rn DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          <= 50000 AS sig
      FROM v""")))
}
