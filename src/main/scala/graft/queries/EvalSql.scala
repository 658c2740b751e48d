package graft.queries

/** Shared DuckDB replay of [[graft.quality.Eval.perClassMetrics]]:
  * wraps any predictions SQL in the per-class one-vs-rest counting +
  * exact milli-metric arithmetic (labels cast to VARCHAR on both
  * engines so class ordering agrees). */
object EvalSql {

  /** `predsSql` must yield columns `tCol` (truth) and `pCol`
    * (prediction). */
  def over(predsSql: String, tCol: String, pCol: String): String =
    s"""WITH preds AS ($predsSql),
       |base AS (SELECT CAST($tCol AS VARCHAR) AS t, CAST($pCol AS VARCHAR) AS p FROM preds),
       |cls AS (SELECT t AS lab FROM base UNION SELECT p FROM base),
       |tpt AS (SELECT t AS lab, count(*) AS tp FROM base WHERE t = p GROUP BY 1),
       |pm AS (SELECT p AS lab, count(*) AS n_pred FROM base GROUP BY 1),
       |tm AS (SELECT t AS lab, count(*) AS n_true FROM base GROUP BY 1),
       |j AS (
       |  SELECT c.lab, coalesce(tp, 0) AS tp, coalesce(n_pred, 0) AS n_pred,
       |         coalesce(n_true, 0) AS n_true
       |  FROM cls c LEFT JOIN tpt USING (lab) LEFT JOIN pm USING (lab)
       |  LEFT JOIN tm USING (lab))
       |SELECT lab, tp, n_pred - tp AS fp, n_true - tp AS fn,
       |       CASE WHEN n_pred = 0 THEN 0 ELSE (tp * 1000) // n_pred END AS precision_milli,
       |       CASE WHEN n_true = 0 THEN 0 ELSE (tp * 1000) // n_true END AS recall_milli,
       |       CASE WHEN n_pred + n_true = 0 THEN 0
       |            ELSE (2 * tp * 1000) // (n_pred + n_true) END AS f1_milli
       |FROM j""".stripMargin
}
