"""Statistical inference & drift-diagnostics operators (round 9, late batch).

Companions to plans/warehouse.py's time-series family, all over the same
per-type daily/hourly cell frames and all under the repo's determinism
discipline (DETERMINISM.md): exact int64 statistics, cross-multiplied
integer significance verdicts (no libm p-values — ln/χ² critical values
enter only as literal integer constants, rule 4), at most one final
float division (and IEEE-exact sqrt) per emitted double.

- events_mann_whitney   — tie-corrected rank-sum location-shift test
                          (early vs late half of each type's daily series)
- events_pettitt_change — rank-based single change-point + significance
- events_runs_test      — Wald-Wolfowitz randomness of above/below-median runs
- events_page_hinkley   — non-resetting Page-Hinkley drift alarm profile
- events_hurst_rs       — rescaled-range persistence across dyadic scales
- events_von_neumann    — successive-difference ratio (magnitude-aware serial corr.)
- events_turning_points — local-extrema count randomness test
- events_cox_stuart     — paired-half sign test for monotone trend

Reference scope note: the Kafka Connect S3 sink (reference repo) has no
statistics surface; these are §2B training-pipeline diagnostics (drift /
change detection on ingestion telemetry), built on the same partitioned
cell frames as the connector-parity rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

Z2_04 = 38416  # z²·10⁴ at two-sided α=0.05 (1.96²) — shared with mann_kendall
LN40_05 = 368888  # ln(2/0.05)·10⁵ = 3.68888...: Pettitt's α=0.05 cut


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, x=day index, y=count) daily cells — the mann_kendall /
    theil_sen frame, metadata-sized (|types|·|days|), localCheckpointed
    because every consumer fans it into ≥2 sides."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
    )
    return (
        ev.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)
    )


SQL_DAILY = """
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_mann_whitney — early-vs-late location shift, tie-corrected
# ---------------------------------------------------------------------------


def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U location-shift test between the EARLY and LATE half
    of each type's daily-volume series (split at the midpoint of the
    type's day range, the ks_drift convention: 2x < mn+mx is
    integer-exact). Midranks over tied counts stay integral doubled:
    r2 = 2·cum_before + t + 1, so 2·R1 = Σ ca·r2 and d = 2U1 − n1·n2 are
    exact int64. The tie-corrected z² is the single exact division
    3·d²·n(n−1) / (n1·n2·(n³−n−ΣT)), ΣT = Σ t(t−1)(t+1), and the α=0.05
    verdict is the all-int64 cross-multiplied rule
    3·10⁴·d²·n(n−1) > 38416·n1·n2·(n³−n−ΣT) — no sqrt, no normal CDF.
    Read together with events_ks_drift: KS asks "did the value
    DISTRIBUTION drift", this asks "did the daily VOLUME level shift".

    Scale: everything after the daily rollup is |types|·|days| metadata.
    The int64 verdict product is bounded by 3·10⁴·(n1n2)²·n² — safe to
    ~1.2k daily cells per type (n=366 here); past that, emit z² only
    (documented bound, the mann_kendall S² class)."""
    daily = _daily(spark, sf_dir)
    bounds = daily.groupBy("event_type").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    sided = daily.join(bounds, "event_type").select(
        "event_type",
        "y",
        F.when(F.lit(2) * F.col("x") < F.col("mn") + F.col("mx"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("early"),
    )
    cells = sided.groupBy("event_type", "y").agg(
        F.sum("early").alias("ca"),
        F.sum(F.lit(1) - F.col("early")).alias("cb"),
    )
    wv = Window.partitionBy("event_type").orderBy("y")
    ranked = (
        cells.withColumn("t", F.col("ca") + F.col("cb"))
        .withColumn(
            "cumbef",
            F.coalesce(
                F.sum("t").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("r2", F.lit(2) * F.col("cumbef") + F.col("t") + F.lit(1))
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(F.col("ca") * F.col("r2")).alias("r1_2"),
        F.sum(F.col("t") * (F.col("t") - 1) * (F.col("t") + 1)).alias("tie_sum"),
    )
    out = (
        agg.where((F.col("n1") > 0) & (F.col("n2") > 0))
        .withColumn("n", F.col("n1") + F.col("n2"))
        .withColumn("u2", F.col("r1_2") - F.col("n1") * (F.col("n1") + 1))
        .withColumn("d", F.col("u2") - F.col("n1") * F.col("n2"))
        .withColumn(
            "varden",
            F.col("n1")
            * F.col("n2")
            * (
                F.col("n") * F.col("n") * F.col("n")
                - F.col("n")
                - F.col("tie_sum")
            ),
        )
        .withColumn(
            "sig",
            F.lit(30000)
            * F.col("d")
            * F.col("d")
            * F.col("n")
            * (F.col("n") - 1)
            > F.lit(Z2_04) * F.col("varden"),
        )
    )
    return out.select(
        "event_type",
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.col("u2").alias("u2_stat"),
        "tie_sum",
        F.when(
            F.col("varden") > 0,
            (
                F.lit(3) * F.col("d") * F.col("d") * F.col("n") * (F.col("n") - 1)
            ).cast("double")
            / F.col("varden").cast("double"),
        ).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("d") > 0), F.lit("early_higher"))
        .when(F.col("sig") & (F.col("d") < 0), F.lit("late_higher"))
        .otherwise(F.lit("none"))
        .alias("shift"),
    )


SQL_EVENTS_MANN_WHITNEY = f"""
WITH mwdaily AS ({SQL_DAILY}),
mwb AS (
  SELECT event_type, MIN(x) AS mn, MAX(x) AS mx FROM mwdaily GROUP BY 1
),
mwsided AS (
  SELECT d.event_type, d.y,
         CASE WHEN 2 * d.x < b.mn + b.mx THEN 1 ELSE 0 END AS early
  FROM mwdaily d JOIN mwb b USING (event_type)
),
mwcells AS (
  SELECT event_type, y,
         CAST(SUM(early) AS BIGINT) AS ca,
         CAST(SUM(1 - early) AS BIGINT) AS cb
  FROM mwsided GROUP BY 1, 2
),
mwrank AS (
  SELECT event_type, ca, cb, ca + cb AS t,
         2 * COALESCE(SUM(ca + cb) OVER (
               PARTITION BY event_type ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (ca + cb) + 1 AS r2
  FROM mwcells
),
mwagg AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS n1,
         CAST(SUM(cb) AS BIGINT) AS n2,
         CAST(SUM(ca * r2) AS BIGINT) AS r1_2,
         CAST(SUM(t * (t - 1) * (t + 1)) AS BIGINT) AS tie_sum
  FROM mwrank GROUP BY 1
),
mwstat AS (
  SELECT event_type, n1, n2, tie_sum, n1 + n2 AS n,
         r1_2 - n1 * (n1 + 1) AS u2,
         r1_2 - n1 * (n1 + 1) - n1 * n2 AS d,
         n1 * n2 * ((n1 + n2) * (n1 + n2) * (n1 + n2) - (n1 + n2) - tie_sum)
           AS varden
  FROM mwagg WHERE n1 > 0 AND n2 > 0
)
SELECT event_type,
       n1 AS n_early, n2 AS n_late,
       u2 AS u2_stat, tie_sum,
       CASE WHEN varden > 0
            THEN CAST(3 * d * d * n * (n - 1) AS DOUBLE) / CAST(varden AS DOUBLE)
       END AS z2_stat,
       CASE WHEN 30000 * d * d * n * (n - 1) > {Z2_04} * varden AND d > 0
            THEN 'early_higher'
            WHEN 30000 * d * d * n * (n - 1) > {Z2_04} * varden AND d < 0
            THEN 'late_higher'
            ELSE 'none' END AS shift
FROM mwstat
"""

QUERIES["events_mann_whitney"] = events_mann_whitney
ORACLES["events_mann_whitney"] = SQL_EVENTS_MANN_WHITNEY


# ---------------------------------------------------------------------------
# events_pettitt_change — rank-based single change-point
# ---------------------------------------------------------------------------


def events_pettitt_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric change-point on each type's daily series.
    U_t = Σ_{i≤t}Σ_{j>t} sign(y_i − y_j) is built without the cubic
    triple sum via the exact recurrence U_t − U_{t−1} = V_t where
    V_t = Σ_{j≠t} sign(y_t − y_j): one all-pairs join per type on the
    checkpointed daily frame (the mann_kendall fan-out), one running sum.
    K = max|U_t| over t < n; the change day is the earliest attaining K.
    Significance uses Pettitt's p ≈ 2·exp(−6K²/(n³+n²)) < 0.05 rewritten
    without exp: 6K²/(n³+n²) > ln(40), i.e. the all-int64 rule
    6·10⁵·K² > 368888·(n³+n²) (ln(40)·10⁵ as a literal constant —
    DETERMINISM.md rule 4's Benford treatment). stat = 6K²/(n³+n²) is
    emitted as ONE exact division for inspection.

    Scale: |days|² pairs per type on metadata-sized cells; K ≤ n²/4 keeps
    6·10⁵·K² in int64 to n ≈ 10⁴ daily cells — two orders above any
    per-type daily series."""
    daily = _daily(spark, sf_dir)
    a = daily.select("event_type", F.col("x").alias("xt"), F.col("y").alias("yt"))
    b = daily.select("event_type", F.col("x").alias("xj"), F.col("y").alias("yj"))
    v = (
        a.join(b, "event_type")
        .where(F.col("xj") != F.col("xt"))
        .groupBy("event_type", "xt")
        .agg(
            F.sum(
                F.when(F.col("yt") > F.col("yj"), F.lit(1))
                .when(F.col("yt") < F.col("yj"), F.lit(-1))
                .otherwise(F.lit(0))
            ).alias("v")
        )
    )
    # single-day types produce no pairs: re-anchor on the full day list so
    # n_days still counts them (U is then empty -> no output row, like MK's
    # degenerate n=1 varnum=0 class -> keep n>=2 only)
    wt = Window.partitionBy("event_type").orderBy("xt")
    u = (
        v.withColumn(
            "u",
            F.sum("v").over(wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .withColumn("rn", F.row_number().over(wt))
        .withColumn("nn", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
        .where(F.col("rn") < F.col("nn"))  # U_n = 0 by antisymmetry; excluded
        .withColumn("absu", F.abs("u"))
        .withColumn(
            "k", F.max("absu").over(Window.partitionBy("event_type"))
        )
    )
    best = (
        u.where(F.col("absu") == F.col("k"))
        .groupBy("event_type", "k", "nn")
        .agg(F.min("xt").alias("change_x"))
        .join(
            u.select("event_type", F.col("xt").alias("change_x"), F.col("u").alias("u_at")),
            ["event_type", "change_x"],
        )
    )
    return best.select(
        "event_type",
        F.col("nn").alias("n_days"),
        F.col("k").alias("k_stat"),
        "change_x",
        F.col("u_at").alias("u_at_change"),
        (
            (F.lit(6) * F.col("k") * F.col("k")).cast("double")
            / (
                F.col("nn") * F.col("nn") * F.col("nn") + F.col("nn") * F.col("nn")
            ).cast("double")
        ).alias("stat"),
        (
            F.lit(600000) * F.col("k") * F.col("k")
            > F.lit(LN40_05)
            * (F.col("nn") * F.col("nn") * F.col("nn") + F.col("nn") * F.col("nn"))
        ).alias("significant"),
    )


SQL_EVENTS_PETTITT = f"""
WITH ptdaily AS ({SQL_DAILY}),
ptv AS (
  SELECT a.event_type, a.x AS xt,
         CAST(SUM(CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1 ELSE 0 END)
              AS BIGINT) AS v
  FROM ptdaily a JOIN ptdaily b
    ON a.event_type = b.event_type AND b.x <> a.x
  GROUP BY 1, 2
),
ptu AS (
  SELECT event_type, xt,
         CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY xt) AS BIGINT) AS u,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY xt) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nn
  FROM ptv
),
ptk AS (
  SELECT event_type, xt, u, nn, ABS(u) AS absu,
         MAX(ABS(u)) OVER (PARTITION BY event_type) AS k
  FROM ptu WHERE rn < nn
),
ptbest AS (
  SELECT event_type, k, nn, MIN(xt) AS change_x
  FROM ptk WHERE absu = k GROUP BY 1, 2, 3
)
SELECT b.event_type,
       CAST(b.nn AS BIGINT) AS n_days,
       b.k AS k_stat,
       b.change_x,
       u.u AS u_at_change,
       CAST(6 * b.k * b.k AS DOUBLE)
         / CAST(b.nn * b.nn * b.nn + b.nn * b.nn AS DOUBLE) AS stat,
       600000 * b.k * b.k > {LN40_05} * (b.nn * b.nn * b.nn + b.nn * b.nn)
         AS significant
FROM ptbest b JOIN ptk u
  ON b.event_type = u.event_type AND b.change_x = u.xt
"""

QUERIES["events_pettitt_change"] = events_pettitt_change
ORACLES["events_pettitt_change"] = SQL_EVENTS_PETTITT


# ---------------------------------------------------------------------------
# events_runs_test — Wald-Wolfowitz randomness of the daily series
# ---------------------------------------------------------------------------


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on each type's daily volumes dichotomized
    about the exact median (2y vs med2 keeps the comparison integral;
    days AT the median are dropped — the standard treatment). R = number
    of sign runs; with μ = 2n1n2/n + 1 and
    σ² = 2n1n2(2n1n2−n)/(n²(n−1)), z² is the exact rational
    (Rn − 2n1n2 − n)²·(n−1) / (2n1n2(2n1n2−n)) — integer numerator and
    denominator, ONE final division — and the α=0.05 verdict is the
    cross-multiplied int64 rule num·10⁴ > 38416·den. Too FEW runs =
    clustering (regime persistence), too MANY = oscillation; the signed
    direction is emitted alongside the verdict.

    Scale: one daily rollup, one exact-median pass, one lag over
    metadata-sized cells. num ≤ (Rn)²·n ≤ n⁵ keeps int64 to ~4k daily
    cells per type."""
    daily = _daily(spark, sf_dir)
    med = daily.groupBy("event_type").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("med2")
    )
    marked = (
        daily.join(med, "event_type")
        .where(F.lit(2) * F.col("y") != F.col("med2"))
        .withColumn(
            "s", F.when(F.lit(2) * F.col("y") > F.col("med2"), F.lit(1)).otherwise(F.lit(0))
        )
    )
    wd = Window.partitionBy("event_type").orderBy("x")
    runs = (
        marked.withColumn("prev", F.lag("s").over(wd))
        .withColumn(
            "newrun",
            F.when(F.col("prev").isNull() | (F.col("prev") != F.col("s")), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .groupBy("event_type")
        .agg(
            F.sum("newrun").alias("r"),
            F.sum("s").alias("n1"),
            F.sum(F.lit(1) - F.col("s")).alias("n2"),
        )
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .withColumn("n", F.col("n1") + F.col("n2"))
        .withColumn(
            "dnum",
            F.col("r") * F.col("n") - F.lit(2) * F.col("n1") * F.col("n2") - F.col("n"),
        )
        .withColumn(
            "den",
            F.lit(2)
            * F.col("n1")
            * F.col("n2")
            * (F.lit(2) * F.col("n1") * F.col("n2") - F.col("n")),
        )
        .withColumn("num", F.col("dnum") * F.col("dnum") * (F.col("n") - 1))
    )
    return runs.select(
        "event_type",
        F.col("r").alias("runs"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.when(
            F.col("den") > 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("z2_stat"),
        F.when(
            (F.lit(10000) * F.col("num") > F.lit(Z2_04) * F.col("den"))
            & (F.col("dnum") < 0),
            F.lit("clustered"),
        )
        .when(
            (F.lit(10000) * F.col("num") > F.lit(Z2_04) * F.col("den"))
            & (F.col("dnum") > 0),
            F.lit("oscillating"),
        )
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


SQL_EVENTS_RUNS_TEST = f"""
WITH rtdaily AS ({SQL_DAILY}),
rtmed AS (
  SELECT event_type, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
  FROM rtdaily GROUP BY 1
),
rtmark AS (
  SELECT d.event_type, d.x,
         CASE WHEN 2 * d.y > m.med2 THEN 1 ELSE 0 END AS s
  FROM rtdaily d JOIN rtmed m USING (event_type)
  WHERE 2 * d.y <> m.med2
),
rtlag AS (
  SELECT event_type, s,
         LAG(s) OVER (PARTITION BY event_type ORDER BY x) AS prev
  FROM rtmark
),
rtagg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(SUM(1 - s) AS BIGINT) AS n2
  FROM rtlag GROUP BY 1
),
rtstat AS (
  SELECT event_type, r, n1, n2, n1 + n2 AS n,
         r * (n1 + n2) - 2 * n1 * n2 - (n1 + n2) AS dnum,
         2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS den
  FROM rtagg WHERE n1 > 0 AND n2 > 0
)
SELECT event_type,
       r AS runs, n1 AS n_above, n2 AS n_below,
       CASE WHEN den > 0
            THEN CAST(dnum * dnum * (n - 1) AS DOUBLE) / CAST(den AS DOUBLE)
       END AS z2_stat,
       CASE WHEN 10000 * dnum * dnum * (n - 1) > {Z2_04} * den AND dnum < 0
            THEN 'clustered'
            WHEN 10000 * dnum * dnum * (n - 1) > {Z2_04} * den AND dnum > 0
            THEN 'oscillating'
            ELSE 'random' END AS verdict
FROM rtstat
"""

QUERIES["events_runs_test"] = events_runs_test
ORACLES["events_runs_test"] = SQL_EVENTS_RUNS_TEST


# ---------------------------------------------------------------------------
# events_page_hinkley — sequential drift alarm profile
# ---------------------------------------------------------------------------


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hr, y) hourly cells, the burst/hampel frame."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", (F.unix_millis("ts") / F.lit(3600000)).cast("long").alias("hr")
    )
    return (
        ev.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)
    )


SQL_HOURLY = """
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
"""


def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-resetting Page-Hinkley upward-drift profile on each type's
    hourly volumes. The classical sequential statistic
    m_t = Sigma_{i<=t}(x_i - xbar_i) (delta = 0) is built declaratively:
    xbar_i, the running mean INCLUSIVE of row i, is quantized to exact
    micro-units via integer division (S_i*10^6 div i -- truncation
    identical on both engines, DETERMINISM.md rule 8), every term and the
    running min M_t = min_{s<=t} m_s stay int64, and the alarm rule
    PH_t = m_t - M_t > lambda fires against the scale-adaptive threshold
    lambda = overall_mean/2 in the same micro-units
    (S_n*10^6 div 2n -- no tuning constant leaves integer space).
    Emitted per type: alarm count, first alarm hour, and the peak PH
    excursion (micro int + ONE final /1e6 division). The alarm count is
    the number of hours the statistic sits above lambda (the
    non-resetting profile -- a detect-and-reset variant is a stateful
    streaming twin, not a batch oracle).

    Scale: windows over metadata-sized hourly cells; S_i*10^6 caps the
    int64 path at ~9*10^12 events per type (far above the 100 TB
    design point's per-type hourly series)."""
    cells = _hourly(spark, sf_dir)
    wt = Window.partitionBy("event_type").orderBy("hr")
    wrun = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ph = (
        cells.withColumn("i", F.row_number().over(wt))
        .withColumn("s", F.sum("y").over(wrun))
        .withColumn(
            "term",
            F.col("y") * F.lit(1000000)
            - F.expr("(s * 1000000) div i"),
        )
        .withColumn("m", F.sum("term").over(wrun))
        .withColumn("runmin", F.min("m").over(wrun))
        .withColumn("ph", F.col("m") - F.col("runmin"))
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("y").alias("sn"), F.count(F.lit(1)).alias("n_hours")
    ).withColumn("lam", F.expr("(sn * 1000000) div (2 * n_hours)"))
    return (
        ph.join(tot, "event_type")
        .groupBy("event_type", "n_hours", "lam")
        .agg(
            F.sum(F.when(F.col("ph") > F.col("lam"), F.lit(1)).otherwise(F.lit(0))).alias(
                "n_alarms"
            ),
            F.min(F.when(F.col("ph") > F.col("lam"), F.col("hr"))).alias(
                "first_alarm_hr"
            ),
            F.max("ph").alias("max_ph_micro"),
        )
        .select(
            "event_type",
            "n_hours",
            F.col("lam").alias("lambda_micro"),
            "n_alarms",
            "first_alarm_hr",
            "max_ph_micro",
            (F.col("max_ph_micro").cast("double") / F.lit(1000000.0)).alias("max_ph"),
        )
    )


SQL_EVENTS_PAGE_HINKLEY = f"""
WITH phcells AS ({SQL_HOURLY}),
phrun AS (
  SELECT event_type, hr, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS s
  FROM phcells
),
phm AS (
  SELECT event_type, hr,
         CAST(SUM(y * 1000000 - (s * 1000000) // i)
              OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS m
  FROM phrun
),
phx AS (
  SELECT event_type, hr, m,
         CAST(MIN(m) OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT)
           AS runmin
  FROM phm
),
phtot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS sn,
         CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM phcells GROUP BY 1
),
phl AS (
  SELECT event_type, sn, n_hours,
         (sn * 1000000) // (2 * n_hours) AS lam
  FROM phtot
)
SELECT p.event_type, l.n_hours, l.lam AS lambda_micro,
       CAST(SUM(CASE WHEN p.m - p.runmin > l.lam THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       MIN(CASE WHEN p.m - p.runmin > l.lam THEN p.hr END) AS first_alarm_hr,
       CAST(MAX(p.m - p.runmin) AS BIGINT) AS max_ph_micro,
       CAST(MAX(p.m - p.runmin) AS DOUBLE) / 1000000.0 AS max_ph
FROM phx p JOIN phl l USING (event_type)
GROUP BY 1, 2, 3
"""

QUERIES["events_page_hinkley"] = events_page_hinkley
ORACLES["events_page_hinkley"] = SQL_EVENTS_PAGE_HINKLEY


# ---------------------------------------------------------------------------
# events_hurst_rs — rescaled-range persistence across dyadic scales
# ---------------------------------------------------------------------------

HURST_SIZES = (8, 16, 32, 64)


def events_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis of each type's hourly series at the
    dyadic block sizes 8/16/32/64. Per complete block of b consecutive
    present hours: the range R of cumulative deviations is exact scaled
    int64 (b*P_i - i*S_b, clearing the mean's denominator), S is the
    population sd sqrt(b*Sigma y^2 - S_b^2)/b, and R/S collapses to
    rb / sqrt(varnum) -- ONE IEEE-exact sqrt and ONE division, quantized
    to micro-units (floor(x*10^6+0.5), rule 3) before the cross-block
    mean (rule 16: sum ints, divide once). Random walks have
    R/S ~ c*sqrt(b), so persistence (Hurst H > 1/2) is the SQRT-FREE
    integer verdict a64^2 > 8*a8^2 on the rounded-int mean micro R/S at
    b=64 vs b=8 (a = (2*sum+n) div 2n) -- comparing against the exact
    eightfold ratio that H = 1/2 predicts over the 8x scale span.

    Scale: the block fan-out is 4 rows per hourly cell (rule 17 -- no
    inequality join); every downstream frame is metadata-sized. The
    double product rb*10^6 stays exact below 2^53 for per-block sums to
    ~10^9 events -- far above any 64-hour window."""
    cells = _hourly(spark, sf_dir)
    wt = Window.partitionBy("event_type").orderBy("hr")
    idx = cells.withColumn("rn", F.row_number().over(wt))
    fan = idx.withColumn(
        "b", F.explode(F.array(*[F.lit(b) for b in HURST_SIZES]))
    ).withColumn("g", F.expr("(rn - 1) div b"))
    wg = Window.partitionBy("event_type", "b", "g").orderBy("rn")
    wgall = Window.partitionBy("event_type", "b", "g")
    blocks = (
        fan.withColumn("i", F.row_number().over(wg))
        .withColumn(
            "p", F.sum("y").over(wg.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        .withColumn("sb", F.sum("y").over(wgall))
        .withColumn("sumsq", F.sum(F.col("y") * F.col("y")).over(wgall))
        .withColumn("cnt", F.count(F.lit(1)).over(wgall))
        .where(F.col("cnt") == F.col("b"))
        .withColumn("dev", F.col("b") * F.col("p") - F.col("i") * F.col("sb"))
    )
    per_block = (
        blocks.groupBy("event_type", "b", "g")
        .agg(
            (F.max("dev") - F.min("dev")).alias("rb"),
            (F.first("b") * F.first("sumsq") - F.first("sb") * F.first("sb")).alias(
                "varnum"
            ),
        )
        .where(F.col("varnum") > 0)
        .withColumn(
            "rs_micro",
            F.floor(
                F.col("rb").cast("double") * F.lit(1000000.0) / F.sqrt(F.col("varnum").cast("double"))
                + F.lit(0.5)
            ),
        )
    )
    per_size = per_block.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("rs_micro").alias("sum_rs"),
    ).withColumn(
        "a_int", F.expr("(2 * sum_rs + n_blocks) div (2 * n_blocks)")
    )

    def _pick(b: int, col: str):
        return F.max(F.when(F.col("b") == b, F.col(col)))

    wide = per_size.groupBy("event_type").agg(
        *[
            (_pick(b, "sum_rs").cast("double") / _pick(b, "n_blocks").cast("double")).alias(
                f"rs{b}"
            )
            for b in HURST_SIZES
        ],
        _pick(8, "n_blocks").alias("n_blocks8"),
        _pick(64, "n_blocks").alias("n_blocks64"),
        _pick(8, "a_int").alias("a8"),
        _pick(64, "a_int").alias("a64"),
    )
    return wide.select(
        "event_type",
        "rs8",
        "rs16",
        "rs32",
        "rs64",
        "n_blocks8",
        "n_blocks64",
        F.when(
            F.col("a8").isNotNull() & F.col("a64").isNotNull(),
            F.col("a64") * F.col("a64") > F.lit(8) * F.col("a8") * F.col("a8"),
        ).alias("persistent"),
    )


SQL_EVENTS_HURST_RS = f"""
WITH hrcells AS ({SQL_HOURLY}),
hridx AS (
  SELECT event_type, hr, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM hrcells
),
hrfan AS (
  SELECT i.event_type, i.hr, i.y, i.rn, s.b, (i.rn - 1) // s.b AS g
  FROM hridx i CROSS JOIN (VALUES (8), (16), (32), (64)) s(b)
),
hrblk AS (
  SELECT event_type, b, g, y,
         ROW_NUMBER() OVER (PARTITION BY event_type, b, g ORDER BY rn) AS i,
         CAST(SUM(y) OVER (PARTITION BY event_type, b, g ORDER BY rn)
              AS BIGINT) AS p,
         CAST(SUM(y) OVER (PARTITION BY event_type, b, g) AS BIGINT) AS sb,
         CAST(SUM(y * y) OVER (PARTITION BY event_type, b, g) AS BIGINT)
           AS sumsq,
         COUNT(*) OVER (PARTITION BY event_type, b, g) AS cnt
  FROM hrfan
),
hrdev AS (
  SELECT event_type, b, g,
         MAX(b * p - i * sb) - MIN(b * p - i * sb) AS rb,
         MAX(b * sumsq - sb * sb) AS varnum
  FROM hrblk WHERE cnt = b
  GROUP BY 1, 2, 3
),
hrrs AS (
  SELECT event_type, b, g,
         CAST(FLOOR(CAST(rb AS DOUBLE) * 1000000.0
                    / SQRT(CAST(varnum AS DOUBLE)) + 0.5) AS BIGINT) AS rs_micro
  FROM hrdev WHERE varnum > 0
),
hrsize AS (
  SELECT event_type, b,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(rs_micro) AS BIGINT) AS sum_rs
  FROM hrrs GROUP BY 1, 2
),
hra AS (
  SELECT event_type, b, n_blocks, sum_rs,
         (2 * sum_rs + n_blocks) // (2 * n_blocks) AS a_int
  FROM hrsize
),
hrwide AS (
  SELECT event_type,
         MAX(CASE WHEN b = 8 THEN CAST(sum_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) END) AS rs8,
         MAX(CASE WHEN b = 16 THEN CAST(sum_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) END) AS rs16,
         MAX(CASE WHEN b = 32 THEN CAST(sum_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) END) AS rs32,
         MAX(CASE WHEN b = 64 THEN CAST(sum_rs AS DOUBLE) / CAST(n_blocks AS DOUBLE) END) AS rs64,
         MAX(CASE WHEN b = 8 THEN n_blocks END) AS n_blocks8,
         MAX(CASE WHEN b = 64 THEN n_blocks END) AS n_blocks64,
         MAX(CASE WHEN b = 8 THEN a_int END) AS a8,
         MAX(CASE WHEN b = 64 THEN a_int END) AS a64
  FROM hra GROUP BY 1
)
SELECT event_type, rs8, rs16, rs32, rs64, n_blocks8, n_blocks64,
       CASE WHEN a8 IS NOT NULL AND a64 IS NOT NULL
            THEN a64 * a64 > 8 * a8 * a8 END AS persistent
FROM hrwide
"""

QUERIES["events_hurst_rs"] = events_hurst_rs
ORACLES["events_hurst_rs"] = SQL_EVENTS_HURST_RS


# ---------------------------------------------------------------------------
# events_ordinal_patterns — permutation-style complexity, libm-free
# ---------------------------------------------------------------------------


def events_ordinal_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern complexity of each type's hourly series: every
    window of three consecutive present hours is classified by the sign
    pair (sign(y2-y1), sign(y3-y2)) into one of 9 patterns (ties get
    their own class -- no arbitrary tie-break), and the pattern
    distribution is summarized by its Gini-Simpson diversity
    (T^2 - Sigma c^2)/T^2 -- the libm-free stand-in for permutation
    entropy (rule 4: entropy -> Gini-Simpson, the events_type_diversity
    treatment). White noise spreads mass across patterns (diversity near
    the 9-class maximum 8/9); trends/cycles concentrate it. Also emitted:
    the modal pattern and its exact share (mode tie-break: smaller code).

    Scale: two leads + one count over the hourly cell frame -- no pair
    fan-out at all, the cheapest member of the complexity family."""
    cells = _hourly(spark, sf_dir)
    wt = Window.partitionBy("event_type").orderBy("hr")
    pat = (
        cells.withColumn("y2", F.lead("y", 1).over(wt))
        .withColumn("y3", F.lead("y", 2).over(wt))
        .where(F.col("y3").isNotNull())
        .withColumn(
            "code",
            (F.signum(F.col("y2") - F.col("y")).cast("long") + 1) * 3
            + (F.signum(F.col("y3") - F.col("y2")).cast("long") + 1),
        )
    )
    counts = pat.groupBy("event_type", "code").agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy("event_type")
    scored = (
        counts.withColumn("t", F.sum("c").over(wall))
        .withColumn("sq", F.sum(F.col("c") * F.col("c")).over(wall))
        .withColumn("np", F.count(F.lit(1)).over(wall))
        .withColumn(
            "best",
            F.max(F.struct(F.col("c"), -F.col("code"))).over(wall),
        )
    )
    return (
        scored.where(
            (F.col("c") == F.col("best.c")) & (F.col("code") == -F.col("best.col2"))
        )
        .select(
            "event_type",
            F.col("t").alias("n_windows"),
            F.col("np").alias("n_patterns"),
            (
                (F.col("t") * F.col("t") - F.col("sq")).cast("double")
                / (F.col("t") * F.col("t")).cast("double")
            ).alias("gini_simpson"),
            F.col("code").alias("modal_pattern"),
            (F.col("c").cast("double") / F.col("t").cast("double")).alias("modal_share"),
        )
    )


SQL_EVENTS_ORDINAL = f"""
WITH opcells AS ({SQL_HOURLY}),
oplead AS (
  SELECT event_type, y,
         LEAD(y, 1) OVER (PARTITION BY event_type ORDER BY hr) AS y2,
         LEAD(y, 2) OVER (PARTITION BY event_type ORDER BY hr) AS y3
  FROM opcells
),
opcode AS (
  SELECT event_type,
         (CAST(SIGN(y2 - y) AS BIGINT) + 1) * 3
           + (CAST(SIGN(y3 - y2) AS BIGINT) + 1) AS code
  FROM oplead WHERE y3 IS NOT NULL
),
opcnt AS (
  SELECT event_type, code, CAST(COUNT(*) AS BIGINT) AS c
  FROM opcode GROUP BY 1, 2
),
opsc AS (
  SELECT event_type, code, c,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t,
         CAST(SUM(c * c) OVER (PARTITION BY event_type) AS BIGINT) AS sq,
         COUNT(*) OVER (PARTITION BY event_type) AS np,
         MAX({{'c': c, 'negcode': -code}}) OVER (PARTITION BY event_type)
           AS best
  FROM opcnt
)
SELECT event_type,
       t AS n_windows,
       CAST(np AS BIGINT) AS n_patterns,
       CAST(t * t - sq AS DOUBLE) / CAST(t * t AS DOUBLE) AS gini_simpson,
       code AS modal_pattern,
       CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS modal_share
FROM opsc
WHERE c = best.c AND code = -best.negcode
"""

QUERIES["events_ordinal_patterns"] = events_ordinal_patterns
ORACLES["events_ordinal_patterns"] = SQL_EVENTS_ORDINAL


# ---------------------------------------------------------------------------
# events_xcorr_lags — pairwise cross-correlation at hourly lags
# ---------------------------------------------------------------------------

XCORR_MAX_LAG = 3


def events_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag structure between event streams: Pearson correlation of
    hourly volumes for every unordered type pair at lags -3..+3 (positive
    lag = the second type trails the first by that many hours). Each
    (pair, lag) correlates the hours where BOTH series are present
    (r_l = corr(x_t, y_{t+l})). Sums are exact int64; r is the single
    expression num / (sqrt(denx)*sqrt(deny)) evaluated in the same
    operation order on both engines (two IEEE sqrts, one multiply, one
    divide). is_best marks each pair's max |r| via the micro-quantized
    argmax (floor(r*10^6 + 0.5), tie -> smaller lag) so the label never
    rests on a raw-double comparison.

    Scale: the lag fan-out is 7 rows per hourly cell (rule 17); the join
    is an equi-join on the shifted hour over metadata-sized cell frames
    (|types|*|hours|), and the aggregate is one map-side-combinable
    groupBy per (pair, lag)."""
    cells = _hourly(spark, sf_dir)
    lags = F.array(*[F.lit(v) for v in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)])
    a = (
        cells.select(F.col("event_type").alias("ta"), "hr", F.col("y").alias("x"))
        .withColumn("lag", F.explode(lags))
        .withColumn("hr2", F.col("hr") + F.col("lag"))
    )
    b = cells.select(
        F.col("event_type").alias("tb"), F.col("hr").alias("hr2"), F.col("y").alias("yv")
    )
    joined = a.join(b, "hr2").where(F.col("ta") < F.col("tb"))
    agg = joined.groupBy("ta", "tb", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    scored = (
        agg.withColumn("num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .withColumn("denx", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .withColumn("deny", F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .where((F.col("denx") > 0) & (F.col("deny") > 0))
        .withColumn(
            "r",
            F.col("num").cast("double")
            / (F.sqrt(F.col("denx").cast("double")) * F.sqrt(F.col("deny").cast("double"))),
        )
        .withColumn("r_micro", F.floor(F.col("r") * F.lit(1000000.0) + F.lit(0.5)))
    )
    wpair = Window.partitionBy("ta", "tb")
    return (
        scored.withColumn(
            "best", F.max(F.struct(F.abs(F.col("r_micro")).alias("a"), (-F.col("lag")).alias("nl"))).over(wpair)
        )
        .select(
            "ta",
            "tb",
            "lag",
            F.col("n").alias("n_hours"),
            "r",
            (
                (F.abs(F.col("r_micro")) == F.col("best.a"))
                & (F.col("lag") == -F.col("best.nl"))
            ).alias("is_best"),
        )
    )


SQL_EVENTS_XCORR = f"""
WITH xccells AS ({SQL_HOURLY}),
xca AS (
  SELECT event_type AS ta, hr, y AS x, l.lag, hr + l.lag AS hr2
  FROM xccells CROSS JOIN (
    SELECT unnest(generate_series(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG})) AS lag
  ) l
),
xcj AS (
  SELECT a.ta, b.event_type AS tb, a.lag, a.x, b.y AS yv
  FROM xca a JOIN xccells b ON a.hr2 = b.hr AND a.ta < b.event_type
),
xcagg AS (
  SELECT ta, tb, lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(yv) AS BIGINT) AS sy,
         CAST(SUM(x * yv) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(yv * yv) AS BIGINT) AS syy
  FROM xcj GROUP BY 1, 2, 3
),
xcsc AS (
  SELECT ta, tb, lag, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS r
  FROM xcagg
  WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
),
xcm AS (
  SELECT ta, tb, lag, n, r,
         CAST(FLOOR(r * 1000000.0 + 0.5) AS BIGINT) AS r_micro
  FROM xcsc
),
xcb AS (
  SELECT ta, tb, lag, n, r, r_micro,
         MAX({{'a': ABS(r_micro), 'nl': -lag}}) OVER (PARTITION BY ta, tb)
           AS best
  FROM xcm
)
SELECT ta, tb, lag, n AS n_hours, r,
       ABS(r_micro) = best.a AND lag = -best.nl AS is_best
FROM xcb
"""

QUERIES["events_xcorr_lags"] = events_xcorr_lags
ORACLES["events_xcorr_lags"] = SQL_EVENTS_XCORR


# ---------------------------------------------------------------------------
# events_levene_bf — Brown-Forsythe variance-homogeneity across weekdays
# ---------------------------------------------------------------------------


def events_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity across day-of-week groups, per type -- the VARIANCE
    companion to events_seasonality_anova's mean test: does volatility
    (not just level) depend on the weekday? z = |2y - med2_dow| keeps
    the absolute deviations integral in half-units; with Z/Q the z-sum
    and z-square-sum and B = Sigma_j floor(Zj^2/nj) (euclidean split --
    the GE2 overflow-free form), the F statistic is the single division
    (N-k)(N*B - Z^2) / ((k-1)*N*(Q-B)). heteroscedastic flags F >= 2 via
    int64 cross-multiplication -- a documented heuristic cut (exact
    F-quantiles need incomplete-beta, which is libm; 2.0 sits near the
    alpha=0.05 critical value for the (6, ~350) dof this frame yields).

    Scale: one daily rollup + one per-(type, dow) exact median + two
    metadata aggregates. The floor on B biases F down by < k/(Q-B) --
    negligible and identical on both engines."""
    daily = _daily(spark, sf_dir).withColumn("dow", F.col("x") % 7)
    med = daily.groupBy("event_type", "dow").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("med2")
    )
    z = daily.join(med, ["event_type", "dow"]).withColumn(
        "z", F.abs(F.lit(2) * F.col("y") - F.col("med2"))
    )
    grp = z.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nj"), F.sum("z").alias("zj")
    ).withColumn("bj", F.expr("(zj div nj) * zj + ((zj % nj) * zj) div nj"))
    tot = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("z").alias("zz"),
        F.sum(F.col("z") * F.col("z")).alias("qq"),
    )
    byg = grp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"), F.sum("bj").alias("bb")
    )
    out = (
        tot.join(byg, "event_type")
        .where((F.col("k") > 1) & (F.col("qq") > F.col("bb")))
        .withColumn("fnum", (F.col("nn") - F.col("k")) * (F.col("nn") * F.col("bb") - F.col("zz") * F.col("zz")))
        .withColumn("fden", (F.col("k") - 1) * F.col("nn") * (F.col("qq") - F.col("bb")))
    )
    return out.select(
        "event_type",
        F.col("nn").alias("n_days"),
        F.col("k").alias("k_groups"),
        (F.col("nn") * F.col("bb") - F.col("zz") * F.col("zz")).alias("ssb_scaled"),
        (F.col("nn") * (F.col("qq") - F.col("bb"))).alias("ssw_scaled"),
        (F.col("fnum").cast("double") / F.col("fden").cast("double")).alias("f_stat"),
        (F.col("fnum") >= F.lit(2) * F.col("fden")).alias("heteroscedastic"),
    )


SQL_EVENTS_LEVENE_BF = f"""
WITH lvdaily AS (
  SELECT event_type, x, y, x % 7 AS dow FROM ({SQL_DAILY})
),
lvmed AS (
  SELECT event_type, dow, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
  FROM lvdaily GROUP BY 1, 2
),
lvz AS (
  SELECT d.event_type, d.dow, ABS(2 * d.y - m.med2) AS z
  FROM lvdaily d JOIN lvmed m
    ON d.event_type = m.event_type AND d.dow = m.dow
),
lvg AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS nj,
         CAST(SUM(z) AS BIGINT) AS zj
  FROM lvz GROUP BY 1, 2
),
lvgb AS (
  SELECT event_type, dow, nj, zj,
         (zj // nj) * zj + ((zj % nj) * zj) // nj AS bj
  FROM lvg
),
lvtot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nn,
         CAST(SUM(z) AS BIGINT) AS zz,
         CAST(SUM(z * z) AS BIGINT) AS qq
  FROM lvz GROUP BY 1
),
lvk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(bj) AS BIGINT) AS bb
  FROM lvgb GROUP BY 1
),
lvf AS (
  SELECT t.event_type, t.nn, k.k, t.zz, t.qq, k.bb,
         (t.nn - k.k) * (t.nn * k.bb - t.zz * t.zz) AS fnum,
         (k.k - 1) * t.nn * (t.qq - k.bb) AS fden
  FROM lvtot t JOIN lvk k USING (event_type)
  WHERE k.k > 1 AND t.qq > k.bb
)
SELECT event_type,
       nn AS n_days, k AS k_groups,
       nn * bb - zz * zz AS ssb_scaled,
       nn * (qq - bb) AS ssw_scaled,
       CAST(fnum AS DOUBLE) / CAST(fden AS DOUBLE) AS f_stat,
       fnum >= 2 * fden AS heteroscedastic
FROM lvf
"""

QUERIES["events_levene_bf"] = events_levene_bf
ORACLES["events_levene_bf"] = SQL_EVENTS_LEVENE_BF


# ---------------------------------------------------------------------------
# events_fano_dispersion — over/under-dispersion of daily volumes
# ---------------------------------------------------------------------------


def events_fano_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of each type's daily volumes:
    the Poisson-ness check for arrival counts. With S/Q the daily sum and
    square-sum over N present days, population var/mean collapses to the
    single exact division (N*Q - S^2)/(N*S); the three-way verdict
    compares the same integers cross-multiplied (overdispersed when
    N*Q - S^2 > N*S -- bursty/clustered arrivals; underdispersed when
    strictly below -- rate-limited or quota-shaped traffic). Read with
    events_inter_arrival: that tests WITHIN-day spacing, this tests the
    day-level count process.

    Scale: one rollup over the checkpointed daily frame; Q caps int64 at
    ~10^9 events/day per type."""
    daily = _daily(spark, sf_dir)
    agg = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("q"),
        )
        .where(F.col("n") > 1)
        .withColumn("varnum", F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("total"),
        (
            F.col("varnum").cast("double") / (F.col("n") * F.col("s")).cast("double")
        ).alias("fano"),
        F.when(F.col("varnum") > F.col("n") * F.col("s"), F.lit("overdispersed"))
        .when(F.col("varnum") < F.col("n") * F.col("s"), F.lit("underdispersed"))
        .otherwise(F.lit("poisson"))
        .alias("verdict"),
    )


SQL_EVENTS_FANO = f"""
WITH fddaily AS ({SQL_DAILY}),
fdagg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(y * y) AS BIGINT) AS q
  FROM fddaily GROUP BY 1
)
SELECT event_type, n AS n_days, s AS total,
       CAST(n * q - s * s AS DOUBLE) / CAST(n * s AS DOUBLE) AS fano,
       CASE WHEN n * q - s * s > n * s THEN 'overdispersed'
            WHEN n * q - s * s < n * s THEN 'underdispersed'
            ELSE 'poisson' END AS verdict
FROM fdagg WHERE n > 1
"""

QUERIES["events_fano_dispersion"] = events_fano_dispersion
ORACLES["events_fano_dispersion"] = SQL_EVENTS_FANO


# ---------------------------------------------------------------------------
# events_spectral_power — daily/weekly harmonic projection, libm-free
# ---------------------------------------------------------------------------

import math as _math

SPECTRAL_PERIODS = (24, 168)

# cos/sin tables quantized to 1e6 ints at module import: libm cos enters
# only through these CONSTANTS (the Benford-literal treatment, rule 4) --
# last-ulp platform drift vanishes under the 6-dp rounding, and the same
# integers are embedded verbatim in the oracle string.
_COS_T = {
    p: [int(_math.floor(_math.cos(2 * _math.pi * k / p) * 1e6 + 0.5)) for k in range(p)]
    for p in SPECTRAL_PERIODS
}
_SIN_T = {
    p: [int(_math.floor(_math.sin(2 * _math.pi * k / p) * 1e6 + 0.5)) for k in range(p)]
    for p in SPECTRAL_PERIODS
}


def events_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection of each type's hourly series onto the daily (24 h) and
    weekly (168 h) harmonics: Sc = Sigma y_t*cos(2*pi*(t mod P)/P),
    Ss likewise with sin, power = Sc^2 + Ss^2 and the amplitude estimate
    2*sqrt(P)/(n*10^6) in count units. The trig tables are 1e6-quantized
    integer LITERALS (module constants embedded in both engines -- libm
    never runs at query time), Sc/Ss are exact int64 sums, and the
    squares go through double (the chi2 square-in-double rule: Sc^2
    overflows int64 at corpus scale). daily_dominant compares the two
    powers after 1e6-floor quantization, never raw doubles. This is the
    seasonality-ENERGY companion to events_dow_profile (shape) and
    events_seasonality_anova (significance): absent hours just drop out
    of the projection (documented estimator choice -- no gap fill).

    Scale: two literal-array lookups + one aggregate over the
    checkpointed hourly frame; tables are 24 + 168 ints in the plan."""
    cells = _hourly(spark, sf_dir)
    aggs = []
    for p in SPECTRAL_PERIODS:
        cos_arr = F.array(*[F.lit(v) for v in _COS_T[p]])
        sin_arr = F.array(*[F.lit(v) for v in _SIN_T[p]])
        ph = (F.col("hr") % p + 1).cast("int")
        aggs.append(
            F.sum(F.col("y") * F.element_at(cos_arr, ph)).alias(f"sc{p}")
        )
        aggs.append(
            F.sum(F.col("y") * F.element_at(sin_arr, ph)).alias(f"ss{p}")
        )
    agg = cells.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"), *aggs)
    pw = {
        p: (
            F.col(f"sc{p}").cast("double") * F.col(f"sc{p}").cast("double")
            + F.col(f"ss{p}").cast("double") * F.col(f"ss{p}").cast("double")
        )
        for p in SPECTRAL_PERIODS
    }
    out = agg
    for p in SPECTRAL_PERIODS:
        out = out.withColumn(f"p{p}", pw[p])
    return out.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("p24").alias("power24"),
        F.col("p168").alias("power168"),
        (
            F.lit(2.0) * F.sqrt(F.col("p24")) / (F.col("n").cast("double") * F.lit(1000000.0))
        ).alias("amp24"),
        (
            F.lit(2.0) * F.sqrt(F.col("p168")) / (F.col("n").cast("double") * F.lit(1000000.0))
        ).alias("amp168"),
        (
            F.floor(F.col("p24") / F.lit(1000000.0) + F.lit(0.5))
            > F.floor(F.col("p168") / F.lit(1000000.0) + F.lit(0.5))
        ).alias("daily_dominant"),
    )


def _sql_spectral() -> str:
    def arr(t):
        return "[" + ", ".join(str(v) for v in t) + "]"

    sel = []
    for p in SPECTRAL_PERIODS:
        sel.append(
            f"CAST(SUM(y * ({arr(_COS_T[p])})[CAST(hr % {p} AS INT) + 1]) AS BIGINT) AS sc{p}"
        )
        sel.append(
            f"CAST(SUM(y * ({arr(_SIN_T[p])})[CAST(hr % {p} AS INT) + 1]) AS BIGINT) AS ss{p}"
        )
    return f"""
WITH spcells AS ({SQL_HOURLY}),
spagg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, {', '.join(sel)}
  FROM spcells GROUP BY 1
),
sppw AS (
  SELECT event_type, n,
         CAST(sc24 AS DOUBLE) * CAST(sc24 AS DOUBLE)
           + CAST(ss24 AS DOUBLE) * CAST(ss24 AS DOUBLE) AS p24,
         CAST(sc168 AS DOUBLE) * CAST(sc168 AS DOUBLE)
           + CAST(ss168 AS DOUBLE) * CAST(ss168 AS DOUBLE) AS p168
  FROM spagg
)
SELECT event_type, n AS n_hours, p24 AS power24, p168 AS power168,
       2.0 * SQRT(p24) / (CAST(n AS DOUBLE) * 1000000.0) AS amp24,
       2.0 * SQRT(p168) / (CAST(n AS DOUBLE) * 1000000.0) AS amp168,
       FLOOR(p24 / 1000000.0 + 0.5) > FLOOR(p168 / 1000000.0 + 0.5)
         AS daily_dominant
FROM sppw
"""


QUERIES["events_spectral_power"] = events_spectral_power
ORACLES["events_spectral_power"] = _sql_spectral()


# ---------------------------------------------------------------------------
# anomaly_ensemble_agreement — do the three hourly detectors agree?
# ---------------------------------------------------------------------------


def anomaly_ensemble_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix over three hourly anomaly detectors per type --
    the dedup_method_matrix treatment applied to the time-series family:
    (1) GLOBAL median/MAD (dev2*2 > 3*mad4, all scaled-integer), (2) the
    ROLLING Hampel filter (events_hampel_filter.is_outlier), (3) the
    SEASONAL STL-residual scorer (events_stl_anomaly.is_anomaly). Each
    views "anomalous" through a different null model (stationary /
    locally-stationary / seasonal), so their pairwise Jaccards and the
    consensus share quantify how much of the alert stream is
    model-artifact vs robust signal -- the triage number an on-call
    pipeline actually needs. Flags join on the shared (type, hour) cell
    grain; counts are exact ints, Jaccards one division each.

    Scale: reuses both member operators' plans verbatim (each already
    checkpoint-bounded) plus one global-MAD pass; the join and rollup
    run on metadata-sized cell frames."""
    from .warehouse import events_hampel_filter, events_stl_anomaly

    cells = _hourly(spark, sf_dir)
    gmed = cells.groupBy("event_type").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("med2")
    )
    gdev = cells.join(gmed, "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("y") - F.col("med2"))
    )
    gmad = gdev.groupBy("event_type").agg(
        (F.expr("percentile(dev2, 0.5)") * 2).cast("long").alias("mad4")
    )
    g = (
        gdev.join(gmad, "event_type")
        .select(
            "event_type",
            "hr",
            (F.col("dev2") * 2 > 3 * F.col("mad4")).alias("f_gmad"),
        )
    )
    h = events_hampel_filter(spark, sf_dir).select(
        "event_type", "hr", F.col("is_outlier").alias("f_hampel")
    )
    s = events_stl_anomaly(spark, sf_dir).select(
        "event_type", "hr", F.col("is_anomaly").alias("f_stl")
    )
    joined = g.join(h, ["event_type", "hr"]).join(s, ["event_type", "hr"])
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.col("f_gmad").cast("long")).alias("n_gmad"),
        F.sum(F.col("f_hampel").cast("long")).alias("n_hampel"),
        F.sum(F.col("f_stl").cast("long")).alias("n_stl"),
        F.sum((F.col("f_gmad") & F.col("f_hampel")).cast("long")).alias("n_gh"),
        F.sum((F.col("f_gmad") & F.col("f_stl")).cast("long")).alias("n_gs"),
        F.sum((F.col("f_hampel") & F.col("f_stl")).cast("long")).alias("n_hs"),
        F.sum((F.col("f_gmad") & F.col("f_hampel") & F.col("f_stl")).cast("long")).alias(
            "n_all3"
        ),
        F.sum((F.col("f_gmad") | F.col("f_hampel") | F.col("f_stl")).cast("long")).alias(
            "n_any"
        ),
    )

    def _jac(a: str, b: str, inter: str):
        den = F.col(a) + F.col(b) - F.col(inter)
        return F.when(den > 0, F.col(inter).cast("double") / den.cast("double"))

    return agg.select(
        "event_type",
        "n_hours",
        "n_gmad",
        "n_hampel",
        "n_stl",
        "n_all3",
        "n_any",
        _jac("n_gmad", "n_hampel", "n_gh").alias("j_gmad_hampel"),
        _jac("n_gmad", "n_stl", "n_gs").alias("j_gmad_stl"),
        _jac("n_hampel", "n_stl", "n_hs").alias("j_hampel_stl"),
        F.when(
            F.col("n_any") > 0,
            F.col("n_all3").cast("double") / F.col("n_any").cast("double"),
        ).alias("consensus_share"),
    )


def _sql_ensemble() -> str:
    from .warehouse import SQL_EVENTS_HAMPEL, SQL_EVENTS_STL_ANOMALY

    return f"""
WITH aecells AS ({SQL_HOURLY}),
aemed AS (
  SELECT event_type, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
  FROM aecells GROUP BY 1
),
aedev AS (
  SELECT c.event_type, c.hr, ABS(2 * c.y - m.med2) AS dev2
  FROM aecells c JOIN aemed m USING (event_type)
),
aemad AS (
  SELECT event_type, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
  FROM aedev GROUP BY 1
),
aeg AS (
  SELECT d.event_type, d.hr, d.dev2 * 2 > 3 * m.mad4 AS f_gmad
  FROM aedev d JOIN aemad m USING (event_type)
),
aeh AS (
  SELECT event_type, hr, is_outlier AS f_hampel FROM ({SQL_EVENTS_HAMPEL})
),
aes AS (
  SELECT event_type, hr, is_anomaly AS f_stl FROM ({SQL_EVENTS_STL_ANOMALY})
),
aej AS (
  SELECT g.event_type, g.hr, g.f_gmad, h.f_hampel, s.f_stl
  FROM aeg g
  JOIN aeh h ON g.event_type = h.event_type AND g.hr = h.hr
  JOIN aes s ON g.event_type = s.event_type AND g.hr = s.hr
),
aeagg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(CASE WHEN f_gmad THEN 1 ELSE 0 END) AS BIGINT) AS n_gmad,
         CAST(SUM(CASE WHEN f_hampel THEN 1 ELSE 0 END) AS BIGINT) AS n_hampel,
         CAST(SUM(CASE WHEN f_stl THEN 1 ELSE 0 END) AS BIGINT) AS n_stl,
         CAST(SUM(CASE WHEN f_gmad AND f_hampel THEN 1 ELSE 0 END) AS BIGINT) AS n_gh,
         CAST(SUM(CASE WHEN f_gmad AND f_stl THEN 1 ELSE 0 END) AS BIGINT) AS n_gs,
         CAST(SUM(CASE WHEN f_hampel AND f_stl THEN 1 ELSE 0 END) AS BIGINT) AS n_hs,
         CAST(SUM(CASE WHEN f_gmad AND f_hampel AND f_stl THEN 1 ELSE 0 END)
              AS BIGINT) AS n_all3,
         CAST(SUM(CASE WHEN f_gmad OR f_hampel OR f_stl THEN 1 ELSE 0 END)
              AS BIGINT) AS n_any
  FROM aej GROUP BY 1
)
SELECT event_type, n_hours, n_gmad, n_hampel, n_stl, n_all3, n_any,
       CASE WHEN n_gmad + n_hampel - n_gh > 0
            THEN CAST(n_gh AS DOUBLE) / CAST(n_gmad + n_hampel - n_gh AS DOUBLE)
       END AS j_gmad_hampel,
       CASE WHEN n_gmad + n_stl - n_gs > 0
            THEN CAST(n_gs AS DOUBLE) / CAST(n_gmad + n_stl - n_gs AS DOUBLE)
       END AS j_gmad_stl,
       CASE WHEN n_hampel + n_stl - n_hs > 0
            THEN CAST(n_hs AS DOUBLE) / CAST(n_hampel + n_stl - n_hs AS DOUBLE)
       END AS j_hampel_stl,
       CASE WHEN n_any > 0 THEN CAST(n_all3 AS DOUBLE) / CAST(n_any AS DOUBLE)
       END AS consensus_share
FROM aeagg
"""


QUERIES["anomaly_ensemble_agreement"] = anomaly_ensemble_agreement
ORACLES["anomaly_ensemble_agreement"] = _sql_ensemble()


# ---------------------------------------------------------------------------
# events_markov_diversity — next-state concentration per source state
# ---------------------------------------------------------------------------


def events_markov_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-state concentration of the user-sequence Markov chain: per
    from-state, the Gini-Simpson diversity of the to-state distribution
    (the libm-free entropy-rate stand-in, rule 4), the modal next state
    with its exact share, and the self-loop probability -- the summary
    events_markov_transitions' full matrix is usually read FOR. Pairs
    are built with the transition op's exact construction (lag over
    (user, ts, event_id)); all shares are single divisions of int64
    counts.

    Scale: one user-keyed lag shuffle (the transition op's cost), then
    |types|^2 metadata."""
    from ..session import read_events

    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy("from_type")
    scored = (
        counts.withColumn("t", F.sum("c").over(wall))
        .withColumn("sq", F.sum(F.col("c") * F.col("c")).over(wall))
        .withColumn("n_out", F.count(F.lit(1)).over(wall))
        .withColumn("selfc", F.max(F.when(F.col("to_type") == F.col("from_type"), F.col("c"))).over(wall))
        .withColumn("best", F.max(F.struct(F.col("c").alias("c"), F.col("to_type").alias("tt"))).over(wall))
    )
    return (
        scored.where((F.col("c") == F.col("best.c")) & (F.col("to_type") == F.col("best.tt")))
        .select(
            "from_type",
            F.col("t").alias("n_transitions"),
            F.col("n_out").alias("n_next_states"),
            (
                (F.col("t") * F.col("t") - F.col("sq")).cast("double")
                / (F.col("t") * F.col("t")).cast("double")
            ).alias("gini_simpson"),
            F.col("to_type").alias("modal_next"),
            (F.col("c").cast("double") / F.col("t").cast("double")).alias("modal_share"),
            (
                F.coalesce(F.col("selfc"), F.lit(0)).cast("double")
                / F.col("t").cast("double")
            ).alias("self_loop_p"),
        )
    )


SQL_EVENTS_MARKOV_DIVERSITY = """
WITH mdev AS (
  SELECT user_id, ts, event_id, event_type FROM events
),
mdpairs AS (
  SELECT from_type, event_type AS to_type FROM (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS from_type
    FROM mdev
  ) WHERE from_type IS NOT NULL
),
mdc AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM mdpairs GROUP BY 1, 2
),
mds AS (
  SELECT from_type, to_type, c,
         CAST(SUM(c) OVER (PARTITION BY from_type) AS BIGINT) AS t,
         CAST(SUM(c * c) OVER (PARTITION BY from_type) AS BIGINT) AS sq,
         COUNT(*) OVER (PARTITION BY from_type) AS n_out,
         CAST(MAX(CASE WHEN to_type = from_type THEN c END)
              OVER (PARTITION BY from_type) AS BIGINT) AS selfc,
         MAX({'c': c, 'tt': to_type}) OVER (PARTITION BY from_type) AS best
  FROM mdc
)
SELECT from_type,
       t AS n_transitions,
       CAST(n_out AS BIGINT) AS n_next_states,
       CAST(t * t - sq AS DOUBLE) / CAST(t * t AS DOUBLE) AS gini_simpson,
       to_type AS modal_next,
       CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS modal_share,
       CAST(COALESCE(selfc, 0) AS DOUBLE) / CAST(t AS DOUBLE) AS self_loop_p
FROM mds
WHERE c = best.c AND to_type = best.tt
"""

QUERIES["events_markov_diversity"] = events_markov_diversity
ORACLES["events_markov_diversity"] = SQL_EVENTS_MARKOV_DIVERSITY


# ---------------------------------------------------------------------------
# drift_ensemble_matrix — the drift family's verdict matrix (capstone)
# ---------------------------------------------------------------------------


def drift_ensemble_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per type, five drift detectors' verdicts side by side --
    the dedup_method_matrix treatment for the DRIFT family: KS (value
    distribution, voted via the int64 rule 10*d_num >= na*nb i.e.
    D >= 0.1), Mann-Whitney (volume level shift), Pettitt (single
    change-point), Page-Hinkley (sequential alarm), Mann-Kendall
    (monotone trend). n_votes counts how many of the five fire; a
    1-of-5 fire is a model artifact to triage, 4-of-5 is a real regime
    change. Every vote is the member operator's own integer verdict --
    this matrix adds NO new thresholds beyond the documented KS 0.1 cut.

    Scale: all five members are metadata-frame summaries (each
    checkpoint-bounds its own corpus pass); the matrix is a 5-way
    equi-join on event_type over |types| rows."""
    from .warehouse import events_ks_drift, events_mann_kendall

    ks = events_ks_drift(spark, sf_dir).select(
        "event_type",
        "ks_d",
        (F.lit(10) * F.col("d_num") >= F.col("n_early") * F.col("n_late")).alias(
            "v_ks"
        ),
    )
    mw = events_mann_whitney(spark, sf_dir).select(
        "event_type", F.col("shift").alias("mw_shift"), (F.col("shift") != "none").alias("v_mw")
    )
    pt = events_pettitt_change(spark, sf_dir).select(
        "event_type",
        F.col("change_x").alias("pettitt_change_x"),
        F.col("significant").alias("v_pettitt"),
    )
    ph = events_page_hinkley(spark, sf_dir).select(
        "event_type", F.col("n_alarms").alias("ph_alarms"), (F.col("n_alarms") > 0).alias("v_ph")
    )
    mk = events_mann_kendall(spark, sf_dir).select(
        "event_type", F.col("trend").alias("mk_trend"), (F.col("trend") != "none").alias("v_mk")
    )
    joined = (
        ks.join(mw, "event_type")
        .join(pt, "event_type")
        .join(ph, "event_type")
        .join(mk, "event_type")
    )
    votes = sum(
        F.col(c).cast("long") for c in ("v_ks", "v_mw", "v_pettitt", "v_ph", "v_mk")
    )
    return joined.select(
        "event_type",
        "ks_d",
        "mw_shift",
        "pettitt_change_x",
        "ph_alarms",
        "mk_trend",
        "v_ks",
        "v_mw",
        "v_pettitt",
        "v_ph",
        "v_mk",
        votes.alias("n_votes"),
    )


def _sql_drift_matrix() -> str:
    from .warehouse import SQL_EVENTS_KS_DRIFT, SQL_EVENTS_MANN_KENDALL

    return f"""
WITH dmks AS (
  SELECT event_type, ks_d, 10 * d_num >= n_early * n_late AS v_ks
  FROM ({SQL_EVENTS_KS_DRIFT})
),
dmmw AS (
  SELECT event_type, shift AS mw_shift, shift <> 'none' AS v_mw
  FROM ({SQL_EVENTS_MANN_WHITNEY})
),
dmpt AS (
  SELECT event_type, change_x AS pettitt_change_x, significant AS v_pettitt
  FROM ({SQL_EVENTS_PETTITT})
),
dmph AS (
  SELECT event_type, n_alarms AS ph_alarms, n_alarms > 0 AS v_ph
  FROM ({SQL_EVENTS_PAGE_HINKLEY})
),
dmmk AS (
  SELECT event_type, trend AS mk_trend, trend <> 'none' AS v_mk
  FROM ({SQL_EVENTS_MANN_KENDALL})
)
SELECT k.event_type, k.ks_d, w.mw_shift, p.pettitt_change_x, h.ph_alarms,
       m.mk_trend, k.v_ks, w.v_mw, p.v_pettitt, h.v_ph, m.v_mk,
       CAST((CASE WHEN k.v_ks THEN 1 ELSE 0 END)
          + (CASE WHEN w.v_mw THEN 1 ELSE 0 END)
          + (CASE WHEN p.v_pettitt THEN 1 ELSE 0 END)
          + (CASE WHEN h.v_ph THEN 1 ELSE 0 END)
          + (CASE WHEN m.v_mk THEN 1 ELSE 0 END) AS BIGINT) AS n_votes
FROM dmks k
JOIN dmmw w USING (event_type)
JOIN dmpt p USING (event_type)
JOIN dmph h USING (event_type)
JOIN dmmk m USING (event_type)
"""


QUERIES["drift_ensemble_matrix"] = drift_ensemble_matrix
ORACLES["drift_ensemble_matrix"] = _sql_drift_matrix()


# ---------------------------------------------------------------------------
# events_ph_episodes — alarm-fatigue profile of the Page-Hinkley stream
# ---------------------------------------------------------------------------


def events_ph_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alarm-fatigue triage for events_page_hinkley: consecutive
    over-threshold PRESENT hours merge into episodes (gaps-and-islands
    on the cell row number), per type: episode count, longest episode,
    total alarm hours, mean episode length -- the difference between
    "one long regime shift" (1 episode) and "a flapping detector"
    (many short ones), which n_alarms alone cannot distinguish. Shares
    the PH statistic columns with the parent op expression-for-
    expression (same running-mean quantization, same lambda).

    Scale: the PH windows plus one more row_number and a bounded
    rollup; types with zero alarms emit no row (drift_ensemble_matrix
    carries the zero case)."""
    cells = _hourly(spark, sf_dir)
    wt = Window.partitionBy("event_type").orderBy("hr")
    wrun = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ph = (
        cells.withColumn("i", F.row_number().over(wt))
        .withColumn("s", F.sum("y").over(wrun))
        .withColumn(
            "term",
            F.col("y") * F.lit(1000000) - F.expr("(s * 1000000) div i"),
        )
        .withColumn("m", F.sum("term").over(wrun))
        .withColumn("runmin", F.min("m").over(wrun))
        .withColumn("ph", F.col("m") - F.col("runmin"))
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("y").alias("sn"), F.count(F.lit(1)).alias("n_hours")
    ).withColumn("lam", F.expr("(sn * 1000000) div (2 * n_hours)"))
    alarms = (
        ph.join(tot, "event_type")
        .where(F.col("ph") > F.col("lam"))
        .withColumn("arn", F.row_number().over(wt))
        .withColumn("grp", F.col("i") - F.col("arn"))
    )
    epi = alarms.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("ep_len"),
        F.min("hr").alias("ep_start"),
    )
    return (
        epi.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_episodes"),
            F.sum("ep_len").alias("alarm_hours"),
            F.max("ep_len").alias("longest_episode"),
            F.min("ep_start").alias("first_episode_hr"),
        )
        .select(
            "event_type",
            "n_episodes",
            "alarm_hours",
            "longest_episode",
            "first_episode_hr",
            (
                F.col("alarm_hours").cast("double") / F.col("n_episodes").cast("double")
            ).alias("mean_episode_len"),
        )
    )


SQL_EVENTS_PH_EPISODES = f"""
WITH pecells AS ({SQL_HOURLY}),
perun AS (
  SELECT event_type, hr, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS s
  FROM pecells
),
pem AS (
  SELECT event_type, hr, i,
         CAST(SUM(y * 1000000 - (s * 1000000) // i)
              OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS m
  FROM perun
),
pex AS (
  SELECT event_type, hr, i, m,
         CAST(MIN(m) OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT)
           AS runmin
  FROM pem
),
pel AS (
  SELECT event_type,
         (CAST(SUM(y) AS BIGINT) * 1000000)
           // (2 * CAST(COUNT(*) AS BIGINT)) AS lam
  FROM pecells GROUP BY 1
),
pea AS (
  SELECT x.event_type, x.hr, x.i,
         ROW_NUMBER() OVER (PARTITION BY x.event_type ORDER BY x.hr) AS arn
  FROM pex x JOIN pel l USING (event_type)
  WHERE x.m - x.runmin > l.lam
),
pee AS (
  SELECT event_type, i - arn AS grp,
         CAST(COUNT(*) AS BIGINT) AS ep_len,
         MIN(hr) AS ep_start
  FROM pea GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_episodes,
       CAST(SUM(ep_len) AS BIGINT) AS alarm_hours,
       CAST(MAX(ep_len) AS BIGINT) AS longest_episode,
       MIN(ep_start) AS first_episode_hr,
       CAST(SUM(ep_len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_episode_len
FROM pee GROUP BY 1
"""

QUERIES["events_ph_episodes"] = events_ph_episodes
ORACLES["events_ph_episodes"] = SQL_EVENTS_PH_EPISODES


# ---------------------------------------------------------------------------
# events_qq_drift — decile-by-decile quantile drift (the KS companion)
# ---------------------------------------------------------------------------


def events_qq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ-table drift view: per type, the exact decile values of the
    `value` distribution in the EARLY vs LATE half (ks_drift's split)
    side by side with their gaps -- KS reports WHERE the CDFs diverge
    most; this reports HOW MUCH each quantile moved, the view that
    distinguishes a location shift (all gaps similar) from a tail
    change (gaps grow with the decile). Deciles are exact lower
    quantiles (rank ceil(d*n/10), tie order (value, event_id)) via
    with_global_rank partitioned by (type, half) -- histogram
    decomposition, no unpartitioned sort. is_max_gap marks the largest
    1e6-quantized absolute gap (tie -> smaller decile).

    Scale: the rank pass is the events_value_percentiles_exact class;
    the decile join is an equi-join on the rank value."""
    from ..functions.ranking import with_global_rank
    from ..session import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.unix_millis("ts").alias("ms"), "value", "event_id"
    ).where(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.min("ms").alias("mn"), F.max("ms").alias("mx")
    )
    sided = ev.join(bounds, "event_type").select(
        "event_type",
        "value",
        "event_id",
        F.when(F.lit(2) * F.col("ms") < F.col("mn") + F.col("mx"), F.lit("early"))
        .otherwise(F.lit("late"))
        .alias("half"),
    ).localCheckpoint(eager=True)  # histogram + pass-2 sides of the rank
    ranked = with_global_rank(
        sided, "value", "event_id", part_cols=("event_type", "half"),
        rank_name="r", total_name="n",
    )
    deciles = F.array(*[F.lit(d) for d in range(1, 10)])
    picked = (
        ranked.withColumn("d", F.explode(deciles))
        .where(F.col("r") == F.expr("(d * n + 9) div 10"))
        .groupBy("event_type", "d")
        .agg(
            F.max(F.when(F.col("half") == "early", F.col("value"))).alias("v_early"),
            F.max(F.when(F.col("half") == "late", F.col("value"))).alias("v_late"),
        )
        .where(F.col("v_early").isNotNull() & F.col("v_late").isNotNull())
        .withColumn("gap", F.col("v_late") - F.col("v_early"))
        .withColumn(
            "gap_micro", F.floor(F.abs(F.col("gap")) * F.lit(1000000.0) + F.lit(0.5))
        )
    )
    wt = Window.partitionBy("event_type")
    return (
        picked.withColumn(
            "best", F.max(F.struct(F.col("gap_micro").alias("g"), (-F.col("d")).alias("nd"))).over(wt)
        )
        .select(
            "event_type",
            F.col("d").alias("decile"),
            "v_early",
            "v_late",
            "gap",
            (
                (F.col("gap_micro") == F.col("best.g")) & (F.col("d") == -F.col("best.nd"))
            ).alias("is_max_gap"),
        )
    )


SQL_EVENTS_QQ_DRIFT = """
WITH qqev AS (
  SELECT event_type, epoch_ms(ts) AS ms, value, event_id
  FROM events WHERE value IS NOT NULL
),
qqb AS (
  SELECT event_type, MIN(ms) AS mn, MAX(ms) AS mx FROM qqev GROUP BY 1
),
qqsided AS (
  SELECT e.event_type, e.value, e.event_id,
         CASE WHEN 2 * e.ms < b.mn + b.mx THEN 'early' ELSE 'late' END AS half
  FROM qqev e JOIN qqb b USING (event_type)
),
qqr AS (
  SELECT event_type, half, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, half
                            ORDER BY value, event_id) AS r,
         CAST(COUNT(*) OVER (PARTITION BY event_type, half) AS BIGINT) AS n
  FROM qqsided
),
qqpick AS (
  SELECT event_type, d.d,
         MAX(CASE WHEN half = 'early' THEN value END) AS v_early,
         MAX(CASE WHEN half = 'late' THEN value END) AS v_late
  FROM qqr CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
  WHERE r = (d.d * n + 9) // 10
  GROUP BY 1, 2
),
qqg AS (
  SELECT event_type, d, v_early, v_late, v_late - v_early AS gap,
         CAST(FLOOR(ABS(v_late - v_early) * 1000000.0 + 0.5) AS BIGINT)
           AS gap_micro
  FROM qqpick
  WHERE v_early IS NOT NULL AND v_late IS NOT NULL
),
qqbest AS (
  SELECT event_type, d, v_early, v_late, gap, gap_micro,
         MAX({'g': gap_micro, 'nd': -d}) OVER (PARTITION BY event_type) AS best
  FROM qqg
)
SELECT event_type, CAST(d AS BIGINT) AS decile, v_early, v_late, gap,
       gap_micro = best.g AND d = -best.nd AS is_max_gap
FROM qqbest
"""

QUERIES["events_qq_drift"] = events_qq_drift
ORACLES["events_qq_drift"] = SQL_EVENTS_QQ_DRIFT


# ---------------------------------------------------------------------------
# events_von_neumann — successive-difference randomness ratio (r9 session 3)
# ---------------------------------------------------------------------------


def events_von_neumann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann ratio VN = n²·Σd² / ((n−1)·(nQ − S²)) on each type's
    daily volumes (d = successive difference over present-day order, the
    runs-test convention; S = Σy, Q = Σy²). VN ≈ 2 for a random series;
    VN < 2 means neighboring days are positively correlated (trending /
    regime persistence), VN > 2 rapid alternation. Both numerator
    A = n²·Σd² and denominator B = (n−1)(nQ − S²) are exact int64
    (A ≤ n³·max|d|², safe past 100× the sf0.1 daily volumes); VN is ONE
    final division. The α=0.05 verdict uses the asymptotic
    Var(VN) = 4(n−2)/((n−1)(n+1)): z² = (A−2B)²·(n²−1) / (4(n−2)·B²).
    (A−2B)² and B² overflow int64 at this scale, so BOTH engines square
    in DOUBLE with the identical multiplication order (the chi-square
    rule, DETERMINISM.md rule 16) — products of already-exact int64 casts,
    deterministic on both engines.

    Complements events_runs_test (dichotomized about the median — throws
    away magnitude) with a magnitude-aware serial-correlation test on the
    SAME frame; read beside events_autocorr_lag1 (VN ≈ 2(1 − r₁)).

    Scale: everything after the daily rollup is |types|·|days| metadata
    on the shared localCheckpointed cell frame."""
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("x")
    agg = (
        daily.withColumn("d", F.col("y") - F.lag("y").over(wd))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("q"),
            F.sum(F.col("d") * F.col("d")).alias("sd2"),
        )
        .where(
            (F.col("n") >= 3) & (F.col("n") * F.col("q") > F.col("s") * F.col("s"))
        )
        .withColumn("a", F.col("n") * F.col("n") * F.col("sd2"))
        .withColumn(
            "b", (F.col("n") - 1) * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        )
        .withColumn("dev_d", (F.col("a") - F.lit(2) * F.col("b")).cast("double"))
        .withColumn("b_d", F.col("b").cast("double"))
        .withColumn(
            "num_d",
            F.col("dev_d")
            * F.col("dev_d")
            * (F.col("n") * F.col("n") - 1).cast("double"),
        )
        .withColumn(
            "den_d",
            (F.lit(4) * (F.col("n") - 2)).cast("double") * F.col("b_d") * F.col("b_d"),
        )
        .withColumn(
            "sig", F.lit(10000) * F.col("num_d") > F.lit(Z2_04) * F.col("den_d")
        )
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sd2").alias("sum_d2"),
        (F.col("a").cast("double") / F.col("b").cast("double")).alias("vn_ratio"),
        (F.col("num_d") / F.col("den_d")).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("a") < F.lit(2) * F.col("b")), F.lit("trending"))
        .when(F.col("sig") & (F.col("a") > F.lit(2) * F.col("b")), F.lit("oscillating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


SQL_EVENTS_VON_NEUMANN = f"""
WITH vndaily AS ({SQL_DAILY}),
vnd AS (
  SELECT event_type, y,
         y - LAG(y) OVER (PARTITION BY event_type ORDER BY x) AS d
  FROM vndaily
),
vnagg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(y * y) AS BIGINT) AS q,
         CAST(SUM(d * d) AS BIGINT) AS sd2
  FROM vnd GROUP BY 1
),
vnstat AS (
  SELECT event_type, n, sd2,
         n * n * sd2 AS a,
         (n - 1) * (n * q - s * s) AS b
  FROM vnagg WHERE n >= 3 AND n * q > s * s
),
vnd2 AS (
  SELECT event_type, n, sd2, a, b,
         CAST(a - 2 * b AS DOUBLE) AS dev_d,
         CAST(b AS DOUBLE) AS b_d
  FROM vnstat
),
vnz AS (
  SELECT event_type, n, sd2, a, b,
         dev_d * dev_d * CAST(n * n - 1 AS DOUBLE) AS num_d,
         CAST(4 * (n - 2) AS DOUBLE) * b_d * b_d AS den_d
  FROM vnd2
)
SELECT event_type, n AS n_days, sd2 AS sum_d2,
       CAST(a AS DOUBLE) / CAST(b AS DOUBLE) AS vn_ratio,
       num_d / den_d AS z2_stat,
       CASE WHEN 10000 * num_d > {Z2_04} * den_d AND a < 2 * b THEN 'trending'
            WHEN 10000 * num_d > {Z2_04} * den_d AND a > 2 * b THEN 'oscillating'
            ELSE 'random' END AS verdict
FROM vnz
"""

QUERIES["events_von_neumann"] = events_von_neumann
ORACLES["events_von_neumann"] = SQL_EVENTS_VON_NEUMANN


# ---------------------------------------------------------------------------
# events_turning_points — local-extrema randomness test (r9 session 3)
# ---------------------------------------------------------------------------


def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test on each type's daily volumes: an interior day
    is a turning point iff it is a STRICT local max or strict local min
    against both neighbors (over present-day order). Ties yield no
    turning point — the conservative discrete-data treatment, documented
    deviation from the continuous-distribution theory. Under randomness
    E[T] = 2(n−2)/3 and Var(T) = (16n−29)/90, so with dev3 = 3T − 2(n−2)
    (three times the deviation, integral), z² = 10·dev3² / (16n − 29) —
    exact int64 numerator, ONE final division — and the α=0.05 verdict is
    the cross-multiplied rule 10⁵·dev3² > 38416·(16n−29). Too FEW
    turning points = smooth/trending, too MANY = rapid oscillation.

    The third member of the randomness triptych: runs_test (signs about
    the median), von_neumann (successive-difference magnitude), and this
    (local shape) — each catches departures the others are blind to.

    Scale: one lag + one lead over the shared metadata-sized daily cell
    frame; dev3² ≤ 9n² keeps int64 to any horizon."""
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("x")
    marked = (
        daily.withColumn("prev", F.lag("y").over(wd))
        .withColumn("nxt", F.lead("y").over(wd))
        .withColumn(
            "tp",
            F.when(
                F.col("prev").isNotNull()
                & F.col("nxt").isNotNull()
                & (
                    ((F.col("y") > F.col("prev")) & (F.col("y") > F.col("nxt")))
                    | ((F.col("y") < F.col("prev")) & (F.col("y") < F.col("nxt")))
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
    )
    agg = (
        marked.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tp").alias("t"))
        .where(F.col("n") >= 3)
        .withColumn(
            "dev3", F.lit(3) * F.col("t") - F.lit(2) * (F.col("n") - 2)
        )
        .withColumn("num", F.lit(10) * F.col("dev3") * F.col("dev3"))
        .withColumn("den", F.lit(16) * F.col("n") - 29)
        .withColumn("sig", F.lit(10000) * F.col("num") > F.lit(Z2_04) * F.col("den"))
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("t").alias("n_turning"),
        (F.col("num").cast("double") / F.col("den").cast("double")).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("dev3") < 0), F.lit("trending"))
        .when(F.col("sig") & (F.col("dev3") > 0), F.lit("oscillating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


SQL_EVENTS_TURNING_POINTS = f"""
WITH tpdaily AS ({SQL_DAILY}),
tpmark AS (
  SELECT event_type,
         CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                   AND ((y > prev AND y > nxt) OR (y < prev AND y < nxt))
              THEN 1 ELSE 0 END AS tp
  FROM (
    SELECT event_type, y,
           LAG(y)  OVER (PARTITION BY event_type ORDER BY x) AS prev,
           LEAD(y) OVER (PARTITION BY event_type ORDER BY x) AS nxt
    FROM tpdaily
  )
),
tpagg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tp) AS BIGINT) AS t
  FROM tpmark GROUP BY 1
),
tpstat AS (
  SELECT event_type, n, t,
         3 * t - 2 * (n - 2) AS dev3,
         10 * (3 * t - 2 * (n - 2)) * (3 * t - 2 * (n - 2)) AS num,
         16 * n - 29 AS den
  FROM tpagg WHERE n >= 3
)
SELECT event_type, n AS n_days, t AS n_turning,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS z2_stat,
       CASE WHEN 10000 * num > {Z2_04} * den AND dev3 < 0 THEN 'trending'
            WHEN 10000 * num > {Z2_04} * den AND dev3 > 0 THEN 'oscillating'
            ELSE 'random' END AS verdict
FROM tpstat
"""

QUERIES["events_turning_points"] = events_turning_points
ORACLES["events_turning_points"] = SQL_EVENTS_TURNING_POINTS


# ---------------------------------------------------------------------------
# events_cox_stuart — paired-half sign test for monotone trend (r9 session 3)
# ---------------------------------------------------------------------------


def events_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox–Stuart trend test on each type's daily volumes: the i-th
    present day is paired with the (i + h)-th, h = (n+1) div 2 (the odd
    middle day is unpaired — the standard treatment), for i = 1..n div 2.
    S⁺ = pairs where the later value is strictly higher, S⁻ strictly
    lower, ties dropped. Under no-trend, S⁺ ~ Binomial(m, ½) with
    m = S⁺ + S⁻, so z² (with the normal approximation, no continuity
    correction) is the exact rational (S⁺ − S⁻)² / m — ONE final
    division — and α=0.05 significance is the all-int64 cross-multiplied
    rule 10⁴·(S⁺ − S⁻)² > 38416·m.

    The sign-test companion to events_mann_kendall (all-pairs S) at 1/n
    of the pair budget: Cox–Stuart reads only n/2 long-range pairs, which
    is exactly why it is the textbook quick trend screen — emitted beside
    MK so the two verdicts can be cross-checked per type.

    Scale: the pairing is ONE equi-join keyed on (event_type,
    rn + h) — rank offsets, no range scan — over the shared
    localCheckpointed metadata frame."""
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("x")
    wn = Window.partitionBy("event_type")
    rn = (
        daily.withColumn("rn", F.row_number().over(wd))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .localCheckpoint(eager=True)
    )
    left = rn.where(F.col("rn") <= F.expr("n div 2")).select(
        "event_type",
        F.col("y").alias("y0"),
        (F.col("rn") + F.expr("(n + 1) div 2")).alias("rj"),
        F.col("n").alias("n_days"),
    )
    right = rn.select("event_type", F.col("rn").alias("rj"), F.col("y").alias("y1"))
    agg = (
        left.join(right, ["event_type", "rj"])
        .groupBy("event_type")
        .agg(
            F.max("n_days").alias("n_days"),
            F.sum(F.when(F.col("y1") > F.col("y0"), 1).otherwise(0)).alias("s_plus"),
            F.sum(F.when(F.col("y1") < F.col("y0"), 1).otherwise(0)).alias("s_minus"),
        )
        .withColumn("m", F.col("s_plus") + F.col("s_minus"))
        .withColumn("dv", F.col("s_plus") - F.col("s_minus"))
        .withColumn(
            "sig",
            (F.col("m") > 0)
            & (F.lit(10000) * F.col("dv") * F.col("dv") > F.lit(Z2_04) * F.col("m")),
        )
    )
    return agg.select(
        "event_type",
        "n_days",
        "s_plus",
        "s_minus",
        F.when(
            F.col("m") > 0,
            (F.col("dv") * F.col("dv")).cast("double") / F.col("m").cast("double"),
        ).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("dv") > 0), F.lit("upward"))
        .when(F.col("sig") & (F.col("dv") < 0), F.lit("downward"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


SQL_EVENTS_COX_STUART = f"""
WITH csdaily AS ({SQL_DAILY}),
csrn AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM csdaily
),
cspair AS (
  SELECT a.event_type, a.n, a.y AS y0, b.y AS y1
  FROM csrn a JOIN csrn b
    ON a.event_type = b.event_type AND b.rn = a.rn + (a.n + 1) // 2
  WHERE a.rn <= a.n // 2
),
csagg AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN y1 > y0 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
         CAST(SUM(CASE WHEN y1 < y0 THEN 1 ELSE 0 END) AS BIGINT) AS s_minus
  FROM cspair GROUP BY 1
),
csstat AS (
  SELECT event_type, n_days, s_plus, s_minus,
         s_plus + s_minus AS m, s_plus - s_minus AS dv
  FROM csagg
)
SELECT event_type, n_days, s_plus, s_minus,
       CASE WHEN m > 0
            THEN CAST(dv * dv AS DOUBLE) / CAST(m AS DOUBLE) END AS z2_stat,
       CASE WHEN m > 0 AND 10000 * dv * dv > {Z2_04} * m AND dv > 0
            THEN 'upward'
            WHEN m > 0 AND 10000 * dv * dv > {Z2_04} * m AND dv < 0
            THEN 'downward'
            ELSE 'none' END AS trend
FROM csstat
"""

QUERIES["events_cox_stuart"] = events_cox_stuart
ORACLES["events_cox_stuart"] = SQL_EVENTS_COX_STUART


# ---------------------------------------------------------------------------
# events_variance_ratio — Lo–MacKinlay VR(q) random-walk test (r9 session 3)
# ---------------------------------------------------------------------------

VR_QS = (2, 4, 8)  # aggregation horizons (days); q=1 is identically 1


def events_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance-ratio test on each type's daily-volume
    series at horizons q ∈ {2,4,8}: VR(q) = Var(y_t − y_{t−q}) /
    (q·Var(y_t − y_{t−1})) over OVERLAPPING q-step differences. A random
    walk gives VR ≈ 1; a level-stationary (mean-reverting) daily volume
    gives VR < 1 shrinking with q; a drifting series VR > 1. With
    m = n−1 base differences, T = y_last − y_first, Sd2 = Σd²,
    and per-q SD = ΣDq, SD2 = ΣDq², mq = m−q+1:
      v1 = m·Sd2 − T²                            (m²·Σ(d−d̄)²)
      vq = m²·SD2 − 2·q·T·m·SD + mq·q²·T²        (m²·Σ(Dq−q·d̄)²)
      VR = vq / (mq·q·v1)  — exact int64 num/den, ONE division.
    The α=0.05 verdict uses the asymptotic Var(VR) = 2(2q−1)(q−1)/(3q·m):
    z² = (vq − den)²·3qm / (den²·2(2q−1)(q−1)), den = mq·q·v1 — squares
    in DOUBLE on both engines (the chi-square overflow rule), identical
    multiplication order.

    The multi-horizon companion to events_von_neumann (which is ~VR(1)'s
    reciprocal view): VN asks "are NEIGHBORS correlated", VR(q) asks
    "does the correlation COMPOUND into drift or cancel into reversion".

    Scale: the q fan-out is a 3-element literal explode (rule 17) joined
    back on (type, rn−q) — equi keys, metadata-sized, zero extra scans."""
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("x")
    idx = daily.withColumn("rn", F.row_number().over(wd)).localCheckpoint(eager=True)
    scal = (
        idx.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.struct("rn", "y"))["y"].alias("y_last"),
            F.min(F.struct("rn", "y"))["y"].alias("y_first"),
        )
        .withColumn("m", F.col("n") - 1)
        .withColumn("t", F.col("y_last") - F.col("y_first"))
    )
    d1 = (
        idx.alias("a")
        .join(
            idx.select(
                "event_type", F.col("rn").alias("rnp"), F.col("y").alias("yp")
            ).alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.rn") == F.col("rnp") + 1),
        )
        .select(F.col("a.event_type").alias("event_type"), (F.col("a.y") - F.col("yp")).alias("d"))
        .groupBy("event_type")
        .agg(F.sum(F.col("d") * F.col("d")).alias("sd2"))
    )
    fan = idx.withColumn("q", F.explode(F.array(*[F.lit(q) for q in VR_QS])))
    dq = (
        fan.alias("a")
        .join(
            idx.select(
                "event_type", F.col("rn").alias("rnb"), F.col("y").alias("yb")
            ).alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("rnb") == F.col("a.rn") - F.col("q")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            "q",
            (F.col("a.y") - F.col("yb")).alias("dq"),
        )
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("mq"),
            F.sum("dq").alias("sd"),
            F.sum(F.col("dq") * F.col("dq")).alias("sdq2"),
        )
    )
    st = (
        dq.join(scal, "event_type")
        .join(d1, "event_type")
        .where(F.col("m") >= F.col("q") + 1)
        .withColumn("v1", F.col("m") * F.col("sd2") - F.col("t") * F.col("t"))
        .where(F.col("v1") > 0)
        .withColumn(
            "vq",
            F.col("m") * F.col("m") * F.col("sdq2")
            - F.lit(2) * F.col("q") * F.col("t") * F.col("m") * F.col("sd")
            + F.col("mq") * F.col("q") * F.col("q") * F.col("t") * F.col("t"),
        )
        .withColumn("den", F.col("mq") * F.col("q") * F.col("v1"))
        .withColumn("dev_d", (F.col("vq") - F.col("den")).cast("double"))
        .withColumn("den_d", F.col("den").cast("double"))
        .withColumn(
            "num_d",
            F.col("dev_d") * F.col("dev_d") * (F.lit(3) * F.col("q") * F.col("m")).cast("double"),
        )
        .withColumn(
            "dden_d",
            (F.lit(2) * (F.lit(2) * F.col("q") - 1) * (F.col("q") - 1)).cast("double")
            * F.col("den_d")
            * F.col("den_d"),
        )
        .withColumn(
            "sig", F.lit(10000) * F.col("num_d") > F.lit(Z2_04) * F.col("dden_d")
        )
    )
    return st.select(
        "event_type",
        F.col("q").cast("long").alias("q"),
        F.col("mq").alias("n_diffs"),
        (F.col("vq").cast("double") / F.col("den").cast("double")).alias("vr"),
        (F.col("num_d") / F.col("dden_d")).alias("z2_stat"),
        F.when(F.col("sig") & (F.col("vq") < F.col("den")), F.lit("mean_reverting"))
        .when(F.col("sig") & (F.col("vq") > F.col("den")), F.lit("drifting"))
        .otherwise(F.lit("random_walk"))
        .alias("verdict"),
    )


_VR_QS_SQL = ", ".join(str(q) for q in VR_QS)

SQL_EVENTS_VARIANCE_RATIO = f"""
WITH vrdaily AS ({SQL_DAILY}),
vridx AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn
  FROM vrdaily
),
vrscal AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         MAX({{'r': rn, 'y': y}}).y - MIN({{'r': rn, 'y': y}}).y AS t
  FROM vridx GROUP BY 1
),
vrd1 AS (
  SELECT a.event_type, CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS sd2
  FROM vridx a JOIN vridx b
    ON a.event_type = b.event_type AND a.rn = b.rn + 1
  GROUP BY 1
),
vrdq AS (
  SELECT a.event_type, qq.q,
         CAST(COUNT(*) AS BIGINT) AS mq,
         CAST(SUM(a.y - b.y) AS BIGINT) AS sd,
         CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS sdq2
  FROM vridx a
  CROSS JOIN (SELECT UNNEST([{_VR_QS_SQL}]) AS q) qq
  JOIN vridx b
    ON a.event_type = b.event_type AND b.rn = a.rn - qq.q
  GROUP BY 1, 2
),
vrst AS (
  SELECT d.event_type, d.q, d.mq, d.sd, d.sdq2,
         s.n - 1 AS m, s.t, e.sd2,
         (s.n - 1) * e.sd2 - s.t * s.t AS v1
  FROM vrdq d
  JOIN vrscal s ON d.event_type = s.event_type
  JOIN vrd1 e ON d.event_type = e.event_type
  WHERE s.n - 1 >= d.q + 1 AND (s.n - 1) * e.sd2 - s.t * s.t > 0
),
vrv AS (
  SELECT event_type, q, mq, m,
         m * m * sdq2 - 2 * q * t * m * sd + mq * q * q * t * t AS vq,
         mq * q * v1 AS den
  FROM vrst
),
vrz AS (
  SELECT event_type, q, mq, vq, den,
         CAST(vq - den AS DOUBLE) * CAST(vq - den AS DOUBLE)
           * CAST(3 * q * m AS DOUBLE) AS num_d,
         CAST(2 * (2 * q - 1) * (q - 1) AS DOUBLE)
           * CAST(den AS DOUBLE) * CAST(den AS DOUBLE) AS dden_d
  FROM vrv
)
SELECT event_type, CAST(q AS BIGINT) AS q, mq AS n_diffs,
       CAST(vq AS DOUBLE) / CAST(den AS DOUBLE) AS vr,
       num_d / dden_d AS z2_stat,
       CASE WHEN 10000 * num_d > {Z2_04} * dden_d AND vq < den
            THEN 'mean_reverting'
            WHEN 10000 * num_d > {Z2_04} * dden_d AND vq > den
            THEN 'drifting'
            ELSE 'random_walk' END AS verdict
FROM vrz
"""

QUERIES["events_variance_ratio"] = events_variance_ratio
ORACLES["events_variance_ratio"] = SQL_EVENTS_VARIANCE_RATIO


# ---------------------------------------------------------------------------
# events_recurrence_quant — windowed recurrence quantification (r9 session 3)
# ---------------------------------------------------------------------------

RQA_WINDOW = 90  # max |i−j| in present-day rank — keeps the pair set linear
RQA_LMIN = 2  # minimum diagonal run length that counts as determinism


def events_recurrence_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed recurrence-quantification analysis of each type's daily
    volumes: days i < j ≤ i+90 (present-day rank) RECUR when
    4·|y_i − y_j| ≤ mad4 (within one MAD of each other — mad4 = 4×the
    median absolute deviation about the series median, the hampel
    encoding, exact int64). Emitted per type:
      rr   — recurrence rate: recurrent share of the windowed pair set
      det  — determinism: share of recurrent pairs lying on a DIAGONAL
             run of length ≥ 2 (pair (i+1, j+1) also recurrent — the
             gaps-and-islands grouping per lag), the RQA signature that
             separates deterministic regimes from scattered coincidence
      lmax — longest diagonal run (in pairs)
    High rr + high det = sustained volume regimes (plateaus revisited);
    high rr + low det = isotropic noise around a level. Complements the
    distribution-level drift family: RQA sees TEMPORAL STRUCTURE of the
    recurrences, not just their counts.

    Scale: the pair set is built by a 90-lag literal explode joined on
    (type, rn+lag) — rank equi-keys (rule 17, NOT an n² range join), so
    the pair count is ≤ 90·n per type at any horizon; islands are one
    window pass over the recurrent subset."""
    daily = _daily(spark, sf_dir)
    wd = Window.partitionBy("event_type").orderBy("x")
    med = daily.groupBy("event_type").agg(
        (F.expr("percentile(y, 0.5)") * 2).cast("long").alias("med2")
    )
    dev = daily.join(med, "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("y") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        (F.expr("percentile(dev2, 0.5)") * 2).cast("long").alias("mad4")
    )
    idx = (
        daily.withColumn("rn", F.row_number().over(wd))
        .join(mad, "event_type")
        .localCheckpoint(eager=True)
    )
    fan = idx.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(RQA_WINDOW)))
    ).withColumn("rnb", F.col("rn") + F.col("lag"))
    pairs = fan.alias("a").join(
        idx.select(
            "event_type", F.col("rn").alias("rnb"), F.col("y").alias("yb")
        ).alias("b"),
        ["event_type", "rnb"],
    )
    rec = pairs.select(
        "event_type",
        F.col("a.rn").alias("rn"),
        "lag",
        "mad4",
        (F.lit(4) * F.abs(F.col("a.y") - F.col("yb")) <= F.col("mad4")).alias("r"),
    ).localCheckpoint(eager=True)
    wl = Window.partitionBy("event_type", "lag").orderBy("rn")
    isl = (
        rec.where("r")
        .withColumn("grp", F.col("rn") - F.row_number().over(wl))
        .groupBy("event_type", "lag", "grp")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    diag = isl.groupBy("event_type").agg(
        F.sum(F.when(F.col("c") >= RQA_LMIN, F.col("c")).otherwise(0)).alias("n_diag"),
        F.max("c").alias("lmax"),
    )
    tot = rec.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("r"), 1).otherwise(0)).alias("n_rec"),
        F.max(F.col("mad4")).alias("mad4"),
    )
    out = (
        tot.join(diag, "event_type", "left")
        .withColumn("n_diag", F.coalesce("n_diag", F.lit(0)))
        .withColumn("lmax", F.coalesce("lmax", F.lit(0)))
    )
    return out.select(
        "event_type",
        "n_pairs",
        "n_rec",
        (F.col("mad4").cast("double") / F.lit(4.0)).alias("eps"),
        (F.col("n_rec").cast("double") / F.col("n_pairs").cast("double")).alias("rr"),
        F.when(
            F.col("n_rec") > 0,
            F.col("n_diag").cast("double") / F.col("n_rec").cast("double"),
        ).alias("det"),
        "lmax",
    )


SQL_EVENTS_RECURRENCE = f"""
WITH rqdaily AS ({SQL_DAILY}),
rqmed AS (
  SELECT event_type, CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
  FROM rqdaily GROUP BY 1
),
rqmad AS (
  SELECT d.event_type,
         CAST(quantile_cont(ABS(2 * d.y - m.med2), 0.5) * 2 AS BIGINT) AS mad4
  FROM rqdaily d JOIN rqmed m USING (event_type) GROUP BY 1
),
rqidx AS (
  SELECT d.event_type, d.y, m.mad4,
         ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.x) AS rn
  FROM rqdaily d JOIN rqmad m USING (event_type)
),
rqpairs AS (
  SELECT a.event_type, a.rn, ll.lag, a.mad4,
         (4 * ABS(a.y - b.y) <= a.mad4) AS r
  FROM rqidx a
  CROSS JOIN (SELECT UNNEST(range(1, {RQA_WINDOW} + 1)) AS lag) ll
  JOIN rqidx b
    ON a.event_type = b.event_type AND b.rn = a.rn + ll.lag
),
rqisl AS (
  SELECT event_type, lag,
         rn - ROW_NUMBER() OVER (PARTITION BY event_type, lag ORDER BY rn) AS grp
  FROM rqpairs WHERE r
),
rqruns AS (
  SELECT event_type, lag, grp, CAST(COUNT(*) AS BIGINT) AS c
  FROM rqisl GROUP BY 1, 2, 3
),
rqdiag AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN c >= {RQA_LMIN} THEN c ELSE 0 END) AS BIGINT) AS n_diag,
         CAST(MAX(c) AS BIGINT) AS lmax
  FROM rqruns GROUP BY 1
),
rqtot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_rec,
         CAST(MAX(mad4) AS BIGINT) AS mad4
  FROM rqpairs GROUP BY 1
)
SELECT t.event_type, t.n_pairs, t.n_rec,
       CAST(t.mad4 AS DOUBLE) / 4.0 AS eps,
       CAST(t.n_rec AS DOUBLE) / CAST(t.n_pairs AS DOUBLE) AS rr,
       CASE WHEN t.n_rec > 0
            THEN CAST(COALESCE(d.n_diag, 0) AS DOUBLE) / CAST(t.n_rec AS DOUBLE)
       END AS det,
       COALESCE(d.lmax, 0) AS lmax
FROM rqtot t LEFT JOIN rqdiag d USING (event_type)
"""

QUERIES["events_recurrence_quant"] = events_recurrence_quant
ORACLES["events_recurrence_quant"] = SQL_EVENTS_RECURRENCE
