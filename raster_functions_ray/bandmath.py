"""Band-algebra queries with SQL oracles: the reference's scalar pixel
formulas (Windchill, HeatIndex, FuzzyMembership, Arithmetic) applied to
column-derived fields so DuckDB can verify them value-exactly.

The same kernels (functions/pointwise.py) run over tile pixels in the raster
pipelines; here they run over columns derived deterministically from the
events/lineitem tables — identical IEEE arithmetic both sides, rounded to 4
decimals to absorb libm ulp differences (np.power vs duckdb pow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .functions import pointwise as pw
from .sources import read_table

# temperature in F derived from value∈[0,100): t = value − 20 ∈ [−20, 80)
# wind speed mph: ws = (event_id % 40) + 1 ∈ [1, 40]
_DERIVE_SQL = """
  SELECT event_id,
         CAST(value - 20.0 AS DOUBLE) AS t,
         CAST((event_id % 40) + 1 AS DOUBLE) AS ws,
         CAST((event_id % 90) + 5 AS DOUBLE) AS rh
  FROM events
"""


def _derive(b: pa.Table) -> pd.DataFrame:
    eid = np.asarray(b["event_id"], dtype=np.int64)
    val = np.asarray(b["value"], dtype=np.float64)
    return pd.DataFrame({
        "event_id": eid,
        "t": val - 20.0,
        "ws": ((eid % 40) + 1).astype(np.float64),
        "rh": ((eid % 90) + 5).astype(np.float64),
    })


def q_windchill(sf_dir: str) -> pd.DataFrame:
    """Windchill formula (functions/deprecated/Windchill.py:93-129) over
    derived columns; mask semantics → wc only where ws>=0 (always here)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def kern(b: pa.Table) -> pd.DataFrame:
        df = _derive(b)
        # f8 path (columns, not f4 pixels) so it matches SQL double math
        t, ws = df["t"].to_numpy(), df["ws"].to_numpy()
        ws16 = np.power(ws, 0.16)
        wc = 35.74 + 0.6215 * t + 0.4275 * t * ws16 - 35.75 * ws16
        # half-up fixed-point: identical IEEE ops to the SQL oracle (numpy
        # round() is half-even, DuckDB ROUND is half-away -- avoid both)
        wc = np.floor(wc * 10000.0 + 0.5) / 10000.0
        return pd.DataFrame({"event_id": df["event_id"], "wc": wc})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_WINDCHILL_SQL = f"""
WITH d AS ({_DERIVE_SQL})
SELECT event_id,
       floor((35.74 + 0.6215 * t + 0.4275 * t * pow(ws, 0.16) - 35.75 * pow(ws, 0.16)) * 10000.0 + 0.5) / 10000.0 AS wc
FROM d
"""


def q_heat_index(sf_dir: str) -> pd.DataFrame:
    """Rothfusz heat index incl. the reference's adjustment regions
    (functions/deprecated/HeatIndex.py:73-117) over derived columns, in the
    REAL f4 kernel.  SQL-exact: DuckDB FLOAT arithmetic is true binary32
    (verified bit-identical to NumPy f4), constants enter via
    CAST(CAST(c AS DOUBLE) AS FLOAT) to match Python's two-step literal
    rounding, and the sqrt double-rounding is innocuous (binary64 carries
    ≥ 2·24+2 bits)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def kern(b: pa.Table) -> pd.DataFrame:
        df = _derive(b)
        t = (df["t"].to_numpy() + 60.0)  # shift into HI-relevant range [40, 140)
        hi = pw.heat_index(t.astype(np.float32), df["rh"].to_numpy(np.float32))
        return pd.DataFrame({"event_id": df["event_id"],
                             "hi": hi.astype(np.float64)})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


def _fl(c) -> str:
    """A numeric literal as the IDENTICAL binary32 numpy would produce:
    decimal → double (one rounding, = Python float literal) → float."""
    return f"CAST(CAST({c!r} AS DOUBLE) AS FLOAT)"


def _heat_index_f4_sql() -> str:
    """Op-for-op FLOAT mirror of pointwise.heat_index (f4 path)."""
    t, r = "t", "r"
    H = (f"({_fl(0.5)} * (({t} + {_fl(61.0)})"
         f" + ((({t} - {_fl(68.0)}) * {_fl(1.2)}) + ({r} * {_fl(0.094)}))))")
    # left-fold the Rothfusz polynomial exactly like numpy's evaluation order
    full = _fl(-42.379)
    for op, coef, term in [("+", 2.04901523, t), ("+", 10.14333127, r),
                           ("-", 0.22475541, "tr"), ("-", 6.83783e-3, "tt"),
                           ("-", 5.481717e-2, "rr"), ("+", 1.22874e-3, "ttr"),
                           ("+", 8.5282e-4, "trr"), ("-", 1.99e-6, "ttrr")]:
        full = f"({full} {op} ({_fl(coef)} * {term}))"
    adj1 = (f"((({_fl(13.0)} - {r}) / {_fl(4.0)})"
            f" * CAST(SQRT(CAST((({_fl(17.0)} - ABS({t} - {_fl(95.0)}))"
            f" / {_fl(17.0)}) AS DOUBLE)) AS FLOAT))")
    adj2 = (f"((({t} - {_fl(85.0)}) / {_fl(10.0)})"
            f" * (({_fl(87.0)} - {t}) / {_fl(5.0)}))")
    assert full.count("(") == full.count(")")
    return f"""
WITH d AS ({_DERIVE_SQL}),
base AS (
  SELECT event_id, CAST(t + 60.0 AS FLOAT) AS t, CAST(rh AS FLOAT) AS r FROM d
), prods AS (
  SELECT event_id, t, r, (t * r) AS tr, (r * r) AS rr, (t * t) AS tt,
         ((t * t) * r) AS ttr, (t * (r * r)) AS trr, (((t * t) * r) * r) AS ttrr,
         {H} AS H
  FROM base
), adj AS (
  SELECT event_id, t, r, H,
         CASE WHEN r < 13 AND t >= {_fl(80.0)} AND t <= 112
              THEN ({full} - {adj1})
              WHEN r > 85 AND t >= {_fl(80.0)} AND t <= 87
              THEN ({full} + {adj2})
              ELSE {full} END AS fullv
  FROM prods
)
SELECT event_id,
       CAST(CASE WHEN ((H + t) / {_fl(2.0)}) > 80 THEN fullv ELSE H END
            AS DOUBLE) AS hi
FROM adj
"""


Q_HEAT_INDEX_SQL = _heat_index_f4_sql()


def q_fuzzy_linear(sf_dir: str) -> pd.DataFrame:
    """Fuzzy linear membership (functions/FuzzyMembership.py:119-121) of
    l_quantity between 10 and 40, clipped [0,1] — exact in doubles."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def kern(b: pa.Table) -> pd.DataFrame:
        q = np.asarray(b["l_quantity"], dtype=np.float64)
        r = np.clip((q - 10.0) / (40.0 - 10.0), 0.0, 1.0)
        return pd.DataFrame({"l_orderkey": np.asarray(b["l_orderkey"]),
                             "l_linenumber": np.asarray(b["l_linenumber"]),
                             "membership": np.round(r, 6)})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_FUZZY_LINEAR_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(LEAST(GREATEST((l_quantity - 10.0) / 30.0, 0.0), 1.0), 6) AS membership
FROM lineitem
"""


def q_arithmetic_cols(sf_dir: str) -> pd.DataFrame:
    """Arithmetic op (functions/deprecated/Arithmetic.py:46-64) as column
    algebra: extendedprice / quantity (divide), rounded."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber",
                                                 "l_extendedprice", "l_quantity"])

    def kern(b: pa.Table) -> pd.DataFrame:
        with np.errstate(divide="ignore"):
            r = np.asarray(b["l_extendedprice"], np.float64) / np.asarray(b["l_quantity"], np.float64)
        r = np.floor(r * 10000.0 + 0.5) / 10000.0  # half-up, matches oracle
        return pd.DataFrame({"l_orderkey": np.asarray(b["l_orderkey"]),
                             "l_linenumber": np.asarray(b["l_linenumber"]),
                             "unit_price": r})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_ARITHMETIC_COLS_SQL = """
SELECT l_orderkey, l_linenumber,
       floor((l_extendedprice / l_quantity) * 10000.0 + 0.5) / 10000.0 AS unit_price
FROM lineitem
"""


def q_convert_per_month(sf_dir: str) -> pd.DataFrame:
    """ConvertPerSecondToPerMonth
    (functions/deprecated/ConvertPerSecondToPerMonth.py:43-75): scale a
    per-second rate by seconds-in-the-acquisition-month, month taken from
    the row timestamp — pure double multiplication, SQL-exact."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "value"])

    def kern(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        days = df["ts"].dt.days_in_month.to_numpy(np.float64)
        out = df["value"].to_numpy(np.float64) * (days * 86400.0)
        return pd.DataFrame({"event_id": df["event_id"], "per_month": out})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_CONVERT_PER_MONTH_SQL = """
SELECT event_id,
       value * (CAST(date_part('day', last_day(ts)) AS DOUBLE) * 86400.0) AS per_month
FROM events
"""


def q_fuzzy_mssmall_two_phase(sf_dir: str) -> pd.DataFrame:
    """FuzzyMembership MS-Small (functions/FuzzyMembership.py:139-143) over
    l_quantity — the TWO-PHASE global-statistics plan (SURVEY.md §7.2):
    phase 1 computes dataset mean/std with a distributed aggregate, phase 2
    broadcasts the scalars into the map stage.  SQL oracle recomputes with
    AVG/STDDEV_POP."""
    import ray

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    # phase 1: sum / sumsq / n partials → exact population mean/std
    def moments(b: pa.Table) -> pd.DataFrame:
        q = np.asarray(b["l_quantity"], dtype=np.float64)
        return pd.DataFrame({"s": [q.sum()], "ss": [(q * q).sum()], "n": [q.size]})

    agg = (ds.map_batches(moments, batch_format="pyarrow", batch_size=65536)
           .map_batches(lambda b: pd.DataFrame({"s": [np.asarray(b["s"]).sum()],
                                                "ss": [np.asarray(b["ss"]).sum()],
                                                "n": [np.asarray(b["n"]).sum()]}),
                        batch_format="pyarrow", batch_size=8192)
           .to_pandas().sum())
    mean = agg["s"] / agg["n"]
    # population std via E[x²] − mean² (matches STDDEV_POP up to fp noise,
    # absorbed by round-6 of the final membership)
    std = float(np.sqrt(agg["ss"] / agg["n"] - mean * mean))
    stats_ref = ray.put((float(mean), std))

    def kern(b: pa.Table) -> pd.DataFrame:
        m, s = ray.get(stats_ref)
        q = np.asarray(b["l_quantity"], dtype=np.float64)
        out = np.where(q <= m, 1.0, s / (q - m + s))
        return pd.DataFrame({"l_orderkey": np.asarray(b["l_orderkey"]),
                             "l_linenumber": np.asarray(b["l_linenumber"]),
                             "membership": np.round(out, 6)})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_FUZZY_MSSMALL_SQL = """
WITH s AS (SELECT AVG(l_quantity) AS m, STDDEV_POP(l_quantity) AS sd FROM lineitem)
SELECT l_orderkey, l_linenumber,
       ROUND(CASE WHEN l_quantity <= s.m THEN 1.0
                  ELSE s.sd / (l_quantity - s.m + s.sd) END, 6) AS membership
FROM lineitem, s
"""


def q_heat_index_f8(sf_dir: str) -> pd.DataFrame:
    """Rothfusz heat index in f8 column form with the reference's exact
    branch structure (functions/deprecated/HeatIndex.py:73-117), including
    its idiosyncratic high-humidity adjustment ((t-85)/10)*((87-t)/5) —
    SQL-exact via an identical CASE cascade."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def kern(b: pa.Table) -> pd.DataFrame:
        df = _derive(b)
        t = df["t"].to_numpy() + 60.0  # [40, 140)
        r = df["rh"].to_numpy()
        H = 0.5 * (t + 61.0 + ((t - 68.0) * 1.2) + (r * 0.094))
        a = ((H + t) / 2.0) > 80.0
        tr, rr, tt = t * r, r * r, t * t
        full = (-42.379 + 2.04901523 * t + 10.14333127 * r - 0.22475541 * tr
                - 6.83783e-3 * tt - 5.481717e-2 * rr + 1.22874e-3 * tt * r
                + 8.5282e-4 * t * rr - 1.99e-6 * tt * rr)
        c1 = a & (r < 13.0) & (t >= 80.0) & (t <= 112.0)
        adj1 = ((13.0 - r) / 4.0) * np.sqrt((17.0 - np.abs(t - 95.0)) / 17.0)
        c2 = a & (r > 85.0) & (t >= 80.0) & (t <= 87.0)
        adj2 = ((t - 85.0) / 10.0) * ((87.0 - t) / 5.0)
        out = np.where(a, full - np.where(c1, adj1, 0.0) + np.where(c2, adj2, 0.0), H)
        out = np.floor(out * 10000.0 + 0.5) / 10000.0
        return pd.DataFrame({"event_id": df["event_id"], "hi": out})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_HEAT_INDEX_F8_SQL = f"""
WITH d AS ({_DERIVE_SQL}),
base AS (
  SELECT event_id, t + 60.0 AS tt_, rh AS r FROM d
), steps AS (
  SELECT event_id, tt_ AS t, r,
         0.5 * (tt_ + 61.0 + ((tt_ - 68.0) * 1.2) + (r * 0.094)) AS H
  FROM base
)
SELECT event_id,
  floor((CASE WHEN (H + t) / 2.0 > 80.0 THEN
      (-42.379 + 2.04901523 * t + 10.14333127 * r - 0.22475541 * (t * r)
       - 6.83783e-3 * (t * t) - 5.481717e-2 * (r * r) + 1.22874e-3 * (t * t) * r
       + 8.5282e-4 * t * (r * r) - 1.99e-6 * (t * t) * (r * r))
      - (CASE WHEN r < 13.0 AND t >= 80.0 AND t <= 112.0
              THEN ((13.0 - r) / 4.0) * sqrt((17.0 - abs(t - 95.0)) / 17.0)
              ELSE 0.0 END)
      + (CASE WHEN r > 85.0 AND t >= 80.0 AND t <= 87.0
              THEN ((t - 85.0) / 10.0) * ((87.0 - t) / 5.0)
              ELSE 0.0 END)
    ELSE H END) * 10000.0 + 0.5) / 10000.0 AS hi
FROM steps
"""


def q_fish_habitat_f8(sf_dir: str) -> pd.DataFrame:
    """FishHabitatSuitability trapezoid membership in f8 column form
    (functions/FishHabitatSuitability.py:71-99): temp and salinity derived
    from event columns, fixed depth factor — SQL-exact CASE cascade."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    from .functions.pointwise import depth_factor
    dfac = depth_factor(5.0)  # plateau → 1.0

    def trap(x, min_a, min_p, max_p, max_a):
        out = np.where(x <= min_p, (x - min_a) / (min_p - min_a),
                       np.where(x >= max_p, (x - max_a) / (max_p - max_a), 1.0))
        return np.where(out < 0.0, 0.0, out)

    def kern(b: pa.Table) -> pd.DataFrame:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        val = np.asarray(b["value"], dtype=np.float64)
        temp = 15.0 + val * 0.2            # [15, 35)
        sal = 28.0 + ((eid % 90).astype(np.float64)) * 0.1  # [28, 37)
        tm = trap(temp, 17.99, 26.37, 29.15, 33.35)
        sm = trap(sal, 28.81, 32.27, 35.81, 36.79)
        out = np.floor(tm * sm * dfac * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"event_id": eid, "suitability": out})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_FISH_HABITAT_F8_SQL = """
WITH d AS (
  SELECT event_id,
         15.0 + value * 0.2 AS temp,
         28.0 + CAST(event_id % 90 AS DOUBLE) * 0.1 AS sal
  FROM events
), m AS (
  SELECT event_id,
    GREATEST(CASE WHEN temp <= 26.37 THEN (temp - 17.99) / (26.37 - 17.99)
                  WHEN temp >= 29.15 THEN (temp - 33.35) / (29.15 - 33.35)
                  ELSE 1.0 END, 0.0) AS tm,
    GREATEST(CASE WHEN sal <= 32.27 THEN (sal - 28.81) / (32.27 - 28.81)
                  WHEN sal >= 35.81 THEN (sal - 36.79) / (35.81 - 36.79)
                  ELSE 1.0 END, 0.0) AS sm
  FROM d
)
SELECT event_id, floor(tm * sm * 1.0 * 1000000.0 + 0.5) / 1000000.0 AS suitability
FROM m
"""


def q_fuzzy_gaussian(sf_dir: str) -> pd.DataFrame:
    """Fuzzy Gaussian membership (functions/FuzzyMembership.py:123-125)
    of l_quantity around midpoint 25 with spread 0.01: e^(−a(x−mid)²),
    clipped [0,1], using the SAME kernel as the raster path
    (functions/pointwise.fuzzy_membership mode='gaussian').  ROUND(6)
    absorbs pow-vs-exp last-ulp differences vs DuckDB."""
    from .functions import pointwise as pw

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def kern(b: pa.Table) -> pd.DataFrame:
        q = np.asarray(b["l_quantity"], dtype=np.float64)
        r = pw.fuzzy_membership(q, mode="gaussian", par1=25.0, par2=0.01)
        return pd.DataFrame({"l_orderkey": np.asarray(b["l_orderkey"]),
                             "l_linenumber": np.asarray(b["l_linenumber"]),
                             "membership": np.round(r, 6)})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=65536).to_pandas()


Q_FUZZY_GAUSSIAN_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(LEAST(GREATEST(exp(-0.01 * (l_quantity - 25.0) * (l_quantity - 25.0)),
                            0.0), 1.0), 6) AS membership
FROM lineitem
"""
