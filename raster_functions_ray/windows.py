"""Temporal-window + language-model-scoring operators (round 4).

Three pipeline shapes a 100 TB training-data/analytics stack needs that
the round-3 registry lacked, each SQL-exact:

- ``q_hopping_window``: hopping (sliding) window aggregate over the
  events stream — every event lands in W/H overlapping windows, counts
  and integer-quantized value sums per (window_start, event_type).
  The tumbling complement of events_daily (relational.py).
- ``q_unigram_logprob``: unigram-LM surprisal scoring — the shape of a
  perplexity filter for data selection (train token counts once,
  broadcast the quantized log-prob table, score every doc in one
  streaming pass).  Log-probs are quantized to integer micro-nats so
  the per-doc sum is order-free and the DuckDB oracle (same ln, same
  quantization) is bit-exact; a pytest pins the quantization-boundary
  margin against libm noise.
- ``q_event_debounce``: per-(user, event_type) debounce — keep an event
  iff the previous event of the same key is more than DEBOUNCE_US older
  (the streaming rate-limit / dedup-within-window shape).  Hash-sharded
  and vectorized per shard like relational.q_event_funnel; the oracle
  is a plain LAG window.

Scale notes: the hopping emission is a bounded W/H fan-out of NARROW
rows pre-aggregated in-batch before one small groupby; the LM vocabulary
is bounded by the language (top-V truncation here), so the broadcast is
O(V) regardless of corpus size; the debounce shuffle is keyed on a user
hash shard, so skew is bounded by the hottest user (saltable with
stages/salt if ever needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .sources import read_table

# ---------------------------------------------- hopping window aggregate

WINDOW_US = 3_600_000_000   # 1 h window
HOP_US = 900_000_000        # 15 min hop → every event is in 4 windows


def q_hopping_window(sf_dir: str) -> pd.DataFrame:
    """Per (window_start, event_type): event count + value sum in integer
    cents over hopping 1h/15min windows.  Each event emits W/H = 4 narrow
    rows, pre-aggregated per batch (Arrow hash-count) before one small
    groupby — the shuffle moves O(windows × types × batches) counters,
    never events."""
    from ray.data.aggregate import Sum

    k = WINDOW_US // HOP_US
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy()        # epoch µs
        # cents quantized per ROW (floor(v*100+0.5) on the double), so the
        # aggregate is an order-free int64 sum on both sides
        cents = np.floor(b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        w0 = (ts // HOP_US) * HOP_US
        parts = []
        for j in range(k):
            parts.append(pa.table({
                "window_start": pa.array(w0 - j * HOP_US),
                "event_type": pa.array(et),
                "n": pa.array(np.ones(ts.size, np.int64)),
                "cents": pa.array(cents)}))
        t = pa.concat_tables(parts)
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["window_start", "event_type", "n", "cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby(["window_start", "event_type"])
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("cents", alias_name="sum_cents"))
           .to_pandas())
    out = out.astype({"window_start": "int64", "n_events": "int64",
                      "sum_cents": "int64"})
    return (out[["window_start", "event_type", "n_events", "sum_cents"]]
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True))


Q_HOPPING_WINDOW_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT ((us // {HOP_US}) - t.j) * {HOP_US} AS window_start,
         event_type, cents
  FROM e, UNNEST(generate_series(0, {WINDOW_US // HOP_US - 1})) AS t(j)
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM w GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


# ------------------------------------- unigram-LM surprisal (perplexity)

LM_VOCAB = 2048          # top-V tokens by (count DESC, token ASC)
LM_QUANT = 1_000_000     # micro-nats: qlp = floor(ln(total/c)*1e6 + 0.5)


def _lm_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed token counts: per-batch Arrow hash-count partials →
    gram-keyed groupby — the counts table is vocabulary-sized (bounded by
    the language, not the corpus)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = (pd.Series(b["text"].to_pandas()).str.lower()
                .str.findall(r"[a-z]+").explode().dropna())
        if toks.empty:
            return pa.table({"token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"token": pa.array(vc.index.to_numpy(dtype=object),
                                           pa.string()),
                         "c": pa.array(vc.to_numpy(np.int64))})

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
           .groupby("token").aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    return out.astype({"c": "int64"})


def q_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Per-doc unigram surprisal: sum over tokens of the quantized
    negative log-prob under the corpus's own top-{LM_VOCAB} unigram LM
    (OOV tokens score ln(2·total), i.e. count ½) — the data-selection /
    perplexity-filter shape.  Integer micro-nat quantization makes the
    per-doc sum order-free, so numpy ln and DuckDB ln must only agree to
    <0.5 µnat of the rounding boundary (pytest-pinned margin).

    Engine shape: ONE distributed count pass → O(V) broadcast → ONE
    streaming scoring pass (vectorized searchsorted lookup, reduceat
    sums) — no shuffle touches document text twice."""
    counts = _lm_counts(sf_dir)
    total = int(counts["c"].sum())
    top = counts.sort_values(["c", "token"], ascending=[False, True],
                             kind="mergesort").head(LM_VOCAB)
    vocab = top["token"].to_numpy(dtype=object).astype(str)
    qlp = np.floor(np.log(total / top["c"].to_numpy(np.float64))
                   * LM_QUANT + 0.5).astype(np.int64)
    order = np.argsort(vocab)
    vocab, qlp = vocab[order], qlp[order]
    oov = int(np.floor(np.log(2.0 * total) * LM_QUANT + 0.5))
    lm_ref = ray.put((vocab, qlp))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pd.DataFrame:
        v, q = ray.get(lm_ref)
        df = b.to_pandas()
        toks = df["text"].str.lower().str.findall(r"[a-z]+")
        lens = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().dropna()
        if flat.empty:
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": lens, "n_oov": np.zeros(len(df), np.int64),
                "surprisal_unat": np.zeros(len(df), np.int64)})
        arr = flat.to_numpy(dtype=object).astype(str)
        pos = np.searchsorted(v, arr)
        pos = np.minimum(pos, max(v.size - 1, 0))
        hit = v[pos] == arr if v.size else np.zeros(arr.size, bool)
        per_tok = np.where(hit, q[pos] if v.size else 0, oov)
        # explode preserves the batch's RangeIndex row label = row position
        doc_idx = flat.index.to_numpy(np.int64)
        surp = np.zeros(len(df), np.int64)
        np.add.at(surp, doc_idx, per_tok)
        novv = np.zeros(len(df), np.int64)
        np.add.at(novv, doc_idx, (~hit).astype(np.int64))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_tokens": lens, "n_oov": novv,
                             "surprisal_unat": surp})

    out = ds.map_batches(score, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def unigram_logprob_oracle_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
), cnt AS (
  SELECT token, COUNT(*) AS c FROM toks GROUP BY token
), tot AS (SELECT SUM(c) AS total FROM cnt),
vocab AS (
  SELECT token,
         CAST(floor(ln(CAST(total AS DOUBLE) / c) * {LM_QUANT} + 0.5)
              AS BIGINT) AS qlp
  FROM cnt, tot
  QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, token) <= {LM_VOCAB}
), scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tok,
         SUM(CASE WHEN v.qlp IS NULL THEN 1 ELSE 0 END) AS n_oov,
         SUM(COALESCE(v.qlp,
             (SELECT CAST(floor(ln(2.0 * CAST(total AS DOUBLE)) * {LM_QUANT}
                                + 0.5) AS BIGINT) FROM tot))) AS surp
  FROM toks t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_tok, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(COALESCE(s.surp, 0) AS BIGINT) AS surprisal_unat
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
"""


Q_UNIGRAM_LOGPROB_SQL = unigram_logprob_oracle_sql()


# ------------------------------------------------- per-user-type debounce

DEBOUNCE_US = 600_000_000  # 10 min
DEBOUNCE_SHARDS = 32


def _user_shard(b: pa.Table) -> pa.Table:
    """Append the user-hash shard column shared by the per-user window
    operators — ONE definition so the shard rule can't drift between them."""
    u = b["user_id"].to_numpy()
    return b.append_column(
        "shard", pa.array((u * 2654435761 % 2**31) % DEBOUNCE_SHARDS))


def q_event_debounce(sf_dir: str) -> pd.DataFrame:
    """Keep an event iff the PREVIOUS event of the same (user_id,
    event_type) — ordered by (ts, event_id) — is more than DEBOUNCE_US
    older, or absent.  The streaming rate-limit / within-window-dedup
    shape.  Hash-sharded on user_id (relational.q_event_funnel pattern):
    each shard sorts once and vectorizes the LAG diff — no per-user
    Python group calls, no global sort."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def debounce_shard(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()          # epoch µs
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, et, u))
        eid, ts, u, et = eid[order], ts[order], u[order], et[order]
        same = np.zeros(eid.size, bool)
        if eid.size > 1:
            same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(eid.size, np.int64)
        gap[0] = DEBOUNCE_US + 1
        if eid.size > 1:
            gap[1:] = ts[1:] - ts[:-1]
        kept = ~same | (gap > DEBOUNCE_US)
        return pd.DataFrame({"event_id": eid,
                             "kept": kept.astype(np.int64)})

    out = (ds.map_batches(_user_shard, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(debounce_shard, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


Q_EVENT_DEBOUNCE_SQL = f"""
SELECT event_id,
       CAST(CASE WHEN prev_us IS NULL
                 OR epoch_us(ts) - prev_us > {DEBOUNCE_US}
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM (
  SELECT event_id, ts,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events)
ORDER BY event_id
"""


# ------------------------------------- trailing-window event rate

TRAIL_US = 1_800_000_000  # 30 min trailing window


def q_trailing_rate(sf_dir: str) -> pd.DataFrame:
    """Per event: how many of the SAME USER's events fall in the trailing
    {TRAIL_US}-µs window (current row included) — the sliding-window rate
    behind throttling / burst detection, per-row rather than per-bucket
    (the hopping aggregate's complement).

    Engine shape: user-hash shards (q_event_debounce pattern), one
    lexsort per shard, then a vectorized two-pointer: counts =
    row_position − searchsorted(ts, ts − T within the user's run) — no
    per-user Python, no per-row loop.  The oracle is a RANGE window
    frame."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def rate_shard(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        u = g["user_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        eid, ts, u = eid[order], ts[order], u[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], u.size]
        # ts is sorted only WITHIN each user's run, so a single global
        # searchsorted needs a surrogate that is globally increasing:
        # rebase each run to zero and lift run r by r·STEP, STEP wider
        # than any run's span + the window — runs then occupy disjoint
        # value ranges and one vectorized searchsorted answers every
        # within-run window-start query (no per-user Python loop)
        span = ts[ends - 1] - ts[starts]
        step = int(span.max()) + TRAIL_US + 2 if span.size else 1
        run_idx = np.cumsum(np.r_[False, u[1:] != u[:-1]]).astype(np.int64)
        base = np.repeat(ts[starts], ends - starts)
        adj = (ts - base) + run_idx * step
        lo = np.searchsorted(adj, adj - TRAIL_US, side="left")
        # RANGE ... CURRENT ROW frames include PEERS (same-ts rows sorted
        # after the current one), so the frame end is the last same-ts row
        hi = np.searchsorted(adj, adj, side="right")
        n_window = (hi - lo).astype(np.int64)
        return pd.DataFrame({"event_id": eid, "n_window": n_window})

    out = (ds.map_batches(_user_shard, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(rate_shard, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


Q_TRAILING_RATE_SQL = f"""
SELECT event_id,
       CAST(COUNT(*) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_window
FROM events ORDER BY event_id
"""


# -------------------------------------------------- trailing window median

TRAIL_MED_W = 5


def q_trailing_median(sf_dir: str) -> pd.DataFrame:
    """Per-event trailing median of `value` over the last {TRAIL_MED_W}
    rows of the user's stream (robust smoothing behind anomaly detection).
    The statistic is an ELEMENT of the window (lower median), so the
    double compares hash-exact with no arithmetic.

    Vectorized per ordered group: stack the {TRAIL_MED_W} shifted columns
    with NaN head-pads, row-sort (NaN high), index (m−1)//2 where m is the
    valid count — no per-row Python."""
    from .sources import read_table

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def trail(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = g["value"].to_numpy(np.float64)
        n = len(v)
        cols = [np.concatenate([np.full(k, np.nan), v[:n - k]])
                for k in range(TRAIL_MED_W)]
        m = np.minimum(np.arange(n) + 1, TRAIL_MED_W)
        win = np.sort(np.stack(cols, axis=1), axis=1)  # NaN sorts last
        med = win[np.arange(n), (m - 1) // 2]
        return pd.DataFrame({"event_id": g["event_id"].astype(np.int64),
                             "trail_med": med})

    out = (ds.groupby("user_id").map_groups(trail, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


Q_TRAILING_MEDIAN_SQL = f"""
SELECT event_id,
       quantile_disc(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {TRAIL_MED_W - 1} PRECEDING AND CURRENT ROW) AS trail_med
FROM events
"""


# ----------------------- cross-type band join (stream interval join)

BAND_US = 900_000_000   # 15 min lookback


def q_band_join(sf_dir: str) -> pd.DataFrame:
    """Stream interval join across types: per 'purchase' event, how many
    'view' events by the SAME user fall in the trailing {BAND_US}-µs band
    [t−T, t) — the attribution-window join (two-sided, unlike the
    trailing self-rate).

    Engine shape: both sides land in the same user-hash shard, each shard
    lexsorts once per side and answers every purchase with two
    searchsorted cursors into that user's view run — a vectorized
    band join with no per-row loop and no global sort.  The oracle is a
    correlated RANGE-frame count."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(
        expr="event_type == 'purchase' or event_type == 'view'")

    def band_shard(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        isv = et == "view"
        # composite key = dense-user-rank · span + (ts − ts_min): ONE
        # sorted array answers every probe with two vectorized
        # searchsorteds.  Dense ranks + the shard's ACTUAL span keep the
        # product far from int64 (a raw user_id·2⁵¹ pack silently wrapped
        # at user_id ≥ 4096); the overflow check is exact Python ints.
        uniq = np.unique(u)
        t0 = int(ts.min()) - BAND_US - 1
        span = int(ts.max()) - t0 + BAND_US + 2
        if len(uniq) * span >= (1 << 63):   # pragma: no cover — ~3.5M
            raise OverflowError(            # users·30-day span per shard
                "band_join composite key would overflow; raise "
                "DEBOUNCE_SHARDS so each shard holds fewer users")
        SH = np.int64(span)
        ud = np.searchsorted(uniq, u).astype(np.int64)
        key_v = np.sort(ud[isv] * SH + (ts[isv] - t0))
        pe, pt, pu = eid[~isv], ts[~isv], ud[~isv]
        lo = np.searchsorted(key_v, pu * SH + (pt - t0 - BAND_US), side="left")
        hi = np.searchsorted(key_v, pu * SH + (pt - t0), side="left")
        return pd.DataFrame({"event_id": pe,
                             "n_views": (hi - lo).astype(np.int64)})

    out = (ds.map_batches(_user_shard, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(band_shard, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


Q_BAND_JOIN_SQL = f"""
SELECT p.event_id,
       CAST(COUNT(v.event_id) AS BIGINT) AS n_views
FROM (SELECT event_id, ts, user_id FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND epoch_us(v.ts) >= epoch_us(p.ts) - {BAND_US}
 AND epoch_us(v.ts) < epoch_us(p.ts)
GROUP BY p.event_id
ORDER BY p.event_id
"""


# -------------------- autocorrelation sufficient statistics (daily counts)

ACF_LAGS = 7   # lags 1..7 over the 30-day series (weekly seasonality scan)


def q_acf_daily(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation SUFFICIENT STATISTICS per event type over its
    30-day event-count series — the seasonality scan that feeds model
    selection for the SARIMA family (functions/SeasonalARIMA.py's
    seasonal period is an input; this is how a pipeline would detect
    it).  Exact integer moments only (the group_regression discipline —
    the float ACF r_k = (n·sxy − sa·sb)/… is a driver formula): per
    (event_type, lag k ∈ 1..{ACF_LAGS}): n_pairs, Σ xₜ·xₜ₊ₖ, Σ xₜ
    (leading window), Σ xₜ₊ₖ (trailing window), plus the lag-0 row
    carrying Σx and Σx².

    Engine shape: per-batch Arrow (type, day) count partials → ONE
    type-keyed exchange of cube-sized rows (O(types·days·blocks), never
    events) → per-type vectorized shifted products over the densified
    series.  Empty days count as zero."""
    from .spatial import ST_BIN_US, ST_BINS, ST_T0_US

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        et = b["event_type"].to_numpy(zero_copy_only=False)
        d = (us - ST_T0_US) // ST_BIN_US
        ok = (d >= 0) & (d < ST_BINS)
        t = pa.table({"event_type": pa.array(et[ok]),
                      "bin": pa.array(d[ok]),
                      "n": pa.array(np.ones(int(ok.sum()), np.int64))})
        g = t.group_by(["event_type", "bin"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "bin", "n"])

    def acf_type(g: pd.DataFrame) -> pd.DataFrame:
        x = np.zeros(ST_BINS, np.int64)
        np.add.at(x, g["bin"].to_numpy(np.int64), g["n"].to_numpy(np.int64))
        rows = [{"event_type": g["event_type"].iloc[0], "lag": 0,
                 "n_pairs": ST_BINS, "sxy": int((x * x).sum()),
                 "sa": int(x.sum()), "sb": int(x.sum())}]
        for k in range(1, ACF_LAGS + 1):
            rows.append({"event_type": g["event_type"].iloc[0], "lag": k,
                         "n_pairs": ST_BINS - k,
                         "sxy": int((x[:-k] * x[k:]).sum()),
                         "sa": int(x[:-k].sum()), "sb": int(x[k:].sum())})
        return pd.DataFrame(rows)

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("event_type")
           .map_groups(acf_type, batch_format="pandas")
           .to_pandas())
    out = out.astype({"lag": "int64", "n_pairs": "int64", "sxy": "int64",
                      "sa": "int64", "sb": "int64"})
    return (out.sort_values(["event_type", "lag"]).reset_index(drop=True))


def acf_daily_oracle_sql() -> str:
    from .spatial import ST_BIN_US, ST_BINS, ST_T0_US

    return f"""
WITH counts AS MATERIALIZED (
  SELECT event_type, (epoch_us(ts) - {ST_T0_US}) // {ST_BIN_US} AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE (epoch_us(ts) - {ST_T0_US}) // {ST_BIN_US}
        BETWEEN 0 AND {ST_BINS - 1}
  GROUP BY 1, 2),
dense AS MATERIALIZED (
  SELECT e.event_type, t.b AS bin, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM counts) e
  CROSS JOIN (SELECT CAST(range AS BIGINT) AS b
              FROM range(0, {ST_BINS})) t
  LEFT JOIN counts c ON c.event_type = e.event_type AND c.bin = t.b),
lags AS (SELECT CAST(range AS BIGINT) AS lag
         FROM range(0, {ACF_LAGS + 1}))
SELECT a.event_type, l.lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
       CAST(SUM(a.n) AS BIGINT) AS sa,
       CAST(SUM(b.n) AS BIGINT) AS sb
FROM lags l
JOIN dense a ON TRUE
JOIN dense b ON b.event_type = a.event_type AND b.bin = a.bin + l.lag
GROUP BY a.event_type, l.lag
ORDER BY a.event_type, l.lag
"""


# ------------------- keyed gap-fill imputation (LOCF forward fill)

def q_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Per-user daily gap-fill with LOCF (last-observation-carried-
    forward) imputation — the keyed time-series complement of the
    raster FillRaster/ReplaceNulls family: densify every observed
    user's 30-day activity series and fill gaps from the last observed
    day.  Per (user_id, day): v = that day's event count if observed,
    else the most recent observed count; src = 0 observed / 1 filled /
    2 leading (no prior observation, v = 0).  Exact integers.

    Scale shape: per-batch (user, day, count) unique-count partials →
    ONE groupby-Sum whose result IS output-sized (|users|·≤30 rows ≪
    corpus); the densify + LOCF scan runs vectorized on the result
    (running-maximum of observed day indices + one take_along_axis) —
    the repo's result-sized driver-merge discipline.  The events
    corpus streams through exactly once."""
    from ray.data.aggregate import Sum as ASum

    from .spatial import ST_BIN_US, ST_BINS, ST_T0_US

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], np.int64)
        day = (b["ts"].cast(pa.int64()).to_numpy() - ST_T0_US) // ST_BIN_US
        ok = (day >= 0) & (day < ST_BINS)
        key = u[ok] * ST_BINS + day[ok]
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"user_id": pa.array(uk // ST_BINS),
                         "day": pa.array(uk % ST_BINS),
                         "c": pa.array(c.astype(np.int64))})

    obs = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["user_id", "day"])
           .aggregate(ASum("c", alias_name="c"))
           .to_pandas())                       # output-sized
    users = np.sort(obs["user_id"].unique())
    ui = np.searchsorted(users, obs["user_id"].to_numpy(np.int64))
    dd = obs["day"].to_numpy(np.int64)
    C = np.zeros((users.size, ST_BINS), np.int64)
    C[ui, dd] = obs["c"].to_numpy(np.int64)
    seen = np.full((users.size, ST_BINS), -1, np.int64)
    seen[ui, dd] = dd
    last = np.maximum.accumulate(seen, axis=1)   # last observed day ≤ d
    v = np.where(last >= 0,
                 np.take_along_axis(C, np.maximum(last, 0), axis=1), 0)
    src = np.where(seen >= 0, 0, np.where(last >= 0, 1, 2))
    out = pd.DataFrame({
        "user_id": np.repeat(users, ST_BINS),
        "day": np.tile(np.arange(ST_BINS, dtype=np.int64), users.size),
        "v": v.ravel().astype(np.int64),
        "src": src.ravel().astype(np.int64)})
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


Q_GAP_FILL_SQL = """
WITH obs AS (
  SELECT user_id,
         (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE (epoch_us(ts) - 1704067200000000) // 86400000000 BETWEEN 0 AND 29
  GROUP BY user_id, day
), grid AS (
  SELECT u.user_id, d.day
  FROM (SELECT DISTINCT user_id FROM obs) u,
       (SELECT unnest(generate_series(0, 29)) AS day) d
), j AS (
  SELECT g.user_id, g.day, o.c
  FROM grid g LEFT JOIN obs o USING (user_id, day)
), f AS (
  SELECT user_id, day, c,
         last_value(c IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS locf
  FROM j
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       CAST(COALESCE(locf, 0) AS BIGINT) AS v,
       CAST(CASE WHEN c IS NOT NULL THEN 0
                 WHEN locf IS NOT NULL THEN 1 ELSE 2 END AS BIGINT) AS src
FROM f ORDER BY user_id, day
"""


def q_gap_fill_linear(sf_dir: str) -> pd.DataFrame:
    """Linear-interpolation gap fill — the interpolation sibling of
    q_gap_fill (pandas ``interpolate`` / ArcGIS temporal fill shape):
    a gap day with observations on BOTH sides takes the floor of the
    linear interpolant between them (integer-exact: counts and day
    gaps are nonnegative, so truncation == floor on both engines); a
    tail gap carries the last observation (LOCF), a leading gap is 0.
    Per (user_id, day): v and src = 0 obs / 1 interpolated / 2
    tail-carried / 3 leading.

    Scale shape: identical to q_gap_fill — one output-sized
    groupby-Sum, then the neighbor scans are two vectorized running
    maxima (forward for the previous observed day, reversed for the
    next) on the result matrix."""
    from ray.data.aggregate import Sum as ASum

    from .spatial import ST_BIN_US, ST_BINS, ST_T0_US

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], np.int64)
        day = (b["ts"].cast(pa.int64()).to_numpy() - ST_T0_US) // ST_BIN_US
        ok = (day >= 0) & (day < ST_BINS)
        key = u[ok] * ST_BINS + day[ok]
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"user_id": pa.array(uk // ST_BINS),
                         "day": pa.array(uk % ST_BINS),
                         "c": pa.array(c.astype(np.int64))})

    obs = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["user_id", "day"])
           .aggregate(ASum("c", alias_name="c"))
           .to_pandas())
    users = np.sort(obs["user_id"].unique())
    ui = np.searchsorted(users, obs["user_id"].to_numpy(np.int64))
    dd = obs["day"].to_numpy(np.int64)
    C = np.zeros((users.size, ST_BINS), np.int64)
    C[ui, dd] = obs["c"].to_numpy(np.int64)
    seen = np.full((users.size, ST_BINS), -1, np.int64)
    seen[ui, dd] = dd
    prev = np.maximum.accumulate(seen, axis=1)
    # next observed day: reversed running minimum over (day where seen)
    seen_next = np.where(seen >= 0, seen, ST_BINS)
    nxt = np.minimum.accumulate(seen_next[:, ::-1], axis=1)[:, ::-1]
    p = np.maximum(prev, 0)
    q = np.minimum(nxt, ST_BINS - 1)
    cp = np.take_along_axis(C, p, axis=1)
    cq = np.take_along_axis(C, q, axis=1)
    days = np.arange(ST_BINS, dtype=np.int64)[None, :]
    span = np.maximum(nxt - prev, 1)
    interp = (cp * (nxt - days) + cq * (days - prev)) // span
    is_obs = seen >= 0
    has_prev = prev >= 0
    has_next = nxt < ST_BINS
    v = np.where(is_obs, C,
                 np.where(has_prev & has_next, interp,
                          np.where(has_prev, cp, 0)))
    src = np.where(is_obs, 0,
                   np.where(has_prev & has_next, 1,
                            np.where(has_prev, 2, 3)))
    out = pd.DataFrame({
        "user_id": np.repeat(users, ST_BINS),
        "day": np.tile(days.ravel(), users.size),
        "v": v.ravel().astype(np.int64),
        "src": src.ravel().astype(np.int64)})
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


Q_GAP_FILL_LINEAR_SQL = """
WITH obs AS (
  SELECT user_id,
         (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE (epoch_us(ts) - 1704067200000000) // 86400000000 BETWEEN 0 AND 29
  GROUP BY user_id, day
), grid AS (
  SELECT u.user_id, d.day
  FROM (SELECT DISTINCT user_id FROM obs) u,
       (SELECT unnest(generate_series(0, 29)) AS day) d
), j AS (
  SELECT g.user_id, g.day, o.c
  FROM grid g LEFT JOIN obs o USING (user_id, day)
), f AS (
  SELECT user_id, day, c,
         last_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
           OVER w_prev AS pd,
         last_value(c IGNORE NULLS) OVER w_prev AS pc,
         first_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
           OVER w_next AS nd,
         first_value(c IGNORE NULLS) OVER w_next AS nc
  FROM j
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY day
                    ROWS UNBOUNDED PRECEDING),
         w_next AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       CAST(CASE WHEN c IS NOT NULL THEN c
                 WHEN pd IS NOT NULL AND nd IS NOT NULL
                   THEN (pc * (nd - day) + nc * (day - pd)) // (nd - pd)
                 WHEN pd IS NOT NULL THEN pc ELSE 0 END AS BIGINT) AS v,
       CAST(CASE WHEN c IS NOT NULL THEN 0
                 WHEN pd IS NOT NULL AND nd IS NOT NULL THEN 1
                 WHEN pd IS NOT NULL THEN 2 ELSE 3 END AS BIGINT) AS src
FROM f ORDER BY user_id, day
"""
