"""Sketch / summary-statistics operators for 100-TB-scale profiling
(task brief: training-data pipeline analytics beyond the reference).

- KMV (K-minimum-values) distinct-count sketch: DETERMINISTIC given
  the hash, so it is value-checkable against a SQL oracle
  (the k smallest md5 hashes and the (k-1)/U_(k) estimator are both
  expressible in DuckDB). hll_distinct applies the same md5-replay
  trick to HyperLogLog (the ES `cardinality` estimator) with an
  order-independent integer harmonic fold. Per block only the k smallest hashes
  survive (map-side combiner), the global merge is a bounded top-k —
  the shuffle payload is O(k x blocks) regardless of input size.
- histogram quantiles: EXACT discrete quantiles via a distributed
  value histogram — the shuffle moves one row per distinct value per
  block, then the (distinct values, count) table is reduced on the
  driver. Correct per DuckDB's quantile_disc rule (element at
  ceil(q*n), 1-indexed). Assumes a DISCRETE / bounded-cardinality
  column (flags, categories, quantized measures); for continuous
  columns quantize first — a 100-TB float column with all-distinct
  values needs a streaming sketch (t-digest) instead, which has no
  exact oracle.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from search_engine_ray.ops.relational import distinct, topk, value_counts
from search_engine_ray.ops.rounding import round_half_up

_TWO64 = float(1 << 64)


def _md5_upper64(values: list[str]) -> np.ndarray:
    """First 8 md5 bytes, little-endian — DuckDB's md5_number_upper."""
    return np.array(
        [int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "little") for v in values],
        dtype=np.uint64,
    )


def kmv_distinct(ds: Dataset, col: str, k: int = 256) -> float:
    """Approximate distinct count of `col` via the KMV sketch:
    hash every value to (0, 2^64), keep the k smallest distinct
    hashes; if fewer than k survive the count is exact, else
    estimate = (k-1) / (kth_smallest / 2^64).

    Values are hashed as their string form (md5_number_upper
    semantics) so the estimate is reproducible in SQL. The final <=k
    hashes are collected on the driver (k values — not a data-scale
    materialization). Estimate is rounded half-away-from-zero to 4
    decimals to pin float formatting against the oracle."""

    # hashes travel as int64 via the order-preserving remap h ^ 2^63
    # (uint64 degrades to pickled objects in the groupby/sort shuffle)
    _FLIP = np.uint64(1 << 63)

    def _partial(t: pa.Table) -> pa.Table:
        vals = pc.unique(pc.cast(t[col], pa.string()))
        h = np.unique(_md5_upper64(vals.to_pylist()))  # sorts ascending
        return pa.table({"h": (h[:k] ^ _FLIP).view(np.int64)})

    # the same value appears in many blocks: dedupe the per-block
    # survivors (shuffle payload <= k x blocks rows) before the global
    # bounded top-k picks the k smallest DISTINCT hashes
    survivors = topk(
        distinct(ds.map_batches(_partial, batch_format="pyarrow"), "h"),
        ["h"], k, descending=False,
    )
    signed = np.unique(survivors.to_pandas()["h"].to_numpy(dtype=np.int64))[:k]
    hs = signed.view(np.uint64) ^ _FLIP
    if hs.size < k:
        return float(hs.size)
    return round_half_up((k - 1) / (float(hs[-1]) / _TWO64), 4)


def kmv_intersect(ds_a: Dataset, ds_b: Dataset, col: str, k: int = 256) -> dict:
    """Theta-sketch-style set INTERSECTION on two KMV sketches
    (Apache DataSketches semantics): each side keeps its k smallest
    distinct md5 hashes; the joint theta is the smaller k-th hash of
    the FULL sides (1.0 when a side holds fewer than k distinct
    values, i.e. it is exact); the estimate is |common hashes below
    theta| / theta. Hashing and comparisons are integer-exact and the
    division order is fixed, so the estimate replays bit-identically
    in SQL (md5_number_upper + least/greatest arithmetic). Each
    side's sketch costs one distinct + bounded-topk exchange; only
    2k hashes reach the driver. Returns
    {"est": float, "theta": float, "exact_mode": bool}."""
    _FLIP = np.uint64(1 << 63)

    def _sketch(ds: Dataset) -> tuple[np.ndarray, bool]:
        def _partial(t: pa.Table) -> pa.Table:
            vals = pc.unique(pc.cast(t[col], pa.string()))
            h = np.unique(_md5_upper64(vals.to_pylist()))
            return pa.table({"h": (h[:k] ^ _FLIP).view(np.int64)})

        survivors = topk(
            distinct(ds.map_batches(_partial, batch_format="pyarrow"), "h"),
            ["h"], k, descending=False,
        )
        signed = np.unique(survivors.to_pandas()["h"].to_numpy(dtype=np.int64))[:k]
        hs = signed.view(np.uint64) ^ _FLIP
        # kmv_distinct convention: k survivors -> estimating, fewer -> exact
        return hs, hs.size == k

    ha, full_a = _sketch(ds_a)
    hb, full_b = _sketch(ds_b)
    thr: int | None = None
    if full_a:
        thr = int(ha[-1])
    if full_b:
        tb = int(hb[-1])
        thr = tb if thr is None else min(thr, tb)
    common = np.intersect1d(ha, hb)
    if thr is None:
        return {"est": float(common.size), "theta": 1.0, "exact_mode": True}
    retained = int((common < np.uint64(thr)).sum())
    theta = float(thr) / _TWO64
    return {"est": retained / theta, "theta": theta, "exact_mode": False}


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (binary-search shifts — no
    float log2, which is inexact near powers of two)."""
    x = x.copy()
    n = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        n[m] += s
        x = np.where(m, x >> np.uint64(s), x)
    return n + (x != 0)


def hll_distinct(ds: Dataset, col: str, p: int = 6) -> float:
    """Approximate distinct count via HyperLogLog (the estimator
    behind the ES `cardinality` aggregation): m = 2^p registers, each
    holding the max leading-zero run (+1) of the low 64-p hash bits
    among values routed to it; estimate = alpha_m * m^2 / sum(2^-reg),
    with Flajolet's linear-counting correction when the raw estimate
    is <= 2.5m and empty registers remain.

    Deterministic and SQL-replayable like kmv_distinct: the hash is
    md5_number_upper of the string form, and the harmonic sum is
    folded as the EXACT integer sum(2^(maxrho - reg)) so the estimate
    is independent of register visit order (no float-summation-order
    drift between the engine and the DuckDB oracle).

    Distribution shape: per block the partial is the block's <= m
    (register, rho) maxima — a fixed-size combiner regardless of block
    rows — and the global merge is a groupby-max over <= m * blocks
    tiny rows. Nothing data-scale leaves the map stage."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    low_bits = 64 - p
    # alpha per the HLL paper's small-m constants, 0.7213/(1+1.079/m) beyond
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _partial(t: pa.Table) -> pa.Table:
        vals = pc.unique(pc.cast(t[col], pa.string()))
        h = _md5_upper64(vals.to_pylist())
        reg = (h >> np.uint64(low_bits)).astype(np.int64)
        low = h & np.uint64((1 << low_bits) - 1)
        rho = (low_bits - _bit_length_u64(low) + 1).astype(np.int64)
        df = pd.DataFrame({"reg": reg, "rho": rho}).groupby("reg", as_index=False).max()
        return pa.table({"reg": df["reg"].to_numpy(), "rho": df["rho"].to_numpy()})

    from ray.data.aggregate import Max

    regs = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="mx"))
        .to_pandas()
    )
    mx = np.zeros(m, np.int64)
    mx[regs["reg"].to_numpy()] = regs["mx"].to_numpy()
    zeros = int((mx == 0).sum())
    # exact integer harmonic fold: sum(2^-mx) == s_int / 2^(low_bits+1)
    s_int = int(sum(1 << (low_bits + 1 - int(v)) for v in mx))
    raw = (alpha * float(m * m)) * float(1 << (low_bits + 1)) / float(s_int)
    if raw <= 2.5 * m and zeros > 0:
        return round_half_up(float(m) * float(np.log(float(m) / zeros)), 4)
    return round_half_up(raw, 4)


def grouped_hll_distinct(
    ds: Dataset, key: str, col: str, p: int = 6
) -> pd.DataFrame:
    """Per-group approximate distinct count — the ES `cardinality`
    aggregation nested inside a terms aggregation. Same deterministic
    md5-register HLL as hll_distinct, PER KEY: the per-block partial
    is <= (keys x m) tiny (key, reg, rho) rows, the exchange is one
    groupby-max over them, and the final estimate math runs on the
    (keys x m)-row result — bounded by group cardinality, never data
    size. Returns (key, distinct_est) sorted by key."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    low_bits = 64 - p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _partial(t: pa.Table) -> pa.Table:
        df = pa.table({key: t[key], "v": pc.cast(t[col], pa.string())}).to_pandas()
        df = df.drop_duplicates()
        h = _md5_upper64(df["v"].tolist())
        reg = (h >> np.uint64(low_bits)).astype(np.int64)
        low = h & np.uint64((1 << low_bits) - 1)
        rho = (low_bits - _bit_length_u64(low) + 1).astype(np.int64)
        g = (
            pd.DataFrame({key: df[key].to_numpy(), "reg": reg, "rho": rho})
            .groupby([key, "reg"], as_index=False)
            .max()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max

    regs = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key, "reg"])
        .aggregate(Max("rho", alias_name="mx"))
        .to_pandas()
    )
    out_k, out_e = [], []
    for k, g in regs.groupby(key, sort=True):
        mx = np.zeros(m, np.int64)
        mx[g["reg"].to_numpy()] = g["mx"].to_numpy()
        zeros = int((mx == 0).sum())
        s_int = int(sum(1 << (low_bits + 1 - int(v)) for v in mx))
        raw = (alpha * float(m * m)) * float(1 << (low_bits + 1)) / float(s_int)
        est = (
            float(m) * float(np.log(float(m) / zeros))
            if (raw <= 2.5 * m and zeros > 0)
            else raw
        )
        out_k.append(k)
        out_e.append(float(round_half_up(est, 4)))
    return pd.DataFrame({key: out_k, "distinct_est": out_e})


def hash_sample(ds: Dataset, col: str, rate: float, salt: str = "") -> Dataset:
    """Deterministic hash sampling: keep rows whose
    md5_upper64(str(value) + salt) < rate * 2^64. Unlike random
    sampling this is reproducible across runs and cluster sizes, keeps
    or drops ALL rows sharing a key (sample by user/doc, not by row),
    and needs no coordination — a pure streaming filter. Change `salt`
    to draw an independent sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = np.uint64(min(int(rate * _TWO64), (1 << 64) - 1))

    def _f(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[col], pa.string()).to_pylist()
        h = _md5_upper64([v + salt for v in vals])
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(_f, batch_format="pyarrow")


def stratified_hash_sample(
    ds: Dataset,
    col: str,
    rates: dict,
    strata_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> Dataset:
    """Deterministic stratified sampling: like `hash_sample`, but the
    keep-rate depends on the row's stratum (e.g. sample 'en' at 1%,
    low-resource languages at 100% — the standard rebalancing move in
    training-data curation). The rate map is tiny and ships inside the
    task closure; the filter is a pure streaming map_batches with the
    same whole-key determinism as hash_sample."""
    for r in list(rates.values()) + [default_rate]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rates must be in [0, 1], got {r}")
    thresh = {
        s: np.uint64(min(int(r * _TWO64), (1 << 64) - 1)) for s, r in rates.items()
    }
    dflt = np.uint64(min(int(default_rate * _TWO64), (1 << 64) - 1))

    def _f(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[col], pa.string()).to_pylist()
        h = _md5_upper64([v + salt for v in vals])
        cuts = np.array(
            [thresh.get(s, dflt) for s in t[strata_col].to_pylist()], dtype=np.uint64
        )
        return t.filter(pa.array(h < cuts))

    return ds.map_batches(_f, batch_format="pyarrow")


def weighted_reservoir_sample(
    ds: Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> Dataset:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    A-ES (2006): each row draws u = md5_upper64(str(key)+salt) / 2^64
    in [0,1) and a sample key u^(1/w); the k largest keys ARE a
    weighted sample without replacement. Deterministic (hash-derived
    uniforms, not RNG) so the draw is reproducible across runs AND
    cluster sizes, and exactly SQL-replayable. Distributed as a pure
    map (per-batch partial top-k) + one k-row merge — rows never
    shuffle; only <=k survivors per block move. Rows with w <= 0 get
    key 0 (never drawn before any positive-weight row).

    Output: the input columns plus ``sample_key`` rounded half-away to
    6dp (ranking uses the UNROUNDED key, doc order ties broken by the
    string key asc)."""
    from .relational import topk
    from .rounding import round_half_up

    def _keys(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[key_col], pa.string()).to_pylist()
        h = _md5_upper64([v + salt for v in vals])
        u = h.astype(np.float64) / _TWO64
        w = pc.cast(t[weight_col], pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), 0.0)
        return t.append_column("sample_key", pa.array(key, pa.float64()))

    picked = topk(
        ds.map_batches(_keys, batch_format="pyarrow"),
        ["sample_key", key_col],
        k,
        descending=[True, False],
    )

    def _round(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sample_key")
        return t.set_column(
            i, "sample_key", pa.array(round_half_up(t["sample_key"].to_numpy(), 6))
        )

    return picked.map_batches(_round, batch_format="pyarrow")


def mix_to_budget(
    ds: Dataset,
    budgets: dict,
    text_col: str = "text",
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> Dataset:
    """Data mixing to a per-source TOKEN budget (the training-data
    curation move: "50 B tokens of web, 30 B of wiki, 20 B of books"):
    one aggregate pass computes per-source token totals, the keep-rate
    for source s becomes min(1, budget_s / total_tokens_s), and the mix
    is drawn with the deterministic stratified hash sampler (whole-doc
    keep/drop, reproducible across runs and cluster sizes). Sources
    absent from `budgets` are dropped.

    Expected sampled tokens per source ~= min(budget_s, total_s);
    hash sampling gives the budget in expectation, not exactly — the
    standard trade for a single-pass, coordination-free plan. The
    totals table is one row per source (tiny); the corpus itself
    streams through exactly two scans (count pass + filter pass)."""
    from ray.data.aggregate import Sum

    from search_engine_ray.ops.text import _flat_tokens

    def _partial(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        counts = np.bincount(parents, minlength=n)
        g = (
            pd.DataFrame({"source": t[source_col].to_pandas(), "toks": counts})
            .groupby("source", sort=False)["toks"]
            .sum()
        )
        return pa.table({
            "source": pa.array(g.index, pa.string()),
            "toks": pa.array(g.to_numpy(np.int64), pa.int64()),
        })

    totals = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("toks", alias_name="toks"))
        .to_pandas()  # one row per source
    )
    rates = {
        s: min(1.0, float(budgets[s]) / float(t))
        for s, t in zip(totals["source"], totals["toks"])
        if s in budgets and t > 0
    }
    return stratified_hash_sample(
        ds, key_col, rates, source_col, default_rate=0.0, salt=salt
    )


def histogram_quantiles(
    ds: Dataset, col: str, qs: Sequence[float]
) -> pd.DataFrame:
    """Exact discrete quantiles of `col` (DuckDB quantile_disc
    semantics: the ceil(q*n)-th smallest element, 1-indexed; q=0 is
    the minimum). One distributed value-histogram shuffle; the
    per-distinct-value counts are reduced driver-side (bounded by the
    column's cardinality — see module docstring)."""
    hist = value_counts(ds, col, alias="_n").to_pandas().sort_values(col)
    counts = hist["_n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        raise ValueError("histogram_quantiles over an empty dataset")
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(q)
        out_v.append(hist[col].iloc[idx])
    return pd.DataFrame({"q": out_q, "value": out_v})


def grouped_quantiles(
    ds: Dataset, key: str, col: str, qs: Sequence[float]
) -> Dataset:
    """Exact discrete quantiles of `col` PER GROUP of `key` (DuckDB
    quantile_disc GROUP BY semantics: ceil(q*n)-th smallest, q=0 the
    minimum). Distributed end-to-end: one (key, value) histogram
    shuffle (map-side combined — payload is distinct values per group
    per block), then one map_groups per key resolves its quantiles
    from its value histogram. Group state is the group's DISTINCT
    value count, never its row count, so skewed groups stay bounded;
    nothing group-count-sized touches the driver."""
    qlist = [float(q) for q in qs]
    if not qlist:
        raise ValueError("qs must be non-empty")

    hist = (
        ds.map_batches(
            lambda t: pa.table({key: t[key], col: t[col]}), batch_format="pyarrow"
        )
        .groupby([key, col])
        .aggregate(Count(alias_name="_n"))
    )

    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(col)
        cum = df["_n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        ranks = [max(1, int(np.ceil(q * n))) for q in qlist]
        idx = [int(np.searchsorted(cum, r, side="left")) for r in ranks]
        return pd.DataFrame(
            {
                key: [df[key].iloc[0]] * len(qlist),
                "q": qlist,
                "value": [df[col].iloc[i] for i in idx],
            }
        )

    return hist.groupby(key).map_groups(_resolve, batch_format="pandas")


def sampled_quantiles(
    ds: Dataset, col: str, qs: Sequence[float], rate: float, key_col: str, salt: str = ""
) -> pd.DataFrame:
    """Approximate quantiles for HIGH-CARDINALITY columns: exact
    discrete quantiles of a deterministic hash sample (keep rate
    `rate` keyed on `key_col`). `histogram_quantiles` is exact but its
    shuffle carries one row per distinct value — fine for enums and
    integer-ish columns, unbounded for continuous ones; sampling first
    bounds the histogram at ~rate*n rows with quantile error
    O(1/sqrt(rate*n)) (Bahadur), while staying bit-reproducible across
    runs AND in SQL (the md5 threshold + quantile_disc over the same
    sampled set — unlike t-digest, whose merge order is
    nondeterministic under parallelism)."""
    return histogram_quantiles(hash_sample(ds, key_col, rate, salt=salt), col, qs)


def percentile_ranks(ds: Dataset, col: str, values: Sequence[float]) -> pd.DataFrame:
    """ES percentile_ranks aggregation (the inverse of percentiles):
    for each threshold v, the percentage of rows with col <= v. EXACT
    — one streaming pass of per-batch (n, count<=v per v) partials
    summed globally; the driver sees len(values)+1 integers per block.
    Output (value, pct) with pct = 100.0 * cnt / n rounded half-up 4."""
    from ray.data.aggregate import Sum

    vals = [float(v) for v in values]
    if not vals:
        raise ValueError("values must be non-empty")

    def _partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        cols = {"n": pa.array([np.int64(x.size)])}
        for i, v in enumerate(vals):
            cols[f"c{i}"] = pa.array([np.int64((x <= v).sum())])
        return pa.table(cols)

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"c{i}", alias_name=f"c{i}") for i in range(len(vals))
    ]
    agg = ds.map_batches(_partial, batch_format="pyarrow").aggregate(*aggs)
    n = float(agg["n"])
    if n == 0:
        raise ValueError("percentile_ranks over zero non-null rows")
    pct = [100.0 * float(agg[f"c{i}"]) / n for i in range(len(vals))]
    return pd.DataFrame({"value": vals, "pct": round_half_up(np.array(pct))})


def matrix_stats(ds: Dataset, x_col: str, y_col: str) -> pd.DataFrame:
    """ES matrix_stats aggregation for a column pair: count, means,
    population variances/covariance and Pearson correlation — one
    streaming pass of per-batch raw moments (n, Σx, Σy, Σx², Σy², Σxy)
    combined by a global sum; the driver sees six numbers per block.
    Null rows (either side) are skipped, matching SQL covar_pop/corr.
    Values rounded half-up to 4 (DuckDB tie rule)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~(np.isnan(x) | np.isnan(y))
        x, y = x[m], y[m]
        return pa.table({
            "n": pa.array([np.int64(x.size)]),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "syy": pa.array([float((y * y).sum())]),
            "sxy": pa.array([float((x * y).sum())]),
        })

    agg = ds.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    n = float(agg["n"])
    if n == 0:
        raise ValueError("matrix_stats over zero non-null rows")
    mx, my = agg["sx"] / n, agg["sy"] / n
    vx = agg["sxx"] / n - mx * mx
    vy = agg["syy"] / n - my * my
    cov = agg["sxy"] / n - mx * my
    corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
    vals = [n, mx, my, vx, vy, cov, corr]
    return pd.DataFrame({
        "stat": ["count", "mean_x", "mean_y", "var_x", "var_y", "covar", "corr"],
        "value": round_half_up(np.array(vals, dtype=np.float64)),
    })


def extended_stats(
    ds: Dataset, key: str, col: str, sigma: float = 2.0
) -> pd.DataFrame:
    """ES extended_stats aggregation per group: count, sum, avg,
    population variance (ES's naive sum_sq/n - avg² form), std, and
    the std-deviation bounds avg ± sigma·std. Same shape as
    matrix_stats one level down: per-batch raw moments PER KEY
    (count/Σx/Σx², a bounded-by-cardinality combiner), a tiny
    groupby-sum exchange, final math on the per-group row.

    Exact against SQL when `col` holds integer-valued numbers within
    2^53 (TPC-H quantities): the moment sums are then exact in
    float64, so no summation-order drift. Values rounded half-up to 4
    (DuckDB tie rule); rows ordered by key."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        x = df[col].to_numpy(dtype=np.float64)
        df = df.assign(_n=(~np.isnan(x)).astype(np.int64),
                       _s=np.nan_to_num(x), _sq=np.nan_to_num(x * x))
        g = df.groupby(key, as_index=False)[["_n", "_s", "_sq"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s"),
                   Sum("_sq", alias_name="sq"))
        .to_pandas()
        .sort_values(key, kind="mergesort")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy(dtype=np.float64)
    s, sq = agg["s"].to_numpy(dtype=np.float64), agg["sq"].to_numpy(dtype=np.float64)
    avg = s / n
    var = sq / n - avg * avg
    std = np.sqrt(np.maximum(var, 0.0))
    return pd.DataFrame({
        key: agg[key],
        "n": agg["n"].astype("int64"),
        "sum_v": round_half_up(s),
        "avg_v": round_half_up(avg),
        "var_v": round_half_up(var),
        "std_v": round_half_up(std),
        "upper_sd": round_half_up(avg + sigma * std),
        "lower_sd": round_half_up(avg - sigma * std),
    })


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005): a depth x width
    int64 grid; value v increments cell (r, h_r(v)) per row r; the
    frequency estimate is the MIN over rows — always >= the true count
    (one-sided error <= 2N/width w.p. 1-2^-depth). Row hashes are
    md5_upper64 of "r:value" mod width, so estimates are deterministic
    and exactly reproducible in SQL (md5_number_upper)."""

    def __init__(self, depth: int = 4, width: int = 1024):
        self.depth = int(depth)
        self.width = int(width)
        self.grid = np.zeros((self.depth, self.width), dtype=np.int64)

    def add_values(self, values: list[str]) -> None:
        for r in range(self.depth):
            cells = _md5_upper64([f"{r}:{v}" for v in values]) % np.uint64(self.width)
            np.add.at(self.grid[r], cells.astype(np.int64), 1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.grid += other.grid  # linear sketch: merge = elementwise add
        return self

    def estimate(self, values: list[str]) -> np.ndarray:
        ests = np.empty((self.depth, len(values)), dtype=np.int64)
        for r in range(self.depth):
            cells = _md5_upper64([f"{r}:{v}" for v in values]) % np.uint64(self.width)
            ests[r] = self.grid[r][cells.astype(np.int64)]
        return ests.min(axis=0)


def cm_sketch(ds: Dataset, col: str, depth: int = 4, width: int = 1024) -> CountMinSketch:
    """Distributed count-min build: each batch emits one (depth*width)
    int64 partial (~32 KB at the defaults) and partials fold by
    elementwise ADD — the data streams distributed, only the tiny
    linear sketches travel. Values are hashed as their string form
    (CAST(x AS VARCHAR) in the SQL oracle)."""
    d, w = int(depth), int(width)

    def _partial(t: pa.Table) -> pa.Table:
        sk = CountMinSketch(d, w)
        sk.add_values([str(v) for v in t[col].to_pylist()])
        return pa.table({"cm": pa.array([sk.grid.ravel()], pa.list_(pa.int64()))})

    out = CountMinSketch(d, w)
    for bt in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=256
    ):
        flat = pc.list_flatten(bt["cm"]).to_numpy(zero_copy_only=False)
        out.grid += flat.reshape(-1, d * w).sum(axis=0).reshape(d, w)
    return out


def temperature_mix(
    ds: Dataset,
    group_col: str,
    id_col: str,
    target_total: int,
    alpha: float = 0.5,
) -> Dataset:
    """Temperature-balanced multilingual sampling (the XLM-R /
    multilingual-LM mixing rule): draw ~target_total docs with
    per-group probability proportional to count^alpha — alpha < 1
    up-samples tail languages relative to their corpus share. Group
    counts ride ONE combiner exchange (bounded by group cardinality);
    the per-group keep-rates are computed once on the tiny count table
    and applied as a deterministic md5-threshold streaming filter
    (hash_sample semantics — reproducible at any parallelism, no
    coordination). The rate arithmetic and the UBIGINT<DOUBLE hash
    compare replay bit-identically in SQL."""
    from ray.data.aggregate import Count

    cnt = (
        ds.map_batches(lambda t: t.select([group_col]), batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values(group_col, kind="mergesort")
        .reset_index(drop=True)
    )
    c = cnt["c"].to_numpy(dtype=np.float64)
    s = float(np.power(c, alpha).sum())
    rates = np.minimum(1.0, float(target_total) * (np.power(c, alpha) / s) / c)
    thresh = {g: r * 18446744073709551616.0 for g, r in zip(cnt[group_col], rates)}
    import ray as _ray

    tref = _ray.put(thresh)

    def _f(t: pa.Table) -> pa.Table:
        th = _ray.get(tref)
        groups = t[group_col].to_numpy(zero_copy_only=False)
        ids = [str(v) for v in t[id_col].to_pylist()]
        h = _md5_upper64(ids).astype(np.float64)
        lim = np.array([th[g] for g in groups])
        return t.filter(pa.array(h < lim))

    return ds.map_batches(_f, batch_format="pyarrow")


def heavy_hitters(
    ds: Dataset,
    col: str,
    k: int = 10,
    capacity: int = 64,
) -> pd.DataFrame:
    """Misra-Gries / SpaceSaving-style heavy hitters with an EXACT
    verification pass (the two-phase shape every production top-k
    runs at corpus scale):

    Phase 1 — each block keeps only its ``capacity`` most frequent
    values (a truncated exact count = a Misra-Gries summary whose
    per-block error is the dropped mass, tracked explicitly); the
    truncated partials merge through ONE combiner exchange bounded by
    capacity x blocks, never by corpus rows. Any value whose global
    frequency exceeds the summed dropped mass is guaranteed present
    among the candidates (Misra-Gries merge bound), so the candidate
    set provably contains every true top-k whose count clears that
    bound — the returned ``guaranteed`` flag says whether the bound
    held for rank k.

    Phase 2 — the candidate values broadcast (top 2k by approximate
    count) and ONE exact masked-count pass over the corpus replaces
    approximate counts with exact ones; ties and near-misses inside
    the candidate set are therefore exact, and the final top-k sorts
    (count DESC, value ASC) like the SQL oracle.
    """
    import ray

    import search_engine_ray.ops.relational as rel

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(t[col], pa.string())
        vals, counts = np.unique(v.to_numpy(zero_copy_only=False), return_counts=True)
        if vals.size > capacity:
            keep = np.argsort(-counts, kind="stable")[:capacity]
            dropped = int(counts.sum() - counts[keep].sum())
            vals, counts = vals[keep], counts[keep]
        else:
            dropped = 0
        out_v = np.concatenate([vals, ["__dropped__"]])
        out_c = np.concatenate([counts, [dropped]]).astype(np.int64)
        return pa.table({"v": pa.array(out_v, pa.string()), "c": pa.array(out_c, pa.int64())})

    merged = (
        rel.grouped_aggregate(
            ds.map_batches(_partial, batch_format="pyarrow"), ["v"], {"c": ("sum", "c")}
        )
        .to_pandas()
    )
    dropped_mass = int(merged.loc[merged["v"] == "__dropped__", "c"].sum())
    cand = merged[merged["v"] != "__dropped__"].sort_values(
        ["c", "v"], ascending=[False, True], kind="mergesort"
    )
    cand = cand.head(max(2 * k, k + 8))
    cand_vals = cand["v"].to_numpy()
    kth_approx = int(cand["c"].iloc[k - 1]) if len(cand) >= k else 0
    guaranteed = kth_approx > dropped_mass

    ref = ray.put(set(cand_vals.tolist()))

    def _exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cs = ray.get(ref)
        v = pc.cast(t[col], pa.string()).to_numpy(zero_copy_only=False)
        mask = np.isin(v, list(cs))
        vals, counts = np.unique(v[mask], return_counts=True)
        return pa.table({"v": pa.array(vals, pa.string()), "c": pa.array(counts.astype(np.int64), pa.int64())})

    exact = (
        rel.grouped_aggregate(
            ds.map_batches(_exact, batch_format="pyarrow"), ["v"], {"c": ("sum", "c")}
        )
        .to_pandas()
        .sort_values(["c", "v"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    exact["c"] = exact["c"].astype("int64")
    exact["guaranteed"] = bool(guaranteed)
    return exact
