"""Model-scoring stage: a deterministic logistic-regression quality
classifier — the shape of every learned document filter in a
training-data pipeline (fastText-style quality models, contamination
classifiers, language scorers): train a small model on a bounded
sample driver-side, broadcast the weights, score the whole corpus
vectorized inside map_batches.

The model is intentionally simple (full-batch gradient descent,
zero-init, fixed iteration count, float64) so training is
bit-deterministic for a given input — which makes the whole stage
value-checkable: the SQL oracle retrains identically (numpy in the
oracle generator) and replays the inference expression
``sigmoid(x1*w1 + ... + b)`` with the same float op order. Swap the
trainer for a real model behind the same (weights, score_classifier)
contract; the Ray-side plumbing — bounded driver-side fit, broadcast
weights, vectorized batch inference — is the part that must hold at
100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from search_engine_ray.ops.rounding import round_half_up


def train_logreg(
    X: np.ndarray, y: np.ndarray, iters: int = 300, lr: float = 0.1
) -> tuple[np.ndarray, float]:
    """Full-batch GD logistic regression on STANDARDIZED features —
    deterministic: zero init, fixed iters, float64 throughout.
    Returns (weights, bias) in the standardized feature space."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.sum()) / n
    return w, b


def fit_quality_classifier(
    ds: Dataset,
    feature_cols: list[str],
    label_col: str,
    sample_size: int = 50_000,
    iters: int = 300,
    lr: float = 0.1,
    sort_col: str | None = None,
) -> dict:
    """Driver-side fit on a bounded sample (`limit(sample_size)` — the
    corpus itself never leaves the cluster). Features are
    standardized with the SAMPLE's mean/std (std 0 -> 1); the returned
    model dict carries the fold-in so inference is one fused linear
    form: score = sigmoid(sum_i x_i * w_i + b') with
    w_i = w_std_i / std_i and b' = b - sum_i mean_i * w_std_i / std_i.
    ``sort_col`` sorts the sample before training: Ray's parallel read
    does not pin block order, and float summation order changes the
    trained weights in the last ulps — sorting makes the fit
    bit-reproducible run to run (required by the value oracle)."""
    df = ds.limit(sample_size).to_pandas()
    if sort_col is not None:
        df = df.sort_values(sort_col, kind="mergesort").reset_index(drop=True)
    X = df[feature_cols].to_numpy(dtype=np.float64)
    y = df[label_col].to_numpy(dtype=np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std = np.where(std == 0.0, 1.0, std)
    w, b = train_logreg((X - mean) / std, y, iters=iters, lr=lr)
    w_raw = w / std
    b_raw = float(b - float((mean * w_raw).sum()))
    return {
        "feature_cols": list(feature_cols),
        "weights": [float(v) for v in w_raw],
        "bias": b_raw,
    }


def score_classifier(ds: Dataset, model: dict, out_col: str = "clf_score") -> Dataset:
    """Vectorized batch inference: one fused multiply-add per feature
    column (fixed order — the SQL oracle mirrors it term by term) and
    a sigmoid; scores rounded with the repo's DuckDB-tie rounding.
    The model dict is tiny and ships in the task closure."""
    cols = list(model["feature_cols"])
    ws = [float(v) for v in model["weights"]]
    bias = float(model["bias"])

    def _score(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.float64)
        for c, w in zip(cols, ws):
            z = z + t[c].to_numpy(zero_copy_only=False).astype(np.float64) * w
        z = z + bias
        p = 1.0 / (1.0 + np.exp(-z))
        return t.append_column(out_col, pa.array(round_half_up(p), pa.float64()))

    return ds.map_batches(_score, batch_format="pyarrow")
