"""Distributed model scoring and training over feature Datasets.

Two shapes a training-data pipeline needs:
  - ``logreg_score``: broadcast-weights batched inference — the pattern
    every model-scoring stage follows (weights live in the task closure /
    actor, the batch matmul is one numpy call, no shuffle at all).
  - ``logreg_train``: synchronous gradient descent where each epoch is ONE
    streaming pass: per-batch gradient partials (a k-vector per batch)
    reduce through Ray's Sum aggregate, the driver takes the O(k) step.
    Data never shuffles and never concentrates; only k floats per batch
    move.  Weights round to ``round_dp`` per epoch so the trajectory is
    identical across partitionings (same trick as graph_ops.pagerank).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_score(ds, feature_cols: list[str], weights, bias: float,
                 out_col: str = "score", round_to: int = 6):
    """Vectorized logistic-regression inference: sigmoid(b + X·w) per
    row, weights shipped once in the task closure (they're O(k) — far
    below any broadcast budget).  Pure map; the SQL twin computes the
    identical sigmoid so scores hash-match at the rounding grain."""
    w = np.asarray(weights, dtype=np.float64)

    def score(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols])
        s = np.round(_sigmoid(bias + X @ w), round_to)
        return batch.append_column(out_col, pa.array(s))

    return ds.map_batches(score, batch_format="pyarrow")


def logreg_train(ds, feature_cols: list[str], label_col: str,
                 epochs: int = 5, lr: float = 0.5,
                 round_dp: int = 9) -> dict:
    """Full-batch gradient-descent logistic regression.  Each epoch is
    one streaming pass: per-batch partials of the gradient
    X^T(sigmoid(Xw) − y) and the row count reduce via Sum aggregates;
    the driver applies w ← w − lr·g/n and rounds to ``round_dp``.
    Deterministic across partitionings (gradient summation drift is far
    below the rounding grain); pytest pins equality with a single-process
    numpy reference.  Returns {"bias": b, "weights": [...], "n": rows}."""
    from ray.data.aggregate import Sum

    k = len(feature_cols)
    w = np.zeros(k)
    b = 0.0
    n_rows: int | None = None

    for _ in range(epochs):
        w_now, b_now = w.copy(), b

        def grad_partial(batch: pa.Table) -> pa.Table:
            X = np.column_stack([
                batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in feature_cols])
            y = batch[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            r = _sigmoid(b_now + X @ w_now) - y
            cols = {f"g{i}": pa.array([float(X[:, i] @ r)])
                    for i in range(k)}
            cols["gb"] = pa.array([float(r.sum())])
            cols["n"] = pa.array([len(y)], type=pa.int64())
            return pa.table(cols)

        agg = ds.map_batches(grad_partial, batch_format="pyarrow") \
            .aggregate(*[Sum(f"g{i}", alias_name=f"g{i}")
                         for i in range(k)],
                       Sum("gb", alias_name="gb"),
                       Sum("n", alias_name="n"))
        n_rows = int(agg["n"])
        w = np.round(w - lr * np.array([agg[f"g{i}"] for i in range(k)])
                     / n_rows, round_dp)
        b = round(b - lr * agg["gb"] / n_rows, round_dp)

    return {"bias": b, "weights": w.tolist(), "n": n_rows}
