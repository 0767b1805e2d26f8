"""Stateful classifier stages (SURVEY.md §2.3 → actor pools).

The reference ops re-read the training CSV and re-fit per pixel BLOCK
(functions/KNearestNeighborsClassifier.py:81-128 — an acknowledged
anti-pattern); the engine fits once per ACTOR in ``__init__`` and predicts
per batch.

scikit-learn is not available in this environment, so:
- kNN / nearest-neighbors are implemented exactly in NumPy (brute-force
  distance matmul + argpartition — identical results to sklearn's brute
  algorithm for euclidean metric);
- RandomForest / GradientBoosted (functions/RandomForestClassifier.py:71-120,
  functions/GradientBoostedClassifier.py:72-130) fall back to a deterministic
  seeded bagged-stump ensemble behind an import-try: the Ray-side plumbing
  (actor state, 3-band [pred, p0, p1] output, thresholding) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .. import tilecodec

try:  # pragma: no cover - not present in this environment
    from sklearn.ensemble import GradientBoostingClassifier, RandomForestClassifier
    HAVE_SKLEARN = True
except ImportError:
    HAVE_SKLEARN = False


def knn_predict(train_X: np.ndarray, train_y: np.ndarray, X: np.ndarray, k: int) -> np.ndarray:
    """Brute-force kNN majority vote (euclidean; ties → smallest label,
    matching sklearn's argmax-over-class-counts order).  Distance via the
    matmul identity — never materializes the (n, m, d) broadcast tensor.
    f4 distances: vote ordering is insensitive to the last float bits for
    well-separated training data, and the matmul runs ~2× faster."""
    X32, T32 = X.astype(np.float32), train_X.astype(np.float32)
    d2 = (X32**2).sum(1)[:, None] - 2 * X32 @ T32.T + (T32**2).sum(1)[None, :]
    idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
    labels = train_y[idx]
    classes = np.unique(train_y)
    votes = np.stack([(labels == c).sum(1) for c in classes], axis=1)
    return classes[np.argmax(votes, axis=1)]


def knn_neighbors(train_X: np.ndarray, X: np.ndarray, k: int) -> np.ndarray:
    """k nearest training-row indices per query row, distance-ordered.
    f4 matmul like knn_predict (~2× faster; neighbor ordering insensitive
    to the last float bits for well-separated training data)."""
    X, train_X = X.astype(np.float32), train_X.astype(np.float32)
    d2 = (X**2).sum(1)[:, None] - 2 * X @ train_X.T + (train_X**2).sum(1)[None, :]
    part = np.argpartition(d2, k - 1, axis=1)[:, :k]
    order = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1, kind="stable")
    return np.take_along_axis(part, order, axis=1)


class _CartTree:
    """Exact CART (the split rule behind the reference's sklearn forest,
    functions/RandomForestClassifier.py:71-120): exhaustive best-first
    binary splits, thresholds at midpoints of consecutive sorted feature
    values (``x <= thr`` goes left), deterministic tie-break (lowest
    impurity, then lowest feature index, then lowest threshold).

    ``criterion``: 'gini' (classification; leaf = P(y=1)) or 'mse'
    (regression on a continuous target; leaf = mean) — the regression mode
    is what gradient boosting fits to residuals."""

    def __init__(self, max_depth: int | None = None, criterion: str = "gini",
                 max_features: int | None = None, rng: np.random.Generator | None = None):
        self.max_depth = max_depth
        self.criterion = criterion
        self.max_features = max_features
        self.rng = rng

    def _best_split(self, X: np.ndarray, y: np.ndarray):
        n, d = X.shape
        feats = np.arange(d)
        if self.max_features is not None and self.max_features < d:
            feats = np.sort(self.rng.choice(d, self.max_features, replace=False))
        best = None  # (score, f, thr)
        for f in feats:
            order = np.argsort(X[:, f], kind="stable")
            xs, ys = X[order, f], y[order]
            cut = np.flatnonzero(np.diff(xs) > 0) + 1  # split positions
            if cut.size == 0:
                continue
            csum = np.cumsum(ys)
            csq = np.cumsum(ys * ys)
            nl = cut.astype(np.float64)
            nr = n - nl
            sl, sr = csum[cut - 1], csum[-1] - csum[cut - 1]
            if self.criterion == "gini":
                # binary gini: n_l·p_l(1−p_l) + n_r·p_r(1−p_r)
                pl, pr = sl / nl, sr / nr
                score = nl * pl * (1 - pl) + nr * pr * (1 - pr)
            else:
                # weighted variance == sse_l + sse_r
                ql, qr = csq[cut - 1], csq[-1] - csq[cut - 1]
                score = (ql - sl * sl / nl) + (qr - sr * sr / nr)
            i = int(np.argmin(score))  # first minimum → lowest threshold
            thr = (xs[cut[i] - 1] + xs[cut[i]]) / 2.0
            cand = (float(score[i]), int(f), float(thr))
            if best is None or cand < best:
                best = cand
        return best

    def _build(self, X, y, depth):
        if (self.max_depth is not None and depth >= self.max_depth)                 or len(np.unique(y)) <= 1 or len(y) < 2:
            return {"leaf": float(y.mean())}
        split = self._best_split(X, y)
        if split is None:
            return {"leaf": float(y.mean())}
        _, f, thr = split
        left = X[:, f] <= thr
        if not left.any() or left.all():
            return {"leaf": float(y.mean())}
        return {"f": f, "thr": thr,
                "l": self._build(X[left], y[left], depth + 1),
                "r": self._build(X[~left], y[~left], depth + 1)}

    def fit(self, X: np.ndarray, y: np.ndarray):
        self.root = self._build(np.asarray(X, np.float64),
                                np.asarray(y, np.float64), 0)
        return self

    def predict_value(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        out = np.empty(len(X))

        def walk(node, idx):
            if "leaf" in node:
                out[idx] = node["leaf"]
                return
            go_l = X[idx, node["f"]] <= node["thr"]
            walk(node["l"], idx[go_l])
            walk(node["r"], idx[~go_l])

        walk(self.root, np.arange(len(X)))
        return out

    def set_leaf_values(self, fn):
        """Rewrite every leaf via fn(leaf_value) — the boosted Newton step."""

        def walk(node):
            if "leaf" in node:
                node["leaf"] = fn(node["leaf"])
            else:
                walk(node["l"]); walk(node["r"])

        walk(self.root)


class _CartForest:
    """Deterministic bagged CART forest (sklearn-fallback for the
    reference's RandomForestClassifier): bootstrap per tree, sqrt-feature
    subsampling per node, predict_proba = mean of per-tree leaf
    probabilities (sklearn's soft-voting semantics)."""

    def __init__(self, n_estimators: int = 50, max_depth: int | None = None,
                 random_state: int = 43):
        self.n = n_estimators
        self.max_depth = max_depth
        self.seed = random_state

    def fit(self, X: np.ndarray, y: np.ndarray):
        X = np.asarray(X, np.float64); y = np.asarray(y, np.float64)
        n, d = X.shape
        mf = max(1, int(np.sqrt(d)))
        self.trees = []
        for i in range(self.n):
            rng = np.random.default_rng(self.seed + i)
            idx = rng.integers(0, n, n)
            t = _CartTree(self.max_depth, "gini", mf, rng)
            t.fit(X[idx], y[idx])
            self.trees.append(t)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        p1 = np.mean([t.predict_value(X) for t in self.trees], axis=0)
        return np.stack([1 - p1, p1], axis=1)


class _BoostedCarts:
    """Deterministic gradient boosting with depth-3 regression CARTs on
    logistic loss (sklearn-fallback for GradientBoostingClassifier):
    F0 = prior log-odds; each round fits residuals y − σ(F) and applies
    the per-leaf Newton step Σr / Σp(1−p)."""

    def __init__(self, n_estimators: int = 50, learning_rate: float = 0.1,
                 max_depth: int = 3, random_state: int = 43):
        self.n = n_estimators
        self.lr = learning_rate
        self.max_depth = max_depth
        self.seed = random_state

    def fit(self, X: np.ndarray, y: np.ndarray):
        X = np.asarray(X, np.float64); y = np.asarray(y, np.float64)
        p = np.clip(y.mean(), 1e-6, 1 - 1e-6)
        self.f0 = float(np.log(p / (1 - p)))
        F = np.full(len(y), self.f0)
        self.trees = []
        for _ in range(self.n):
            prob = 1.0 / (1.0 + np.exp(-F))
            resid = y - prob
            t = _CartTree(self.max_depth, "mse").fit(X, resid)
            # per-leaf Newton step: group samples by leaf, set value to
            # Σr / Σp(1−p) (clipped), then shrink by the learning rate
            leaf_of = t.predict_value(X)  # leaf MEAN doubles as a leaf key
            hess = np.maximum(prob * (1 - prob), 1e-12)
            vals = {}
            for lv in np.unique(leaf_of):
                sel = leaf_of == lv
                vals[lv] = float(resid[sel].sum() / hess[sel].sum())
            t.set_leaf_values(lambda v: vals[v])
            F = F + self.lr * t.predict_value(X)
            self.trees.append(t)
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        F = np.full(len(X), self.f0)
        for t in self.trees:
            F = F + self.lr * t.predict_value(X)
        return F

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        p1 = 1.0 / (1.0 + np.exp(-self.decision_function(X)))
        return np.stack([1 - p1, p1], axis=1)


class TileClassifier:
    """Actor-pool stage: classify each pixel stack (bands = features).

    model: 'knn' (exact), 'rf' / 'gbt' (sklearn if present, stump ensemble
    fallback).  Output tile: 1 band (knn) or 3 bands [pred, p0, p1]
    thresholded like functions/RandomForestClassifier.py:104-117.
    """

    def __init__(self, training_ref, model: str = "knn", k: int = 5,
                 n_features: int = 6, prob_threshold: float = 0.5,
                 subsample: int = 1, force_cart: bool = False):
        # subsample > 1: classify every s-th pixel and nearest-fill the rest
        # (the per-pixel neighbor search is the acknowledged cost bound —
        # the reference refits per BLOCK, functions/KNearestNeighbors
        # Classifier.py:81-128; exact full-resolution kNN is gated by
        # tests/test_engine_extras.py::test_knn_exact)
        self.subsample = int(subsample)
        self.n_features = int(n_features)
        df = ray.get(training_ref)
        feats = [f"pred_{i}" for i in range(1, n_features + 1)]
        self.X = df[feats].to_numpy(dtype=np.float64)
        self.y = df["VarToPredict"].to_numpy(dtype=np.int64)
        self.model_kind = model
        self.k = k
        self.thresh = prob_threshold
        if model in ("rf", "gbt"):
            # force_cart pins the deterministic in-repo CART ensemble even
            # when sklearn is importable — the SQL-exact gate exports THAT
            # model's tree literals, so its engine side must never switch
            # implementations with the environment
            if HAVE_SKLEARN and not force_cart:  # pragma: no cover
                cls = RandomForestClassifier if model == "rf" else GradientBoostingClassifier
                self.model = cls(random_state=43).fit(self.X, self.y)
            else:
                cls = _CartForest if model == "rf" else _BoostedCarts
                self.model = cls(random_state=43).fit(self.X, self.y)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_pix, out_bc, out_pt = [], [], []
        s = self.subsample
        for i, pix, msk in tilecodec.iter_tiles(batch):
            if pix.ndim == 2:
                pix = pix[None]
            bands, h, w = pix.shape
            if s > 1:
                sub = pix[:, ::s, ::s]
                sh, sw = sub.shape[1:]
                feats = sub.reshape(bands, -1).T.astype(np.float64)
            else:
                sh, sw = h, w
                feats = pix.reshape(bands, -1).T.astype(np.float64)
            if self.model_kind == "knn":
                pred = knn_predict(self.X[:, :bands], self.y, feats, self.k)
                out = pred.reshape(sh, sw).astype(np.float32)
                if s > 1:
                    out = np.repeat(np.repeat(out, s, axis=0), s, axis=1)[:h, :w]
                out_bc.append(1)
            else:
                # align tile bands to the model's feature count, like the
                # knn path's self.X[:, :bands] (a 4-band tile against a
                # 6-feature model otherwise indexes out of range)
                nf = self.n_features
                if feats.shape[1] > nf:
                    feats = feats[:, :nf]
                elif feats.shape[1] < nf:
                    feats = np.pad(feats, ((0, 0), (0, nf - feats.shape[1])))
                proba = self.model.predict_proba(feats)
                pred = (proba[:, 1] >= self.thresh).astype(np.float32)
                out = np.stack([pred.reshape(sh, sw),
                                proba[:, 0].reshape(sh, sw).astype(np.float32),
                                proba[:, 1].reshape(sh, sw).astype(np.float32)])
                if s > 1:
                    out = np.repeat(np.repeat(out, s, axis=1), s, axis=2)[:, :h, :w]
                out_bc.append(3)
            out_pix.append(tilecodec.encode(out.astype(np.float32)))
            out_pt.append("f4")
        cols = {c: batch[c] for c in batch.column_names if c not in ("pixels", "mask", "band_count", "pixel_type")}
        cols["band_count"] = pa.array(out_bc, pa.int32())
        cols["pixel_type"] = pa.array(out_pt, pa.string())
        cols["pixels"] = pa.array(out_pix, pa.binary())
        cols["mask"] = batch["mask"]
        return pa.table(cols)


def classify_tiles(tiles: rd.Dataset, training: pd.DataFrame, model: str = "knn",
                   k: int = 5, concurrency: int = 4, batch_size: int = 8,
                   subsample: int = 1, n_features: int = 6,
                   prob_threshold: float = 0.5,
                   force_cart: bool = False) -> rd.Dataset:
    tref = ray.put(training)
    return tiles.map_batches(TileClassifier,
                             fn_constructor_kwargs={"training_ref": tref, "model": model,
                                                    "k": k, "subsample": subsample,
                                                    "n_features": n_features,
                                                    "prob_threshold": prob_threshold,
                                                    "force_cart": force_cart},
                             batch_format="pyarrow", batch_size=batch_size,
                             concurrency=concurrency)
