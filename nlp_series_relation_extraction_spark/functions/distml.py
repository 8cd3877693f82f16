"""Distributed model fits for the training-data pipeline: k-means, PCA,
logistic regression.

The ANN/SemDeDup operators (functions/similarity.py) train their coarse
quantizers on a bounded driver-side sample — standard index practice, but
at 100 TB the sample can miss tail modes. These fits run over the FULL
corpus with the canonical broadcast-model / partial-sum shape:

* the model (k x d centroids, d x d Gram, d+1 weights) is broadcast in the
  UDF closure — always driver-sized, never a data-path collect;
* each Arrow batch reduces to per-partition partial sums inside numpy
  (map-side combine in the truest sense: k*d doubles per partition, not
  per row);
* partials shuffle as (slot, pos, val) scalar rows through one groupBy —
  shuffle volume is O(model size * partitions) pre-combine and
  O(model size) post, independent of corpus size;
* the driver folds the k*d (or d^2, or d+1) summed scalars back into the
  model and broadcasts the next iterate.

That is exactly the treeAggregate pattern MLlib uses for its own k-means
and LBFGS (public Spark source, mllib/clustering/KMeans.scala), expressed
through DataFrame mapInPandas so it stays in the Arrow lane with the rest
of this repo.

Determinism: fixed init (first-k rows by id — same contract as
similarity._kmeans_fit), fixed iteration counts, float64 partials. Exact
equality with the numpy twins is NOT guaranteed bit-for-bit (partition sum
order differs from a flat numpy sum) but is pinned to 1e-9-ish tolerances
in tests/test_distml.py, and assignment/prediction parity is pinned
exactly on data with non-degenerate margins.

No counterpart in the reference (zhoujx4/NLP-Series-relation-extraction
has no clustering/PCA/classifier stage); these are the beyond-reference
LLM-pipeline operators the brief asks for.
"""

from __future__ import annotations

from .smalldf import local_df

from pyspark.sql import DataFrame, functions as F

from .partitioning import ensure_parallelism

_PARTIAL_SCHEMA = "slot int, pos int, val double"


def _vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v array<double>) in float64, parallelism-guarded (batch only:
    the guard inspects .rdd partition counts, which streaming plans
    forbid — a stream's micro-batches inherit the source's file splits)."""
    out = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if df.isStreaming:
        return out
    return ensure_parallelism(out)


def _reduce_partials(partials: DataFrame) -> dict:
    """One groupBy over (slot, pos) scalar rows -> {(slot, pos): sum}.

    The collect is model-sized (k*d / d^2 / d+1 rows), never data-sized.
    """
    rows = partials.groupBy("slot", "pos").agg(F.sum("val").alias("s")).collect()
    return {(r.slot, r.pos): r.s for r in rows}


def _first_k_vectors(vec: DataFrame, k: int, op: str) -> "np.ndarray":
    """Deterministic init: the k smallest-id vectors (same contract as
    similarity._kmeans_fit's first-n_clusters-of-sample init)."""
    import numpy as np

    rows = vec.orderBy("id").limit(k).collect()
    V0 = np.asarray([r.v for r in rows], dtype=np.float64)
    if len(V0) == 0:
        raise ValueError(f"{op}: empty input — nothing to fit")
    return V0


# ---------------------------------------------------------------------------
# k-means (full-corpus Lloyd's)
# ---------------------------------------------------------------------------


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int = 10,
) -> tuple["np.ndarray", float]:
    """Full-corpus Lloyd's k-means -> (centroids [k, d], inertia).

    Per iteration: broadcast C, one Arrow pass producing per-partition
    (count, sum) partials per cluster, one constant-size shuffle, driver
    update. Empty clusters keep their previous centroid (matches the
    numpy twin and similarity._kmeans_fit). The final pass also sums
    min-squared-distance -> inertia, for an elbow/sanity readout.
    """
    import numpy as np
    import pandas as pd

    vec = _vectors(df, id_col, vec_col)
    # several jobs over the same rows: keep the (narrow) vectors local.
    # At real scale swap for persist(MEMORY_AND_DISK) — same note as
    # operators/graph.py's pagerank loop.
    vec = vec.localCheckpoint(eager=False)

    C = _first_k_vectors(vec, k, "kmeans_fit")
    k_eff, d = C.shape
    inertia = float("nan")

    for it in range(n_iter):
        last = it == n_iter - 1
        Cb = C  # rebind so the closure ships this iterate, not the name

        def partials(batches):
            sums = np.zeros((k_eff, d), dtype=np.float64)
            cnts = np.zeros(k_eff, dtype=np.float64)
            sse = 0.0
            for pdf in batches:
                X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
                if len(X) == 0:
                    continue
                d2 = (
                    (X**2).sum(axis=1, keepdims=True)
                    - 2.0 * (X @ Cb.T)
                    + (Cb**2).sum(axis=1)[None, :]
                )
                a = d2.argmin(axis=1)
                sse += float(d2[np.arange(len(X)), a].sum())
                for c in np.unique(a):
                    m = a == c
                    cnts[c] += float(m.sum())
                    sums[c] += X[m].sum(axis=0)
            out = {"slot": [], "pos": [], "val": []}
            for c in range(k_eff):
                if cnts[c] == 0.0:
                    continue
                out["slot"].append(c)
                out["pos"].append(-1)
                out["val"].append(cnts[c])
                for j in range(d):
                    out["slot"].append(c)
                    out["pos"].append(j)
                    out["val"].append(sums[c, j])
            out["slot"].append(-1)
            out["pos"].append(-1)
            out["val"].append(sse)
            yield pd.DataFrame(out)

        acc = _reduce_partials(vec.mapInPandas(partials, _PARTIAL_SCHEMA))
        inertia = acc.get((-1, -1), 0.0)
        C_new = C.copy()
        for c in range(k_eff):
            n_c = acc.get((c, -1), 0.0)
            if n_c > 0.0:
                C_new[c] = np.array(
                    [acc[(c, j)] for j in range(d)], dtype=np.float64
                ) / n_c
        C = C_new
        if last:
            break
    return C, float(inertia)


def kmeans_fit_numpy(
    V: "np.ndarray", k: int, n_iter: int = 10
) -> tuple["np.ndarray", float]:
    """Single-matrix twin of kmeans_fit: identical init (first k rows in id
    order), identical update (sum/count, empty keeps previous), identical
    inertia (sum of min d2 at the pre-update assignment of the last
    iteration)."""
    import numpy as np

    V = np.asarray(V, dtype=np.float64)
    C = V[:k].copy()
    inertia = float("nan")
    for _ in range(n_iter):
        d2 = (
            (V**2).sum(axis=1, keepdims=True)
            - 2.0 * (V @ C.T)
            + (C**2).sum(axis=1)[None, :]
        )
        a = d2.argmin(axis=1)
        inertia = float(d2[np.arange(len(V)), a].sum())
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = V[m].sum(axis=0) / m.sum()
    return C, inertia


def kmeans_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: "np.ndarray"
) -> DataFrame:
    """(id, cluster) — nearest centroid per row, one Arrow pass, no
    shuffle beyond the parallelism guard."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            d2 = (
                (X**2).sum(axis=1, keepdims=True)
                - 2.0 * (X @ C.T)
                + (C**2).sum(axis=1)[None, :]
            )
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster": d2.argmin(axis=1).astype("int32")}
            )

    return _vectors(df, id_col, vec_col).mapInPandas(
        assign, schema="id long, cluster int"
    )


def kmeans_census(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "np.ndarray",
    quant: int = 1000,
) -> DataFrame:
    """Per-cluster census against FROZEN centroids: (cluster, pos, s)
    where pos = -1 carries the member count and pos = j the per-dimension
    sum of floor(x*quant) — INTEGER sums, so the result is summation-
    order-free and bit-stable across partitionings and across streaming
    micro-batch folds (the same determinism trick as similarity.quantized).

    The algebra is associative+commutative SUM over a bounded key space
    (k*(d+1) rows), i.e. exactly what Structured Streaming's state store
    maintains incrementally — streaming/kmeans.py runs this same plan on
    a stream to keep a live cluster census / drift monitor against a
    trained model. Running mean of cluster c = s[c, :] / (quant * n_c);
    drift = distance of that mean from centroids[c].
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    k, d = C.shape
    q = float(quant)

    def partials(batches):
        sums = np.zeros((k, d), dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            d2 = (
                (X**2).sum(axis=1, keepdims=True)
                - 2.0 * (X @ C.T)
                + (C**2).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            Xq = np.floor(X * q).astype(np.int64)
            for c in np.unique(a):
                sel = a == c
                cnts[c] += int(sel.sum())
                sums[c] += Xq[sel].sum(axis=0)
        out = {"cluster": [], "pos": [], "s": []}
        for c in range(k):
            if cnts[c] == 0:
                continue
            out["cluster"].append(c)
            out["pos"].append(-1)
            out["s"].append(int(cnts[c]))
            for j in range(d):
                out["cluster"].append(c)
                out["pos"].append(j)
                out["s"].append(int(sums[c, j]))
        yield pd.DataFrame(out)

    return (
        _vectors(df, id_col, vec_col)
        .mapInPandas(partials, schema="cluster int, pos int, s long")
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"))
    )


def pq_codebooks_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    ks: int,
    n_iter: int = 10,
) -> "np.ndarray":
    """Full-corpus product-quantization codebooks: [m, ks, dsub].

    All m subspace k-means fits run FUSED — one Arrow pass per iteration
    emits partials for every (subspace, cluster) pair (slot = j*ks + c),
    so the job count is n_iter, not m*n_iter. Same init/update recursion
    as similarity._kmeans_fit per subspace (first-ks rows by id, mean
    update, empty keeps previous), so the bounded-sample and full-corpus
    trainers agree whenever they see the same data. Feed the result to
    similarity.pq_topk(codebooks=...).
    """
    import numpy as np
    import pandas as pd

    vec = _vectors(df, id_col, vec_col).localCheckpoint(eager=False)
    V0 = _first_k_vectors(vec, ks, "pq_codebooks_fit")
    dim = V0.shape[1]
    if dim % m:
        raise ValueError(f"pq_codebooks_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    ks_eff = len(V0)
    C = np.stack(
        [V0[:, j * dsub : (j + 1) * dsub].copy() for j in range(m)]
    )  # [m, ks_eff, dsub]

    for _ in range(n_iter):
        Cb = C

        def partials(batches):
            sums = np.zeros((m, ks_eff, dsub), dtype=np.float64)
            cnts = np.zeros((m, ks_eff), dtype=np.float64)
            for pdf in batches:
                X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
                if len(X) == 0:
                    continue
                for j in range(m):
                    sub = X[:, j * dsub : (j + 1) * dsub]
                    d2 = (
                        (sub**2).sum(axis=1, keepdims=True)
                        - 2.0 * (sub @ Cb[j].T)
                        + (Cb[j] ** 2).sum(axis=1)[None, :]
                    )
                    a = d2.argmin(axis=1)
                    for c in np.unique(a):
                        sel = a == c
                        cnts[j, c] += float(sel.sum())
                        sums[j, c] += sub[sel].sum(axis=0)
            out = {"slot": [], "pos": [], "val": []}
            for j in range(m):
                for c in range(ks_eff):
                    if cnts[j, c] == 0.0:
                        continue
                    slot = j * ks_eff + c
                    out["slot"].append(slot)
                    out["pos"].append(-1)
                    out["val"].append(cnts[j, c])
                    for t in range(dsub):
                        out["slot"].append(slot)
                        out["pos"].append(t)
                        out["val"].append(sums[j, c, t])
            yield pd.DataFrame(out)

        acc = _reduce_partials(vec.mapInPandas(partials, _PARTIAL_SCHEMA))
        C_new = C.copy()
        for j in range(m):
            for c in range(ks_eff):
                slot = j * ks_eff + c
                n_c = acc.get((slot, -1), 0.0)
                if n_c > 0.0:
                    C_new[j, c] = (
                        np.array(
                            [acc[(slot, t)] for t in range(dsub)],
                            dtype=np.float64,
                        )
                        / n_c
                    )
        C = C_new
    return C


# ---------------------------------------------------------------------------
# PCA (Gram-matrix partial sums)
# ---------------------------------------------------------------------------


def pca_fit(
    df: DataFrame, id_col: str, vec_col: str, n_components: int
) -> dict:
    """Full-corpus PCA via one pass of (count, sum, X^T X) partial sums.

    Returns {"mean": [d], "components": [m, d], "explained_variance": [m],
    "explained_variance_ratio": [m]} — components are unit rows of the
    sample-covariance eigendecomposition, descending eigenvalue, each
    sign-fixed so its largest-|.|element is positive (the twin applies the
    same convention; raw eigh signs are arbitrary).

    One Arrow pass, one O(d^2) shuffle, driver-side eigh of a d x d
    matrix — d is embedding width (64-4096), never corpus-sized.
    """
    import numpy as np
    import pandas as pd

    vec = _vectors(df, id_col, vec_col)

    def partials(batches):
        d_seen = None
        G = None
        s = None
        n = 0.0
        for pdf in batches:
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            if G is None:
                d_seen = X.shape[1]
                G = np.zeros((d_seen, d_seen), dtype=np.float64)
                s = np.zeros(d_seen, dtype=np.float64)
            G += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if G is None:
            return
        out = {"slot": [0], "pos": [-1], "val": [n]}
        for j in range(d_seen):
            out["slot"].append(1)
            out["pos"].append(j)
            out["val"].append(s[j])
        flat = G.ravel()
        for p in range(d_seen * d_seen):
            out["slot"].append(2)
            out["pos"].append(p)
            out["val"].append(flat[p])
        yield pd.DataFrame(out)

    acc = _reduce_partials(vec.mapInPandas(partials, _PARTIAL_SCHEMA))
    n = acc.get((0, -1), 0.0)
    if n < 2:
        raise ValueError("pca_fit: need >= 2 rows")
    d = max(p for (slot, p) in acc if slot == 1) + 1
    s = np.array([acc[(1, j)] for j in range(d)], dtype=np.float64)
    G = np.array(
        [acc[(2, p)] for p in range(d * d)], dtype=np.float64
    ).reshape(d, d)
    mean = s / n
    cov = (G - n * np.outer(mean, mean)) / (n - 1.0)
    cov = (cov + cov.T) / 2.0  # symmetrize away partial-sum float noise
    return _pca_from_cov(mean, cov, n_components)


def _pca_from_cov(mean, cov, n_components: int) -> dict:
    import numpy as np

    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T.copy()
    evr_den = float(w.sum())
    for i in range(len(comps)):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = w[order]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / evr_den,
    }


def pca_fit_numpy(V: "np.ndarray", n_components: int) -> dict:
    """Flat-matrix twin: same covariance definition (ddof=1), same
    eigendecomposition, same sign convention."""
    import numpy as np

    V = np.asarray(V, dtype=np.float64)
    mean = V.mean(axis=0)
    X = V - mean
    cov = (X.T @ X) / (len(V) - 1.0)
    return _pca_from_cov(mean, cov, n_components)


def pca_transform(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mean: "np.ndarray",
    components: "np.ndarray",
) -> DataFrame:
    """(id, proj array<double>) — (x - mean) @ components.T, one Arrow
    pass with the [m, d] component matrix in the closure."""
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64)

    def project(batches):
        for pdf in batches:
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            P = (X - mu) @ W.T
            yield pd.DataFrame({"id": pdf["id"], "proj": list(P)})

    return _vectors(df, id_col, vec_col).mapInPandas(
        project, schema="id long, proj array<double>"
    )


# ---------------------------------------------------------------------------
# Logistic regression (full-batch GD, partial-sum gradients)
# ---------------------------------------------------------------------------


def logreg_fit(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 100,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> dict:
    """Full-batch gradient-descent logistic regression over feature
    COLUMNS (not an array col — the quality-gate use feeds textstats
    integers straight in). Features are standardized by corpus mean/std
    (one partial-sum pass) so the fixed learning rate is scale-free.

    Returns {"w": [d], "b": float, "mean": [d], "std": [d], "n": int} in
    STANDARDIZED space; logreg_predict applies the same transform.

    Per iteration: broadcast (w, b), one Arrow pass of (d+1)-value
    gradient partials, one constant-size shuffle, driver step
    w -= lr * (grad/n + l2*w). Deterministic: zero init, fixed iteration
    count, float64 — the numpy twin runs the identical recursion.
    """
    import numpy as np
    import pandas as pd

    d = len(feature_cols)
    cols = [F.col(c).cast("double").alias(f"f{i}") for i, c in enumerate(feature_cols)]
    rows = ensure_parallelism(
        df.select(*cols, F.col(label_col).cast("double").alias("y"))
    ).localCheckpoint(eager=False)
    fnames = [f"f{i}" for i in range(d)]

    def stat_partials(batches):
        s = np.zeros(d)
        ss = np.zeros(d)
        n = 0.0
        for pdf in batches:
            X = pdf[fnames].to_numpy(dtype=np.float64)
            if len(X) == 0:
                continue
            s += X.sum(axis=0)
            ss += (X**2).sum(axis=0)
            n += len(X)
        out = {"slot": [0], "pos": [-1], "val": [n]}
        for j in range(d):
            out["slot"] += [1, 2]
            out["pos"] += [j, j]
            out["val"] += [s[j], ss[j]]
        yield pd.DataFrame(out)

    acc = _reduce_partials(rows.mapInPandas(stat_partials, _PARTIAL_SCHEMA))
    n = acc.get((0, -1), 0.0)
    if n == 0:
        raise ValueError("logreg_fit: empty input")
    mean = np.array([acc[(1, j)] for j in range(d)]) / n
    var = np.maximum(np.array([acc[(2, j)] for j in range(d)]) / n - mean**2, 0.0)
    std = np.sqrt(var)
    std[std == 0.0] = 1.0  # constant features contribute nothing either way

    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(n_iter):
        wb, bb = w.copy(), b

        def grad_partials(batches):
            g = np.zeros(d)
            gb = 0.0
            for pdf in batches:
                X = (pdf[fnames].to_numpy(dtype=np.float64) - mean) / std
                if len(X) == 0:
                    continue
                y = pdf["y"].to_numpy(dtype=np.float64)
                p = 1.0 / (1.0 + np.exp(-(X @ wb + bb)))
                r = p - y
                g += X.T @ r
                gb += float(r.sum())
            out = {"slot": [0], "pos": [-1], "val": [gb]}
            for j in range(d):
                out["slot"].append(1)
                out["pos"].append(j)
                out["val"].append(g[j])
            yield pd.DataFrame(out)

        acc = _reduce_partials(rows.mapInPandas(grad_partials, _PARTIAL_SCHEMA))
        gb = acc.get((0, -1), 0.0)
        g = np.array([acc.get((1, j), 0.0) for j in range(d)])
        w = w - lr * (g / n + l2 * w)
        b = b - lr * (gb / n)
    return {"w": w, "b": b, "mean": mean, "std": std, "n": int(n)}


def logreg_fit_numpy(
    X: "np.ndarray",
    y: "np.ndarray",
    n_iter: int = 100,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> dict:
    """Flat-matrix twin of logreg_fit: identical standardization
    (population std), identical GD recursion."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mean = X.mean(axis=0)
    std = np.sqrt(np.maximum((X**2).mean(axis=0) - mean**2, 0.0))
    std = np.where(std == 0.0, 1.0, std)
    Z = (X - mean) / std
    n = len(X)
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        r = p - y
        w = w - lr * ((Z.T @ r) / n + l2 * w)
        b = b - lr * (r.sum() / n)
    return {"w": w, "b": b, "mean": mean, "std": std, "n": n}


def logreg_predict(
    df: DataFrame, id_col: str, feature_cols: list[str], model: dict
) -> DataFrame:
    """(id, prob, pred) — sigmoid((x - mean)/std . w + b), pred at 0.5."""
    import numpy as np
    import pandas as pd

    d = len(feature_cols)
    w = np.asarray(model["w"], dtype=np.float64)
    b = float(model["b"])
    mean = np.asarray(model["mean"], dtype=np.float64)
    std = np.asarray(model["std"], dtype=np.float64)
    cols = [F.col(c).cast("double").alias(f"f{i}") for i, c in enumerate(feature_cols)]
    fnames = [f"f{i}" for i in range(d)]
    rows = ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias("id"), *cols)
    )

    def predict(batches):
        for pdf in batches:
            X = (pdf[fnames].to_numpy(dtype=np.float64) - mean) / std
            if len(X) == 0:
                continue
            p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
            yield pd.DataFrame(
                {"id": pdf["id"], "prob": p, "pred": (p >= 0.5).astype("int32")}
            )

    return rows.mapInPandas(predict, schema="id long, prob double, pred int")


# ---------------------------------------------------------------------------
# Orthogonal Procrustes embedding-space alignment
# ---------------------------------------------------------------------------


def procrustes_fit(
    pairs: DataFrame, vec_a: str = "va", vec_b: str = "vb"
) -> dict:
    """Orthogonal Procrustes alignment (Schönemann 1966): the rotation
    W = argmin_{W orthogonal} ||A W - B||_F between two embedding
    spaces observed on SHARED anchor entities — the standard tool for
    aligning KGE snapshots after a refit (embedding spaces are only
    defined up to rotation; a refit scrambles the basis even when the
    geometry is unchanged) or for cross-lingual/cross-model bridging
    (Mikolov 2013 exp2). Pure rotation variant — no centering/scale —
    documented contract; anchors are rows of ``pairs`` with both
    vectors present.

    ``pairs``: (va array, vb array), one row per anchor. Returns
    {"W": [d, d], "n": n_anchors} with W = U V^T from the SVD of
    M = A^T B.

    Scale shape: the same broadcast-model / partial-sum channel as
    pca_fit — each Arrow batch reduces to a d x d numpy partial of M,
    one O(d^2) shuffle, driver-side SVD of a d x d matrix (d = width,
    never corpus-sized). W is unique when M's singular values are
    distinct (simultaneous U/V sign flips cancel in U V^T), so the
    distributed fit equals the numpy twin to float tolerance
    regardless of partitioning."""
    import numpy as np
    import pandas as pd

    vec = pairs.select(
        F.col(vec_a).cast("array<double>").alias("a"),
        F.col(vec_b).cast("array<double>").alias("b"),
    )
    if not vec.isStreaming:
        vec = ensure_parallelism(vec)

    def partials(batches):
        M = None
        n = 0.0
        d_seen = None
        for pdf in batches:
            A = np.asarray(pdf["a"].tolist(), dtype=np.float64)
            B = np.asarray(pdf["b"].tolist(), dtype=np.float64)
            if len(A) == 0:
                continue
            if M is None:
                d_seen = A.shape[1]
                if B.shape[1] != d_seen:
                    raise ValueError(
                        "procrustes_fit: vector widths differ "
                        f"({d_seen} vs {B.shape[1]})"
                    )
                M = np.zeros((d_seen, d_seen), dtype=np.float64)
            M += A.T @ B
            n += len(A)
        if M is None:
            return
        out = {"slot": [0], "pos": [-1], "val": [n]}
        flat = M.ravel()
        for p in range(flat.shape[0]):
            out["slot"].append(1)
            out["pos"].append(p)
            out["val"].append(flat[p])
        yield pd.DataFrame(out)

    acc = _reduce_partials(vec.mapInPandas(partials, _PARTIAL_SCHEMA))
    n = acc.get((0, -1), 0.0)
    if n < 1:
        raise ValueError("procrustes_fit: no anchor rows")
    dd = max(p for (slot, p) in acc if slot == 1) + 1
    d = int(round(dd ** 0.5))
    M = np.array(
        [acc[(1, p)] for p in range(d * d)], dtype=np.float64
    ).reshape(d, d)
    return {"W": _procrustes_from_m(M), "n": int(n)}


def _procrustes_from_m(M) -> "np.ndarray":
    import numpy as np

    U, _s, Vt = np.linalg.svd(M)
    return U @ Vt


def procrustes_fit_numpy(A, B) -> "np.ndarray":
    """Flat-matrix twin: identical M accumulation and SVD."""
    import numpy as np

    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    return _procrustes_from_m(A.T @ B)


def procrustes_apply(
    df: DataFrame, model: dict, vec_col: str, out_col: str = "v_aligned"
) -> DataFrame:
    """Rotate every vector into the target space: one Arrow GEMM pass
    with the d x d W broadcast in the closure (model-sized, never
    data-sized); all other columns pass through."""
    import numpy as np
    import pandas as pd

    W = np.asarray(model["W"], dtype=np.float64)
    cols = df.columns
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols]
        + [f"`{out_col}` array<double>"]
    )

    def gemm(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            out = pdf[cols].copy() if len(cols) else pd.DataFrame()
            out[out_col] = (
                list(X @ W) if len(X) else pd.Series([], dtype=object)
            )
            yield out

    src = df if df.isStreaming else ensure_parallelism(df)
    return src.mapInPandas(gemm, schema)


def procrustes_report(
    pairs: DataFrame, model: dict, vec_a: str = "va", vec_b: str = "vb"
) -> DataFrame:
    """One-row alignment-quality report over the anchor pairs:
    (n_anchors, mean_cos_before_ppm, mean_cos_after_ppm). Cosines are
    computed per row JVM-free inside one Arrow pass and averaged with
    a (sum, count) partial — a single constant-size shuffle."""
    import numpy as np
    import pandas as pd

    W = np.asarray(model["W"], dtype=np.float64)

    def partials(batches):
        s_before = 0.0
        s_after = 0.0
        n = 0.0
        for pdf in batches:
            A = np.asarray(pdf["a"].tolist(), dtype=np.float64)
            B = np.asarray(pdf["b"].tolist(), dtype=np.float64)
            if len(A) == 0:
                continue
            na = np.linalg.norm(A, axis=1)
            nb = np.linalg.norm(B, axis=1)
            den = np.where(na * nb == 0, 1.0, na * nb)
            s_before += float(((A * B).sum(axis=1) / den).sum())
            AW = A @ W
            naw = np.linalg.norm(AW, axis=1)
            den2 = np.where(naw * nb == 0, 1.0, naw * nb)
            s_after += float(((AW * B).sum(axis=1) / den2).sum())
            n += len(A)
        if n:
            yield pd.DataFrame(
                {"slot": [0, 1, 2], "pos": [-1, -1, -1],
                 "val": [n, s_before, s_after]}
            )

    vec = pairs.select(
        F.col(vec_a).cast("array<double>").alias("a"),
        F.col(vec_b).cast("array<double>").alias("b"),
    )
    if not vec.isStreaming:
        vec = ensure_parallelism(vec)
    acc = _reduce_partials(vec.mapInPandas(partials, _PARTIAL_SCHEMA))
    n = acc.get((0, -1), 0.0)
    spark = pairs.sparkSession
    if n == 0:
        return local_df(spark, 
            [],
            "n_anchors long, mean_cos_before_ppm long,"
            " mean_cos_after_ppm long",
        )
    row = (
        int(n),
        int(round(acc[(1, -1)] / n * 1_000_000)),
        int(round(acc[(2, -1)] / n * 1_000_000)),
    )
    return local_df(spark, 
        [row],
        "n_anchors long, mean_cos_before_ppm long,"
        " mean_cos_after_ppm long",
    )
