"""Distributed PCA over an embedding corpus — the whitening / dimension-
reduction step between ext_embedding_normalize and IVF training.

Structure (the classic two-stage distributed PCA):

1. **Covariance, corpus-parallel**: each partition computes ONE local
   Gram contribution (sum of outer products, vectorized numpy inside
   Arrow-batched mapInPandas) plus the local sum vector and count — so a
   partition of any size reduces to a single (d*d + d + 1)-float row.
   The driver combines the handful of partials into the d x d covariance:
   cov = (sum_outer - n * mean mean^T) / n. At 100 TB this moves
   O(partitions * d^2) floats, never the corpus.
2. **Eigendecomposition on the driver**: d x d is tiny (64 x 64);
   numpy.linalg.eigh, components sorted by descending eigenvalue. Sign
   convention: each component's largest-|coeff| entry is made positive
   (eigh's sign is otherwise arbitrary).
3. **Projection, map-only**: the component matrix broadcasts; projecting
   is a matmul per Arrow batch.

Verification (rows-only — no SQL oracle can eigendecompose): pytest pins
orthonormality of the components, eigenvalue/variance agreement
(projected variance per component == its eigenvalue), spectrum ordering,
explained-ratio normalization, and stability across partition layouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _partial_gram_rows(emb: DataFrame) -> DataFrame:
    """One row per partition: (n, sum_vec, flattened outer-product sum)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in it:
            m = np.array(pdf["e"].tolist(), dtype=np.float64)
            if m.size == 0:
                continue
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gram = m.T @ m
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    return emb.select(F.col("e")).mapInPandas(
        batches, "n long, s array<double>, g array<double>"
    )


def fit_pca(emb: DataFrame):
    """Fit PCA on (vec_id, e array<double>); returns (mean, components,
    eigenvalues) as numpy arrays — components[k] is the k-th principal
    axis (descending eigenvalue, sign-normalized)."""
    partials = _partial_gram_rows(emb).collect()
    if not partials:
        raise ValueError("empty embedding corpus")
    n = sum(r.n for r in partials)
    d = len(partials[0].s)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in partials:
        s += np.array(r.s)
        g += np.array(r.g).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order].T  # rows = components
    for k in range(vecs.shape[0]):  # deterministic sign
        j = int(np.argmax(np.abs(vecs[k])))
        if vecs[k, j] < 0:
            vecs[k] = -vecs[k]
    return mean, vecs, np.maximum(vals, 0.0)


def project_pca(
    emb: DataFrame, mean: np.ndarray, components: np.ndarray, k: int
) -> DataFrame:
    """Map-only projection onto the first k components (broadcast matmul)."""
    comp = components[:k]
    mean_l = mean.tolist()
    comp_l = comp.tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m_mean = np.array(mean_l)
        m_comp = np.array(comp_l)
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["e"].tolist(), dtype=np.float64)
            z = (m - m_mean) @ m_comp.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": list(z.tolist())}
            )

    return emb.select("vec_id", "e").mapInPandas(
        batches, "vec_id long, proj array<double>"
    )
