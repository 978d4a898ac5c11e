"""Vector math kernels (numpy, vectorized — used inside Arrow-batched UDFs).

Parity anchors:
  - power_normalize: /root/reference/affiliation_vector_transform.py:6-29
  - l2_normalize:    /root/reference/topic_analysis.py:89-90,
                     /root/reference/populate_author_affiliation_type_distances.py:44-47
  - cosine via matmul of normalized rows:
                     /root/reference/populate_author_affiliation_type_distances.py:111,
                     /root/reference/multitopic_tracer.py:10-11
"""

from __future__ import annotations

import numpy as np


def power_normalize(values, power: float = 4.0) -> np.ndarray:
    """clip(v,0)**p / sum; all-zero input → zero vector (sums to 0)."""
    vec = np.asarray(values, dtype=np.float64)
    transformed = np.power(np.maximum(vec, 0.0), power)
    denom = float(transformed.sum())
    if denom == 0.0:
        return np.zeros_like(transformed)
    return transformed / denom


def l2_normalize(matrix: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Row-wise L2 normalization with a clip floor on the norm."""
    mat = np.asarray(matrix, dtype=np.float32)
    if mat.ndim == 1:
        mat = mat[None, :]
    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), eps)
    return mat / norms


def cosine_matrix(queries: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Batched cosine similarity: normalize rows then one matmul."""
    return l2_normalize(queries) @ l2_normalize(targets).T


def hashed_tfidf_vector(tokens: list[str], dim: int = 64) -> np.ndarray:
    """Deterministic hashed term-frequency vector, L2-normalized.

    The sandbox substitute for the reference's network embedding models
    (J1/J2 — /root/reference/publication_embedder.py:75-94,
    /root/reference/embed_entries.py:27-52).  Preserves the downstream
    data contract: a normalized float32 vector per text.
    """
    vec = np.zeros(dim, dtype=np.float32)
    for tok in tokens:
        # FNV-1a 32-bit — stable across runs/processes, no PYTHONHASHSEED
        h = 2166136261
        for byte in tok.encode("utf-8"):
            h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
        vec[h % dim] += 1.0
    norm = float(np.linalg.norm(vec))
    return vec / norm if norm > 0 else vec
