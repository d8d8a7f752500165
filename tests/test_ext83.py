"""Property tests for extension batch 83: PCA top component invariants
vs numpy."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_ORACLE


def test_pca_top_component_matches_numpy(spark):
    from gemini_data_wrangler_spark.queries import registry

    rows = registry()["embedding_pca_top_component"][0](spark, SF_ORACLE).collect()
    assert len(rows) == 64
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    lam = rows[0]["eigenvalue"]
    frac = rows[0]["explained_frac"]
    # unit norm (rounded loadings)
    assert abs(np.linalg.norm(v) - 1.0) < 0.01
    # dominant eigenvalue must be >= mean eigenvalue = trace/dims
    assert frac >= 1.0 / 64

    from gemini_data_wrangler_spark.sources.readers import load_sf_tables

    emb = load_sf_tables(spark, SF_ORACLE)["embeddings"].collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(C)
    assert abs(lam - evals[-1]) < max(0.05 * evals[-1], 1e-3), (lam, evals[-1])
