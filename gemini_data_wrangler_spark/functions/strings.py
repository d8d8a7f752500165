"""String-distance kernels for entity resolution: Jaro, Jaro-Winkler and
unrestricted Damerau-Levenshtein, exposed as Arrow-batched pandas UDFs.

These are the slow-path scoring functions of the fuzzy-match family
(`F.levenshtein` stays JVM-side and is preferred where it fits — see
`fuzzy_match_customer_names`). They run AFTER blocking, so each batch
holds candidate pairs, never the cross product. Semantics match the
published definitions exactly (and therefore DuckDB's native
`jaro_winkler_similarity` / `damerau_levenshtein`, which the oracle
queries use as the independent reference implementation):

- Jaro (Jaro 1989): match window max(|a|,|b|)//2 − 1, transpositions =
  half the out-of-order matches.
- Winkler boost (Winkler 1990): + l·p·(1−jaro) for common prefix l ≤ 4,
  p = 0.1, applied only when jaro > 0.7.
- Damerau-Levenshtein: the UNRESTRICTED variant (Lowrance & Wagner
  1975) — transposed characters may be further edited afterwards, so
  d("CA","ABC") = 2, where the restricted OSA variant gives 3.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB convention: jaro("", "") = 0, not 1
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, boost: float = 0.7) -> float:
    j = jaro(a, b)
    if j <= boost:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * p * (1.0 - j)


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner), O(|a|·|b|)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose block
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro_winkler_batch(a_list, b_list, p: float = 0.1, boost: float = 0.7):
    """Vectorized Jaro-Winkler over a batch of pairs — the same
    pair-axis-vectorization treatment ``damerau_levenshtein_batch`` got
    (the per-pair interpreted loop inside the Arrow batch cost DL ~4×
    before it was numpy-vectorized). Every step of the greedy
    window-match scan is a numpy op across ALL pairs: the i/j loops run
    max-length × max-window times total, independent of batch size.

    Bit-exact with the scalar ``jaro_winkler`` above (asserted in tests):
    the match scan replays the scalar's exact greedy order (i ascending,
    first unmatched equal j within the window), the transposition count
    compares k-th matched chars via a vectorized rank scatter, and the
    float formulas evaluate in the scalar's operation order.

    Padding uses distinct a-side/b-side sentinel char ids so padded
    positions can never produce spurious matches or prefix agreement.
    """
    import numpy as np

    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    la = np.array([len(x) for x in a_list], dtype=np.int64)
    lb = np.array([len(x) for x in b_list], dtype=np.int64)
    La, Lb = max(int(la.max()), 1), max(int(lb.max()), 1)
    eq_all = np.array([x == y for x, y in zip(a_list, b_list)], dtype=bool)
    chars = sorted(set("".join(a_list)) | set("".join(b_list)))
    cmap = {c: i for i, c in enumerate(chars)}
    nc = len(chars)
    A = np.full((n, La), nc, dtype=np.int32)
    B = np.full((n, Lb), nc + 1, dtype=np.int32)
    for idx, s in enumerate(a_list):
        if s:
            A[idx, : len(s)] = [cmap[c] for c in s]
    for idx, s in enumerate(b_list):
        if s:
            B[idx, : len(s)] = [cmap[c] for c in s]
    window = np.maximum(la, lb) // 2 - 1  # can be negative (len-1 pairs)
    a_match = np.zeros((n, La), dtype=bool)
    b_match = np.zeros((n, Lb), dtype=bool)
    rows = np.arange(n)
    for i in range(La):
        lo = np.maximum(0, i - window)
        hi = np.minimum(lb, i + window + 1)
        active = (i < la) & (hi > lo)
        if not active.any():
            continue
        found = np.zeros(n, dtype=bool)
        ai = A[:, i]
        for off in range(int((hi - lo).max())):
            j = lo + off
            valid = active & ~found & (j < hi)
            if not valid.any():
                break
            jc = np.minimum(j, Lb - 1)  # clamp only protects invalid rows
            cond = valid & ~b_match[rows, jc] & (ai == B[rows, jc])
            if cond.any():
                b_match[rows[cond], jc[cond]] = True
                a_match[cond, i] = True
                found |= cond
    m = a_match.sum(axis=1).astype(np.int64)
    # Transpositions: k-th matched char of a vs k-th matched char of b.
    # Scatter matched chars into rank order (fancy indexing, no loops).
    Mm = max(int(m.max()), 1)
    Am = np.zeros((n, Mm), dtype=np.int32)
    Bm = np.full((n, Mm), -1, dtype=np.int32)
    r, c = np.nonzero(a_match)
    Am[r, a_match.cumsum(axis=1)[r, c] - 1] = A[r, c]
    r, c = np.nonzero(b_match)
    Bm[r, b_match.cumsum(axis=1)[r, c] - 1] = B[r, c]
    t = (((Am != Bm) & (np.arange(Mm) < m[:, None])).sum(axis=1) // 2).astype(
        np.int64
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        jar = (m / la + m / lb + (m - t) / m) / 3.0
    jar = np.where((m == 0) | (la == 0) | (lb == 0), 0.0, jar)
    # a == b short-circuits to 1.0 in the scalar (the window formula
    # yields m=0 for identical length-1 strings); empty-vs-empty stays 0.
    jar = np.where(eq_all & (la > 0), 1.0, jar)
    pl = min(4, La, Lb)
    pref = np.cumprod(A[:, :pl] == B[:, :pl], axis=1).sum(axis=1)
    return np.where(jar > boost, jar + pref * p * (1.0 - jar), jar)


def jaro_winkler_udf():
    """Arrow-batched pandas UDF — built lazily (pandas_udf parses its DDL
    return type against the ACTIVE session, so decoration can't happen at
    import time). Scores via the numpy pair-axis kernel."""

    def _score(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        mask = a.notna() & b.notna()
        out = np.full(len(a), np.nan, dtype=np.float64)
        if mask.any():
            out[np.flatnonzero(mask.to_numpy())] = jaro_winkler_batch(
                a[mask].tolist(), b[mask].tolist()
            )
        return pd.Series(out, dtype="float64").where(mask)

    return F.pandas_udf(_score, "double")


def damerau_levenshtein_batch(a_list, b_list):
    """Vectorized unrestricted Damerau-Levenshtein over a batch of pairs:
    one (La×Lb)-step DP whose every cell update is a numpy op across the
    whole pair axis — turning N·|a|·|b| Python-interpreted steps into
    |a|·|b| vector steps. Bit-exact with the scalar Lowrance-Wagner
    implementation above (asserted in tests), which remains the oracle.

    Padding uses two distinct sentinel char ids (a-side, b-side) so padded
    positions can never produce spurious matches; each pair's answer is
    read from its own (la+1, lb+1) cell, which padded-region updates can
    never influence (DP cells only depend on smaller indices, and the
    last-occurrence table keyed by the a-sentinel is never probed by a
    real b char)."""
    import numpy as np

    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    la = np.array([len(x) for x in a_list], dtype=np.int32)
    lb = np.array([len(x) for x in b_list], dtype=np.int32)
    La, Lb = int(la.max()), int(lb.max())
    chars = sorted(set("".join(a_list)) | set("".join(b_list)))
    cmap = {c: i for i, c in enumerate(chars)}
    nc = len(chars)
    pad_a, pad_b = nc, nc + 1
    A = np.full((n, max(La, 1)), pad_a, dtype=np.int32)
    B = np.full((n, max(Lb, 1)), pad_b, dtype=np.int32)
    for idx, s in enumerate(a_list):
        if s:
            A[idx, : len(s)] = [cmap[c] for c in s]
    for idx, s in enumerate(b_list):
        if s:
            B[idx, : len(s)] = [cmap[c] for c in s]
    maxdist = La + Lb  # ≥ every pair's la+lb: an "infinity" never selected
    d = np.full((La + 2, Lb + 2, n), maxdist, dtype=np.int32)
    d[1 : La + 2, 1] = np.arange(La + 1, dtype=np.int32)[:, None]
    d[1, 1 : Lb + 2] = np.arange(Lb + 1, dtype=np.int32)[:, None]
    da = np.zeros((n, nc + 2), dtype=np.int32)
    rows = np.arange(n)
    for i in range(1, La + 1):
        ai = A[:, i - 1]
        db = np.zeros(n, dtype=np.int32)
        for j in range(1, Lb + 1):
            bj = B[:, j - 1]
            k = da[rows, bj]
            l = db
            eq = ai == bj
            cost = np.where(eq, 0, 1).astype(np.int32)
            db = np.where(eq, j, db)
            trans = d[k, l, rows] + (i - k - 1) + 1 + (j - l - 1)
            d[i + 1, j + 1] = np.minimum(
                np.minimum(d[i, j] + cost, d[i + 1, j] + 1),
                np.minimum(d[i, j + 1] + 1, trans),
            )
        da[rows, ai] = i
    return d[la + 1, lb + 1, rows]


def damerau_levenshtein_udf():
    def _score(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        mask = a.notna() & b.notna()
        out = np.full(len(a), None, dtype=object)
        if mask.any():
            vals = damerau_levenshtein_batch(
                a[mask].tolist(), b[mask].tolist()
            )
            out[np.flatnonzero(mask.to_numpy())] = vals
        return pd.Series(out, dtype="Int32")

    return F.pandas_udf(_score, "int")
