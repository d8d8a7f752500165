"""Skew-handling joins — explicit salting for hot keys.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins
at runtime; explicit salting is the complementary *planned* strategy when a
known-hot key would overwhelm even split partitions (the classic 100 TB
failure mode: one user/session/null-key holds 20% of rows).

``salted_join`` replicates the build side ``salt`` times and scatters the
probe side uniformly across the salt space, so the hot key's rows spread
over ``salt`` reducers. Exactly equivalent to a plain inner/left equi-join
— verified against the unsalted result in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (probe, skewed) side salted.

    * left rows get a uniform pseudo-random salt in ``[0, salt)`` derived
      from a row hash (deterministic — no rand(), replays identically);
    * right (build) rows are replicated once per salt value via a literal
      array explode (no shuffle to replicate);
    * the join key becomes (key, salt), so one hot key now occupies
      ``salt`` shuffle partitions instead of one.

    Supports how ∈ {inner, left}. Output columns = left columns + right
    columns (minus the right key, which duplicates the left key).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    )
    salted_r = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_l.join(
        salted_r,
        on=(salted_l[left_key] == salted_r[right_key]) & (salted_l["_salt"] == salted_r["_salt"]),
        how=how,
    )
    keep = [salted_l[c] for c in left.columns] + [
        salted_r[c] for c in right.columns if c != right_key
    ]
    return out.select(*keep)
