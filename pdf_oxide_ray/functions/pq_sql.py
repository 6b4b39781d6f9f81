"""Shared DuckDB CTE chains for the product-quantization family
(LEAF module — query families import it without touching siblings,
the `functions/markov_sql.py` pattern).

`pq_chain(s, m, d, k, iters, scale)` returns one subspace's unrolled
Lloyd chain (prefixed CTE names ``q{s}/c{s}_t/a{s}_f/sq{s}/ds{s}/
res{s}``), mirroring `queries._kmeans_cte_chain`'s exactness contract
(round_even grid, BIGINT component sums, argmin ties toward the lower
cluster id) with an offset slice into the embedding list. The caller
provides the shared ``dims`` CTE and composes subspace chains +
final SELECTs."""

from __future__ import annotations

PQ_M = 4          # subspaces
PQ_D = 16         # dims per subspace (4 x 16 = the 64-d embedding)
PQ_K = 8          # centroids per subspace codebook
PQ_ITERS = 5


def pq_chain(s: int, scale: float) -> str:
    """One subspace's unrolled Lloyd chain — module docstring."""
    o = s * PQ_D
    S = repr(scale)
    parts = [f"""
q{s} AS (SELECT vec_id, j,
             round_even(embedding[j + 1 + {o}] * {S}, 0) / {S} AS x
      FROM embeddings, dims),
c{s}_0 AS (SELECT vec_id AS cluster, j, x AS c FROM q{s}
           WHERE vec_id < {PQ_K})"""]
    for t in range(1, PQ_ITERS + 1):
        p = t - 1
        parts.append(f"""
d{s}_{t} AS (SELECT q.vec_id, c.cluster,
              SUM(q.x * q.x) - 2 * SUM(q.x * c.c) + SUM(c.c * c.c)
                AS d2
       FROM q{s} q JOIN c{s}_{p} c USING (j)
       GROUP BY q.vec_id, c.cluster),
a{s}_{t} AS (SELECT vec_id, cluster FROM (
         SELECT vec_id, cluster,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cluster) AS rn
         FROM d{s}_{t}) WHERE rn = 1),
u{s}_{t} AS (SELECT a.cluster, q.j,
              (CAST(SUM(CAST(round_even(q.x * {S}, 0) AS BIGINT))
                    AS DOUBLE) / COUNT(*)) / {S} AS c
       FROM q{s} q JOIN a{s}_{t} a USING (vec_id)
       GROUP BY a.cluster, q.j),
c{s}_{t} AS (SELECT c{s}_{p}.cluster, c{s}_{p}.j,
                    COALESCE(u{s}_{t}.c, c{s}_{p}.c) AS c
       FROM c{s}_{p} LEFT JOIN u{s}_{t}
         ON u{s}_{t}.cluster = c{s}_{p}.cluster
        AND u{s}_{t}.j = c{s}_{p}.j)""")
    f = PQ_ITERS + 1
    parts.append(f"""
d{s}_{f} AS (SELECT q.vec_id, c.cluster,
              SUM(q.x * q.x) - 2 * SUM(q.x * c.c) + SUM(c.c * c.c)
                AS d2
       FROM q{s} q JOIN c{s}_{PQ_ITERS} c USING (j)
       GROUP BY q.vec_id, c.cluster),
a{s}_f AS (SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster) AS rn
  FROM d{s}_{f}) WHERE rn = 1),
sq{s} AS (SELECT q.vec_id,
              CAST(round((q.x - c.c) * (q.x - c.c) * 1000000000)
                   AS BIGINT) AS sq9
       FROM q{s} q
       JOIN a{s}_f a USING (vec_id)
       JOIN c{s}_{PQ_ITERS} c ON c.cluster = a.cluster
                              AND c.j = q.j),
ds{s} AS (SELECT vec_id, CAST(SUM(sq9) AS BIGINT) AS d2q
          FROM sq{s} GROUP BY 1),
res{s} AS (SELECT CAST({s} AS BIGINT) AS subspace,
                  CAST(count(*) AS BIGINT) AS n_vectors,
                  CAST(SUM(d2q) AS BIGINT) AS sd
           FROM ds{s})""")
    return ",".join(parts)

