"""Shared DuckDB CTE chain for the event-type Markov family (LEAF
module — query families import it without touching siblings).

`markov_chain_cte(prec, iters)` returns a WITH-chain computing:

* ``tr``     — first-order transition counts over each user's event
  stream ordered by (ts, event_id);
* ``states`` — the state space (union of prev/next types);
* ``aug``    — counts augmented with a self-loop for absorbing states;
* ``rt``     — per-state outgoing totals;
* ``it0..itN`` — N exact-integer power-iteration steps on the
  ``prec`` probability grid. Every stage is MATERIALIZED: DuckDB
  inlines plain CTEs per reference, so a chained iteration would
  otherwise re-expand exponentially (observed: 24 plain stages never
  finish; MATERIALIZED runs in ~0.1 s). Per-term BIGINT floor
  division keeps each step order-free, matching the engine's
  ``(v[i] * C[i]) // rowtot[i]`` int64 fold bit-for-bit.

The caller appends its own final SELECT (and any extra CTEs) after
the returned chain."""

from __future__ import annotations


def markov_chain_cte(prec: int, iters: int) -> str:
    stages = ", ".join(
        f"it{k} AS MATERIALIZED (SELECT a.j AS j, "
        f"CAST(SUM((p.v * a.n) // rt.tot) AS BIGINT) AS v "
        f"FROM it{k - 1} p JOIN aug a ON a.i = p.j "
        f"JOIN rt ON rt.i = a.i GROUP BY a.j)"
        for k in range(1, iters + 1))
    return f"""
    WITH
    tr0 AS (SELECT event_type AS j,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS i
            FROM events),
    tr AS MATERIALIZED (SELECT i, j, count(*) AS n FROM tr0
                        WHERE i IS NOT NULL GROUP BY 1, 2),
    states AS MATERIALIZED (SELECT DISTINCT i AS s FROM tr
                            UNION SELECT DISTINCT j FROM tr),
    aug AS MATERIALIZED (
      SELECT i, j, n FROM tr
      UNION ALL
      SELECT s, s, CAST(1 AS BIGINT) FROM states
      WHERE s NOT IN (SELECT DISTINCT i FROM tr)),
    rt AS MATERIALIZED (SELECT i, CAST(SUM(n) AS BIGINT) AS tot
                        FROM aug GROUP BY 1),
    it0 AS MATERIALIZED (
      SELECT s AS j, CAST({prec}
                          // (SELECT count(*) FROM states) AS BIGINT) AS v
      FROM states),
    {stages}"""
