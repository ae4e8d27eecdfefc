"""DuckDB SQL builders that replicate the SplitMix64 randomization exactly.

The ``rng_mode="splitmix"`` path in ``stages/randomization.py`` draws from a
counter-keyed SplitMix64 stream (``rng.sm_rank_uniforms``): every float op in
the draw and in the noise/reflect/retry chain is a single IEEE-754 operation
with a fixed evaluation order, so DuckDB can reproduce the output bit-for-bit
from the same parquet input — which turns the SEEDED randomized columns
(reference ``RandomizationNumeric.java:31-40`` / ``RandomizationDate.java:40-58``
/ ``RandomizationDateTime.java:36-51`` semantics) into value-hash-checkable
oracle queries instead of rows-only checks.

Mod-2^64 arithmetic is built from HUGEINT (128-bit) primitives:
``a*b mod 2^64`` splits ``a`` into 32-bit halves so no intermediate exceeds
2^96; xor/shift run through UBIGINT. The uniform is ``(z >> 11) * 2^-53``
(exact in double); gaussians are Box-Muller written operation-for-operation
as in ``rng.sm_gaussian_rounds`` (ln/cos may differ from numpy by ~1 ulp, but
every consumer rounds to whole days/seconds, where a boundary coincidence has
~2^-40 probability per row — the integer outputs are exact in practice and
verified by the driver's value-hash gate).
"""

from __future__ import annotations

from .rng import DRAWS_PER_RANK, RETRY_ROUNDS, SM64_GAMMA, _SM64_M1, _SM64_M2

_TWO64 = 1 << 64
_TWO32 = 1 << 32


def _mul64(expr: str, const: int) -> str:
    """SQL for ``expr * const mod 2^64`` over non-negative HUGEINTs."""
    c0, c1 = const % _TWO32, const >> 32
    e = f"({expr})"
    return (
        f"(({e} % {_TWO32} * {c0} + ({e} % {_TWO32} * {c1} + {e} // {_TWO32} * {c0})"
        f" % {_TWO32} * {_TWO32}) % {_TWO64})"
    )


def _xsh(expr: str, shift: int) -> str:
    """SQL for ``expr ^ (expr >> shift)`` on a value < 2^64 held in HUGEINT."""
    return (
        f"CAST(xor(CAST(({expr}) AS UBIGINT), CAST(({expr}) // {1 << shift} AS UBIGINT))"
        f" AS HUGEINT)"
    )


def _sm64_chain(prefix: str, src: str, carry: str, draws: dict[str, str], key64: int) -> str:
    """CTE chain computing exact SplitMix64 uniforms.

    ``draws`` maps output uniform column -> counter SQL expression (valid over
    ``src``'s columns); ``carry`` columns are passed through every step. The
    final CTE is ``{prefix}u`` with carry + uniform columns in [0, 1).
    """
    names = list(draws)
    s0 = ", ".join(
        f"(CAST({key64} AS HUGEINT) + "
        f"{_mul64(f'CAST({draws[n]} AS HUGEINT)', SM64_GAMMA)}) % {_TWO64} AS x_{n}"
        for n in names
    )
    s1 = ", ".join(f"{_mul64(_xsh(f'x_{n}', 30), _SM64_M1)} AS x_{n}" for n in names)
    s2 = ", ".join(f"{_mul64(_xsh(f'x_{n}', 27), _SM64_M2)} AS x_{n}" for n in names)
    s3 = ", ".join(f"{_xsh(f'x_{n}', 31)} AS x_{n}" for n in names)
    su = ", ".join(
        f"CAST(x_{n} // 2048 AS DOUBLE) * (1.0/9007199254740992.0) AS {n}" for n in names
    )
    return f"""
{prefix}0 AS (SELECT {carry}, {s0} FROM {src}),
{prefix}1 AS (SELECT {carry}, {s1} FROM {prefix}0),
{prefix}2 AS (SELECT {carry}, {s2} FROM {prefix}1),
{prefix}3 AS (SELECT {carry}, {s3} FROM {prefix}2),
{prefix}u AS (SELECT {carry}, {su} FROM {prefix}3)"""


def _rand_prefix(table: str, id_col: str, val_col: str, val_expr: str, g_sql: str) -> str:
    """Shared CTEs: rank per (value, id), w, per-rank noise scale ``dist``
    (the closed-form window walk of ``Randomization.java:42-52``, same shape
    as the already-hash-exact ``SQL_RAND_WINDOW``), vmin/vmax, retry rounds."""
    return f"""
WITH stats AS (SELECT count(*) AS k FROM {table} WHERE {val_col} IS NOT NULL),
wk AS (SELECT k, CASE WHEN k // ({g_sql}) = k THEN k - 1 ELSE k // ({g_sql}) END AS w FROM stats),
s AS (SELECT {id_col} AS id, {val_expr} AS v,
             row_number() OVER (ORDER BY {val_expr}, {id_col}) - 1 AS rnk
      FROM {table} WHERE {val_col} IS NOT NULL),
cw AS (SELECT i.rnk AS idx, j.rnk AS j
       FROM s i CROSS JOIN wk
       JOIN s j ON j.rnk BETWEEN greatest(i.rnk - wk.w, 0) AND least(i.rnk, wk.k - wk.w - 1)
       LEFT JOIN s jw ON jw.rnk = j.rnk + wk.w + 1
       WHERE j.rnk >= wk.k - wk.w - 1 OR (j.v + jw.v) >= 2 * i.v),
lb AS (SELECT idx, min(j) AS lb FROM cw GROUP BY idx),
d AS (SELECT i.id, i.v, i.rnk, greatest(abs(i.v - sl.v), abs(i.v - slw.v)) AS dist
      FROM s i JOIN lb ON lb.idx = i.rnk CROSS JOIN wk
      JOIN s sl ON sl.rnk = lb.lb JOIN s slw ON slw.rnk = lb.lb + wk.w),
mm AS (SELECT min(v) AS vmin, max(v) AS vmax FROM s),
rr AS (SELECT unnest(range({RETRY_ROUNDS})) AS j),
base AS (SELECT d.id, d.v, d.rnk, d.dist, rr.j FROM d CROSS JOIN rr),"""


def sql_rand_numeric(
    table: str, id_col: str, val_col: str, g_sql: str, key64: int, out_name: str
) -> str:
    """Uniform noise, reflected then retried into [vmin, vmax]
    (``randomize_ranks_np`` NUMERIC branch, op-for-op)."""
    chain = _sm64_chain(
        "sm", "base", "id, v, dist, j", {"u": f"rnk * {DRAWS_PER_RANK} + 2 * j"}, key64
    )
    return f"""{_rand_prefix(table, id_col, val_col, f"CAST({val_col} AS DOUBLE)", g_sql)}
{chain},
cnd AS (SELECT smu.id, smu.v, smu.j,
        CASE WHEN smu.v + smu.u * smu.dist > mm.vmax OR smu.v + smu.u * smu.dist < mm.vmin
             THEN smu.v - smu.u * smu.dist ELSE smu.v + smu.u * smu.dist END AS cand
        FROM smu CROSS JOIN mm),
pick AS (SELECT cnd.id, any_value(cnd.v) AS v,
                arg_min(cnd.cand, cnd.j)
                  FILTER (WHERE cnd.cand >= mm.vmin AND cnd.cand <= mm.vmax) AS sel
         FROM cnd CROSS JOIN mm GROUP BY cnd.id),
o AS (SELECT pick.id, COALESCE(pick.sel, least(greatest(pick.v, mm.vmin), mm.vmax)) AS val
      FROM pick CROSS JOIN mm)
SELECT t.{id_col}, o.val AS {out_name}
FROM {table} t LEFT JOIN o ON o.id = t.{id_col}
"""


def _gaussian_cte(key64: int) -> str:
    """base -> zz(id, v, dist, j, z): Box-Muller over lanes 2j / 2j+1."""
    chain = _sm64_chain(
        "sm",
        "base",
        "id, v, dist, j",
        {
            "u1": f"rnk * {DRAWS_PER_RANK} + 2 * j",
            "u2": f"rnk * {DRAWS_PER_RANK} + 2 * j + 1",
        },
        key64,
    )
    return f"""{chain},
zz AS (SELECT id, v, dist, j,
              sqrt(-2.0 * ln(greatest(u1, 1e-300))) * cos(2.0 * pi() * u2) AS z
       FROM smu),"""


def sql_rand_date(
    table: str, id_col: str, val_col: str, g_sql: str, key64: int, out_name: str
) -> str:
    """Gaussian whole-day noise, sign-flip reflect then retry
    (``randomize_ranks_np`` DATE branch; Math.round = floor(x+0.5)); output
    projected to epoch-day BIGINT so both engines hash identical ints."""
    val_expr = f"CAST(datediff('day', DATE '1970-01-01', CAST({val_col} AS DATE)) AS DOUBLE)"
    return f"""{_rand_prefix(table, id_col, val_col, val_expr, g_sql)}
{_gaussian_cte(key64)}
nn AS (SELECT id, v, j, floor(z * dist + 0.5) AS noise FROM zz),
rf AS (SELECT nn.id, nn.v, nn.j,
              CASE WHEN nn.v + nn.noise > mm.vmax OR nn.v + nn.noise < mm.vmin
                   THEN -nn.noise ELSE nn.noise END AS noise
       FROM nn CROSS JOIN mm),
pick AS (SELECT rf.id, any_value(rf.v) AS v,
                arg_min(rf.noise, rf.j)
                  FILTER (WHERE rf.v + rf.noise >= mm.vmin AND rf.v + rf.noise <= mm.vmax) AS sel
         FROM rf CROSS JOIN mm GROUP BY rf.id),
o AS (SELECT id, v + COALESCE(sel, 0.0) AS val FROM pick)
SELECT t.{id_col}, CAST(o.val AS BIGINT) AS {out_name}
FROM {table} t LEFT JOIN o ON o.id = t.{id_col}
"""


def sql_rand_datetime(
    table: str, id_col: str, val_col: str, g_sql: str, key64: int, out_name: str
) -> str:
    """Gaussian whole-SECOND noise over epoch-millis values (Java ``(int)``
    cast = trunc); output projected to epoch millis BIGINT for cross-engine
    value hashing (``randomize_ranks_np`` DATETIME branch)."""
    val_expr = f"CAST(epoch_ms({val_col}) AS DOUBLE)"
    return f"""{_rand_prefix(table, id_col, val_col, val_expr, g_sql)}
{_gaussian_cte(key64)}
nn AS (SELECT id, v, j,
              CAST(CAST(v AS BIGINT) // 1000 AS DOUBLE) AS vs,
              trunc(z * (dist / 1000.0)) AS noise
       FROM zz),
bb AS (SELECT CAST(CAST(vmin AS BIGINT) // 1000 AS DOUBLE) AS lo,
              CAST(CAST(vmax AS BIGINT) // 1000 AS DOUBLE) AS hi FROM mm),
rf AS (SELECT nn.id, nn.v, nn.vs, nn.j,
              CASE WHEN nn.vs + nn.noise > bb.hi OR nn.vs + nn.noise < bb.lo
                   THEN -nn.noise ELSE nn.noise END AS noise
       FROM nn CROSS JOIN bb),
pick AS (SELECT rf.id, any_value(rf.v) AS v,
                arg_min(rf.noise, rf.j)
                  FILTER (WHERE rf.vs + rf.noise >= bb.lo AND rf.vs + rf.noise <= bb.hi) AS sel
         FROM rf CROSS JOIN bb GROUP BY rf.id),
o AS (SELECT id, v + COALESCE(sel, 0.0) * 1000 AS val FROM pick)
SELECT t.{id_col}, CAST(o.val AS BIGINT) AS {out_name}
FROM {table} t LEFT JOIN o ON o.id = t.{id_col}
"""
