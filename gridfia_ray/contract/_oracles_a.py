"""DuckDB oracle SQL, part A — split out of build_oracle_sql (round-5
VERDICT #3). Statements preserved verbatim in original order; the
preamble locals are recomputed per part."""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def add_oracles_a(sql: dict, f: dict) -> None:
    P = f["pixels"]
    PZ = f["pixel_zones"]
    TD = f["tiles_dup"]
    T = f["tiles"]
    t = f["meta"]["tile"]
    x0, px, _, y0, _, nyp = f["meta"]["transform"]

    species_cte = f"WITH p AS (SELECT * FROM read_parquet('{P}') WHERE species_code <> '0000')"
    tot_cte = "tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x)"

    sql["gf_richness"] = (
        f"{species_cte} SELECT y, x, COUNT(*) FILTER (biomass > 0.0) AS richness "
        "FROM p GROUP BY y, x"
    )
    sql["gf_shannon"] = f"""
        {species_cte}, {tot_cte}
        SELECT p.y, p.x, {_sql_s6("COALESCE(SUM(CASE WHEN p.biomass > 0 AND t.total > 0 THEN -(p.biomass/t.total)*LN(p.biomass/t.total) END), 0)")} AS shannon_u
        FROM p JOIN tot t USING (y, x) GROUP BY p.y, p.x"""
    # config-compiled sharded precise plan must land on the identical
    # µ-unit raster as the direct plan
    sql["gf_job_shannon"] = sql["gf_shannon"]
    sql["gf_simpson"] = f"""
        {species_cte}, {tot_cte},
        s AS (SELECT p.y, p.x, COALESCE(SUM(CASE WHEN t.total > 0 THEN POW(p.biomass/t.total, 2) END), 0) sumsq
              FROM p JOIN tot t USING (y, x) GROUP BY p.y, p.x)
        SELECT y, x, {_sql_s6("CASE WHEN sumsq > 0 THEN 1.0/sumsq ELSE 1.0 END")} AS simpson_u FROM s"""
    sql["gf_evenness"] = f"""
        {species_cte}, {tot_cte},
        s AS (SELECT p.y, p.x,
                COALESCE(SUM(CASE WHEN p.biomass > 0 AND t.total > 0 THEN -(p.biomass/t.total)*LN(p.biomass/t.total) END), 0) shannon,
                COUNT(*) FILTER (p.biomass > 0) rich
              FROM p JOIN tot t USING (y, x) GROUP BY p.y, p.x)
        SELECT y, x, {_sql_s6("CASE WHEN rich > 1 THEN shannon/LN(rich) ELSE 0 END")} AS evenness_u FROM s"""
    sql["gf_total_biomass"] = (
        f"{species_cte} SELECT y, x, {_sql_s6('SUM(biomass)')} AS total_u FROM p GROUP BY y, x"
    )
    sql["gf_total_comparison"] = f"""
        {species_cte}, {tot_cte},
        st AS (SELECT y, x, biomass stored_total FROM read_parquet('{P}') WHERE species_code = '0000')
        SELECT t.y, t.x, {_sql_s6("ABS(st.stored_total - t.total)")} AS comparison_u
        FROM tot t JOIN st USING (y, x)"""
    sql["gf_dominant_species"] = f"""
        {species_cte},
        r AS (SELECT y, x, species_code, biomass,
                MAX(biomass) OVER (PARTITION BY y, x) mx,
                ROW_NUMBER() OVER (PARTITION BY y, x ORDER BY biomass DESC, species_code) rn
              FROM p),
        cat AS (SELECT species_code, ROW_NUMBER() OVER (ORDER BY species_code) - 1 ci
                FROM (SELECT DISTINCT species_code FROM read_parquet('{P}')))
        SELECT r.y, r.x, CASE WHEN r.mx > 0 THEN c.ci ELSE 0 END AS dom_idx
        FROM r JOIN cat c USING (species_code) WHERE r.rn = 1"""
    sql["gf_species_proportion"] = f"""
        {species_cte}, {tot_cte}
        SELECT t.y, t.x, {_sql_s6("CASE WHEN t.total > 0 THEN sp.biomass/t.total ELSE 0 END")} AS proportion_u
        FROM tot t JOIN p sp USING (y, x) WHERE sp.species_code = '0110'"""
    grp = "', '".join(fixtures.GROUP_CODES)
    sql["gf_group_proportion"] = f"""
        {species_cte}, {tot_cte},
        g AS (SELECT y, x, SUM(biomass) gb FROM p WHERE species_code IN ('{grp}') GROUP BY y, x)
        SELECT t.y, t.x, {_sql_s6("CASE WHEN t.total > 0 THEN g.gb/t.total ELSE 0 END")} AS group_u
        FROM tot t JOIN g USING (y, x)"""
    sql["gf_species_percentage"] = f"""
        {species_cte}, {tot_cte}
        SELECT t.y, t.x, {_sql_s6("CASE WHEN t.total > 0 THEN sp.biomass/t.total*100.0 ELSE 0 END")} AS percentage_u
        FROM tot t JOIN p sp USING (y, x) WHERE sp.species_code = '0110'"""
    sql["gf_biomass_threshold"] = f"""
        {species_cte} SELECT y, x, CAST(CASE WHEN SUM(biomass) > 50.0 THEN 1 ELSE 0 END AS BIGINT) AS above50
        FROM p GROUP BY y, x"""
    sql["gf_species_presence"] = f"""
        SELECT y, x, CAST(CASE WHEN biomass > 0.0 THEN 1 ELSE 0 END AS BIGINT) AS present
        FROM read_parquet('{P}') WHERE species_code = '0131'"""
    sql["gf_rare_species"] = f"""
        {species_cte},
        freq AS (SELECT species_code, COUNT(*) FILTER (biomass > 0) * 1.0 / COUNT(*) fr
                 FROM p GROUP BY species_code)
        SELECT p.y, p.x, COUNT(*) FILTER (p.biomass > 0 AND freq.fr < 0.05) AS n_rare
        FROM p JOIN freq USING (species_code) GROUP BY p.y, p.x"""
    sql["gf_common_species"] = f"""
        {species_cte},
        freq AS (SELECT species_code, COUNT(*) FILTER (biomass > 0) * 1.0 / COUNT(*) fr
                 FROM p GROUP BY species_code)
        SELECT p.y, p.x, COUNT(*) FILTER (p.biomass > 0 AND freq.fr >= 0.5) AS n_common
        FROM p JOIN freq USING (species_code) GROUP BY p.y, p.x"""
    sql["gf_species_dominance"] = f"""
        {species_cte},
        r AS (SELECT y, x, species_code,
                MAX(biomass) OVER (PARTITION BY y, x) mx,
                ROW_NUMBER() OVER (PARTITION BY y, x ORDER BY biomass DESC, species_code) rn
              FROM p),
        dom AS (SELECT species_code, COUNT(*) dp FROM r WHERE rn = 1 AND mx > 0 GROUP BY species_code),
        n AS (SELECT COUNT(*) total FROM (SELECT DISTINCT y, x FROM p))
        SELECT s.species_code, CAST(COALESCE(d.dp, 0) AS BIGINT) AS dominant_px,
               {_sql_s6("COALESCE(d.dp, 0) * 100.0 / n.total")} AS dominance_u
        FROM (SELECT DISTINCT species_code FROM p) s LEFT JOIN dom d USING (species_code), n"""
    sql["gf_occurrence_stats"] = f"""
        {species_cte}
        SELECT species_code, COUNT(*) FILTER (biomass > 0) AS present_px, COUNT(*) AS n_px,
               {_sql_s6("SUM(biomass)")} AS sum_biomass_u, {_sql_s6("MAX(biomass)")} AS max_biomass_u
        FROM p GROUP BY species_code"""
    # the CSV text roundtrip must land on the identical stats table
    sql["gf_csv_roundtrip"] = sql["gf_occurrence_stats"]
    sql["gf_json_roundtrip"] = sql["gf_occurrence_stats"]
    sql["gf_ipc_roundtrip"] = sql["gf_occurrence_stats"]
    sql["gf_coverage_topk"] = f"""
        {species_cte}
        SELECT species_code,
               {_sql_s6("COUNT(*) FILTER (biomass > 0) * 100.0 / COUNT(*)")} AS coverage_u
        FROM p GROUP BY species_code ORDER BY 2 DESC LIMIT 10"""
    # focal windows: the raster grid is DENSE (every (y, x) has a row in
    # ``tot`` by construction), so a separable rewrite — per-row window
    # over x, then per-column window over the row partials — is exactly
    # the 2-D box window (sum/count/min/max all decompose), and turns
    # DuckDB's O(n·w²) inequality IEJoin (~12 s on 262k px) into two
    # linear window passes (<0.5 s).
    sql["gf_focal_sum"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        rw AS (SELECT y, x,
                 SUM(v)   OVER w AS rs,
                 COUNT(*) OVER w AS rn
               FROM u
               WINDOW w AS (PARTITION BY y ORDER BY x
                            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(SUM(rs) OVER w AS BIGINT) AS sum_u,
               CAST(SUM(rn) OVER w AS BIGINT) AS n_nbrs
        FROM rw
        WINDOW w AS (PARTITION BY x ORDER BY y
                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"""
    sql["gf_focal_stats_5x5"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        rw AS (SELECT y, x,
                 SUM(v)   OVER w AS rs,
                 COUNT(*) OVER w AS rn,
                 MIN(v)   OVER w AS rmin,
                 MAX(v)   OVER w AS rmax
               FROM u
               WINDOW w AS (PARTITION BY y ORDER BY x
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING))
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(SUM(rs) OVER w AS BIGINT) AS sum_u,
               CAST(SUM(rn) OVER w AS BIGINT) AS n_nbrs,
               CAST(MIN(rmin) OVER w AS BIGINT) AS min_u,
               CAST(MAX(rmax) OVER w AS BIGINT) AS max_u
        FROM rw
        WINDOW w AS (PARTITION BY x ORDER BY y
                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)"""
    _vg_lags = ", ".join(f"({v})" for v in _VARIOGRAM_LAGS)
    sql["gf_semivariogram"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        lags(lag) AS (VALUES {_vg_lags}),
        pairs AS (
          SELECT 'e' AS direction, l.lag, (b.v - a.v) * (b.v - a.v) AS d2
          FROM u a CROSS JOIN lags l
          JOIN u b ON b.y = a.y AND b.x = a.x + l.lag
          UNION ALL
          SELECT 's', l.lag, (b.v - a.v) * (b.v - a.v)
          FROM u a CROSS JOIN lags l
          JOIN u b ON b.x = a.x AND b.y = a.y + l.lag)
        SELECT direction, CAST(lag AS BIGINT) AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(d2 // 4294967296) AS BIGINT) AS ss_hi,
               CAST(SUM(d2 % 4294967296) AS BIGINT) AS ss_lo
        FROM pairs GROUP BY 1, 2"""
    sql["gf_hist_equalize"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        mm AS (SELECT MIN(v) lo, MAX(v) hi, COUNT(*) n FROM u),
        b AS (SELECT u.y, u.x, ((u.v - mm.lo) * 256) // (mm.hi - mm.lo + 1) AS bin
              FROM u, mm),
        h AS (SELECT bin, COUNT(*) c FROM b GROUP BY bin),
        cdf AS (SELECT bin, SUM(c) OVER (ORDER BY bin) cum FROM h),
        cm AS (SELECT MIN(cum) cmin FROM cdf),
        lut AS (SELECT cdf.bin,
                  CAST(CASE WHEN mm.n = cm.cmin THEN 0
                       ELSE ((cdf.cum - cm.cmin) * 255) // (mm.n - cm.cmin)
                  END AS BIGINT) AS eq
                FROM cdf, cm, mm)
        SELECT CAST(b.y AS BIGINT) AS y, CAST(b.x AS BIGINT) AS x, lut.eq
        FROM b JOIN lut USING (bin)"""
    # histogram matching: the two epochs re-derived exactly as
    # make_yearly_stack(t=0 / t=1) writes them; dense ref CDF via a
    # scaffolded window; the transfer compares cross-multiplied CDFs in
    # HUGEINT (the engine uses Python ints — same exact arithmetic)
    sql["gf_hist_match"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        e0 AS (SELECT y, x, v + (x + y) % 7000 AS v FROM u),
        e1 AS (SELECT y, x, v + ((y*2654435761 + x*40503) % 1000000 - 500000)
                          + (31 + x + y) % 7000 AS v FROM u),
        mms AS (SELECT MIN(v) lo, MAX(v) hi, COUNT(*) n FROM e1),
        mmr AS (SELECT MIN(v) lo, MAX(v) hi, COUNT(*) n FROM e0),
        bs AS (SELECT e1.y, e1.x,
                      ((e1.v - mms.lo) * 256) // (mms.hi - mms.lo + 1) AS bin
               FROM e1, mms),
        br AS (SELECT ((e0.v - mmr.lo) * 256) // (mmr.hi - mmr.lo + 1) AS bin
               FROM e0, mmr),
        hs AS (SELECT bin, COUNT(*) c FROM bs GROUP BY bin),
        cs AS (SELECT bin, SUM(c) OVER (ORDER BY bin) cum FROM hs),
        hr AS (SELECT bin, COUNT(*) c FROM br GROUP BY bin),
        scaffold AS (SELECT unnest(range(256)) AS bin),
        crd AS (SELECT s.bin, SUM(COALESCE(hr.c, 0)) OVER (ORDER BY s.bin) cum
                FROM scaffold s LEFT JOIN hr USING (bin)),
        lut AS (SELECT cs.bin, MIN(crd.bin) AS m
                FROM cs, crd, mms, mmr
                WHERE CAST(crd.cum AS HUGEINT) * mms.n
                      >= CAST(cs.cum AS HUGEINT) * mmr.n
                GROUP BY cs.bin)
        SELECT CAST(bs.y AS BIGINT) AS y, CAST(bs.x AS BIGINT) AS x,
               CAST(lut.m AS BIGINT) AS m
        FROM bs JOIN lut USING (bin)"""
    sql["gf_focal_median"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        -- reverse-shift window: every source pixel CONTRIBUTES to its
        -- 9 shifted targets, then one group-by — no join at all
        -- (DuckDB planned the BETWEEN box join as an O(n·w²) IEJoin;
        -- out-of-grid / border targets never reach the count-9 gate)
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x, b.v AS v
               FROM u b CROSS JOIN offs o)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(quantile_disc(v, 0.5) AS BIGINT) AS med_u
        FROM nb GROUP BY y, x HAVING COUNT(*) = 9"""
    sql["gf_downsample_majority"] = f"""
        {species_cte},
        r AS (SELECT y, x, species_code,
                MAX(biomass) OVER (PARTITION BY y, x) mx,
                ROW_NUMBER() OVER (PARTITION BY y, x
                                   ORDER BY biomass DESC, species_code) rn
              FROM p),
        cat AS (SELECT species_code, ROW_NUMBER() OVER (ORDER BY species_code) - 1 ci
                FROM (SELECT DISTINCT species_code FROM read_parquet('{P}'))),
        u AS (SELECT r.y, r.x,
                CAST(CASE WHEN r.mx > 0 THEN c.ci ELSE 0 END AS BIGINT) v
              FROM r JOIN cat c USING (species_code) WHERE r.rn = 1),
        blk AS (SELECT y // 2 AS y2, x // 2 AS x2, v, COUNT(*) cnt
                FROM u GROUP BY 1, 2, 3),
        w AS (SELECT y2, x2, v,
                ROW_NUMBER() OVER (PARTITION BY y2, x2
                                   ORDER BY cnt DESC, v) rn
              FROM blk)
        SELECT CAST(y2 AS BIGINT) AS y, CAST(x2 AS BIGINT) AS x,
               CAST(v AS BIGINT) AS maj
        FROM w WHERE rn = 1"""
    sql["gf_focal_majority"] = f"""
        {species_cte},
        r AS (SELECT y, x, species_code,
                MAX(biomass) OVER (PARTITION BY y, x) mx,
                ROW_NUMBER() OVER (PARTITION BY y, x
                                   ORDER BY biomass DESC, species_code) rn
              FROM p),
        cat AS (SELECT species_code, ROW_NUMBER() OVER (ORDER BY species_code) - 1 ci
                FROM (SELECT DISTINCT species_code FROM read_parquet('{P}'))),
        u AS (SELECT r.y, r.x,
                CAST(CASE WHEN r.mx > 0 THEN c.ci ELSE 0 END AS BIGINT) v
              FROM r JOIN cat c USING (species_code) WHERE r.rn = 1),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        c2 AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x, b.v, COUNT(*) cnt
               FROM u b CROSS JOIN offs o
               GROUP BY 1, 2, 3),
        t AS (SELECT y, x, SUM(cnt) tot FROM c2 GROUP BY 1, 2),
        w AS (SELECT c2.y, c2.x, c2.v,
                ROW_NUMBER() OVER (PARTITION BY c2.y, c2.x
                                   ORDER BY c2.cnt DESC, c2.v) rn
              FROM c2 JOIN t USING (y, x) WHERE t.tot = 9)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(v AS BIGINT) AS maj
        FROM w WHERE rn = 1"""
    _lvl_u = int(np.floor(_CONTOUR_LEVEL * 1_000_000 + 0.5))
    sql["gf_contour_cells"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        c AS (SELECT tl.y, tl.x,
                8 * CAST(tl.v >= {_lvl_u} AS INT)
              + 4 * CAST(tr.v >= {_lvl_u} AS INT)
              + 2 * CAST(br.v >= {_lvl_u} AS INT)
              + 1 * CAST(bl.v >= {_lvl_u} AS INT) AS ms_case
              FROM u tl JOIN u tr ON tr.y = tl.y     AND tr.x = tl.x + 1
                        JOIN u bl ON bl.y = tl.y + 1 AND bl.x = tl.x
                        JOIN u br ON br.y = tl.y + 1 AND br.x = tl.x + 1)
        SELECT CAST(y AS BIGINT) y, CAST(x AS BIGINT) x,
               CAST(ms_case AS BIGINT) ms_case,
               CAST(CASE WHEN ms_case IN (5, 10) THEN 2 ELSE 1 END AS BIGINT) n_seg
        FROM c WHERE ms_case > 0 AND ms_case < 15"""
    sql["gf_focal_tpi"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                      SUM(b.v) AS sv, COUNT(*) AS c
               FROM u b CROSS JOIN offs o GROUP BY 1, 2)
        SELECT CAST(a.y AS BIGINT) AS y, CAST(a.x AS BIGINT) AS x,
               CAST(9 * a.v - nb.sv AS BIGINT) AS tpi9_u
        FROM u a JOIN nb USING (y, x) WHERE nb.c = 9"""
    from gridfia_ray.pipelines.calc import expr_to_sql, parse_expr

    _pct = lambda code: _sql_s6(  # noqa: E731
        f"CASE WHEN t.total > 0 THEN sp{code}.biomass/t.total*100.0 "
        f"ELSE 0 END"
    )
    _nd = expr_to_sql(parse_expr(_CALC_EXPR), {"a": "pa", "b": "pb"})
    sql["gf_raster_calc"] = f"""
        {species_cte}, {tot_cte},
        c AS (SELECT t.y, t.x, {_pct('0131')} AS pa, {_pct('0110')} AS pb
              FROM tot t
              JOIN p sp0131 ON sp0131.y = t.y AND sp0131.x = t.x
                           AND sp0131.species_code = '0131'
              JOIN p sp0110 ON sp0110.y = t.y AND sp0110.x = t.x
                           AND sp0110.species_code = '0110')
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST({_nd} AS BIGINT) AS nd_u
        FROM c"""
    sql["gf_glcm"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        lv AS (SELECT y, x, LEAST(v // 20000000, 15) AS l FROM u),
        pr AS (
          SELECT 'e' AS direction, a.l AS la, b.l AS lb
          FROM lv a JOIN lv b ON b.y = a.y AND b.x = a.x + 1
          UNION ALL
          SELECT 's' AS direction, a.l AS la, b.l AS lb
          FROM lv a JOIN lv b ON b.y = a.y + 1 AND b.x = a.x)
        SELECT direction, CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pr GROUP BY 1, 2, 3"""
    sql["gf_focal_curvature"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                      SUM(b.v * (CASE
                        WHEN abs(o.dy) + abs(o.dx) = 1 THEN 1
                        WHEN o.dy = 0 AND o.dx = 0 THEN -4
                        ELSE 0 END)) AS lap,
                      COUNT(*) AS c
               FROM u b CROSS JOIN offs o GROUP BY 1, 2)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(lap AS BIGINT) AS lap4_u
        FROM nb WHERE c = 9"""
    sql["gf_focal_aspect"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u0 AS (SELECT y, x, {_sql_s6('total')} AS val FROM tot),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        g0 AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                -CAST(SUM(b.val * o.dx * (2 - abs(o.dy))) AS BIGINT) AS u,
                CAST(SUM(b.val * o.dy * (2 - abs(o.dx))) AS BIGINT) AS v,
                COUNT(*) AS c
               FROM u0 b CROSS JOIN offs o GROUP BY 1, 2),
        g AS (SELECT y, x, u, v FROM g0 WHERE c = 9)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(CASE
                 WHEN u = 0 AND v = 0 THEN -1
                 WHEN u >= 0 AND v > 0 AND u < v THEN 0
                 WHEN u > 0 AND v > 0 AND u >= v THEN 1
                 WHEN u > 0 AND v <= 0 AND u > -v THEN 2
                 WHEN u > 0 AND v < 0 AND u <= -v THEN 3
                 WHEN u <= 0 AND v < 0 AND -u < -v THEN 4
                 WHEN u < 0 AND v < 0 AND -u >= -v THEN 5
                 WHEN (u < 0 AND v = 0) OR (u < 0 AND v > 0 AND -u > v) THEN 6
                 ELSE 7 END AS BIGINT) AS octant
        FROM g"""
    sql["gf_focal_gradient"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                      SUM(b.v * o.dx * (2 - abs(o.dy))) AS ddx,
                      SUM(b.v * o.dy * (2 - abs(o.dx))) AS ddy,
                      COUNT(*) AS c
               FROM u b CROSS JOIN offs o GROUP BY 1, 2)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(ddx AS BIGINT) AS ddx_u,
               CAST(ddy AS BIGINT) AS ddy_u
        FROM nb WHERE c = 9"""
    # local autocorrelation: every per-pixel building block is an exact
    # BIGINT/HUGEINT; the single float division mirrors the pipeline's
    # IEEE expression tree term for term (pipelines/local_stats.py),
    # so the µ-unit quantization is bit-deterministic on both sides
    sql["gf_local_moran"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        g AS (SELECT COUNT(*) AS n, SUM(v) AS s,
                     SUM(CAST(v AS HUGEINT) * v) AS ssq FROM u),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb0 AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                       SUM(b.v) AS sn, COUNT(*) AS c
                FROM u b CROSS JOIN offs o GROUP BY 1, 2),
        nb AS (SELECT a.y, a.x, a.v, nb0.sn, nb0.c
               FROM u a JOIN nb0 USING (y, x)),
        d AS (SELECT nb.y, nb.x,
                     g.n * nb.v - g.s AS dev,
                     g.n * nb.sn - nb.c * g.s AS nbrdev,
                     nb.c AS c,
                     g.n AS n,
                     CAST(g.n AS HUGEINT) * g.n * g.ssq
                       - CAST(g.n AS HUGEINT) * g.s * g.s AS ssd
              FROM nb, g)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               {_sql_s6("(CAST(dev AS DOUBLE) * CAST(nbrdev AS DOUBLE) * n)"
                        " / (CAST(c AS DOUBLE) * CAST(ssd AS DOUBLE))")} AS i_u,
               CAST(CASE WHEN dev > 0 AND nbrdev > 0 THEN 1
                         WHEN dev < 0 AND nbrdev > 0 THEN 2
                         WHEN dev < 0 AND nbrdev < 0 THEN 3
                         WHEN dev > 0 AND nbrdev < 0 THEN 4
                         ELSE 0 END AS BIGINT) AS quad
        FROM d"""
    sql["gf_getis_gstar"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        g AS (SELECT COUNT(*) AS n, SUM(v) AS s,
                     SUM(CAST(v AS HUGEINT) * v) AS ssq FROM u),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb0 AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                       SUM(b.v) AS sw, COUNT(*) AS w
                FROM u b CROSS JOIN offs o GROUP BY 1, 2),
        nb AS (SELECT a.y, a.x, nb0.sw, nb0.w
               FROM u a JOIN nb0 USING (y, x)),
        d AS (SELECT nb.y, nb.x,
                     g.n * nb.sw - nb.w * g.s AS num,
                     g.n * g.ssq - CAST(g.s AS HUGEINT) * g.s AS a,
                     g.n * nb.w - nb.w * nb.w AS bn,
                     g.n AS n
              FROM nb, g)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               {_sql_s6("CAST(num AS DOUBLE)"
                        " / (sqrt(CAST(a AS DOUBLE))"
                        " * sqrt(CAST(bn AS DOUBLE) / (n - 1)))")} AS gi_u
        FROM d"""
    # temporal trend: the SQL re-derives the synthetic 5-year stack
    # from the pixel table with the same integer closed forms, then the
    # same int64-exact OLS sums; the single float division mirrors the
    # pipeline's expression (pipelines/temporal.py)
    sql["gf_temporal_trend"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        t AS (SELECT unnest(range(5)) AS yr),
        stack AS (SELECT u.y, u.x, t.yr,
                  u.v + t.yr * ((u.y*2654435761 + u.x*40503) % 1000000
                                - 500000)
                      + (t.yr*31 + u.x + u.y) % 7000 AS w
                  FROM u CROSS JOIN t),
        agg AS (SELECT y, x, COUNT(*) AS k, SUM(yr) AS st,
                       SUM(yr*yr) AS st2, SUM(w) AS sv, SUM(yr*w) AS stv,
                       MAX(CASE WHEN yr = 4 THEN w END)
                         - MAX(CASE WHEN yr = 0 THEN w END) AS delta
                FROM stack GROUP BY y, x)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               {_sql_s6("CAST(k*stv - st*sv AS DOUBLE) / (k*st2 - st*st)")}
                 AS slope_u,
               CAST(delta AS BIGINT) AS delta
        FROM agg"""
    sql["gf_temporal_composite"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        t AS (SELECT unnest(range(5)) AS yr),
        stack AS (SELECT u.y, u.x, t.yr,
                  u.v + t.yr * ((u.y*2654435761 + u.x*40503) % 1000000
                                - 500000)
                      + (t.yr*31 + u.x + u.y) % 7000 AS w
                  FROM u CROSS JOIN t)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(quantile_disc(w, 0.5) AS BIGINT) AS med_u,
               CAST(MIN(w) AS BIGINT) AS min_u,
               CAST(MAX(w) AS BIGINT) AS max_u
        FROM stack GROUP BY y, x"""
    # proximity: distances are pure integers, so the oracle is the
    # brute-force min over the (small) feature set — no float anywhere
    sql["gf_distance_transform"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        feat AS (SELECT y, x FROM u WHERE v > {int(150.0 * 1_000_000)})
        SELECT CAST(u.y AS BIGINT) AS y, CAST(u.x AS BIGINT) AS x,
               CAST(MIN(ABS(u.y - feat.y) + ABS(u.x - feat.x)) AS BIGINT)
                 AS dist
        FROM u CROSS JOIN feat GROUP BY u.y, u.x"""
    sql["gf_distance_transform_l2"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        feat AS (SELECT y, x FROM u WHERE v > {int(150.0 * 1_000_000)})
        SELECT CAST(u.y AS BIGINT) AS y, CAST(u.x AS BIGINT) AS x,
               CAST(MIN((u.y - feat.y) * (u.y - feat.y)
                        + (u.x - feat.x) * (u.x - feat.x)) AS BIGINT)
                 AS dist2
        FROM u CROSS JOIN feat GROUP BY u.y, u.x"""
    # allocation: nearest-seed identity with the (d2, seed_y, seed_x)
    # lexicographic tie rule — ROW_NUMBER replays it exactly
    sql["gf_euclidean_allocation"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        feat AS (SELECT y, x FROM u WHERE v > {int(150.0 * 1_000_000)}),
        alloc AS (SELECT u.y, u.x, feat.y AS sy, feat.x AS sx,
                  (u.y - feat.y) * (u.y - feat.y)
                    + (u.x - feat.x) * (u.x - feat.x) AS d2,
                  ROW_NUMBER() OVER (PARTITION BY u.y, u.x
                    ORDER BY (u.y - feat.y) * (u.y - feat.y)
                             + (u.x - feat.x) * (u.x - feat.x),
                             feat.y, feat.x) AS rn
                  FROM u CROSS JOIN feat)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(sy AS BIGINT) AS seed_y, CAST(sx AS BIGINT) AS seed_x,
               CAST(d2 AS BIGINT) AS dist2
        FROM alloc WHERE rn = 1"""
    sql["gf_downsample_2x"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x)
        SELECT CAST(y // 2 AS BIGINT) AS y, CAST(x // 2 AS BIGINT) AS x,
               CAST(SUM({_sql_s6('total')}) AS BIGINT) AS sum_u
        FROM tot GROUP BY 1, 2"""
    # rot90cw coordinate remap: out[x, N-1-y] = in[y, x]
    _n_px = int(f["meta"]["grid"]) * int(f["meta"]["tile"])
    sql["gf_augment_rot90"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x)
        SELECT CAST(x AS BIGINT) AS y, CAST({_n_px - 1} - y AS BIGINT) AS x,
               {_sql_s6('total')} AS total_u
        FROM tot"""
    sql["gf_patchify"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        px AS (SELECT y // 16 AS pr, x // 16 AS pc,
                      {_sql_s6('total')} AS u FROM tot)
        SELECT CAST(pr AS BIGINT) AS patch_row, CAST(pc AS BIGINT) AS patch_col,
               COUNT(*) AS n_px, CAST(SUM(u) AS BIGINT) AS sum_u,
               MIN(u) AS min_u, MAX(u) AS max_u
        FROM px GROUP BY 1, 2"""
    # west half = tile_col < grid//2, derived from fixture meta so the
    # oracle tracks q_mosaic if the fixture grid/tile ever changes
    _west_px = (int(f["meta"]["grid"]) // 2) * int(t)
    sql["gf_mosaic"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(CASE WHEN x < {_west_px}
                    THEN FLOOR(2*total*1000000 + 0.5)
                    ELSE FLOOR(total*1000000 + 0.5) END AS BIGINT) AS sum_u
        FROM tot"""
    sql["gf_downsample_4x"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x)
        SELECT CAST(y // 4 AS BIGINT) AS y, CAST(x // 4 AS BIGINT) AS x,
               CAST(SUM({_sql_s6('total')}) AS BIGINT) AS sum_u
        FROM tot GROUP BY 1, 2"""
    sql["gf_zonal_percentiles"] = f"""
        {species_cte},
        j AS (SELECT z.zone_id, p.biomass
              FROM p JOIN read_parquet('{PZ}') z USING (y, x)
              WHERE p.biomass > 0)
        SELECT zone_id, CAST(q_pct AS BIGINT) AS q_pct,
               {_sql_s6('v')} AS value_u
        FROM (
          SELECT zone_id, 2 AS q_pct, quantile_disc(biomass, 0.02) AS v
          FROM j GROUP BY zone_id
          UNION ALL
          SELECT zone_id, 50 AS q_pct, quantile_disc(biomass, 0.50) AS v
          FROM j GROUP BY zone_id
          UNION ALL
          SELECT zone_id, 98 AS q_pct, quantile_disc(biomass, 0.98) AS v
          FROM j GROUP BY zone_id
        )"""
    sql["gf_zonal_stats"] = f"""
        {species_cte},
        j AS (SELECT z.zone_id, p.species_code, p.biomass
              FROM p JOIN read_parquet('{PZ}') z USING (y, x)),
        zs AS (SELECT zone_id, species_code, CAST(COUNT(*) FILTER (biomass > 0) AS DOUBLE) c,
                      SUM(biomass) sb, COUNT(*) npx
               FROM j GROUP BY zone_id, species_code),
        agg AS (SELECT zone_id,
                  MAX(npx) n_pixels, SUM(c) totc, SUM(sb) totb
                FROM zs GROUP BY zone_id),
        div AS (SELECT z.zone_id,
                  COALESCE(SUM(CASE WHEN z.c > 0 THEN -(z.c/a.totc)*LN(z.c/a.totc) END), 0) shannon,
                  1.0 - COALESCE(SUM(POW(z.c/a.totc, 2)), 0) simpson,
                  COUNT(*) FILTER (z.c = 1) f1, COUNT(*) FILTER (z.c = 2) f2,
                  COUNT(*) FILTER (z.c > 0) obs,
                  CAST(COUNT(*) FILTER (z.c >= 1 AND z.c <= 10) AS DOUBLE) n_rare,
                  CAST(COUNT(*) FILTER (z.c > 10) AS DOUBLE) n_abund,
                  COALESCE(SUM(z.c) FILTER (z.c >= 1 AND z.c <= 10), 0) nrt,
                  COALESCE(SUM(z.c * (z.c - 1)) FILTER (z.c >= 1 AND z.c <= 10), 0) srr
                FROM zs z JOIN agg a USING (zone_id) GROUP BY z.zone_id),
        est AS (SELECT zone_id, shannon, simpson, f1, f2, obs, n_rare, n_abund, nrt, srr,
                  CASE WHEN nrt > 0 THEN 1.0 - f1/nrt ELSE 1.0 END c_ace
                FROM div)
        SELECT a.zone_id, CAST(a.n_pixels AS BIGINT) n_pixels, CAST(e.obs AS BIGINT) richness,
           {_sql_s6("e.shannon")} shannon_u,
           {_sql_s6("e.simpson")} simpson_u,
           {_sql_s6("CASE WHEN e.obs > 1 THEN e.shannon/LN(e.obs) ELSE 0 END")} evenness_u,
           {_sql_s6("CASE WHEN e.f2 > 0 THEN e.obs + e.f1*e.f1/(2.0*e.f2) WHEN e.f1 > 0 THEN e.obs + e.f1*(e.f1-1.0)/2.0 ELSE e.obs END")} chao1_u,
           {_sql_s6("CASE WHEN e.n_rare = 0 THEN e.n_abund WHEN e.c_ace > 0 THEN e.n_abund + e.n_rare/e.c_ace + (e.f1/e.c_ace) * (CASE WHEN e.nrt*(e.nrt-1.0) > 0 THEN GREATEST(0.0, (e.n_rare/e.c_ace)*(e.srr/(e.nrt*(e.nrt-1.0))) - 1.0) ELSE 0.0 END) ELSE e.n_abund + e.n_rare END")} ace_u,
           {_sql_s6("a.totb")} total_biomass_u,
           {_sql_s6("a.totb / a.n_pixels")} mean_biomass_u
        FROM agg a JOIN est e USING (zone_id)"""
    sql["gf_zonal_species"] = f"""
        {species_cte}
        SELECT z.zone_id, p.species_code,
               COUNT(*) FILTER (p.biomass > 0) AS present_px,
               COUNT(*) AS n_px,
               {_sql_s6("SUM(p.biomass)")} AS sum_biomass_u
        FROM p JOIN read_parquet('{PZ}') z USING (y, x)
        GROUP BY z.zone_id, p.species_code"""
    sql["gf_quantile_classes"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot)
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(NTILE(5) OVER (ORDER BY v, y * {_n_px} + x) AS BIGINT)
                 AS class
        FROM u"""
    sql["gf_zonal_raster_stats"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        z AS (SELECT y, x, MIN(zone_id) AS zone_id
              FROM read_parquet('{PZ}') GROUP BY y, x)
        SELECT z.zone_id, COUNT(*) AS n_px, MIN(u.v) AS min_u,
               MAX(u.v) AS max_u, CAST(SUM(u.v) AS BIGINT) AS sum_u
        FROM u JOIN z USING (y, x)
        GROUP BY z.zone_id ORDER BY z.zone_id"""
    sql["gf_tabulate_area"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        cl AS (SELECT y, x,
               CAST(NTILE(5) OVER (ORDER BY v, y * {_n_px} + x) AS BIGINT)
                 AS class
               FROM u),
        z AS (SELECT y, x, MIN(zone_id) AS zone_id
              FROM read_parquet('{PZ}') GROUP BY y, x)
        SELECT z.zone_id, cl.class, CAST(COUNT(*) AS BIGINT) AS n_px
        FROM cl JOIN z USING (y, x)
        GROUP BY 1, 2"""
    sql["gf_zonal_geometry"] = f"""
        WITH z AS (SELECT y, x, MIN(zone_id) AS zone_id
                   FROM read_parquet('{PZ}') GROUP BY y, x),
        -- reverse-shift same-zone neighbor counts (the correlated
        -- OR'd subquery was a per-row scan, 13s on 262k px)
        offs(dy, dx) AS (VALUES (1,0),(-1,0),(0,1),(0,-1)),
        c AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x, b.zone_id,
                     COUNT(*) AS same
              FROM z b CROSS JOIN offs o GROUP BY 1, 2, 3),
        e AS (SELECT a.y, a.x, a.zone_id, COALESCE(c.same, 0) AS same
              FROM z a LEFT JOIN c USING (y, x, zone_id))
        SELECT zone_id, CAST(COUNT(*) AS BIGINT) AS n_px,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(4 - same) AS BIGINT) AS perim
        FROM e GROUP BY zone_id ORDER BY zone_id"""
    sql["gf_zone_neighbors"] = f"""
        WITH z AS (SELECT y, x, MIN(zone_id) AS zone_id
                   FROM read_parquet('{PZ}') GROUP BY y, x)
        -- two equality joins UNION ALL'd: the OR'd join condition
        -- forced a nested-loop plan (24s on 262k px)
        , e AS (
          SELECT a.zone_id AS za, b.zone_id AS zb
          FROM z a JOIN z b ON b.y = a.y + 1 AND b.x = a.x
          UNION ALL
          SELECT a.zone_id, b.zone_id
          FROM z a JOIN z b ON b.y = a.y AND b.x = a.x + 1)
        SELECT LEAST(za, zb) AS zone_a,
               GREATEST(za, zb) AS zone_b,
               CAST(COUNT(*) AS BIGINT) AS shared_edges
        FROM e WHERE za <> zb
        GROUP BY 1, 2"""
    sql["gf_cooccurrence"] = f"""
        {species_cte}
        SELECT a.species_code AS sa, b.species_code AS sb,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM p a JOIN p b
          ON a.y = b.y AND a.x = b.x AND a.species_code < b.species_code
        WHERE a.biomass > 0 AND b.biomass > 0
        GROUP BY 1, 2"""
    sql["gf_zonal_majority"] = f"""
        {species_cte},
        c AS (
          SELECT z.zone_id, p.species_code, COUNT(*) AS px
          FROM p JOIN read_parquet('{PZ}') z USING (y, x)
          WHERE p.biomass > 0
          GROUP BY z.zone_id, p.species_code),
        r AS (
          SELECT zone_id, species_code, px,
            ROW_NUMBER() OVER (PARTITION BY zone_id
                               ORDER BY px DESC, species_code) rhi,
            ROW_NUMBER() OVER (PARTITION BY zone_id
                               ORDER BY px ASC, species_code) rlo,
            COUNT(*) OVER (PARTITION BY zone_id) variety
          FROM c)
        SELECT hi.zone_id,
               hi.species_code AS majority_species, hi.px AS majority_px,
               lo.species_code AS minority_species, lo.px AS minority_px,
               hi.variety
        FROM r hi JOIN r lo USING (zone_id)
        WHERE hi.rhi = 1 AND lo.rlo = 1
        ORDER BY hi.zone_id"""
    sql["gf_zonal_histogram"] = f"""
        {species_cte}
        SELECT z.zone_id, {_sql_s6('p.biomass')} // 10000000 AS bin,
               COUNT(*) AS n_px
        FROM p JOIN read_parquet('{PZ}') z USING (y, x)
        WHERE p.biomass > 0
        GROUP BY z.zone_id, bin
        ORDER BY z.zone_id, bin"""
    sql["gf_rasterize"] = f"""
        SELECT CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               MIN(zone_id) AS zone_id
        FROM read_parquet('{PZ}') GROUP BY 1, 2"""
    sql["gf_bbox_extract"] = f"""
        SELECT y, x, {_sql_s6("biomass")} AS value_u
        FROM read_parquet('{P}')
        WHERE species_code = '0000'
          AND y >= {_BBOX_PX["y0"]} AND y < {_BBOX_PX["y1"]}
          AND x >= {_BBOX_PX["x0"]} AND x < {_BBOX_PX["x1"]}"""
    sql["gf_tile_zone_join"] = f"""
        WITH tz AS (SELECT DISTINCT zone_id, y // {t} tr, x // {t} tc FROM read_parquet('{PZ}')),
        sp AS (SELECT DISTINCT species_code FROM read_parquet('{P}'))
        SELECT tz.zone_id, printf('%s/%04d/%04d', sp.species_code, tz.tr, tz.tc) AS image_id
        FROM tz CROSS JOIN sp"""
    sql["gf_knn_idw"] = f"""
        WITH tiles AS (SELECT DISTINCT y // {t} tr, x // {t} tc FROM read_parquet('{P}')
                       WHERE species_code = '0000'),
        ctr AS (SELECT tr, tc, {x0} + (tc * {t} + {t}/2.0) * {px} cx,
                       {y0} + (tr * {t} + {t}/2.0) * ({nyp}) cy FROM tiles),
        d AS (SELECT c.tr, c.tc, p.value,
                SQRT(POW(p.x - c.cx, 2) + POW(p.y - c.cy, 2)) dist,
                ROW_NUMBER() OVER (PARTITION BY c.tr, c.tc
                                   ORDER BY POW(p.x - c.cx, 2) + POW(p.y - c.cy, 2), p.plot_id) rn
              FROM ctr c CROSS JOIN read_parquet('{f["plots"]}') p)
        SELECT tr AS tile_row, tc AS tile_col,
               {_sql_s6("SUM(value / POW(dist, 2)) / SUM(1.0 / POW(dist, 2))")} AS knn_u
        FROM d WHERE rn <= 4 GROUP BY tr, tc"""
    sql["gf_tile_dedup_exact"] = f"SELECT DISTINCT image_id FROM read_parquet('{TD}')"
    sql["gf_tile_near_dup"] = f"""
        WITH u AS (SELECT image_id, MIN(phash) phash FROM read_parquet('{TD}') GROUP BY image_id)
        SELECT a.image_id a, b.image_id b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) hamming
        FROM u a JOIN u b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 6"""
    sql["gf_morans_i"] = f"""
        WITH tm AS (SELECT y // {t} tr, x // {t} tc, AVG(biomass) v
                    FROM read_parquet('{P}') WHERE species_code = '0000' GROUP BY 1, 2),
        st AS (SELECT AVG(v) m, COUNT(*) n FROM tm),
        pr AS (SELECT (a.v - st.m) * (b.v - st.m) cr
               FROM tm a JOIN tm b
                 ON abs(a.tr - b.tr) <= 1 AND abs(a.tc - b.tc) <= 1
                AND NOT (a.tr = b.tr AND a.tc = b.tc), st),
        sq AS (SELECT SUM(POW(v - st.m, 2)) s FROM tm, st)
        SELECT {_sql_s6("(st.n * 1.0 / (SELECT COUNT(*) FROM pr)) * ((SELECT SUM(cr) FROM pr) / sq.s)")} AS morans_i_u,
               CAST(st.n AS BIGINT) AS n_tiles,
               CAST((SELECT COUNT(*) FROM pr) AS BIGINT) AS w_pairs
        FROM st, sq"""
    sql["gf_geary_c"] = f"""
        WITH tm AS (SELECT y // {t} tr, x // {t} tc, AVG(biomass) v
                    FROM read_parquet('{P}') WHERE species_code = '0000' GROUP BY 1, 2),
        st AS (SELECT AVG(v) m, COUNT(*) n FROM tm),
        pr AS (SELECT POW(a.v - b.v, 2) d2
               FROM tm a JOIN tm b
                 ON abs(a.tr - b.tr) <= 1 AND abs(a.tc - b.tc) <= 1
                AND NOT (a.tr = b.tr AND a.tc = b.tc)),
        sq AS (SELECT SUM(POW(v - st.m, 2)) s FROM tm, st)
        SELECT {_sql_s6("((st.n - 1.0) / (2.0 * (SELECT COUNT(*) FROM pr))) * ((SELECT SUM(d2) FROM pr) / sq.s)")} AS geary_c_u,
               CAST(st.n AS BIGINT) AS n_tiles,
               CAST((SELECT COUNT(*) FROM pr) AS BIGINT) AS w_pairs
        FROM st, sq"""
    sql["gf_percentiles_exact"] = f"""
        WITH v AS (SELECT biomass FROM read_parquet('{P}')
                   WHERE species_code <> '0000' AND biomass <> 0),
        qd AS (SELECT quantile_disc(biomass, [0.02, 0.50, 0.98]) ql FROM v)
        SELECT CAST([2, 50, 98][i] AS BIGINT) AS q_pct,
               {_sql_s6('ql[i]')} AS value_u
        FROM qd, (SELECT unnest(generate_series(1, 3)) i)"""
    # pinned-parquet oracles (fixture-gen-time single-process brute
    # force, fixtures._write_warp_expected / _write_percentiles_expected):
    # transcendental reprojection and the deterministic histogram sketch
    # aren't SQL-expressible, but their expected outputs are pinned
    # tables — full rows+schema+hash checks instead of no_oracle
    sql["gf_warp_mercator"] = (
        f"SELECT * FROM read_parquet('{f['warp_expected']}')"
    )
    sql["gf_percentiles"] = (
        f"SELECT * FROM read_parquet('{f['percentiles_expected']}')"
    )
    sql["gf_tile_catalog"] = (
        f"SELECT split_part(image_id, '/', 1) AS species_code, COUNT(*) AS n_tiles "
        f"FROM read_parquet('{T}/*.parquet') GROUP BY 1"
    )
    sql["gf_tile_features"] = f"""
        WITH p AS (SELECT species_code, y // {t} tr, x // {t} tc, biomass
                   FROM read_parquet('{P}'))
        SELECT species_code || '/' || lpad(CAST(tr AS VARCHAR), 4, '0')
                 || '/' || lpad(CAST(tc AS VARCHAR), 4, '0') AS image_id,
               {_sql_s6('AVG(biomass)')} AS mean_u,
               {_sql_s6('MIN(biomass)')} AS min_u,
               {_sql_s6('MAX(biomass)')} AS max_u,
               CAST(COUNT(*) FILTER (biomass <> 0) AS BIGINT) AS n_nonzero
        FROM p GROUP BY 1"""
    sql["gf_normalize_clip"] = f"""
        {species_cte},
        v AS (SELECT biomass FROM p WHERE biomass <> 0),
        qd AS (SELECT quantile_disc(biomass, [0.02, 0.98]) ql FROM v),
        tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x)
        SELECT t.y, t.x,
               {_sql_s6("(LEAST(GREATEST(t.total, qd.ql[1]), qd.ql[2]) - qd.ql[1]) / (qd.ql[2] - qd.ql[1])")} AS norm_u
        FROM tot t, qd"""
    _n_px = f["meta"]["grid"] * f["meta"]["tile"]
    _probe = ", ".join(
        str(int(v)) for v in np.linspace(3, _n_px - 4, 5).astype(np.int64)
    )
    sql["gf_identify"] = f"""
        SELECT species_code, CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               {_sql_s6('biomass')} AS value_u
        FROM read_parquet('{P}')
        WHERE species_code IN ('0000', '0131')
          AND y IN ({_probe}) AND x IN ({_probe})"""
    sql["gf_tile_resize"] = f"""
        WITH p AS (SELECT species_code, y // {t} tr, x // {t} tc,
                          (y % {t}) // {t // 8} sy, (x % {t}) // {t // 8} sx,
                          biomass
                   FROM read_parquet('{P}'))
        SELECT species_code || '/' || lpad(CAST(tr AS VARCHAR), 4, '0')
                 || '/' || lpad(CAST(tc AS VARCHAR), 4, '0') AS image_id,
               CAST(sy AS BIGINT) AS sy, CAST(sx AS BIGINT) AS sx,
               {_sql_s6('CAST(CAST(AVG(biomass) AS REAL) AS DOUBLE)')} AS value_u
        FROM p GROUP BY species_code, tr, tc, sy, sx"""
    # all four raster sinks store the same float32 plane; the s6 sums are
    # exact ints (f64 species sum is exact, f64→f32 cast matches DuckDB's
    # DOUBLE→REAL round-to-nearest-even)
    sql["gf_raster_roundtrip"] = f"""
        WITH p AS (SELECT y, x, biomass FROM read_parquet('{P}')
                   WHERE species_code <> '0000'),
        tot AS (SELECT y, x, CAST(CAST(SUM(biomass) AS REAL) AS DOUBLE) t
                FROM p GROUP BY y, x),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) n_px,
                     CAST(SUM({_sql_s6('t')}) AS BIGINT) sum_u FROM tot)
        SELECT f.fmt, s.n_px, s.sum_u
        FROM s, (VALUES ('geotiff'), ('netcdf'), ('raw'), ('zarr')) f(fmt)
        ORDER BY f.fmt"""
    # ingest roundtrip: per-species tile counts and exact s6 pixel sums
    # recomputed from the independent pixel table
    sql["gf_ingest_cube"] = f"""
        SELECT species_code,
               CAST(COUNT(*) / ({t} * {t}) AS BIGINT) AS n_tiles,
               CAST(SUM({_sql_s6('biomass')}) AS BIGINT) AS sum_u
        FROM read_parquet('{P}')
        GROUP BY species_code ORDER BY species_code"""
    # append lifecycle lands on the identical full-store invariant
    sql["gf_store_append"] = sql["gf_ingest_cube"]
    # compaction (monolithic → aligned per-species) preserves content
    sql["gf_store_compact"] = sql["gf_ingest_cube"]
    # lossy-codec roundtrip: pinned sequential decode replay (see
    # fixtures.ensure_jpeg_fixture docstring for the exactness argument)
    sql["gf_jpeg_decode"] = (
        f"SELECT * FROM read_parquet('{fixtures.ensure_jpeg_fixture()['expected']}') "
        "WHERE image_id LIKE '0000/%' OR image_id LIKE '0131/%' "
        "ORDER BY image_id"
    )
    sql["gf_webp_decode"] = (
        f"SELECT * FROM read_parquet('{fixtures.ensure_webp_fixture()['expected']}') "
        f"ORDER BY image_id"
    )
    # pinned sequential-replay oracles for the seed-deterministic
    # hash/heuristic ops (see gridfia_ray/oracle_pins.py for the
    # exactness argument per family). Generation is EAGER here on
    # purpose: the paths are deterministic, but composing them without
    # building would break any consumer that runs an oracle before its
    # paired query — the ensure_* calls are a cached-path read after the
    # first (one-time, ~25 s) build
    from gridfia_ray import oracle_pins as _pins

    _dp, _ap = _pins.ensure_docpin(), _pins.ensure_annpin()
    sql["doc_minhash_pinned"] = (
        f"SELECT * FROM read_parquet('{_dp['minhash_expected']}') ORDER BY a, b"
    )
    _bp = _pins.ensure_bpepin()
    sql["bpe_train_pinned"] = (
        f"SELECT * FROM read_parquet('{_bp['merges_expected']}') ORDER BY rank"
    )
    sql["bpe_tokenize_pinned"] = (
        f"SELECT * FROM read_parquet('{_bp['counts_expected']}') ORDER BY doc_id"
    )
    _cdcp = _pins.ensure_cdcpin()
    sql["doc_cdc_pinned"] = (
        f"SELECT * FROM read_parquet('{_cdcp['cdc_expected']}') "
        f"ORDER BY doc_id, chunk_id"
    )
    sql["doc_cdc_dedup_pinned"] = f"""
        SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM read_parquet('{_cdcp['cdc_expected']}')
        GROUP BY chunk_hash HAVING COUNT(*) > 1
        ORDER BY chunk_hash"""
    sql["doc_cdc_dedup_docs"] = f"""
        WITH ch AS (SELECT * FROM read_parquet('{_cdcp['cdc_expected']}')),
        docs AS (SELECT * FROM read_parquet('{_cdcp['documents']}')),
        w AS (SELECT chunk_hash, MIN(doc_id * 2097152 + chunk_id) mk
              FROM ch GROUP BY 1),
        k AS (SELECT ch.* FROM ch JOIN w USING (chunk_hash)
              WHERE ch.doc_id * 2097152 + ch.chunk_id = w.mk),
        tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_total
                FROM ch GROUP BY 1),
        re AS (SELECT k.doc_id,
                      string_agg(substr(d.text, CAST(k."start" AS INT) + 1,
                                        CAST(k."length" AS INT)),
                                 '' ORDER BY k.chunk_id) t,
                      CAST(COUNT(*) AS BIGINT) n_kept
               FROM k JOIN docs d USING (doc_id) GROUP BY 1)
        SELECT re.doc_id, md5(COALESCE(re.t, '')) h, re.n_kept,
               tot.n_total - re.n_kept AS n_dropped
        FROM re JOIN tot USING (doc_id)"""
    _pcap = _pins.ensure_pcapin()
    sql["emb_pca_pinned"] = (
        f"SELECT * FROM read_parquet('{_pcap['pca_expected']}') "
        f"ORDER BY vec_id, pc_idx"
    )
    # the oracle COMPUTES here: ICU nfc_normalize vs our unicodedata
    _np_ = _pins.ensure_normpin()
    sql["doc_normalize_pinned"] = f"""
        SELECT doc_id,
               CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars,
               md5(nfc_normalize(text)) AS h
        FROM read_parquet('{_np_['documents']}')
        ORDER BY doc_id"""
    sql["doc_simhash_pinned"] = (
        f"SELECT * FROM read_parquet('{_dp['simhash_expected']}') ORDER BY a, b"
    )
    sql["doc_hll_pinned"] = f"SELECT * FROM read_parquet('{_dp['hll_expected']}')"
    sql["ghll_pinned"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_ghllpin()['expected']}') "
        f"ORDER BY day"
    )
    sql["ddq_pinned"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_ddqpin()['expected']}') "
        f"ORDER BY grp"
    )
    sql["gf_hillshade"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_hspin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_connected_components"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_cclpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_flow_accumulation"] = (
        f"SELECT y, x, dir, acc "
        f"FROM read_parquet('{_pins.ensure_flowpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_change_patches"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_changepin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_watershed"] = (
        f"SELECT y, x, basin "
        f"FROM read_parquet('{_pins.ensure_flowpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_strahler"] = (
        f"SELECT y, x, strahler "
        f"FROM read_parquet('{_pins.ensure_flowpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["events_anomaly"] = """
        WITH e AS (SELECT event_type, ts, event_id,
               CAST(FLOOR(value*1000 + 0.5) AS BIGINT) AS v
               FROM events),
        w AS (SELECT event_type, event_id, v,
              CAST(COALESCE(SUM(v) OVER win, 0) AS BIGINT) AS s,
              CAST(COALESCE(SUM(v*v) OVER win, 0) AS BIGINT) AS q,
              CAST(COUNT(v) OVER win AS BIGINT) AS n
              FROM e
              WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        SELECT event_type, event_id, v AS v_milli, n AS n_window,
          CAST(CASE WHEN n >= 2
                     AND (n*v - s)*(n*v - s) > 9*(n*q - s*s)
               THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM w"""
    sql["gf_cost_distance"] = (
        f"SELECT y, x, cdist "
        f"FROM read_parquet('{_pins.ensure_costpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_cost_backlink"] = (
        f"SELECT y, x, backlink "
        f"FROM read_parquet('{_pins.ensure_costpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_cost_allocation"] = (
        f"SELECT y, x, alloc "
        f"FROM read_parquet('{_pins.ensure_allocpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_cost_distance_src"] = (
        f"SELECT y, x, cdist "
        f"FROM read_parquet('{_pins.ensure_costsrcpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_fill_sinks"] = (
        f"SELECT y, x, fill_u, depth_u "
        f"FROM read_parquet('{_pins.ensure_fillpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_flow_filled"] = (
        f"SELECT y, x, dir, acc "
        f"FROM read_parquet('{_pins.ensure_flowfillpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["audio_resample"] = (
        f"SELECT clip_id, n_samples, rate, duration_ms, rms_u, peak_u, "
        f"zero_crossings "
        f"FROM read_parquet('{_pins.ensure_audpin()['resample_expected']}') "
        f"ORDER BY clip_id"
    )
    sql["gf_unsharp"] = f"""
        {species_cte},
        tot AS (SELECT y, x, SUM(biomass) AS total FROM p GROUP BY y, x),
        u AS (SELECT y, x, {_sql_s6('total')} AS v FROM tot),
        offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)),
        nb AS (SELECT b.y - o.dy AS y, b.x - o.dx AS x,
                      SUM(b.v) AS sv, COUNT(*) AS c
               FROM u b CROSS JOIN offs o GROUP BY 1, 2)
        SELECT CAST(a.y AS BIGINT) AS y, CAST(a.x AS BIGINT) AS x,
               CAST(a.v + CAST(FLOOR(
                   CAST(3 * (nb.c * a.v - nb.sv) AS DOUBLE)
                   / (2 * nb.c)) AS BIGINT) AS BIGINT) AS sharp_u
        FROM u a JOIN nb USING (y, x)"""
    sql["gf_clahe"] = (
        f"SELECT y, x, level "
        f"FROM read_parquet('{_pins.ensure_clahepin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_flow_length"] = (
        f"SELECT y, x, flen_u "
        f"FROM read_parquet('{_pins.ensure_flowlenpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_dinf_accumulation"] = (
        f"SELECT y, x, angle_u, acc_fp "
        f"FROM read_parquet('{_pins.ensure_dinfpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_twi"] = (
        f"SELECT y, x, twi_u, spi_u "
        f"FROM read_parquet('{_pins.ensure_flowfillpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["gf_viewshed"] = (
        f"SELECT y, x, n_vis "
        f"FROM read_parquet('{_pins.ensure_viewpin()['expected']}') "
        f"ORDER BY y, x"
    )
    sql["emb_kcenter"] = (
        f"SELECT rank, vec_id, radius2_u "
        f"FROM read_parquet('{_pins.ensure_divpin()['expected']}') "
        f"ORDER BY rank"
    )
    sql["gf_kriging"] = (
        f"SELECT point_id, pred_u, var_u, k_used "
        f"FROM read_parquet('{_pins.ensure_krigpin()['expected']}') "
        f"ORDER BY point_id"
    )
    sql["gf_cost_paths"] = (
        f"SELECT dest_id, step, y, x "
        f"FROM read_parquet('{_pins.ensure_allocpin()['paths']}') "
        f"ORDER BY dest_id, step"
    )
    sql["gf_sieve"] = (
        f"SELECT y, x, component "
        f"FROM read_parquet('{_pins.ensure_cclpin()['expected']}') "
        f"WHERE component IN (SELECT component "
        f"  FROM read_parquet('{_pins.ensure_cclpin()['expected']}') "
        f"  GROUP BY component HAVING COUNT(*) >= 2) "
        f"ORDER BY y, x"
    )
    sql["gf_component_sizes"] = (
        f"SELECT component, COUNT(*) AS n_pixels "
        f"FROM read_parquet('{_pins.ensure_cclpin()['expected']}') "
        f"GROUP BY component ORDER BY component"
    )
    sql["gf_component_props"] = (
        f"SELECT component, COUNT(*) AS n_pixels, "
        f"MIN(y) AS min_y, MAX(y) AS max_y, "
        f"MIN(x) AS min_x, MAX(x) AS max_x, "
        f"CAST(SUM(y) AS BIGINT) AS sum_y, CAST(SUM(x) AS BIGINT) AS sum_x "
        f"FROM read_parquet('{_pins.ensure_cclpin()['expected']}') "
        f"GROUP BY component ORDER BY component"
    )
    sql["gf_warp_bilinear"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_warpblpin()['expected']}') "
        f"ORDER BY tile_row, tile_col"
    )
    sql["ann_lsh_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['lsh_expected']}') ORDER BY query_id, rank"
    )
    sql["emb_near_dup_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['neardup_expected']}') ORDER BY a, b"
    )
    sql["ann_ivf_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['ivf_expected']}') ORDER BY query_id, rank"
    )
    sql["emb_semantic_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['semantic_expected']}') ORDER BY vec_id"
    )
    sql["ann_pq_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['pq_expected']}') ORDER BY query_id, rank"
    )
    sql["ann_ivfpq_pinned"] = (
        f"SELECT * FROM read_parquet('{_ap['ivfpq_expected']}') "
        f"ORDER BY query_id, rank"
    )
    from gridfia_ray.pipelines.sampling import rate_threshold_hex as _rth

    _mix_cases = " ".join(
        f"WHEN '{k}' THEN '{_rth(v)}'" for k, v in _MIX_RATES.items()
    )
    sql["doc_mix"] = f"""
        SELECT doc_id, source FROM documents
        WHERE substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
              < CASE source {_mix_cases} ELSE '{_rth(_MIX_DEFAULT)}' END
        ORDER BY doc_id"""
    # exact per-stratum allocation: (n+9)//10 is the integer ceil both
    # sides compute — never float CEIL(0.1*n)
    sql["doc_stratified"] = """
        WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) n
                   FROM documents GROUP BY 1),
        r AS (SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR))
                     ) rn
              FROM documents)
        SELECT r.doc_id, r.source FROM r JOIN c USING (source)
        WHERE rn <= (n + 9) // 10 ORDER BY doc_id"""
    # EXTERNAL oracle: EPSG Guidance Note 7-2's own worked-example
    # numbers as literals (TM: OSGB 50°30'N 0°30'E; LCC-2SP: NAD27 Texas
    # South Central 28°30'N 96°W in ftUS; HOM-B: Timbalai/RSO Borneo)
    sql["gf_stateplane_vectors"] = """
        SELECT * FROM (VALUES
          ('hom_borneo',
           CAST(FLOOR(679245.73*10 + 0.5) AS BIGINT),
           CAST(FLOOR(596562.78*10 + 0.5) AS BIGINT),
           CAST(FLOOR((115 + 48/60.0 + 19.8196/3600.0)*1000000 + 0.5) AS BIGINT),
           CAST(FLOOR((5 + 23/60.0 + 14.1129/3600.0)*1000000 + 0.5) AS BIGINT)),
          ('lcc_texas',
           CAST(FLOOR(2963503.91*10 + 0.5) AS BIGINT),
           CAST(FLOOR(254759.80*10 + 0.5) AS BIGINT),
           CAST(FLOOR(-96.0*1000000 + 0.5) AS BIGINT),
           CAST(FLOOR(28.5*1000000 + 0.5) AS BIGINT)),
          ('tm_osgb',
           CAST(FLOOR(577274.99*10 + 0.5) AS BIGINT),
           CAST(FLOOR(69740.50*10 + 0.5) AS BIGINT),
           CAST(FLOOR(0.5*1000000 + 0.5) AS BIGINT),
           CAST(FLOOR(50.5*1000000 + 0.5) AS BIGINT))
        ) t(anchor, x_dm, y_dm, lon_u, lat_u) ORDER BY anchor"""
    sql["events_resampling"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_statpin()['expected']}')"
    )
    sql["gf_s2_aggregate"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_s2pin()['expected']}') "
        f"ORDER BY s2_cell"
    )
    sql["audio_features"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_audpin()['features_expected']}') "
        f"ORDER BY clip_id"
    )
    sql["audio_spectrogram"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_audpin()['spectrogram_expected']}') "
        f"ORDER BY clip_id"
    )
    sql["video_frames"] = (
        f"SELECT * FROM read_parquet('{_pins.ensure_vidpin()['frames_expected']}') "
        f"ORDER BY clip_id, frame_idx"
    )
    # PII redaction: the identical RE2 patterns in the identical order,
    # counts taken per stage on the partially-redacted text (matching
    # redact_pii's sequential application)
    from gridfia_ray.text.ops import PII_PATTERNS as _pii

    sql["doc_redact"] = (
        "WITH s0 AS (SELECT doc_id, text AS t FROM read_parquet('"
        + _dp["pii_documents"]
        + "')),\n"
        "s1 AS (SELECT doc_id, len(regexp_extract_all(t, '" + _pii[0][0] + "')) n1,"
        " regexp_replace(t, '" + _pii[0][0] + "', '" + _pii[0][1] + "', 'g') t FROM s0),\n"
        "s2 AS (SELECT doc_id, n1, len(regexp_extract_all(t, '" + _pii[1][0] + "')) n2,"
        " regexp_replace(t, '" + _pii[1][0] + "', '" + _pii[1][1] + "', 'g') t FROM s1),\n"
        "s3 AS (SELECT doc_id, n1, n2, len(regexp_extract_all(t, '" + _pii[2][0] + "')) n3,"
        " regexp_replace(t, '" + _pii[2][0] + "', '" + _pii[2][1] + "', 'g') t FROM s2)\n"
        "SELECT doc_id, t AS text_redacted,"
        " CAST(n1 + n2 + n3 AS BIGINT) AS n_redactions FROM s3 ORDER BY doc_id"
    )
