"""Exact DuckDB mirrors for the TRAINED-IVF family (round-4:
ann_ivf_trained and embedding_neardup_stats were the last rows-only
embedding queries).

``_centroid_ctes`` replays the full training chain:
smallest-md5(vec_id) sample (embeddings._sample_vec_ids) -> greedy
farthest-point init -> 5 sample cosine-Lloyd rounds (9-dp rounded, the
_coarse_centroids discipline) -> 8 full-data cosine rounds with 6-dp
rounded assignment and 9-dp rounded renormalized-sum updates
(ann.ivf_train_centroids). Per-round rounding is exactly why the SQL
matches bit-for-bit: a 1e-15 cross-engine sum-order drift cannot move
a value across a 1e-9 rounding boundary except with negligible (and
fixture-fixed) probability, the same argument the exact kmeans oracle
already rests on.
"""

from __future__ import annotations

def _centroid_ctes(n_lists: int = 16, s_rounds: int = 5,
                   f_rounds: int = 8, sample_rows: int = 2000):
    """CTE chain ending in cent_f{f_rounds}(c, i, v): the trained IVF
    centroids. Mirrors embeddings._coarse_centroids + ann.ivf_train_centroids."""
    parts = [f"""
ev AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE embedding IS NOT NULL),
-- sample selection ranks over ALL vec_ids (null embeddings included)
-- because the impl's _sample_vec_ids scans ONLY the 8-byte id column
-- (the 100-TB-cheap path) and _coarse_centroids drops nulls AFTER the
-- bottom-{sample_rows} cut; a dirty table therefore trains on fewer
-- than {sample_rows} usable rows, and this mirror must do the same
-- (round-4 advice, medium).
smpsel AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                            vec_id) - 1 AS ridx
  FROM embeddings),
smp AS MATERIALIZED (
  SELECT e.vec_id, e.emb,
         row_number() OVER (ORDER BY md5(CAST(e.vec_id AS VARCHAR)),
                            e.vec_id) - 1 AS sidx
  FROM ev e JOIN smpsel s ON s.vec_id = e.vec_id
  WHERE s.ridx < {sample_rows}),
sx AS MATERIALIZED (
  SELECT sidx, unnest(range(len(emb))) AS i, unnest(emb) AS x
  FROM smp WHERE sidx < {sample_rows}),
snrm AS (SELECT sidx, greatest(sqrt(sum(x * x)), 1e-12) AS nr
         FROM sx GROUP BY sidx),
sxn AS MATERIALIZED (
  SELECT s.sidx, s.i, round(s.x / n.nr, 9) AS x
  FROM sx s JOIN snrm n ON n.sidx = s.sidx)"""]
    # kcenter greedy init: chosen0 = sidx 0; best(sidx) = round(dot with chosen,9)
    parts.append("""
ch0 AS MATERIALIZED (SELECT 0::BIGINT AS sidx),
b0 AS MATERIALIZED (
  SELECT a.sidx, round(sum(a.x * b.x), 9) AS best
  FROM sxn a JOIN sxn b ON b.i = a.i AND b.sidx = 0
  GROUP BY a.sidx)""")
    for t in range(1, n_lists):
        parts.append(f"""
ch{t} AS MATERIALIZED (
  -- the impl runs min(n_lists, n) picks: no pick when the sample has
  -- <= t points (1-row boundary — without this guard the unrolled
  -- stages re-pick the same point into 16 duplicate centroids)
  SELECT sidx FROM b{t-1}
  WHERE (SELECT count(*) FROM snrm) > {t}
  ORDER BY best, sidx LIMIT 1),
b{t} AS MATERIALIZED (
  SELECT a.sidx, greatest(p.best, round(sum(a.x * b.x), 9)) AS best
  FROM sxn a
  JOIN sxn b ON b.i = a.i AND b.sidx = (SELECT sidx FROM ch{t})
  JOIN b{t-1} p ON p.sidx = a.sidx
  GROUP BY a.sidx, p.best)""")
    chosen_union = " UNION ALL ".join(
        f"SELECT {t} AS c, sidx FROM ch{t}" for t in range(n_lists))
    parts.append(f"""
cent_s0 AS MATERIALIZED (
  SELECT ch.c, s.i, s.x AS v
  FROM ({chosen_union}) ch JOIN sxn s ON s.sidx = ch.sidx)""")
    # 5 sample-Lloyd rounds on sxn (cosine argmax round9, mean->renorm->round9)
    prev = "cent_s0"
    for r in range(1, s_rounds + 1):
        parts.append(f"""
sa{r} AS MATERIALIZED (
  SELECT sidx, c FROM (
    SELECT a.sidx, m.c,
           row_number() OVER (PARTITION BY a.sidx
             ORDER BY round(sum(a.x * m.v), 9) DESC, m.c) AS rn
    FROM sxn a JOIN {prev} m ON m.i = a.i
    GROUP BY a.sidx, m.c) WHERE rn = 1),
sm{r} AS MATERIALIZED (
  SELECT g.c, s.i, sum(s.x) / max(g.n) AS mv
  FROM (SELECT c, count(*) AS n FROM sa{r} GROUP BY c) g
  JOIN sa{r} a ON a.c = g.c
  JOIN sxn s ON s.sidx = a.sidx
  GROUP BY g.c, s.i),
smn{r} AS (SELECT c, greatest(sqrt(sum(mv * mv)), 1e-12) AS nr
           FROM sm{r} GROUP BY c),
cent_s{r} AS MATERIALIZED (
  SELECT p.c, p.i,
         round(COALESCE(m.mv / n.nr, p.v), 9) AS v
  FROM {prev} p
  LEFT JOIN sm{r} m ON m.c = p.c AND m.i = p.i
  LEFT JOIN smn{r} n ON n.c = p.c)""")
        prev = f"cent_s{r}"
    # full-data normalized vectors (UNROUNDED)
    parts.append("""
fx AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(emb))) AS i, unnest(emb) AS x
  FROM ev),
fnrm AS (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nr
         FROM fx GROUP BY vec_id),
fxn AS MATERIALIZED (
  SELECT f.vec_id, f.i, f.x / n.nr AS x
  FROM fx f JOIN fnrm n ON n.vec_id = f.vec_id)""")
    parts.append(f"cent_f0 AS MATERIALIZED (SELECT * FROM {prev})")
    prev = "cent_f0"
    for r in range(1, f_rounds + 1):
        parts.append(f"""
fa{r} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT a.vec_id, m.c,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(sum(a.x * m.v), 6) DESC, m.c) AS rn
    FROM fxn a JOIN {prev} m ON m.i = a.i
    GROUP BY a.vec_id, m.c) WHERE rn = 1),
fs{r} AS MATERIALIZED (
  SELECT a.c, s.i, sum(s.x) AS sv
  FROM fa{r} a JOIN fxn s ON s.vec_id = a.vec_id
  GROUP BY a.c, s.i),
fn{r} AS (SELECT c, sqrt(sum(sv * sv)) AS nr FROM fs{r} GROUP BY c),
cent_f{r} AS MATERIALIZED (
  SELECT p.c, p.i,
         round(CASE WHEN n.nr > 0 THEN s.sv / n.nr ELSE p.v END, 9) AS v
  FROM {prev} p
  LEFT JOIN fs{r} s ON s.c = p.c AND s.i = p.i
  LEFT JOIN fn{r} n ON n.c = p.c
  ) """)
        prev = f"cent_f{r}"
    return ",".join(parts), prev



def ann_ivf_trained_sql(k: int = 20, query_vec_id: int = 0,
                        n_lists: int = 16, nprobe: int = 4) -> str:
    """Mirror of stages/ann.ivf_topk_trained: probe the nprobe nearest
    trained centroids (6-dp rounded cosine, ties -> lowest list), rank
    candidates by exact 6-dp cosine to the query."""
    ctes, cent = _centroid_ctes(n_lists=n_lists)
    return f"""
WITH {ctes},
q AS MATERIALIZED (
  SELECT unnest(range(len(emb))) AS i, unnest(emb) AS x
  FROM ev WHERE vec_id = {query_vec_id}),
qn AS MATERIALIZED (
  SELECT i, x / (SELECT sqrt(sum(x * x)) FROM q) AS x FROM q),
probe AS MATERIALIZED (
  SELECT c FROM (
    SELECT m.c, round(sum(m.v * qn.x), 6) AS cs
    FROM {cent} m JOIN qn ON qn.i = m.i GROUP BY m.c)
  ORDER BY cs DESC, c LIMIT {nprobe}),
assign AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT a.vec_id, m.c,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(sum(a.x * m.v), 6) DESC, m.c) AS rn
    FROM fxn a JOIN {cent} m ON m.i = a.i
    GROUP BY a.vec_id, m.c) WHERE rn = 1)
SELECT f.vec_id, round(sum(f.x * qn.x), 6) AS cosine
FROM fxn f
JOIN assign a ON a.vec_id = f.vec_id
JOIN probe p ON p.c = a.c
JOIN qn ON qn.i = f.i
GROUP BY f.vec_id
ORDER BY cosine DESC, f.vec_id LIMIT {k}
"""


def embedding_neardup_stats_sql(threshold: float = 0.35,
                                n_lists: int = 16,
                                round_to: int = 6) -> str:
    """Mirror of stages/embeddings.cosine_neardup_stats: postings =
    per-vector count of coarse lists within angle <= min_angle +
    2*acos(threshold) + 1e-9 of it (the coverage-duplication rule),
    centroids = the SAMPLE fit only (_coarse_centroids); n_pairs from
    the exact brute-force pair count (oracle.cosine_neardup_sql's
    pair rule composed inline)."""
    import math
    theta2 = repr(2.0 * math.acos(max(-1.0, min(1.0, threshold))) + 1e-9)
    # sample fit only: f_rounds=0 -> cent_f0 == cent_s5
    ctes, cent = _centroid_ctes(n_lists=n_lists, f_rounds=0)
    return f"""
WITH {ctes},
ang AS MATERIALIZED (
  SELECT a.vec_id, m.c,
         acos(least(greatest(sum(a.x * m.v), -1.0), 1.0)) AS ang
  FROM fxn a JOIN {cent} m ON m.i = a.i
  GROUP BY a.vec_id, m.c),
rad AS (SELECT vec_id, min(ang) + {theta2} AS radius
        FROM ang GROUP BY vec_id),
post AS (
  SELECT count(*) AS np_
  FROM ang a JOIN rad r ON r.vec_id = a.vec_id
  WHERE a.ang <= r.radius),
nv AS (SELECT count(*) AS n FROM ev),
np2 AS (
  SELECT count(*) AS n
  FROM ev a JOIN ev b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.emb, b.emb) >= {threshold!r})
SELECT CAST(nv.n AS BIGINT) AS n_vectors,
       CAST(post.np_ AS BIGINT) AS n_postings,
       round(CASE WHEN nv.n > 0
                  THEN CAST(post.np_ AS DOUBLE) / nv.n
                  ELSE 0.0 END, {round_to}) AS dup_factor,
       CAST(np2.n AS BIGINT) AS n_pairs
FROM nv, post, np2
"""
