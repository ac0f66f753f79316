-- q81 PPJoin prefix-filter oracle replay (round 10 — evidence artifact,
-- NOT the declared oracle). Verified value-identical to the declared
-- all-pairs q81 oracle at sf0.1 (758,890 rows, pandas .equals == True;
-- 50.7 s vs the naive form's 67.6 s in DuckDB 1.x at 32 threads).
--
-- Why it is NOT the sf1 path (BASELINE.md §4.0d): prefix filtering cuts
-- CANDIDATES, but q81's ANSWER SET is itself quadratic on this corpus
-- (28% of within-lang pairs at ≥0.8 Jaccard; ~76M pairs at sf1), so the
-- exact-verify stage scales with the output and no replay restores
-- feasibility. Kept for the record and for corpora where answers are
-- sparse — there this form is the right oracle restage (it is the q86
-- recipe plus per-set prefixes).
--
-- Correctness of the filters (both exact, integer arithmetic):
--  * size gate: J(A,B) >= 0.8  =>  |A∩B| >= 0.8·max  =>  5·min >= 4·max
--  * prefix gate: with tokens globally ordered by (df, t), prefixes of
--    length |x| − ⌈0.8·|x|⌉ + 1 = sz − ((4·sz + 4) // 5) + 1 must share
--    a token when J >= 0.8 (Chaudhuri/Bayardo/Xiao prefix-filter bound;
--    the integer form avoids float-ceil boundary errors).
WITH d AS MATERIALIZED (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS tok,
    len(list_distinct(string_split(text, ' '))) AS sz FROM documents),
tf AS MATERIALIZED (
  SELECT t, count(*) AS df FROM (SELECT unnest(tok) AS t FROM d) GROUP BY t),
ptok AS MATERIALIZED (
  SELECT doc_id, lang, sz, t FROM (
    SELECT s.doc_id, s.lang, s.sz, x.t,
      row_number() OVER (PARTITION BY s.doc_id ORDER BY f.df, x.t) AS rn
    FROM d s, unnest(s.tok) AS x(t) JOIN tf f ON x.t = f.t)
  WHERE rn <= sz - ((4 * sz + 4) // 5) + 1),
cand AS MATERIALIZED (
  SELECT DISTINCT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b
  FROM ptok a JOIN ptok b
    ON a.t = b.t AND a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE 5 * least(a.sz, b.sz) >= 4 * greatest(a.sz, b.sz))
SELECT c.lang AS lang, c.id_a AS id_a, c.id_b AS id_b,
  round(CAST(len(list_intersect(sa.tok, sb.tok)) AS DOUBLE) /
    (sa.sz + sb.sz - len(list_intersect(sa.tok, sb.tok))), 4) AS jaccard
FROM cand c JOIN d sa ON c.id_a = sa.doc_id JOIN d sb ON c.id_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.tok, sb.tok)) AS DOUBLE) /
    (sa.sz + sb.sz - len(list_intersect(sa.tok, sb.tok))) >= 0.8
ORDER BY lang, id_a, id_b;
