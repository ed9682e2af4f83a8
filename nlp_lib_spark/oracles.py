"""DuckDB oracle SQL for the rule-engine chain (dep parse -> rules -> triples).

Round-1 left the flagship ``kg_triples`` chain rows-only ("no_oracle"); this
module closes that gap by extending the proven recursive-CTE technique
(gate._pos_oracle_sql and friends) to the dependency builder and the shipped
rule union (``relx/ppi/RunRelex.java:141-153``).

Composition: every builder starts from ``gate._pos_oracle_sql()``'s prefix
(the fully-oracled annotation stream: citation strip -> sentence split ->
tokens -> gazetteer state machine -> blinding -> simplify -> POS) and adds:

* ``str2`` — the post-simplify token stream with POS + DOMAIN value +
  protein flag, restricted to extraction-eligible sentences
  (2 <= entity_count <= max_mentions, the pipeline's trivial-skip and
  mention-flood guards, kernels/pipeline.annotate_sentence).
* ``dep_e`` — a faithful SQL replica of the frozen deterministic dependency
  builder (kernels/depparse.dep_parse): noun runs, the sequential
  aux-absorption verb-group state machine (recursive CTE), subjects,
  negation, objects, adverbs, collapsed prepositions, conjunction edges and
  Stanford-style CC distribution (transitive closure).
* per-rule pair CTEs replicating RelexRule1/2/2b/3 and their union.

Corpus-dead branches (documented, mirrored by the pytest fuzz oracles in
tests/test_forms.py): RelexRule5 and form-4 need fused ``PROTEINa/PROTEINb``
tokens — the testdata vocabulary contains no slash-joined entity pairs, so
the gazetteer never emits B-FUSED (verified at sf0.001/0.01/0.1).
RelexRule3(c) needs ``partmod`` and RelexRule1's rcmod/abbrev/appos branches
need relation labels the frozen dep builder never emits (structurally dead).
RelexRule3(a)'s consecutive ``prep_between`` test is replicated for
distance-2 BFS paths (the structural trigger: two prep_between edges through
a shared node, with the reference's sorted-adjacency tie-break); longer
shortest paths never satisfy it on this corpus (verified: zero fires among
all candidate pairs at every sf).
"""

from __future__ import annotations

_R2_PREPS = ("prep_of", "prep_by", "prep_to", "prep_on", "prep_for",
             "prep_in", "prep_through", "prep_with")
_R3_PREPS = _R2_PREPS + ("prep_between",)
_R1_PREP_AGENT = ("prep_of", "prep_from", "prep_like", "prep_including",
                  "prep_in")


def _in(vals) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in vals)


def _ann_parts() -> tuple[str, str, str, str]:
    """(head_through_seq, pos_case_expr, domain_value_expr, lw) lifted from
    gate._pos_oracle_sql — the same rsplit composition gate's rule2b oracle
    uses."""
    from nlp_lib_spark.gate import _pos_oracle_sql, _sql_set, _stem_sql
    from nlp_lib_spark.kernels.domain import DomainAnnotator
    from nlp_lib_spark.lexicons import TESTDATA_DOMAIN_TERMS
    base = _pos_oracle_sql()
    head, tail = base.rsplit(
        "SELECT conv_id, turn_idx, sent_id, idx, bw AS token,", 1)
    case_expr = tail.rsplit("FROM seq", 1)[0].strip()
    case_expr = case_expr[: -len("AS pos_tag")].strip()
    terms = _sql_set(sorted(DomainAnnotator(TESTDATA_DOMAIN_TERMS).terms))
    lw = "lower(bw)"
    stem_lw = _stem_sql(lw)
    dom_expr = (f"CASE WHEN {lw} IN ({terms}) THEN {lw} "
                f"WHEN ({stem_lw}) IN ({terms}) THEN {stem_lw} END")
    return head.rstrip().rstrip(","), case_expr, dom_expr, lw


def stream_sql_prefix(simplify: bool = True) -> str:
    """Annotation-chain prefix ending with CTE ``str2``: one row per token of
    every extraction-eligible sentence.

    ``simplify=False`` renders the WGPRelEx variant
    (operators/wgp.typed_relations_for_sentence): typed blinding skips the
    parenthetical prune, so the drop_span exclusion is lifted from the
    token stream."""
    from nlp_lib_spark.lexicons import TESTDATA_CONFIG
    head, pos_case, dom_expr, _lw = _ann_parts()
    if not simplify:
        head = head.replace("WHERE m2.ms IS NULL AND d.lb IS NULL",
                            "WHERE m2.ms IS NULL")
    mx = TESTDATA_CONFIG.max_mentions
    return head + f""",
elig AS MATERIALIZED (  -- pipeline guards: trivial-skip (<2 entities) + mention flood
  SELECT conv_id, turn_idx, sent_id FROM mention
  GROUP BY 1, 2, 3 HAVING count(*) BETWEEN 2 AND {mx}
),
str2 AS MATERIALIZED (
  SELECT s.conv_id || '#' || CAST(s.turn_idx AS VARCHAR) || '#'
           || CAST(s.sent_id AS VARCHAR) AS sk,
         s.conv_id, s.turn_idx, s.sent_id, s.idx AS i, s.bw AS w,
         lower(s.bw) AS lw,
         {pos_case} AS pos,
         {dom_expr} AS dom,
         (s.bw LIKE '%PROTEIN%') AS is_prot
  FROM (SELECT seq.* FROM seq
        JOIN elig e ON e.conv_id = seq.conv_id
         AND e.turn_idx = seq.turn_idx AND e.sent_id = seq.sent_id) s
),
sdim AS MATERIALIZED (SELECT DISTINCT sk, conv_id, turn_idx, sent_id FROM str2)"""


def dep_sql_prefix(simplify: bool = True) -> str:
    """stream prefix + the dep_parse replica, ending with CTE ``dep_e``
    (sk, reln, gov, dep) — DISTINCT edge set (the rules are set-valued, so
    edge multiplicity is irrelevant; kernels/depparse.py is the spec)."""
    from nlp_lib_spark.kernels.postag import (BE_FORMS, DO_FORMS, HAVE_FORMS,
                                              NEGATIONS)
    aux = _in(sorted(BE_FORMS | DO_FORMS | HAVE_FORMS))
    be = _in(sorted(BE_FORMS))
    neg = _in(sorted(NEGATIONS))
    return stream_sql_prefix(simplify) + f""",
-- ================= dep_parse replica (kernels/depparse.py) =================
d_run0 AS MATERIALIZED (  -- noun-run islands: maximal DT/JJ/CD/N* spans
  SELECT sk, i, pos,
         i - CAST(row_number() OVER (PARTITION BY sk ORDER BY i) AS INT) AS grp
  FROM str2 WHERE pos IN ('DT', 'JJ', 'CD') OR pos LIKE 'N%'
),
d_run AS (
  SELECT sk, grp, max(CASE WHEN pos LIKE 'N%' THEN i END) AS head
  FROM d_run0 GROUP BY sk, grp
),
d_runhead AS MATERIALIZED (  -- token -> head of its noun run (runs with >=1 noun only)
  SELECT r0.sk, r0.i, r.head
  FROM d_run0 r0 JOIN d_run r ON r.sk = r0.sk AND r.grp = r0.grp
  WHERE r.head IS NOT NULL
),
d_heads AS MATERIALIZED (SELECT DISTINCT sk, head AS h FROM d_runhead),
e_np AS MATERIALIZED (  -- step 1: in-run attachments to the run head
  SELECT rh.sk,
         CASE WHEN t.pos = 'JJ' THEN 'amod'
              WHEN t.pos LIKE 'N%' THEN 'nn'
              WHEN t.pos = 'CD' THEN 'num'
              WHEN t.pos = 'DT' THEN 'det' END AS reln,
         rh.head AS gov, rh.i AS dep
  FROM d_runhead rh JOIN str2 t ON t.sk = rh.sk AND t.i = rh.i
  WHERE rh.i <> rh.head
),
d_verb AS MATERIALIZED (
  SELECT sk, i, lw, pos,
         CAST(row_number() OVER (PARTITION BY sk ORDER BY i) AS INT) AS k
  FROM str2 WHERE pos LIKE 'V%' OR pos = 'MD'
),
-- step 2: sequential aux-absorption state machine over verb ordinals
d_vstep(sk, lex, passive, nextk) AS (
  SELECT v1.sk,
         CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                   AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
              THEN v2.i ELSE v1.i END,
         CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                   AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
              THEN v1.lw IN ({be}) AND v2.pos IN ('VBN', 'VBD')
              ELSE false END,
         CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                   AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
              THEN 3 ELSE 2 END
  FROM d_verb v1 LEFT JOIN d_verb v2 ON v2.sk = v1.sk AND v2.k = 2
  WHERE v1.k = 1
  UNION ALL
  SELECT s.sk,
         CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                   AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
              THEN v2.i ELSE v1.i END,
         CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                   AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
              THEN v1.lw IN ({be}) AND v2.pos IN ('VBN', 'VBD')
              ELSE false END,
         s.nextk + CASE WHEN (v1.lw IN ({aux}) OR v1.pos = 'MD')
                             AND v2.i IS NOT NULL AND v2.i - v1.i <= 3
                        THEN 2 ELSE 1 END
  FROM d_vstep s
  JOIN d_verb v1 ON v1.sk = s.sk AND v1.k = s.nextk
  LEFT JOIN d_verb v2 ON v2.sk = s.sk AND v2.k = s.nextk + 1
),
d_lex AS MATERIALIZED (SELECT sk, lex AS v, passive FROM d_vstep),
e_subj AS MATERIALIZED (  -- step 3: nearest preceding run head
  SELECT z.sk, CASE WHEN z.passive THEN 'nsubjpass' ELSE 'nsubj' END AS reln,
         z.v AS gov, z.subj AS dep
  FROM (SELECT l.sk, l.v, l.passive,
               (SELECT max(h.h) FROM d_heads h
                WHERE h.sk = l.sk AND h.h < l.v) AS subj
        FROM d_lex l) z
  WHERE z.subj IS NOT NULL
),
e_neg AS MATERIALIZED (  -- step 4: negation word within 3 left, no lexical verb between
  SELECT l.sk, 'neg' AS reln, l.v AS gov, t.i AS dep
  FROM d_lex l
  JOIN str2 t ON t.sk = l.sk AND t.i BETWEEN l.v - 3 AND l.v - 1
  WHERE t.lw IN ({neg})
    AND NOT EXISTS (SELECT 1 FROM d_lex u
                    WHERE u.sk = l.sk AND u.v > t.i AND u.v < l.v)
),
e_dobj AS MATERIALIZED (  -- step 5: next run head with clean gap
  SELECT z.sk, 'dobj' AS reln, z.v AS gov, z.obj AS dep
  FROM (SELECT l.sk, l.v,
               (SELECT min(h.h) FROM d_heads h
                WHERE h.sk = l.sk AND h.h > l.v) AS obj
        FROM d_lex l) z
  WHERE z.obj IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM str2 b
                    WHERE b.sk = z.sk AND b.i > z.v AND b.i < z.obj
                      AND NOT (b.pos IN ('DT', 'JJ', 'RB', 'CD')
                               OR b.pos LIKE 'N%'))
),
e_advmod AS MATERIALIZED (  -- step 5b: non-negation adverbs to the nearest lexical verb
  SELECT z.sk, 'advmod' AS reln, z.gov, z.a AS dep
  FROM (SELECT t.sk, t.i AS a,
               (SELECT l.v FROM d_lex l WHERE l.sk = t.sk
                ORDER BY abs(l.v - t.i), l.v LIMIT 1) AS gov
        FROM str2 t
        WHERE t.pos = 'RB'
          AND NOT EXISTS (SELECT 1 FROM e_neg n
                          WHERE n.sk = t.sk AND n.dep = t.i)) z
  WHERE z.gov IS NOT NULL
),
d_prepobj AS MATERIALIZED (  -- step 6: first right head, clean gap
  SELECT p0.sk, p0.p, p0.lw, p0.h1 AS obj
  FROM (SELECT t.sk, t.i AS p, t.lw,
               (SELECT min(h.h) FROM d_heads h
                WHERE h.sk = t.sk AND h.h > t.i) AS h1
        FROM str2 t WHERE t.pos IN ('IN', 'TO')) p0
  WHERE p0.h1 IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM str2 b
                    WHERE b.sk = p0.sk AND b.i > p0.p AND b.i < p0.h1
                      AND NOT (b.pos IN ('DT', 'JJ', 'CD')
                               OR b.pos LIKE 'N%'))
),
e_prep AS MATERIALIZED (
  SELECT z.sk, 'prep_' || z.lw AS reln, z.gov, z.obj AS dep
  FROM (SELECT pq.sk, pq.lw, pq.obj,
               CASE WHEN rh.head IS NOT NULL AND rh.head <= pq.q THEN rh.head
                    ELSE coalesce(
                      (SELECT max(l.v) FROM d_lex l
                       WHERE l.sk = pq.sk AND l.v < pq.p),
                      (SELECT max(h.h) FROM d_heads h
                       WHERE h.sk = pq.sk AND h.h < pq.p)) END AS gov
        FROM (SELECT po.sk, po.p, po.lw, po.obj,
                     (SELECT max(t.i) FROM str2 t
                      WHERE t.sk = po.sk AND t.i < po.p
                        AND t.pos <> 'RB') AS q
              FROM d_prepobj po) pq
        LEFT JOIN d_runhead rh ON rh.sk = pq.sk AND rh.i = pq.q) z
  WHERE z.gov IS NOT NULL AND z.gov <> z.obj
),
d_conj AS MATERIALIZED (  -- step 7: CC between adjacent-ish run heads, clean gap
  SELECT cc.sk, cc.c, cc.lw, cc.a, cc.b
  FROM (SELECT t.sk, t.i AS c, t.lw,
               (SELECT max(h.h) FROM d_heads h
                WHERE h.sk = t.sk AND h.h < t.i) AS a,
               (SELECT min(h.h) FROM d_heads h
                WHERE h.sk = t.sk AND h.h > t.i) AS b
        FROM str2 t WHERE t.pos = 'CC') cc
  WHERE cc.a IS NOT NULL AND cc.b IS NOT NULL
    AND NOT EXISTS (
      SELECT 1 FROM str2 g
      LEFT JOIN d_runhead grh ON grh.sk = g.sk AND grh.i = g.i
      WHERE g.sk = cc.sk AND g.i > cc.a AND g.i < cc.b AND g.i <> cc.c
        AND NOT (coalesce(grh.head, -1) IN (cc.a, cc.b)
                 OR g.pos IN ('CC', ',')))
),
e_conj AS MATERIALIZED (SELECT sk, 'conj_' || lw AS reln, a AS gov, b AS dep FROM d_conj),
conj_reach(sk, src, dst) AS (  -- CC-distribution closure (left-to-right)
  SELECT sk, gov, dep FROM e_conj
  UNION
  SELECT r.sk, r.src, e.dep
  FROM conj_reach r JOIN e_conj e ON e.sk = r.sk AND e.gov = r.dst
),
e_base AS MATERIALIZED (
  SELECT * FROM e_np UNION ALL SELECT * FROM e_subj
  UNION ALL SELECT * FROM e_neg UNION ALL SELECT * FROM e_dobj
  UNION ALL SELECT * FROM e_advmod UNION ALL SELECT * FROM e_prep
  UNION ALL SELECT * FROM e_conj
),
dep_e AS MATERIALIZED (
  SELECT DISTINCT sk, reln, gov, dep FROM (
    SELECT * FROM e_base
    UNION ALL
    SELECT b.sk, b.reln, b.gov, r.dst AS dep
    FROM e_base b JOIN conj_reach r ON r.sk = b.sk AND r.src = b.dep
    WHERE b.reln IN ('nsubj', 'nsubjpass', 'dobj') OR b.reln LIKE 'prep_%'
  )
)"""


def dep_edges_oracle_sql() -> str:
    """Oracle for the kg_dep_edges gate: the distinct dependency edge set."""
    return dep_sql_prefix() + """
SELECT d.conv_id, d.turn_idx, d.sent_id, e.reln, e.gov, e.dep
FROM dep_e e JOIN sdim d ON d.sk = e.sk
"""


def rules_sql_prefix(simplify: bool = True) -> str:
    """dep prefix + shared rule machinery + per-rule pair CTEs, ending with
    ``u_pairs`` (sk, e1, e2) — the RunRelex union."""
    r2p = _in(_R2_PREPS)
    r3p = _in(_R3_PREPS + ("agent", "nn", "amod"))
    r1pa = _in(_R1_PREP_AGENT)
    return dep_sql_prefix(simplify) + f""",
-- ================= shared rule machinery (kernels/rules.py) ================
q_neg AS MATERIALIZED (  -- tokens governing a neg edge (isNegated checks)
  SELECT DISTINCT sk, gov AS x FROM dep_e WHERE reln = 'neg'
),
q_cdom AS MATERIALIZED (  -- NP-chunk-contains-DOMAIN per token (_np_chunk + domain scan)
  SELECT c.sk, c.x,
         EXISTS (SELECT 1 FROM str2 t
                 WHERE t.sk = c.sk AND t.i BETWEEN c.lo AND c.hi
                   AND t.dom IS NOT NULL) AS cdom
  FROM (SELECT t.sk, t.i AS x,
               least(t.i, coalesce(min(least(e.gov, e.dep)), t.i)) AS lo,
               greatest(t.i, coalesce(max(greatest(e.gov, e.dep)), t.i)) AS hi
        FROM str2 t
        LEFT JOIN dep_e e ON e.sk = t.sk AND (e.gov = t.i OR e.dep = t.i)
             AND e.reln IN ('nn', 'amod', 'advmod')
        GROUP BY t.sk, t.i) c
),
he_a AS MATERIALIZED (  -- getHeadEntityFromNP, agent pattern nn|amod(|abbrev: dead)
  SELECT sk, x, max(CASE WHEN is_prot THEN c END) AS he
  FROM (SELECT sk, i AS x, i AS c, is_prot FROM str2
        UNION ALL
        SELECT e.sk, e.gov, e.dep, t.is_prot
        FROM dep_e e JOIN str2 t ON t.sk = e.sk AND t.i = e.dep
        WHERE e.reln IN ('nn', 'amod')) z
  GROUP BY sk, x
),
he_t AS MATERIALIZED (  -- target / rule2 pattern nn|amod|advmod
  SELECT sk, x, max(CASE WHEN is_prot THEN c END) AS he
  FROM (SELECT sk, i AS x, i AS c, is_prot FROM str2
        UNION ALL
        SELECT e.sk, e.gov, e.dep, t.is_prot
        FROM dep_e e JOIN str2 t ON t.sk = e.sk AND t.i = e.dep
        WHERE e.reln IN ('nn', 'amod', 'advmod')) z
  GROUP BY sk, x
),
enp_a AS MATERIALIZED (  -- getEntitiesFromNP: head entity + conj expansion (appos: dead)
  SELECT sk, x, he AS ent FROM he_a WHERE he IS NOT NULL
  UNION
  SELECT h.sk, h.x, h2.he
  FROM he_a h
  JOIN dep_e e ON e.sk = h.sk AND e.dep = h.he AND e.reln LIKE 'conj_%'
  JOIN he_a h2 ON h2.sk = h.sk AND h2.x = e.gov
  WHERE h.he IS NOT NULL AND h.he <> h.x AND h2.he IS NOT NULL
),
enp_t AS MATERIALIZED (
  SELECT sk, x, he AS ent FROM he_t WHERE he IS NOT NULL
  UNION
  SELECT h.sk, h.x, h2.he
  FROM he_t h
  JOIN dep_e e ON e.sk = h.sk AND e.dep = h.he AND e.reln LIKE 'conj_%'
  JOIN he_t h2 ON h2.sk = h.sk AND h2.x = e.gov
  WHERE h.he IS NOT NULL AND h.he <> h.x AND h2.he IS NOT NULL
),
-- ====================== RelexRule1 (rules.rule1) ===========================
r1_seed AS MATERIALIZED (
  SELECT sk, gov AS v, dep AS subj FROM dep_e
  WHERE reln IN ('nsubj', 'nsubjpass')
),
-- DFS chains from the seed verb over the live _R1_PATH labels (dobj|prep_*);
-- cum_cd / cum_ng accumulate the isDomainSpecific / isNegated prefix checks
-- (chunk-domain resp. governs-neg of every chain node; see rules.py:146-176)
r1_chain(sk, v, subj, dnode, cum_cd, cum_ng) AS (
  SELECT s.sk, s.v, s.subj, e.dep,
         cs.cdom OR cv.cdom OR cd.cdom,
         (ns.x IS NOT NULL) OR (nv.x IS NOT NULL) OR (nd.x IS NOT NULL)
  FROM r1_seed s
  JOIN dep_e e ON e.sk = s.sk AND e.gov = s.v
       AND (e.reln = 'dobj' OR e.reln LIKE 'prep_%')
  JOIN q_cdom cs ON cs.sk = s.sk AND cs.x = s.subj
  JOIN q_cdom cv ON cv.sk = s.sk AND cv.x = s.v
  JOIN q_cdom cd ON cd.sk = s.sk AND cd.x = e.dep
  LEFT JOIN q_neg ns ON ns.sk = s.sk AND ns.x = s.subj
  LEFT JOIN q_neg nv ON nv.sk = s.sk AND nv.x = s.v
  LEFT JOIN q_neg nd ON nd.sk = s.sk AND nd.x = e.dep
  UNION ALL
  SELECT c.sk, c.v, c.subj, e.dep,
         c.cum_cd OR cd.cdom,
         c.cum_ng OR (nd.x IS NOT NULL)
  FROM r1_chain c
  JOIN dep_e e ON e.sk = c.sk AND e.gov = c.dnode
       AND (e.reln = 'dobj' OR e.reln LIKE 'prep_%')
  JOIN q_cdom cd ON cd.sk = c.sk AND cd.x = e.dep
  LEFT JOIN q_neg nd ON nd.sk = c.sk AND nd.x = e.dep
),
-- agent side: base NP entities of the subject...
r1_base_agents AS MATERIALIZED (
  SELECT s.sk, s.v, s.subj, en.ent
  FROM r1_seed s JOIN enp_a en ON en.sk = s.sk AND en.x = s.subj
),
-- ...plus prep-chain agents: chains from subj (and base agents != subj)
-- over prep_*(seed)/prep_*|dobj(extension); leaf paths contribute
-- entities of the rightmost prep_(of|from|like|including|in) object
r1_pchain(sk, v, subj, dnode, maxpa) AS (
  SELECT st.sk, st.v, st.subj, e.dep,
         CASE WHEN e.reln IN ({r1pa}) THEN e.dep END
  FROM (SELECT sk, v, subj, subj AS x FROM r1_seed
        UNION
        SELECT sk, v, subj, ent FROM r1_base_agents WHERE ent <> subj) st
  JOIN dep_e e ON e.sk = st.sk AND e.gov = st.x AND e.reln LIKE 'prep_%'
  UNION ALL
  SELECT c.sk, c.v, c.subj, e.dep,
         greatest(coalesce(c.maxpa, -1),
                  CASE WHEN e.reln IN ({r1pa}) THEN e.dep ELSE -1 END)
  FROM r1_pchain c
  JOIN dep_e e ON e.sk = c.sk AND e.gov = c.dnode
       AND (e.reln LIKE 'prep_%' OR e.reln = 'dobj')
),
r1_agents AS MATERIALIZED (
  SELECT sk, v, subj, ent FROM r1_base_agents
  UNION
  SELECT c.sk, c.v, c.subj, en.ent
  FROM r1_pchain c
  JOIN enp_a en ON en.sk = c.sk AND en.x = c.maxpa
  WHERE coalesce(c.maxpa, -1) <> -1
    AND NOT EXISTS (SELECT 1 FROM dep_e e
                    WHERE e.sk = c.sk AND e.gov = c.dnode
                      AND (e.reln LIKE 'prep_%' OR e.reln = 'dobj'))
),
r1_pairs AS MATERIALIZED (
  SELECT DISTINCT c.sk, least(a.ent, t.ent) AS e1,
         greatest(a.ent, t.ent) AS e2
  FROM r1_chain c
  JOIN str2 h ON h.sk = c.sk AND h.i = c.dnode AND h.pos LIKE 'NN%'
  JOIN enp_t t ON t.sk = c.sk AND t.x = c.dnode
  JOIN r1_agents a ON a.sk = c.sk AND a.v = c.v AND a.subj = c.subj
  WHERE c.cum_cd AND NOT c.cum_ng
),
-- ====================== RelexRule2 (rules.rule2) ===========================
-- chains of _R2_PREP edges; cum tracks isDomainSpecific over the prefix,
-- including the reference's path-INDEX quirk (rules.py:239-251): the else
-- branch tests the DOMAIN tag of the token at position <path index>.
r2_chain(sk, depth, gov, dep, cum) AS (
  SELECT e.sk, 0, e.gov, e.dep,
         CASE WHEN g.pos LIKE 'N%' THEN cg.cdom
              ELSE coalesce(t0.dom IS NOT NULL, false) END
  FROM dep_e e
  JOIN str2 g ON g.sk = e.sk AND g.i = e.gov
  JOIN q_cdom cg ON cg.sk = e.sk AND cg.x = e.gov
  LEFT JOIN str2 t0 ON t0.sk = e.sk AND t0.i = 0
  WHERE e.reln IN ({r2p})
  UNION ALL
  SELECT c.sk, c.depth + 1, e.gov, e.dep,
         c.cum OR CASE WHEN g.pos LIKE 'N%' THEN cg.cdom
                       ELSE coalesce(ti.dom IS NOT NULL, false) END
  FROM r2_chain c
  JOIN dep_e e ON e.sk = c.sk AND e.gov = c.dep AND e.reln IN ({r2p})
  JOIN str2 g ON g.sk = e.sk AND g.i = e.gov
  JOIN q_cdom cg ON cg.sk = e.sk AND cg.x = e.gov
  LEFT JOIN str2 ti ON ti.sk = e.sk AND ti.i = c.depth + 1
),
r2_pairs AS MATERIALIZED (
  SELECT DISTINCT c.sk, least(a.ent, t.ent) AS e1,
         greatest(a.ent, t.ent) AS e2
  FROM r2_chain c
  JOIN str2 g ON g.sk = c.sk AND g.i = c.gov AND g.pos LIKE 'NN%'
  JOIN str2 d ON d.sk = c.sk AND d.i = c.dep AND d.pos LIKE 'NN%'
  JOIN enp_t a ON a.sk = c.sk AND a.x = c.gov
  JOIN enp_t t ON t.sk = c.sk AND t.x = c.dep
  WHERE c.cum
),
-- ====================== RelexRule2b (rules.rule2b) =========================
r2b_cls AS MATERIALIZED (
  SELECT sk, i, w, is_prot,
         CASE WHEN w LIKE '%PROTEIN%' THEN 'PROT'
              WHEN dom IS NOT NULL THEN 'REL'
              WHEN length(w) = 1 AND w IN ('/', ',', '-') THEN w
              WHEN pos IN ('IN', 'TO') AND w IN ('of', 'by', 'to', 'on',
                   'for', 'in', 'through', 'with') THEN 'PREP'
              WHEN w IN ('and', 'or') THEN 'CONJ'
              WHEN pos LIKE 'N%' THEN 'N'
              ELSE 'W' END AS cls
  FROM str2
),
r2b_pairs AS MATERIALIZED (
  SELECT p.sk, p.e1, p.e2
  FROM (SELECT a.sk, a.i AS e1, b.i AS e2
        FROM r2b_cls a JOIN r2b_cls b ON b.sk = a.sk AND a.i < b.i
        WHERE a.is_prot AND b.is_prot) p
  WHERE regexp_matches(
    (SELECT string_agg(CASE WHEN s.i = p.e1 THEN 'PROT1'
                            WHEN s.i = p.e2 THEN 'PROT2'
                            ELSE s.cls END, '' ORDER BY s.i)
     FROM r2b_cls s WHERE s.sk = p.sk AND s.i <= p.e2),
    '(PREP|REL|N)+(PREP)(REL|PREP|N)*PROT1(REL|N|PREP|PROT)+PROT2')
),
-- ====================== RelexRule3 (rules.rule3) ===========================
-- (b) domain-noun fan-out: directed reachability over the _R3_REACH labels
r3_reach(sk, src, node) AS (
  SELECT sk, i, i FROM str2 WHERE pos LIKE 'N%' AND dom IS NOT NULL
  UNION
  SELECT r.sk, r.src, e.dep
  FROM r3_reach r JOIN dep_e e ON e.sk = r.sk AND e.gov = r.node
  WHERE e.reln IN ({r3p})
),
r3b_pairs AS MATERIALIZED (
  SELECT DISTINCT t1.sk, t1.node AS e1, t2.node AS e2
  FROM r3_reach t1
  JOIN r3_reach t2 ON t2.sk = t1.sk AND t2.src = t1.src
       AND t1.node < t2.node
  JOIN str2 p1 ON p1.sk = t1.sk AND p1.i = t1.node AND p1.is_prot
  JOIN str2 p2 ON p2.sk = t2.sk AND p2.i = t2.node AND p2.is_prot
  WHERE t1.src < t1.node
),
-- (a) consecutive prep_between on the BFS shortest path, replicated for
-- distance-2 paths (two prep_between edges through the BFS-chosen shared
-- node; sorted-adjacency tie-break per kernels/depgraph.DepGraph).
und AS MATERIALIZED (  -- undirected adjacency with the -reln reverse convention
  SELECT sk, gov AS u, dep AS v, reln AS lab FROM dep_e
  UNION ALL
  SELECT sk, dep AS u, gov AS v, '-' || reln FROM dep_e
),
r3a_dtp AS MATERIALIZED (  -- protein tokens satisfying the domain-proximity precondition
  SELECT s.sk, s.i
  FROM str2 s
  WHERE s.is_prot AND (
    coalesce((SELECT max(d.i) FROM str2 d
              WHERE d.sk = s.sk AND d.i < s.i AND d.dom IS NOT NULL), -1)
    > s.i - 5)
),
r3a_pairs AS MATERIALIZED (
  SELECT z.sk, z.e1, z.e2 FROM (
    SELECT a.sk, a.i AS e1, p2.i AS e2,
           -- BFS-chosen mid = min node adjacent to both; labels = min label
           -- of each parallel edge bundle (sorted-adjacency first entry)
           (SELECT min(u1.v) FROM und u1
            WHERE u1.sk = a.sk AND u1.u = a.i
              AND EXISTS (SELECT 1 FROM und u2 WHERE u2.sk = a.sk
                          AND u2.u = u1.v AND u2.v = p2.i)) AS mid
    FROM r3a_dtp a
    JOIN str2 p2 ON p2.sk = a.sk AND p2.i > a.i AND p2.is_prot
    WHERE NOT EXISTS (SELECT 1 FROM und u0 WHERE u0.sk = a.sk
                      AND u0.u = a.i AND u0.v = p2.i)
  ) z
  WHERE z.mid IS NOT NULL
    AND ltrim((SELECT min(u1.lab) FROM und u1
               WHERE u1.sk = z.sk AND u1.u = z.e1 AND u1.v = z.mid),
              '-') = 'prep_between'
    AND ltrim((SELECT min(u2.lab) FROM und u2
               WHERE u2.sk = z.sk AND u2.u = z.mid AND u2.v = z.e2),
              '-') = 'prep_between'
),
-- ================== union (RunRelex.java:141-153) ==========================
u_pairs AS MATERIALIZED (
  SELECT sk, e1, e2 FROM r1_pairs
  UNION SELECT sk, e1, e2 FROM r2_pairs
  UNION SELECT sk, e1, e2 FROM r2b_pairs
  UNION SELECT sk, e1, e2 FROM r3b_pairs
  UNION SELECT sk, e1, e2 FROM r3a_pairs
)"""


def _pairs_select(cte: str) -> str:
    return f"""
SELECT d.conv_id, d.turn_idx, d.sent_id, p.e1, p.e2
FROM {cte} p JOIN sdim d ON d.sk = p.sk
"""


def rule1_pairs_oracle_sql() -> str:
    return rules_sql_prefix() + _pairs_select("r1_pairs")


def rule2_pairs_oracle_sql() -> str:
    return rules_sql_prefix() + _pairs_select("r2_pairs")


def rule3_pairs_oracle_sql() -> str:
    return rules_sql_prefix() + """,
r3_pairs AS (SELECT sk, e1, e2 FROM r3b_pairs
             UNION SELECT sk, e1, e2 FROM r3a_pairs)""" + \
        _pairs_select("r3_pairs")


def union_pairs_oracle_sql() -> str:
    return rules_sql_prefix() + _pairs_select("u_pairs")


def triples_oracle_sql() -> str:
    """The flagship kg_triples oracle: rule-union pairs resolved to
    (subj, pred, obj) per kernels/pipeline.triples_for_sentence —
    placeholder->surface via the gazetteer mention map, predicate = nearest
    DOMAIN key term (_pred_term), fallback 'interacts_with'.  Fused
    same-token pairs (i==j) cannot occur on this corpus (no B-FUSED)."""
    return rules_sql_prefix() + """,
mention2 AS MATERIALIZED (  -- placeholder ordinal -> surface text
  SELECT conv_id, turn_idx, sent_id, mtext,
         row_number() OVER (PARTITION BY conv_id, turn_idx, sent_id
                            ORDER BY ms) - 1 AS k
  FROM step WHERE ms IS NOT NULL
)
SELECT d.conv_id, d.turn_idx, d.sent_id, p.e1, p.e2,
       m1.mtext AS subj,
       coalesce(
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i > p.e1
            AND t.i < p.e2 AND t.dom IS NOT NULL ORDER BY t.i LIMIT 1),
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i < p.e1
            AND t.i >= p.e1 - 5 AND t.dom IS NOT NULL
          ORDER BY t.i DESC LIMIT 1),
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i > p.e2
            AND t.i <= p.e2 + 5 AND t.dom IS NOT NULL ORDER BY t.i LIMIT 1),
         'interacts_with') AS pred,
       m2.mtext AS obj
FROM u_pairs p
JOIN sdim d ON d.sk = p.sk
JOIN str2 w1 ON w1.sk = p.sk AND w1.i = p.e1
JOIN str2 w2 ON w2.sk = p.sk AND w2.i = p.e2
JOIN mention2 m1 ON m1.conv_id = d.conv_id AND m1.turn_idx = d.turn_idx
     AND m1.sent_id = d.sent_id
     AND m1.k = CAST(substr(w1.w, 8) AS INT)
JOIN mention2 m2 ON m2.conv_id = d.conv_id AND m2.turn_idx = d.turn_idx
     AND m2.sent_id = d.sent_id
     AND m2.k = CAST(substr(w2.w, 8) AS INT)
WHERE p.e1 <> p.e2
"""


def wgp_triples_oracle_sql() -> str:
    """kg_wgp_triples oracle (main/WGPRelEx.java via operators/wgp.py): the
    gate derives typed IOB deterministically — the k-th gazetteer mention of
    a sentence is GENOTYPE (k even) / PHENOTYPE (k odd) — then runs the same
    rule union WITHOUT the parenthetical prune and keeps cross-type pairs
    only, emitting (doc_id, sent_id, genotype, pred, phenotype)."""
    return rules_sql_prefix(simplify=False) + """,
mention2 AS MATERIALIZED (
  SELECT conv_id, turn_idx, sent_id, mtext,
         row_number() OVER (PARTITION BY conv_id, turn_idx, sent_id
                            ORDER BY ms) - 1 AS k
  FROM step WHERE ms IS NOT NULL
)
SELECT d.conv_id || ':' || CAST(d.turn_idx AS VARCHAR) AS doc_id,
       d.sent_id,
       CASE WHEN m1.k % 2 = 0 THEN m1.mtext ELSE m2.mtext END AS genotype,
       coalesce(
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i > p.e1
            AND t.i < p.e2 AND t.dom IS NOT NULL ORDER BY t.i LIMIT 1),
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i < p.e1
            AND t.i >= p.e1 - 5 AND t.dom IS NOT NULL
          ORDER BY t.i DESC LIMIT 1),
         (SELECT t.dom FROM str2 t WHERE t.sk = p.sk AND t.i > p.e2
            AND t.i <= p.e2 + 5 AND t.dom IS NOT NULL ORDER BY t.i LIMIT 1),
         'interacts_with') AS pred,
       CASE WHEN m1.k % 2 = 0 THEN m2.mtext ELSE m1.mtext END AS phenotype
FROM u_pairs p
JOIN sdim d ON d.sk = p.sk
JOIN str2 w1 ON w1.sk = p.sk AND w1.i = p.e1
JOIN str2 w2 ON w2.sk = p.sk AND w2.i = p.e2
JOIN mention2 m1 ON m1.conv_id = d.conv_id AND m1.turn_idx = d.turn_idx
     AND m1.sent_id = d.sent_id AND m1.k = CAST(substr(w1.w, 8) AS INT)
JOIN mention2 m2 ON m2.conv_id = d.conv_id AND m2.turn_idx = d.turn_idx
     AND m2.sent_id = d.sent_id AND m2.k = CAST(substr(w2.w, 8) AS INT)
WHERE p.e1 <> p.e2 AND m1.k % 2 <> m2.k % 2
"""


def kg_edges_oracle_sql() -> str:
    """kg_edges oracle: the triples oracle joined through the canonical map
    (gate._entity_links_oracle_sql semantics — linking + transitive-closure
    CC) and aggregated per (subj_id, pred, obj_id), replicating
    operators/graph.materialize_graph."""
    from nlp_lib_spark.gate import _entity_links_oracle_sql
    return f"""
WITH triples AS MATERIALIZED ({triples_oracle_sql()}),
cmap AS MATERIALIZED (
  SELECT DISTINCT norm, entity_id FROM ({_entity_links_oracle_sql()}) links
),
t AS (
  SELECT tr.conv_id, tr.pred,
         coalesce(cs.entity_id,
                  trim(regexp_replace(lower(tr.subj), '\\s+', ' ', 'g'))) AS subj_id,
         coalesce(co.entity_id,
                  trim(regexp_replace(lower(tr.obj), '\\s+', ' ', 'g'))) AS obj_id
  FROM triples tr
  LEFT JOIN cmap cs
    ON cs.norm = trim(regexp_replace(lower(tr.subj), '\\s+', ' ', 'g'))
  LEFT JOIN cmap co
    ON co.norm = trim(regexp_replace(lower(tr.obj), '\\s+', ' ', 'g'))
)
SELECT subj_id, pred, obj_id, count(*) AS weight,
       count(DISTINCT conv_id) AS n_convs
FROM t GROUP BY subj_id, pred, obj_id
"""
