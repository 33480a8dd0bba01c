#!/usr/bin/env python3
"""Implementation-FREE metamorphic invariants (VERDICT r13 #3).

The verification stack so far is three same-author implementations
(Scala engine, DuckDB oracle SQL, crosscheck.py's from-the-paper
reimplementations). This script asserts properties that need NO
implementation of the operator at all — only the operator's published
GUARANTEE and ground truth computed from the raw tables by definition:

  - ann_rank_shape     every ANN variant returns distinct neighbors
                       with ranks 1..n and its score monotone along
                       rank (cos desc, adc/dist asc); at most k rows
                       per query, non-empty dumps, no foreign queries
                       — exactly k per query is guaranteed (and
                       asserted) only for brute force; the bucketed
                       variants may legitimately return fewer
  - ann_recall         brute-force top-k == exact numpy top-k
                       (tie-tolerant), and each approximate variant's
                       recall@10 against exact ground truth is above a
                       floor far below its measured value but far above
                       broken (lsh/ivf floors from RECALL_sf10.json; the
                       PQ family is excluded from recall floors — its
                       measured recall with 16-code LCG codebooks is
                       0.01-0.35 by design, crosscheck verifies it
                       value-exactly instead)
  - hll_error          |estimate - exact| / exact within the published
                       HLL error for m=64 registers (sigma = 1.04/sqrt m
                       ~= 13%): every group <= 3.5 sigma, median <= 2
                       sigma (Flajolet et al. 2007)
  - bm25_monotonic     adding a matching term never lowers the score:
                       same doc length + componentwise >= tf => score >=
                       (strict when any tf strictly higher); same tf
                       vector + longer doc => score strictly lower
                       (Robertson/Sparck-Jones directions, b=0.75 > 0)
  - winnow_guarantee   Schleimer-Wilkerson-Aiken theorem: two documents
                       sharing a token run of length >= window + k - 1
                       (= 6 for the engine's k=3, w=4) MUST share at
                       least one fingerprint; ground-truth shared runs
                       found by definitional 6-gram intersection
  - dedup_idempotent   op(op(x)) == op(x), dump-observable forms:
                       exact-dedup survivors have pairwise-distinct
                       texts (re-dedup would change nothing); digest
                       dedup picks the same survivors as text dedup;
                       keep-one keeps EXACTLY one doc per connected
                       component with n_members = component size;
                       paragraph dedup's kept paragraphs are globally
                       unique (a second pass would drop nothing)

Round-15 additions (VERDICT r14 #5 — the uncovered high-semantic-risk
families), same implementation-free discipline:

  - funnel_greedy      session_funnel: the published greedy-first-match
                       contract re-derived by a definitional sorted scan
                       per user ((ts, event_id) order); full coverage
                       (one row per user with events); stage distribution
                       must be non-degenerate (anti-vacuity)
  - retention_def      session_retention: exact equality with the
                       definitional distinct-(user, day) / min-day-cohort
                       triangle; >= 2 cohorts and >= 1 positive offset
  - asof_directions    all four as-of variants: matched ts on the correct
                       side of the query ts per direction; backward match
                       IS the definitional max date <= ts (forward: min
                       ts >= date; nearest: argmin |gap| with the
                       backward-on-ties rule), via numpy searchsorted;
                       tolerance drops exactly the out-of-bound winners
                       (both arms must be non-empty); coverage exact
  - join_containment   interval_join / range_join: exact SET equality
                       with the definitional per-user pair enumeration
                       (overlap resp. BETWEEN predicates); the join must
                       be selective (pairs < user-block cross product)
  - pack_conservation  corpus_pack: per-lang doc_id-ordered cumulative
                       offsets re-derived definitionally; token
                       conservation (sum of packed == sum of input);
                       corpus_chunk: every chunk == the definitional
                       window/stride slice, no chunk over the window

Round-16 additions (VERDICT r15 #6 — the remaining families), same
discipline:

  - cm_bound           count-min: definitional top-10 probe coverage +
                       exact counts, one-sided estimate (est >= exact,
                       the published CM guarantee), overestimate within
                       eps*N for eps = e/width
  - quantile_bucket    histogram quantiles: the reported pN IS the upper
                       edge of the bucket holding the definitional exact
                       quantile (so within one bucket width of exact)
  - pagerank_power     rank vector == the 5-step damped power iteration
                       (d=0.85) over the oracle-verified pair graph,
                       within the integer fixed-point grain (L1 bound)
  - budget_select      greedy prefix set equality + budget conservation
                       + maximality (the next doc would exceed budget)
  - mixture_rates      per-stratum cut respected row-wise; keep rates
                       within 4 sigma binomial of the configured rates
  - score_completeness bm25: exactly the docs with >= 1 query term,
                       definitional n_hits, positive scores; tfidf:
                       exact integer-ratio scores, top-k set equality
  - heavy_hitters_exact exact set+count equality with definitional
                       token counts >= threshold (output is exact by
                       contract; the sketch is only a prescreen)

Usage: invariants.py [sf_dir] [verify_out_dir] [only,names]
       invariants.py --teeth [sf_dir] [verify_out_dir]
  defaults: /root/testdata/sf0.01 /tmp/verify_out01
  (run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first)

--teeth proves each check can actually FAIL (VERDICT r14 #5: "at least
one mutation-teeth demonstration each"): for every registered mutation
it re-runs the owning check against an in-memory corrupted copy of the
dump and requires a violation — a check that passes on corrupted data
is a broken check, exactly the crosscheck teeth protocol applied to
this layer. Exit 0 only when every clean check passes AND every
mutation is caught.

Exit 0 = every invariant holds; 1 = any violation. A check that finds
ZERO instances to test (no tie pairs, no shared runs) FAILS loudly —
an invariant vacuously true is not evidence.
"""
import math
import os
import sys
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def load_table(sf_dir, name):
    return pq.read_table(f"{sf_dir}/{name}.parquet").to_pandas()


# --teeth injection point: (dump_name, corrupt_fn) applied to the loaded
# dump in memory — the parquet on disk is never touched
_MUTATE = None


def load_result(out_dir, name):
    path = f"{out_dir}/{name}"
    if not os.path.exists(path):
        # r17: Verify dumps the non-oracle fixtures to the SIBLING
        # `<outDir>_fixtures` dir so the driver's DuckDB compare stops
        # flagging them as no_oracle; old dumps keep them in out_dir
        sib = f"{out_dir.rstrip('/')}_fixtures/{name}"
        if os.path.exists(sib):
            path = sib
    df = pq.read_table(path).to_pandas()
    if _MUTATE and _MUTATE[0] == name:
        df = _MUTATE[1](df.copy())
    return df


def ts_us(series):
    """Epoch microseconds from a parquet timestamp column (µs or ns
    encodings both ship across driver generations — see Tables.apply)."""
    return pd.to_datetime(series).astype("datetime64[us]").astype("int64").to_numpy()


def tokens(text):
    if text is None:
        return []
    return [t for t in text.strip().split(" ") if t]


# ------------------------------------------------------------------ ANN

ANN_SCORE = {  # dump -> (score column, ascending?)
    "ann_topk": ("cos", False),
    "ann_lsh_topk": ("cos", False),
    "ann_ivf_topk": ("cos", False),
    "ann_ivf_auto_topk": ("cos", False),
    "ann_ivf_auto_topk_half": ("cos", False),
    "ann_ivf_trained_topk": ("dist", True),
    "ann_pq_topk": ("adc", True),
    "ann_ivfpq_topk": ("adc", True),
    "ann_ivfpq_trained_topk": ("adc", True),
}

# Recall floors. Absolute for the variants whose recall is
# scale-independent (brute force is exact by definition; trained IVF
# measured 0.97 at sf10 and stays high at small corpora because its
# centroids adapt). The BUCKETED variants' recall is a function of
# corpus size vs bucket count (16 LSH buckets over 500 vectors cannot
# hold top-10 the way they do over 32k), so their floor is scale-aware:
# 5x the random-guess baseline k/(N-1), but never below 0.05 — a broken
# bucket join lands AT the random baseline, a working one sits far
# above it at every sf (measured: 0.19-0.89 across sf0.01-sf10 vs
# random 0.0003-0.02). Floors are calibrated under the FULL k-slot
# budget denominator (missing rows count as misses, never as an easier
# denominator) — measured under it this round: sf0.01 0.19-0.75,
# sf0.1 0.18-0.80, sf10 0.83-0.97, all >= 1.8x their floor.
RECALL_FLOORS = {
    "ann_topk": 1.0,
    "ann_lsh_topk": "scaled",
    "ann_ivf_topk": "scaled",
    "ann_ivf_auto_topk": "scaled",
    "ann_ivf_trained_topk": 0.6,
}


def inv_ann_rank_shape(sf, out, k=10):
    # expected coverage derived from the RAW table (r14 review: without
    # it an empty/truncated dump passed vacuously — and the PQ family
    # has no other invariant watching its row counts)
    emb = load_table(sf, "embeddings")
    full_q = set(int(v) for v in emb["vec_id"] if v < 8)
    half_q = set(int(v) for v in emb["vec_id"] if v < 8 and v % 2 == 0)
    errs = []
    for name, (score_col, asc) in ANN_SCORE.items():
        df = load_result(out, name)
        expect_q = half_q if name.endswith("_half") else full_q
        got_q = set(int(q) for q in df["query_id"].unique())
        # Coverage without over-asserting the bucketed contract (meta
        # review): LSH/IVF variants legitimately return < k rows (or
        # none) for a query whose bucket/probed cells hold < k other
        # vectors — only brute force guarantees exactly k per query.
        # What every variant DOES guarantee: no foreign queries, no
        # query over k rows, and a non-empty dump (anti-vacuity).
        if not got_q <= expect_q:
            errs.append(f"{name}: foreign queries {sorted(got_q - expect_q)}")
        if name == "ann_topk" and (got_q != expect_q or len(df) != len(expect_q) * k):
            errs.append(f"{name}: {len(df)} rows over {len(got_q)} queries, "
                        f"expected {len(expect_q) * k} over {len(expect_q)}")
        if df.empty:
            errs.append(f"{name}: empty dump — vacuous")
        for qid, g in df.groupby("query_id"):
            if len(g) > k:
                errs.append(f"{name} q{qid}: {len(g)} rows > k={k}")
            g = g.sort_values("rank")
            if list(g["rank"]) != list(range(1, len(g) + 1)):
                errs.append(f"{name} q{qid}: ranks not 1..k: {list(g['rank'])}")
            if g["neighbor_id"].nunique() != len(g):
                errs.append(f"{name} q{qid}: duplicate neighbors")
            s = list(g[score_col])
            ordered = all(
                (a <= b + 1e-9) if asc else (a >= b - 1e-9)
                for a, b in zip(s, s[1:]))
            if not ordered:
                errs.append(f"{name} q{qid}: {score_col} not monotone along rank")
    return errs, f"{len(ANN_SCORE)} variants"


def _exact_topk(corpus_ids, corpus_vecs, query_ids, query_vecs, k=10):
    """Definitional cosine top-k (self-matches excluded — the engine's
    documented contract); returns per-query (kth_score, scores[])."""
    cn = corpus_vecs / np.linalg.norm(corpus_vecs, axis=1, keepdims=True)
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    sims = qn @ cn.T  # (nq, n)
    for qi, qid in enumerate(query_ids):
        sims[qi][corpus_ids == qid] = -np.inf
    kth = np.sort(sims, axis=1)[:, -k]
    return kth, sims


def inv_ann_recall(sf, out, k=10):
    emb = load_table(sf, "embeddings")
    ids = emb["vec_id"].to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    qmask = ids < 8
    qids = ids[qmask]
    id_to_col = {int(v): i for i, v in enumerate(ids)}
    errs, report = [], []
    # one ground truth serves every variant — it depends only on the
    # corpus and queries, not the variant (r14 review: it was rebuilt
    # inside the loop, 5 redundant full similarity matrices)
    kth, sims = _exact_topk(ids, vecs, qids, vecs[qmask], k)
    for name, floor in RECALL_FLOORS.items():
        df = load_result(out, name)
        hits = total = 0
        for qi, qid in enumerate(qids):
            got = df[df["query_id"] == qid]["neighbor_id"]
            for nid in got:
                total += 1
                # tie-tolerant membership: exact cosine >= exact kth score
                if sims[qi][id_to_col[int(nid)]] >= kth[qi] - 1e-9:
                    hits += 1
        # recall over the FULL k-slot budget (meta review): a bucketed
        # variant may legitimately return < k rows — those slots count as
        # misses, never as an easier denominator; only brute force owes
        # exactly nq*k rows (inv_ann_rank_shape pins that).
        recall = hits / (max(1, len(qids)) * k)
        report.append(f"{name}={recall:.3f}")
        if total > len(qids) * k:
            errs.append(f"{name}: {total} rows > budget {len(qids) * k}")
        eff = max(0.05, 5.0 * k / (len(ids) - 1)) if floor == "scaled" else floor
        if recall < eff:
            errs.append(f"{name}: recall {recall:.3f} < floor {eff:.3f}")
    # the auto-sized variant over the even-id half corpus: same invariant,
    # ground truth restricted to the corpus it actually searched
    half = emb[emb["vec_id"] % 2 == 0]
    hids = half["vec_id"].to_numpy()
    hvecs = np.stack([np.asarray(v, dtype=np.float64) for v in half["embedding"]])
    hq = hids < 8
    kth, sims = _exact_topk(hids, hvecs, hids[hq], hvecs[hq], k)
    hcol = {int(v): i for i, v in enumerate(hids)}
    df = load_result(out, "ann_ivf_auto_topk_half")
    hits = n_rows = 0
    for qi, qid in enumerate(hids[hq]):
        for nid in df[df["query_id"] == qid]["neighbor_id"]:
            n_rows += 1
            if int(nid) not in hcol:
                errs.append(f"half: neighbor {nid} outside the half corpus")
            elif sims[qi][hcol[int(nid)]] >= kth[qi] - 1e-9:
                hits += 1
    budget = max(1, int(hq.sum())) * k
    if n_rows > budget:
        errs.append(f"ann_ivf_auto_topk_half: {n_rows} rows > budget {budget}")
    recall = hits / budget  # full k-slot budget, as above
    report.append(f"half={recall:.3f}")
    heff = max(0.05, 5.0 * k / (len(hids) - 1))
    if recall < heff:
        errs.append(f"ann_ivf_auto_topk_half: recall {recall:.3f} < {heff:.3f}")
    return errs, " ".join(report)


# ------------------------------------------------------------------ HLL

def inv_hll_error(sf, out, m=64):
    df = load_result(out, "sketch_hll_users")
    sigma = 1.04 / math.sqrt(m)
    rels = []
    errs = []
    for _, r in df.iterrows():
        if r["n_exact"] <= 0:
            continue
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        rels.append(rel)
        if rel > 3.5 * sigma:
            errs.append(f"{r['event_type']}: rel err {rel:.3f} > 3.5 sigma "
                        f"({3.5 * sigma:.3f}) for m={m}")
    if not rels:
        errs.append("no groups with positive exact count — vacuous")
    elif sorted(rels)[len(rels) // 2] > 2 * sigma:
        errs.append(f"median rel err {sorted(rels)[len(rels) // 2]:.3f} "
                    f"> 2 sigma ({2 * sigma:.3f})")
    return errs, f"{len(rels)} groups, max rel {max(rels):.3f}" if rels else "0 groups"


# ----------------------------------------------------------------- BM25

def inv_bm25_monotonic(sf, out, terms=("customer", "vector", "slow")):
    docs = load_table(sf, "documents")
    stats = {}  # doc_id -> (tf tuple, dl)
    for _, r in docs.iterrows():
        tk = tokens(None if r["text"] is None else r["text"].lower())
        stats[r["doc_id"]] = (tuple(tk.count(t) for t in terms), len(tk))
    df = load_result(out, "text_bm25")
    score = dict(zip(df["doc_id"], df["bm25"]))
    nhits = dict(zip(df["doc_id"], df["n_hits"]))
    errs = []
    # completeness + n_hits consistency (every matching doc, only those)
    matching = {d for d, (tf, _) in stats.items() if any(tf)}
    if matching != set(score):
        errs.append(f"dump covers {len(score)} docs, ground truth {len(matching)}")
    for d in matching & set(score):
        if nhits[d] != sum(1 for v in stats[d][0] if v > 0):
            errs.append(f"doc {d}: n_hits {nhits[d]} != ground truth")
    # direction 1: same dl, componentwise-dominating tf => score not lower
    by_dl = defaultdict(list)
    for d in matching & set(score):
        by_dl[stats[d][1]].append(d)
    checked_tf = checked_dl = 0
    for dl, ds in by_dl.items():
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                ta, tb = stats[a][0], stats[b][0]
                hi, lo = (a, b) if all(x >= y for x, y in zip(ta, tb)) else \
                         ((b, a) if all(y >= x for x, y in zip(ta, tb)) else (None, None))
                if hi is None or stats[hi][0] == stats[lo][0]:
                    continue
                checked_tf += 1
                if score[hi] < score[lo] - 1e-9:
                    errs.append(
                        f"docs {hi}/{lo}: dl={dl}, tf {stats[hi][0]} >= "
                        f"{stats[lo][0]} but bm25 {score[hi]:.4f} < {score[lo]:.4f}")
    # direction 2: same tf vector, longer doc => strictly lower score
    by_tf = defaultdict(list)
    for d in matching & set(score):
        by_tf[stats[d][0]].append(d)
    for tf, ds in by_tf.items():
        ds = sorted(ds, key=lambda d: stats[d][1])
        for a, b in zip(ds, ds[1:]):
            if stats[a][1] == stats[b][1]:
                continue
            checked_dl += 1
            if score[a] < score[b] - 1e-9:  # a is shorter => must score >=
                errs.append(
                    f"docs {a}/{b}: same tf {tf}, dl {stats[a][1]} < "
                    f"{stats[b][1]} but bm25 {score[a]:.4f} < {score[b]:.4f}")
    if checked_tf + checked_dl == 0:
        errs.append("no comparable doc pairs found — vacuous")
    return errs, f"{checked_tf} tf-pairs, {checked_dl} dl-pairs"


# -------------------------------------------------------------- winnow

def inv_winnow_guarantee(sf, out, kgram=3, window=4, max_df=32, max_pairs=20000):
    """SWA theorem: a shared token run of length >= window + kgram - 1
    (>= window consecutive shared shingles => one full shared window)
    forces a shared fingerprint. Ground truth pairs come from
    definitional 6-gram intersection — no winnowing logic involved."""
    t = window + kgram - 1
    docs = load_table(sf, "documents")
    toks = {r["doc_id"]: tokens(None if r["text"] is None else r["text"].lower())
            for _, r in docs.iterrows()}
    gram_docs = defaultdict(set)
    for d, tk in toks.items():
        for i in range(len(tk) - t + 1):
            gram_docs[tuple(tk[i:i + t])].add(d)
    pairs = set()
    for g, ds in gram_docs.items():
        if len(ds) > max_df:
            continue  # boilerplate runs: quadratic pair floods add no signal
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
        if len(pairs) > max_pairs:
            break
    fps = load_result(out, "text_winnow")
    fp_of = defaultdict(set)
    for d, fp in fps.itertuples(index=False):
        fp_of[d].add(fp)
    errs = []
    for a, b in pairs:
        if not (fp_of[a] & fp_of[b]):
            errs.append(f"docs {a}/{b} share a >= {t}-token run but no fingerprint")
            if len(errs) > 5:
                break
    if not pairs:
        errs.append("no document pairs share a long run — vacuous")
    return errs, f"{len(pairs)} ground-truth pairs"


# --------------------------------------------------------------- dedup

def inv_dedup_idempotent(sf, out):
    docs = load_table(sf, "documents")
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    errs = []
    # exact dedup: survivors pairwise distinct by text (second pass = no-op)
    keep = load_result(out, "dedup_exact")
    seen = {}
    for d in keep["keep_id"]:
        txt = text_of.get(d)
        if txt in seen:
            errs.append(f"dedup_exact: survivors {seen[txt]} and {d} share text")
        seen[txt] = d
    # digest dedup must agree with text dedup (and is idempotent with it)
    kd = load_result(out, "dedup_exact_digest")
    if set(keep["keep_id"]) != set(kd["keep_id"]):
        errs.append("dedup_exact and dedup_exact_digest keep different survivors")
    # keep-one vs components: exactly one survivor per component, sized right
    comp = load_result(out, "dedup_components")
    comp_of = dict(zip(comp["doc_id"], comp["component"]))
    sizes = comp.groupby("component").size().to_dict()
    k1 = load_result(out, "dedup_keep_one")
    comps_kept = defaultdict(list)
    for _, r in k1.iterrows():
        if r["keep_id"] not in comp_of:
            errs.append(f"keep_one survivor {r['keep_id']} not in any component")
            continue
        c = comp_of[r["keep_id"]]
        comps_kept[c].append(r["keep_id"])
        if sizes.get(c) != r["n_members"]:
            errs.append(f"component {c}: n_members {r['n_members']} != "
                        f"size {sizes.get(c)}")
    for c, ks in comps_kept.items():
        if len(ks) != 1:
            errs.append(f"component {c}: {len(ks)} survivors {ks}")
    missing = set(sizes) - set(comps_kept)
    if missing:
        errs.append(f"{len(missing)} components with NO survivor")
    # Paragraph dedup idempotence, count form (r14 review): re-splitting
    # the REJOINED text_kept on the separator mis-parses whenever a kept
    # paragraph itself ends with the separator word ('b the' + 'c'
    # rejoins as 'b the the c' and re-splits as ['b', 'the c']), so
    # uniqueness was being checked on mangled strings. The definitional
    # counts avoid parsing kept text entirely: per doc, n_paras must
    # equal the raw text's non-blank split count, and a second dedup
    # pass changes nothing iff the TOTAL kept count equals the number of
    # DISTINCT paragraph strings corpus-wide (first-occurrence-wins
    # keeps exactly one per distinct paragraph — same-doc duplicates
    # included, which the old doc_id-exempting check never flagged).
    para = load_result(out, "dedup_paragraph")
    sep = " the "
    # First-occurrence-wins is the op's PUBLISHED guarantee (smallest
    # (doc_id, idx) keeps each distinct paragraph): recompute the kept
    # subsequence per doc from the raw text and compare text_kept as an
    # EXACT string — no re-splitting of rejoined text (unparseable when a
    # kept paragraph itself ends with the separator word), and stronger
    # than the count-only form the meta chain broke (keep-A-twice +
    # drop-C keeps every count balanced while a second pass would not be
    # a no-op).
    distinct_paras = set()
    split_of, kept_of = {}, {}
    seen_global = set()
    for d in sorted(text_of):
        txt = text_of[d]
        # strip(" ") not strip(): both engines blank-filter with the
        # space-only trim(), so a non-space-whitespace paragraph counts
        ps = [p for p in (txt or "").split(sep) if p.strip(" ")]
        split_of[d] = ps
        distinct_paras.update(ps)
        kept = []
        for p in ps:
            if p not in seen_global:
                seen_global.add(p)
                kept.append(p)
        kept_of[d] = kept
    n_kept_sum = 0
    for _, r in para.iterrows():
        d = r["doc_id"]
        n_kept_sum += r["n_kept"]
        if r["n_paras"] != len(split_of.get(d, [])):
            errs.append(f"dedup_paragraph doc {d}: n_paras {r['n_paras']} "
                        f"!= definitional split {len(split_of.get(d, []))}")
        expected = sep.join(kept_of.get(d, []))
        if (r["n_kept"] != len(kept_of.get(d, []))
                or (r["text_kept"] or "") != expected):
            errs.append(f"dedup_paragraph doc {d}: kept text != "
                        "first-occurrence-wins ground truth")
    # dump coverage: every doc with a non-blank split owes a row — an
    # engine filtering n_kept==0 rows would silently exempt those docs
    # from every per-doc check above
    missing_docs = {d for d, ps in split_of.items() if ps} - set(para["doc_id"])
    if missing_docs:
        errs.append(f"dedup_paragraph: {len(missing_docs)} docs with "
                    "paragraphs missing from the dump")
    if n_kept_sum != len(distinct_paras):
        errs.append(f"dedup_paragraph: total kept {n_kept_sum} != "
                    f"{len(distinct_paras)} distinct paragraphs — a second "
                    "pass would not be a no-op")
    return errs, (f"{len(keep)} exact survivors, {len(k1)} components, "
                  f"{n_kept_sum} kept / {len(distinct_paras)} distinct paragraphs")


# ------------------------------------------------------------- sessions

def inv_funnel_greedy(sf, out, steps=("view", "click", "purchase")):
    ev = load_table(sf, "events")
    us = ts_us(ev["ts"])
    code = {s: i + 1 for i, s in enumerate(steps)}
    order = np.lexsort((ev["event_id"].to_numpy(), us))
    truth = {}
    nonadv = 0  # discriminating instances: events the greedy fold SKIPS
    uids = ev["user_id"].to_numpy()[order]
    codes = np.array([code.get(t, 0) for t in ev["event_type"]])[order]
    for u, c in zip(uids, codes):
        st = truth.get(u, 0)
        if c == st + 1:
            truth[u] = st + 1
        else:
            truth.setdefault(u, st)
            nonadv += 1
    df = load_result(out, "session_funnel")
    got = dict(zip(df["user_id"], df["stage"]))
    errs = []
    if set(got) != set(truth):
        errs.append(f"coverage: dump {len(got)} users != ground truth {len(truth)}")
    bad = [(u, got[u], truth[u]) for u in set(got) & set(truth) if got[u] != truth[u]]
    for u, g, t in bad[:5]:
        errs.append(f"user {u}: stage {g} != definitional greedy {t}")
    # stage s also implies an ORDERED step subsequence of length s exists —
    # re-verified by an independent subsequence scan, not the fold above
    for u in list(truth)[:200]:
        want = 1
        for c in codes[uids == u]:
            if c == want and want <= truth[u]:
                want += 1
        if want - 1 < truth[u]:
            errs.append(f"user {u}: stage {truth[u]} but no ordered "
                        f"subsequence of that length")
            break
    # Anti-vacuity: the fold must have processed non-advancing events
    # (otherwise any monotone semantics agrees).
    if nonadv < 100:
        errs.append(f"only {nonadv} non-advancing events — vacuous")
    stages = sorted(set(truth.values()))
    # r16 (VERDICT r15 #5a — the former KNOWN FIXTURE LIMIT, closed): on
    # the driver's testdata every user saturates at stage 3, so final
    # values could not distinguish greedy order-sensitivity from a rival
    # order-insensitive distinct-type-count semantics. Verify now dumps a
    # deterministic 600-user fixture (DataGen.funnelFixtureEvents) with
    # stages 0-3 and order-scrambled sequences, plus the engine's funnel
    # over it — definitionally re-derived here, and the rival semantics
    # must DISAGREE with the greedy finals on a material user count.
    fx = load_result(out, "funnel_fixture_events")  # dumped next to results
    fdf = load_result(out, "session_funnel_fixture")
    fus = ts_us(fx["ts"])
    forder = np.lexsort((fx["event_id"].to_numpy(), fus))
    fuids = fx["user_id"].to_numpy()[forder]
    fcodes = np.array([code.get(t, 0) for t in fx["event_type"]])[forder]
    ftruth, rival_types = {}, defaultdict(set)
    for u, c in zip(fuids, fcodes):
        st = ftruth.get(u, 0)
        ftruth[u] = st + 1 if c == st + 1 else st
        if c:
            rival_types[u].add(c)
    fgot = dict(zip(fdf["user_id"], fdf["stage"]))
    if fgot != ftruth:
        bad = [(u, fgot.get(u), ftruth.get(u))
               for u in set(fgot) | set(ftruth) if fgot.get(u) != ftruth.get(u)]
        errs.append(f"fixture: engine funnel != definitional greedy: {bad[:4]}")
    fstages = pd.Series(list(ftruth.values())).value_counts()
    if sorted(fstages.index) != [0, 1, 2, 3] or fstages.min() < 20:
        errs.append(f"fixture stages degenerate: {dict(fstages)} — vacuous")
    disagree = sum(1 for u in ftruth if len(rival_types[u]) != ftruth[u])
    if disagree < 20:
        errs.append(f"fixture: rival distinct-type-count semantics "
                    f"indistinguishable on finals ({disagree} users) — vacuous")
    return errs, (f"{len(truth)} users, stages {stages}, {nonadv} skipped "
                  f"events; fixture {len(ftruth)} users, stage counts "
                  f"{sorted(dict(fstages).items())}, rival disagrees on "
                  f"{disagree}")


def inv_retention_def(sf, out, day_us=86400000000):
    ev = load_table(sf, "events")
    day = ts_us(ev["ts"]) // day_us
    ud = set(zip(ev["user_id"].to_numpy(), day))
    cohort = {}
    for u, d in ud:
        cohort[u] = min(cohort.get(u, d), d)
    truth = defaultdict(int)
    for u, d in ud:
        truth[(cohort[u], d - cohort[u])] += 1
    df = load_result(out, "session_retention")
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for _, r in df.iterrows()}
    errs = []
    if got != dict(truth):
        extra = set(got) - set(truth)
        missing = set(truth) - set(got)
        wrong = [k for k in set(got) & set(truth) if got[k] != truth[k]]
        errs.append(f"triangle mismatch: extra={sorted(extra)[:3]} "
                    f"missing={sorted(missing)[:3]} wrong={wrong[:3]}")
    cohorts = {c for c, _ in truth}
    if len(cohorts) < 2 or not any(o > 0 for _, o in truth):
        errs.append("degenerate triangle (one cohort or no positive offset) — vacuous")
    return errs, f"{len(cohorts)} cohorts, {len(truth)} cells"


# ------------------------------------------------------------ as-of joins

def _by_key(keys, ts, payload):
    """key -> (sorted ts array, parallel payload array)."""
    out = {}
    df = pd.DataFrame({"k": keys, "t": ts, "p": payload}).sort_values(["k", "t", "p"])
    for k, g in df.groupby("k", sort=False):
        out[k] = (g["t"].to_numpy(), g["p"].to_numpy())
    return out


def inv_asof_directions(sf, out, tol=750000000000000):
    ev = load_table(sf, "events")
    orders = load_table(sf, "orders")
    e_us = ts_us(ev["ts"])
    o_us = ts_us(orders["o_orderdate"])
    by_cust = _by_key(orders["o_custkey"].to_numpy(), o_us,
                      orders["o_orderkey"].to_numpy())
    ev_ts = dict(zip(ev["event_id"], e_us))
    ev_user = dict(zip(ev["event_id"], ev["user_id"]))
    errs = []

    def best_backward(u, t):
        if u not in by_cust:
            return None
        ts, _ = by_cust[u]
        i = np.searchsorted(ts, t, side="right")
        return int(ts[i - 1]) if i > 0 else None

    # backward: match date == definitional max date <= event ts, orderkey
    # belongs to that (user, date); coverage exact (one row per matchable
    # event, none for unmatchable)
    df = load_result(out, "asof_join")
    matchable = {eid for eid, u in ev_user.items()
                 if best_backward(u, ev_ts[eid]) is not None}
    if set(df["event_id"]) != matchable or len(df) != len(matchable):
        errs.append(f"asof_join coverage: {len(df)} rows vs "
                    f"{len(matchable)} matchable events")
    okeys = defaultdict(set)  # (cust, date) -> orderkeys
    for c, t, k in zip(orders["o_custkey"], o_us, orders["o_orderkey"]):
        okeys[(c, int(t))].add(k)
    for _, r in df.iterrows():
        b = best_backward(r["user_id"], r["ts_us"])
        if r["o_orderdate_us"] > r["ts_us"]:
            errs.append(f"asof_join event {r['event_id']}: match AFTER query ts")
        elif b is None or r["o_orderdate_us"] != b:
            errs.append(f"asof_join event {r['event_id']}: date "
                        f"{r['o_orderdate_us']} != definitional max<= {b}")
        elif r["o_orderkey"] not in okeys[(r["user_id"], b)]:
            errs.append(f"asof_join event {r['event_id']}: orderkey not at "
                        "the matched (user, date)")
        if len(errs) > 8:
            break
    # tolerance: same winner, out-of-bound winners DROPPED — both arms
    # must be exercised (anti-vacuity)
    dft = load_result(out, "asof_join_tolerance")
    in_bound = {eid for eid in matchable
                if ev_ts[eid] - best_backward(ev_user[eid], ev_ts[eid]) <= tol}
    if set(dft["event_id"]) != in_bound:
        errs.append(f"asof_join_tolerance coverage: {len(dft)} rows vs "
                    f"{len(in_bound)} in-bound events")
    for _, r in dft.iterrows():
        if r["ts_us"] - r["o_orderdate_us"] > tol:
            errs.append(f"asof_join_tolerance event {r['event_id']}: gap over bound")
            break
    if not in_bound or in_bound == matchable:
        errs.append("tolerance arms degenerate (all or none in bound) — vacuous")

    # forward: per order, matched event ts == definitional min >= date
    by_user = _by_key(ev["user_id"].to_numpy(), e_us, ev["event_id"].to_numpy())
    o_date = dict(zip(orders["o_orderkey"], o_us))
    o_cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))

    def best_forward(u, t):
        if u not in by_user:
            return None
        ts, _ = by_user[u]
        i = np.searchsorted(ts, t, side="left")
        return int(ts[i]) if i < len(ts) else None

    dff = load_result(out, "asof_join_forward")
    fwd_matchable = {k for k, c in o_cust.items()
                     if best_forward(c, o_date[k]) is not None}
    if set(dff["o_orderkey"]) != fwd_matchable or len(dff) != len(fwd_matchable):
        errs.append(f"asof_join_forward coverage: {len(dff)} rows vs "
                    f"{len(fwd_matchable)} matchable orders")
    for _, r in dff.iterrows():
        b = best_forward(r["o_custkey"], r["o_orderdate_us"])
        if r["event_ts_us"] < r["o_orderdate_us"]:
            errs.append(f"asof_join_forward order {r['o_orderkey']}: match BEFORE date")
            break
        if b is None or r["event_ts_us"] != b:
            errs.append(f"asof_join_forward order {r['o_orderkey']}: ts "
                        f"{r['event_ts_us']} != definitional min>= {b}")
            break

    # nearest: |gap| is the definitional argmin over the user's
    # purchases; exact two-sided ties must resolve backward
    p = ev[ev["event_type"] == "purchase"]
    by_user_p = _by_key(p["user_id"].to_numpy(), ts_us(p["ts"]),
                        p["event_id"].to_numpy())
    dfn = load_result(out, "asof_join_nearest")
    n_matchable = {eid for eid, u in ev_user.items() if u in by_user_p}
    if set(dfn["event_id"]) != n_matchable:
        errs.append(f"asof_join_nearest coverage: {len(dfn)} rows vs "
                    f"{len(n_matchable)} events with a same-user purchase")
    ties = 0
    for _, r in dfn.iterrows():
        ts, _ = by_user_p[r["user_id"]]
        gaps = np.abs(ts - r["ts_us"])
        mg = gaps.min()
        if abs(r["p_ts_us"] - r["ts_us"]) != mg:
            errs.append(f"asof_join_nearest event {r['event_id']}: gap "
                        f"{abs(r['p_ts_us'] - r['ts_us'])} != argmin {mg}")
            break
        back = (ts[ts <= r["ts_us"]].size and
                r["ts_us"] - ts[ts <= r["ts_us"]].max() == mg)
        fwd = (ts[ts > r["ts_us"]].size and
               ts[ts > r["ts_us"]].min() - r["ts_us"] == mg)
        if back and fwd:
            ties += 1
            if r["p_ts_us"] > r["ts_us"]:
                errs.append(f"asof_join_nearest event {r['event_id']}: "
                            "two-sided tie resolved FORWARD")
                break
    return errs, (f"{len(matchable)} backward, {len(in_bound)} in-bound, "
                  f"{len(fwd_matchable)} forward, {len(n_matchable)} nearest "
                  f"({ties} two-sided ties)")


# ------------------------------------------------------ interval / range

def inv_join_containment(sf, out):
    ev = load_table(sf, "events")
    us = ts_us(ev["ts"])
    eid = ev["event_id"].to_numpy()
    uid = ev["user_id"].to_numpy()
    et = ev["event_type"].to_numpy()
    errs = []
    # definitional per-user pair enumeration — no bucketing logic involved
    views = [(u, i, t) for u, i, t, y in zip(uid, eid, us, et) if y == "view"]
    buys = [(u, i, t) for u, i, t, y in zip(uid, eid, us, et) if y == "purchase"]
    buys_by_u = defaultdict(list)
    for u, i, t in buys:
        buys_by_u[u].append((i, t))
    truth_iv = set()
    cross = 0
    for u, vi, vt in views:
        for pi, pt in buys_by_u.get(u, []):
            cross += 1
            if vt <= pt + 7200000000 and pt <= vt + 1800000000:
                truth_iv.add((vi, pi))
    df = load_result(out, "interval_join")
    got_iv = set(zip(df["view_id"], df["purchase_id"]))
    if got_iv != truth_iv:
        errs.append(f"interval_join: {len(got_iv - truth_iv)} extra, "
                    f"{len(truth_iv - got_iv)} missing vs definitional "
                    f"{len(truth_iv)} pairs")
    ts_of = dict(zip(eid, us))
    for _, r in df.iterrows():
        if (r["v_start_us"] != ts_of[r["view_id"]]
                or r["p_start_us"] != ts_of[r["purchase_id"]]):
            errs.append(f"interval_join pair {r['view_id']}/{r['purchase_id']}: "
                        "carried ts columns disagree with the raw events")
            break
    if not truth_iv or len(truth_iv) == cross:
        errs.append("interval predicate degenerate (empty or whole block "
                    "cross product) — vacuous")
    # range join: BETWEEN inclusive, self-pair excluded
    truth_rg = set()
    cross_rg = 0
    for u, i, t in zip(uid, eid, us):
        for pi, pt in buys_by_u.get(u, []):
            cross_rg += 1
            if pi != i and pt <= t <= pt + 7200000000:
                truth_rg.add((i, pi))
    dfr = load_result(out, "range_join")
    got_rg = set(zip(dfr["event_id"], dfr["purchase_id"]))
    if got_rg != truth_rg:
        errs.append(f"range_join: {len(got_rg - truth_rg)} extra, "
                    f"{len(truth_rg - got_rg)} missing vs definitional "
                    f"{len(truth_rg)} pairs")
    if any(e == p for e, p in got_rg):
        errs.append("range_join: self-pair leaked")
    if not truth_rg or len(truth_rg) == cross_rg:
        errs.append("range predicate degenerate — vacuous")
    return errs, (f"interval {len(truth_iv)}/{cross} pairs, "
                  f"range {len(truth_rg)}/{cross_rg} pairs")


# ------------------------------------------------------- pack / chunk

def inv_pack_conservation(sf, out, capacity=2048, window=40, stride=30):
    docs = load_table(sf, "documents")
    ntok = {r["doc_id"]: len(tokens(r["text"]))
            for _, r in docs.iterrows()}
    lang_of = dict(zip(docs["doc_id"], docs["lang"]))
    errs = []
    # definitional per-lang doc_id-ordered running offsets
    truth = {}
    by_lang = defaultdict(list)
    for d in sorted(ntok):
        by_lang[lang_of[d]].append(d)
    for lang, ds in by_lang.items():
        off = 0
        for d in ds:
            truth[d] = (lang, ntok[d], off, off // capacity)
            off += ntok[d]
    df = load_result(out, "corpus_pack")
    if set(df["doc_id"]) != set(truth) or len(df) != len(truth):
        errs.append(f"corpus_pack coverage: {len(df)} rows vs {len(truth)} docs")
    if df["n_tokens"].sum() != sum(ntok.values()):
        errs.append(f"token conservation broken: packed {df['n_tokens'].sum()} "
                    f"!= input {sum(ntok.values())}")
    for _, r in df.iterrows():
        t = truth.get(r["doc_id"])
        if t is None:
            continue
        if (r["lang"], r["n_tokens"], r["start_off"], r["chunk_id"]) != t:
            errs.append(f"corpus_pack doc {r['doc_id']}: "
                        f"({r['lang']},{r['n_tokens']},{r['start_off']},"
                        f"{r['chunk_id']}) != definitional {t}")
            break
    if df["chunk_id"].nunique() < 2:
        errs.append("corpus_pack: fewer than 2 chunks — vacuous")
    # chunk: exact window/stride slices over lowercased tokens
    ltok = {r["doc_id"]: tokens(None if r["text"] is None else r["text"].lower())
            for _, r in docs.iterrows()}
    truth_ch = {}
    for d, tk in ltok.items():
        for st in range(0, len(tk), stride):
            sl = tk[st:st + window]
            truth_ch[(d, st // stride)] = (len(sl), " ".join(sl))
    dfc = load_result(out, "corpus_chunk")
    got_keys = set(zip(dfc["doc_id"], dfc["chunk_idx"]))
    if got_keys != set(truth_ch):
        errs.append(f"corpus_chunk coverage: {len(got_keys)} chunks vs "
                    f"definitional {len(truth_ch)}")
    over = dfc[dfc["n_tokens"] > window]
    if len(over):
        errs.append(f"corpus_chunk: {len(over)} chunks exceed window {window}")
    for _, r in dfc.iterrows():
        t = truth_ch.get((r["doc_id"], r["chunk_idx"]))
        if t and (r["n_tokens"], r["chunk_text"]) != t:
            errs.append(f"corpus_chunk doc {r['doc_id']} idx {r['chunk_idx']}: "
                        "slice != definitional window/stride slice")
            break
    n_multi = sum(1 for d, i in truth_ch if i > 0)
    n_short = sum(1 for v, _ in truth_ch.values() if v < window)
    if n_multi == 0 or n_short == 0:
        errs.append("corpus_chunk fixtures degenerate (no multi-chunk doc "
                    "or no short tail) — vacuous")
    return errs, (f"pack {len(truth)} docs / {df['chunk_id'].nunique()} max-lang "
                  f"chunks, chunk {len(truth_ch)} slices ({n_short} short tails)")


# ------------------------------------------------- r16 additions
# (VERDICT r15 #6 — the last uncovered high-semantic-risk families),
# same implementation-free discipline: published guarantee + ground
# truth recomputed by definition from the raw tables. The definitional
# tokenizer throughout is whitespace split (the engine's `tokens` is
# split-on-' ' of trimmed text — on the corpus fixtures the two are
# identical, and the oracle gate already pins the engine's exact form).


def _doc_tokens(docs, lower=True):
    t = docs[docs["text"].notna()]["text"]
    return (t.str.lower() if lower else t).str.split()


def inv_cm_bound(sf, out):
    """count-min: probes are the definitional top-10 by (count desc, id),
    n_exact is the definitional count, the estimate is ONE-SIDED
    (est >= exact always — the published CM guarantee) and the
    overestimate is within eps*N for eps = e/width (w=256, d=4;
    Cormode-Muthukrishnan bound, deterministic here: data + hashes are
    fixed)."""
    ev = load_table(sf, "events")
    df = load_result(out, "sketch_cm_counts")
    cnt = ev.dropna(subset=["user_id"]).groupby("user_id").size()
    top = (cnt.reset_index(name="n")
           .sort_values(["n", "user_id"], ascending=[False, True]).head(10))
    errs = []
    if set(df["user_id"]) != set(top["user_id"]):
        errs.append(f"probe set != definitional top-10: {sorted(set(df['user_id']) ^ set(top['user_id']))[:4]}")
    exact = df.set_index("user_id")["n_exact"]
    bad = [u for u in df["user_id"] if u in cnt.index and exact[u] != cnt[u]]
    if bad:
        errs.append(f"n_exact diverges from definitional count for {bad[:4]}")
    over = df["cm_estimate"] - df["n_exact"]
    if (over < 0).any():
        errs.append(f"one-sided bound VIOLATED: estimate < exact for "
                    f"{list(df['user_id'][over < 0])[:4]}")
    n_total = int(cnt.sum())
    bound = math.e / 256 * n_total
    if (over > bound).any():
        errs.append(f"overestimate beyond eps*N={bound:.0f}: max {over.max()}")
    if len(df) < 10 or n_total == 0 or cnt.max() == 0:
        errs.append("degenerate probe set — vacuous")
    return errs, (f"10 probes over N={n_total}, max over-estimate "
                  f"{int(over.max())} (bound {bound:.0f})")


def inv_quantile_bucket(sf, out):
    """histogram quantiles: the reported pN is EXACTLY the upper edge of
    the bucket holding the definitional exact quantile (smallest value
    whose 100*rank >= q*n), per the published equi-width contract
    (maxValue=128, 64 buckets => edge = 2*(v//2)+2), hence within one
    bucket width of exact."""
    docs = load_table(sf, "documents")
    df = load_result(out, "sketch_hist_quantiles")
    ntok = _doc_tokens(docs, lower=False).str.len()
    langs = docs[docs["text"].notna()]["lang"]
    errs = []
    nondeg = 0
    for _, r in df.iterrows():
        v = np.sort(ntok[langs == r["lang"]].to_numpy())
        n = len(v)
        if n == 0:
            errs.append(f"{r['lang']}: no docs — vacuous")
            continue
        for q, colname in ((50, "p50"), (95, "p95")):
            k = int(np.searchsorted(np.arange(1, n + 1) * 100, q * n, "left"))
            vq = int(v[k])
            edge = 2 * (vq // 2) + 2 if vq < 128 else 128
            if int(r[colname]) != edge:
                errs.append(f"{r['lang']} p{q}: dump {r[colname]} != "
                            f"definitional bucket edge {edge} (exact {vq})")
        if r["p50"] != r["p95"]:
            nondeg += 1
    if len(df) < 2 or nondeg == 0:
        errs.append("degenerate quantiles (one group or p50==p95 everywhere) — vacuous")
    return errs, f"{len(df)} langs, {nondeg} with p50 != p95"


def inv_pagerank_power(sf, out):
    """graph_pagerank: the rank vector IS the 5-step damped power
    iteration (d=0.85, uniform start 1.0) over the oracle-verified
    candidate-pair graph (dedup_minhash_pairs — the same LSH front-end,
    per the op's contract), to within the integer fixed-point grain
    (scale 1e-6): L1 mean <= 1e-3, max <= 1e-2. Full doc coverage."""
    docs = load_table(sf, "documents")
    pr = load_result(out, "graph_pagerank")
    pairs = load_result(out, "dedup_minhash_pairs")
    ids = docs["doc_id"].to_numpy()
    errs = []
    if set(pr["doc_id"]) != set(ids):
        errs.append(f"coverage: {len(pr)} ranked != {len(ids)} docs")
        return errs, ""
    idx = {d: i for i, d in enumerate(ids)}
    src = np.concatenate([pairs["id1"].to_numpy(), pairs["id2"].to_numpy()])
    dst = np.concatenate([pairs["id2"].to_numpy(), pairs["id1"].to_numpy()])
    deg = pd.Series(src).value_counts()
    r = np.full(len(ids), 1.0)
    for _ in range(5):
        contrib = np.zeros(len(ids))
        c = pd.Series(r, index=ids)[src].to_numpy() / deg[src].to_numpy()
        np.add.at(contrib, [idx[d] for d in dst], c)
        r = 0.15 + 0.85 * contrib
    got = pr.set_index("doc_id")["rank_units"].reindex(ids).to_numpy() / 1e6
    l1 = np.abs(got - r)
    if l1.mean() > 1e-3 or l1.max() > 1e-2:
        errs.append(f"power-iteration L1 bound violated: mean {l1.mean():.2e} "
                    f"max {l1.max():.2e}")
    if len(pairs) == 0 or len(set(np.round(got, 6))) < 2:
        errs.append("degenerate graph (no edges or constant ranks) — vacuous")
    return errs, (f"{len(ids)} nodes, {len(pairs)} pairs, L1 mean "
                  f"{l1.mean():.1e} max {l1.max():.1e}")


def inv_budget_select(sf, out):
    """corpus_budget_select: selected set == the definitional greedy
    prefix (score desc, doc_id asc; cumulative tokens <= 6000); budget
    conserved (sum <= 6000); greedily MAXIMAL (the next-ranked doc would
    exceed the budget); cum_tokens equals the definitional prefix sum."""
    docs = load_table(sf, "documents")
    df = load_result(out, "corpus_budget_select")
    d = docs[docs["text"].notna()].copy()
    d["n_tokens"] = d["text"].str.split(" ").str.len()
    d["score"] = d["n_chars"].astype(float) / d["n_tokens"]
    d = d.sort_values(["score", "doc_id"],
                      ascending=[False, True]).reset_index(drop=True)
    d["cum"] = d["n_tokens"].cumsum()
    sel = d[d["cum"] <= 6000]
    errs = []
    if set(df["doc_id"]) != set(sel["doc_id"]):
        errs.append(f"selected set != definitional greedy prefix "
                    f"(diff {sorted(set(df['doc_id']) ^ set(sel['doc_id']))[:4]})")
    got_sum = int(df["n_tokens"].sum())
    if got_sum > 6000:
        errs.append(f"budget conservation VIOLATED: {got_sum} > 6000")
    if len(sel) < len(d) and d["cum"].iloc[len(sel)] <= 6000:
        errs.append("not maximal: the next-ranked doc still fits")
    cum = df.set_index("doc_id")["cum_tokens"]
    bad = [r.doc_id for r in sel.itertuples()
           if r.doc_id in cum.index and cum[r.doc_id] != r.cum]
    if bad:
        errs.append(f"cum_tokens diverges from the definitional prefix sum: {bad[:4]}")
    if len(df) == 0 or len(df) == len(d):
        errs.append("degenerate selection (none or all docs) — vacuous")
    return errs, f"{len(df)} of {len(d)} docs, {got_sum}/6000 tokens"


def inv_mixture_rates(sf, out):
    """corpus_mixture: every kept row's u_bucket respects its stratum's
    cut (src0 < 500000, src1 < 250000, default < 1000000), kept sets are
    subsets of their strata, and per-stratum keep rates sit within 4
    sigma of the configured rates (binomial; the hash is uniform by
    contract)."""
    docs = load_table(sf, "documents")
    df = load_result(out, "corpus_mixture")
    cuts = {"src0": 500000, "src1": 250000}
    rates = {"src0": 0.5, "src1": 0.25}
    errs = []
    viol = [(r.source, r.u_bucket) for r in df.itertuples()
            if r.u_bucket >= cuts.get(r.source, 1000000) or r.u_bucket < 0]
    if viol:
        errs.append(f"u_bucket beyond the stratum cut: {viol[:4]}")
    by_src = docs.groupby("source")["doc_id"].apply(set)
    for s, members in by_src.items():
        kept = set(df[df["source"] == s]["doc_id"])
        if not kept <= members:
            errs.append(f"{s}: kept docs outside the stratum")
        rate = rates.get(s, 1.0)
        n = len(members)
        sd = max(1e-9, (n * rate * (1 - rate)) ** 0.5)
        if abs(len(kept) - n * rate) > 4 * sd:
            errs.append(f"{s}: kept {len(kept)}/{n} beyond 4 sigma of rate {rate}")
    present = {s for s in df["source"]}
    if not ({"src0", "src1"} <= present) or len(present) < 3:
        errs.append("strata coverage degenerate (need src0, src1 and a "
                    "default-rate stratum) — vacuous")
    return errs, (f"{len(df)} kept across {len(present)} strata; "
                  f"src0 {len(df[df['source'] == 'src0'])}, "
                  f"src1 {len(df[df['source'] == 'src1'])}")


def inv_score_completeness(sf, out):
    """text_bm25 + text_tfidf document-score completeness. bm25: the dump
    covers EXACTLY the docs containing >= 1 query term ({customer,
    vector, slow}), n_hits is the definitional distinct-term-hit count,
    scores > 0 (idf = log(1+x) with x > 0). tfidf: linear tf*N/df is an
    exact integer ratio — every dumped score re-derives exactly; per-doc
    ranks are 1..m with distinct terms and the top-k by (score desc,
    term asc) matches the definitional top-k set."""
    docs = load_table(sf, "documents")
    errs = []
    toks = _doc_tokens(docs)
    dids = docs[docs["text"].notna()]["doc_id"]
    # ---- bm25 ----
    bm = load_result(out, "text_bm25")
    terms = {"customer", "vector", "slow"}
    hits = toks.apply(lambda t: len(terms & set(t)))
    want = set(dids[hits.to_numpy() > 0])
    if set(bm["doc_id"]) != want:
        errs.append(f"bm25 coverage: {len(bm)} dumped != {len(want)} docs "
                    "with >= 1 query term")
    nh = bm.set_index("doc_id")["n_hits"]
    bad = [i for i, h in zip(dids, hits) if h > 0 and
           i in nh.index and nh[i] != h]
    if bad:
        errs.append(f"bm25 n_hits != definitional hit count for {bad[:4]}")
    if not (bm["bm25"] > 0).all():
        errs.append("bm25 score <= 0 on a matching doc")
    # ---- tfidf ----
    tf = load_result(out, "text_tfidf")
    from collections import Counter
    n_docs = len(docs)
    tfc, dfc = {}, {}
    for i, ts in zip(dids, toks):
        c = Counter(ts)
        tfc[i] = c
        for t in c:
            dfc[t] = dfc.get(t, 0) + 1
    for r in tf.itertuples():
        truth = round(tfc[r.doc_id][r.term] * n_docs / dfc[r.term], 6)
        if abs(truth - r.score) > 1e-9:
            errs.append(f"tfidf score for ({r.doc_id}, {r.term}): dump "
                        f"{r.score} != definitional {truth}")
            break
    k = 5
    for did, g in tf.groupby("doc_id"):
        if sorted(g["rank"]) != list(range(1, len(g) + 1)) or not g["term"].is_unique:
            errs.append(f"tfidf doc {did}: ranks/terms malformed")
            break
        scores = sorted(((round(tfc[did][t] * n_docs / dfc[t], 6), t)
                         for t in tfc[did]), key=lambda s: (-s[0], s[1]))
        if set(g["term"]) != {t for _, t in scores[:k]} and len(scores) >= k:
            errs.append(f"tfidf doc {did}: dumped terms are not the "
                        f"definitional top-{k}")
            break
    if set(tf["doc_id"]) != set(dids):
        errs.append(f"tfidf coverage: {tf['doc_id'].nunique()} docs != {len(dids)}")
    if len(bm) == 0 or hits.eq(0).sum() == 0:
        errs.append("bm25 fixture degenerate (no hit-free docs) — vacuous")
    return errs, (f"bm25 {len(bm)} matching docs, tfidf "
                  f"{tf['doc_id'].nunique()} docs x top-5")


def inv_heavy_hitters_exact(sf, out):
    """sketch_heavy_hitters: the output is EXACT by contract (the sketch
    is only a no-false-negative prescreen): set equality with the
    definitional token counts >= 900, counts exact."""
    docs = load_table(sf, "documents")
    df = load_result(out, "sketch_heavy_hitters")
    cnts = _doc_tokens(docs).explode().value_counts()
    truth = {t: int(c) for t, c in cnts.items() if c >= 900}
    got = dict(zip(df["tok"], df["n"]))
    errs = []
    if got != truth:
        missing = set(truth) - set(got)
        extra = set(got) - set(truth)
        wrong = [t for t in set(got) & set(truth) if got[t] != truth[t]]
        errs.append(f"heavy-hitter set/count mismatch: missing={sorted(missing)[:3]} "
                    f"extra={sorted(extra)[:3]} wrong={wrong[:3]}")
    if len(truth) == 0 or not (cnts < 900).any():
        errs.append("degenerate threshold (no hitters or no non-hitters) — vacuous")
    return errs, f"{len(truth)} exact heavy hitters over {len(cnts)} tokens"


# ----------------------------------------------------------------- teeth

def _mut_funnel(df):
    df.loc[df.index[0], "stage"] = df.loc[df.index[0], "stage"] + 1
    return df


def _mut_retention(df):
    df.loc[df.index[0], "n_users"] = df.loc[df.index[0], "n_users"] + 1
    return df


def _mut_asof(df):
    # push one matched date forward a day: breaks argmax (or direction)
    df.loc[df.index[0], "o_orderdate_us"] = \
        df.loc[df.index[0], "o_orderdate_us"] + 86400000000
    return df


def _mut_interval(df):
    return df.iloc[1:]  # drop one pair: exact set equality must notice


def _mut_pack(df):
    df.loc[df.index[0], "n_tokens"] = df.loc[df.index[0], "n_tokens"] - 1
    return df


def _mut_chunk(df):
    df.loc[df.index[0], "n_tokens"] = df.loc[df.index[0], "n_tokens"] + 1
    return df


def _mut_cm(df):
    # break the one-sided guarantee: estimate dips below exact
    df.loc[df.index[0], "cm_estimate"] = df.loc[df.index[0], "n_exact"] - 1
    return df


def _mut_quantile(df):
    # shift one p95 a full bucket: no longer the covering bucket's edge
    df.loc[df.index[0], "p95"] = df.loc[df.index[0], "p95"] + 2
    return df


def _mut_pagerank(df):
    # scale one rank by 2x: far beyond the fixed-point grain
    df.loc[df.index[0], "rank_units"] = df.loc[df.index[0], "rank_units"] * 2 + 1
    return df


def _mut_budget(df):
    return df.iloc[:-1]  # drop the last selected doc: no longer maximal/equal


def _mut_mixture(df):
    # push one kept row past its stratum cut
    i = df.index[df["source"] == "src1"][0]
    df.loc[i, "u_bucket"] = 999999
    return df


def _mut_bm25(df):
    return df.iloc[1:]  # drop a matching doc: coverage must notice


def _mut_tfidf(df):
    df.loc[df.index[0], "score"] = df.loc[df.index[0], "score"] + 1.0
    return df


def _mut_hh(df):
    return df.iloc[1:]  # a heavy hitter goes missing


# check name -> list of (dump mutated, mutation fn); every entry must
# make its owning check FAIL under --teeth
MUTATIONS = {
    "funnel_greedy": [("session_funnel", _mut_funnel),
                      ("session_funnel_fixture", _mut_funnel)],
    "retention_def": [("session_retention", _mut_retention)],
    "asof_directions": [("asof_join", _mut_asof)],
    "join_containment": [("interval_join", _mut_interval)],
    "pack_conservation": [("corpus_pack", _mut_pack),
                          ("corpus_chunk", _mut_chunk)],
    "cm_bound": [("sketch_cm_counts", _mut_cm)],
    "quantile_bucket": [("sketch_hist_quantiles", _mut_quantile)],
    "pagerank_power": [("graph_pagerank", _mut_pagerank)],
    "budget_select": [("corpus_budget_select", _mut_budget)],
    "mixture_rates": [("corpus_mixture", _mut_mixture)],
    "score_completeness": [("text_bm25", _mut_bm25),
                           ("text_tfidf", _mut_tfidf)],
    "heavy_hitters_exact": [("sketch_heavy_hitters", _mut_hh)],
}


# ----------------------------------------------------------------- main

INVARIANTS = {
    "ann_rank_shape": inv_ann_rank_shape,
    "ann_recall": inv_ann_recall,
    "hll_error": inv_hll_error,
    "bm25_monotonic": inv_bm25_monotonic,
    "winnow_guarantee": inv_winnow_guarantee,
    "dedup_idempotent": inv_dedup_idempotent,
    "funnel_greedy": inv_funnel_greedy,
    "retention_def": inv_retention_def,
    "asof_directions": inv_asof_directions,
    "join_containment": inv_join_containment,
    "pack_conservation": inv_pack_conservation,
    "cm_bound": inv_cm_bound,
    "quantile_bucket": inv_quantile_bucket,
    "pagerank_power": inv_pagerank_power,
    "budget_select": inv_budget_select,
    "mixture_rates": inv_mixture_rates,
    "score_completeness": inv_score_completeness,
    "heavy_hitters_exact": inv_heavy_hitters_exact,
}


def teeth(sf, out):
    global _MUTATE
    bad = 0
    for name, muts in MUTATIONS.items():
        fn = INVARIANTS[name]
        _MUTATE = None
        errs, _ = fn(sf, out)
        if errs:
            print(f"TEETH {name}: clean run already fails — fix first: {errs[:2]}")
            bad += 1
            continue
        for dump, mut in muts:
            _MUTATE = (dump, mut)
            try:
                merrs, _ = fn(sf, out)
            except Exception as e:  # noqa: BLE001 — a crash is a catch too
                merrs = [f"exception {type(e).__name__}"]
            _MUTATE = None
            if merrs:
                print(f"TEETH {name} [{dump} ← {mut.__name__}]: CAUGHT "
                      f"({str(merrs[0])[:90]})")
            else:
                print(f"TEETH {name} [{dump} ← {mut.__name__}]: *** SURVIVED — "
                      "the check cannot fail, it proves nothing ***")
                bad += 1
    print(f"\n{sum(len(m) for m in MUTATIONS.values())} mutations, {bad} problems")
    sys.exit(1 if bad else 0)


def main():
    argv = sys.argv[1:]
    run_teeth = argv and argv[0] == "--teeth"
    if run_teeth:
        argv = argv[1:]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out01"
    if run_teeth:
        teeth(sf, out)
        return
    only = set(argv[2].split(",")) if len(argv) > 2 else None
    failures = 0
    for name, fn in INVARIANTS.items():
        if only and name not in only:
            continue
        try:
            errs, info = fn(sf, out)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errs, info = [f"exception {type(e).__name__}: {e}"], ""
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(str(e) for e in errs[:6]))
        else:
            print(f"PASS {name} ({info})")
    print(f"\n{len(INVARIANTS) if not only else len(only)} invariants, "
          f"{failures} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
