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
    df = pq.read_table(f"{out_dir}/{name}").to_pandas()
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
    # (otherwise any monotone semantics agrees). KNOWN FIXTURE LIMIT,
    # declared rather than hidden: on the driver's testdata every user
    # saturates at stage 3 at every sf, so the rival order-insensitive
    # distinct-type-count semantics is indistinguishable on final values
    # here — the mutation teeth (--teeth) are the proof this check can
    # fail, and the per-event fold equality is the live signal.
    if nonadv < 100:
        errs.append(f"only {nonadv} non-advancing events — vacuous")
    stages = sorted(set(truth.values()))
    return errs, (f"{len(truth)} users, stages {stages} "
                  f"(saturated fixture), {nonadv} skipped events")


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


# check name -> list of (dump mutated, mutation fn); every entry must
# make its owning check FAIL under --teeth
MUTATIONS = {
    "funnel_greedy": [("session_funnel", _mut_funnel)],
    "retention_def": [("session_retention", _mut_retention)],
    "asof_directions": [("asof_join", _mut_asof)],
    "join_containment": [("interval_join", _mut_interval)],
    "pack_conservation": [("corpus_pack", _mut_pack),
                          ("corpus_chunk", _mut_chunk)],
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
