#!/usr/bin/env python3
"""Randomized differential fuzzing of the query surface against DuckDB.

The fixed-testdata gate can only catch divergence the testdata's shape
exercises; this harness generates N randomized corpora and replays a
rotating subset of SparkEntry.queries on each, comparing every result
against its DuckDB oracle with the SAME oracle_check.py the driver runs.

Four corpus FAMILIES, round-robined across the N corpora:
  docs   — documents+embeddings: sizes, unicode planes (ASCII / accented
           Latin / CJK / astral emoji), whitespace and empty-text skew,
           exact- and near-duplicate rates, sparse vs dense doc ids,
           null-lang rows.
  events — the event stream: ts ties, empty event types, single-user
           skew, day-span and id-sparsity variation.
  graph  — the TPC-H-ish trade/basket tables: uniform / hub-skew /
           island-disconnected / chain / whale-basket topologies, sparse
           vs dense keys, degenerate sizes.
  assets — ASCII-payload documents probing the multimodal decode/fallback
           boundary (near-valid RIFF/GIF/BMP/AU/AIFF headers, truncated
           and corrupt-magic variants, runts, planted near-dup streams).

Usage:
  tools/fuzz_diff.py [--corpora 10] [--queries 20] [--seed 14]
                     [--families docs,events,graph,assets]
                     [--workdir /tmp/graft_fuzz] [--keep]

One sbt JVM runs all corpora (graft.FuzzVerify); each corpus carries its
own _queries.txt subset. Exit 0 iff every corpus is ALL MATCH.
"""
import argparse
import os
import random
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Rotating pool: documents/embeddings-family queries (fuzz corpora carry
# only those two tables). Diverse by mechanism: exact/near dedup, sketches,
# splits/decontam, tokenizers, text quality, CDC, substring dedup, packing,
# language-ID, ANN/recall.
QUERY_POOL = [
    "q18_exact_dedup", "q19_text_stats", "q21_dedup_keep_first",
    "q22_token_count", "q23_text_stats_by_lang", "q24_ngram_neardups",
    "q29_lang_quality", "q34_approx_distinct", "q48_dup_clusters",
    "q50_train_splits", "q51_contamination", "q52_source_quota",
    "q56_quantiles", "q63_portable_minhash_neardups",
    "q64_portable_simhash_neardups", "q65_portable_winnow_buckets",
    "q59_source_overlap", "q66_dedup_keep_best", "q68_repetition_stats",
    "q80_ngram_novelty", "q84_bigram_lm", "q85_token_entropy",
    "q90_substring_decontam", "q97_boilerplate", "q102_split_leakage",
    "q105_chunk_dedup", "q107_oov_rate", "q110_normalize_repair",
    "q117_bpe_merges", "q118_bpe_encode", "q165_byte_bpe",
    "q187_lang_fertility", "q120_soft_dedup", "q121_repetition_profile",
    "q124_substring_spans", "q125_substring_cut", "q126_char_coverage",
    "q158_language_id", "q161_banding_scurve", "q162_url_canonicalize",
    "q171_cdc_chunk_dedup", "q175_leak_safe_split",
    "q178_length_percentiles", "q179_split_decontam",
    "q183_window_boundaries", "q185_blocklist_filter",
    "q186_template_inventory", "q188_maximal_runs",
    "q20_embedding_prep", "q27_embedding_topk", "q47_embedding_ivf_topk",
    "q104_ann_recall", "q119_coreset_sample",
    "q89_embedding_pq_topk", "q109_pq_recall",
]

# Event-stream pool: every oracled query whose only input is the events
# table (temporal joins, sessionization, funnels, trend/anomaly rollups).
EVENTS_POOL = [
    "q53_asof_join", "q54_range_join", "q55_sessionization",
    "q116_conversion_funnel", "q129_cohort_retention",
    "q130_hourly_anomalies", "q132_ewma_trend", "q137_rolling_active",
    "q140_event_transitions", "q141_session_paths",
    "q147_transition_latency", "q149_weekday_seasonality",
    "q154_pattern_screen",
]

# Graph pool: every oracled query over the trade graph (lineitem⋈orders
# customer↔supplier projection) or the market-basket graph (parts
# co-ordered), plus the supplier-seeded audits.
GRAPH_POOL = [
    "q128_pagerank", "q133_trustrank", "q134_seed_distance",
    "q135_communities", "q136_copurchase", "q138_triangle_census",
    "q139_local_clustering", "q143_assoc_rules", "q144_kcore_peel",
    "q145_link_predict", "q148_hits", "q150_rfm_segments",
    "q151_degree_profile", "q153_cost_distance",
    "q157_harmonic_centrality", "q163_anf_curve", "q166_anf_calibration",
]

# Asset pool: the multimodal/phash family over fakeAssets(documents) —
# every oracle replays the deterministic FALLBACK decode, so the contract
# under fuzz is that none of these payloads is claimed by an installed JDK
# reader (truly-decodable payloads are pinned by MultimodalSpec's
# real-decode fixtures; the oracle cannot replay ImageIO/javax.sound).
ASSETS_POOL = [
    "q31_multimodal_features", "q32_video_frames", "q101_audio_stats",
    "q122_phash_neardups", "q123_phash_admit", "q127_phash_clusters",
    "q168_phash_recall",
]

ASCII_VOCAB = ("key agg row scan slow fast table value part hash merge "
               "batch spark line sort window group filter join stream data "
               "column order query big small customer the a of to and").split()
LATIN_VOCAB = ("café über niño œuvre señal fjörd àpropos tête çedilla "
               "grüß pâté øre ångström").split()
CJK_CHARS = ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年"
             "得就那要下以生会自着去之过家学对可她里后小么心多天而能好都")
EMOJI = list("😀🚀🌍🎉🔥💡🐍📚🧪🦉")


def make_text(rng, style, length_words):
    if style == "ascii":
        words = [rng.choice(ASCII_VOCAB) for _ in range(length_words)]
    elif style == "latin":
        words = [rng.choice(LATIN_VOCAB + ASCII_VOCAB)
                 for _ in range(length_words)]
    elif style == "cjk":
        words = ["".join(rng.choice(CJK_CHARS)
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(length_words)]
    elif style == "astral":
        words = [rng.choice(ASCII_VOCAB) if rng.random() < 0.7
                 else rng.choice(EMOJI) for _ in range(length_words)]
    else:  # mixed
        words = [rng.choice(ASCII_VOCAB + LATIN_VOCAB) if rng.random() < 0.8
                 else "".join(rng.choice(CJK_CHARS) for _ in range(3))
                 for _ in range(length_words)]
    sep = rng.choice([" ", " ", " ", "  ", "\t", " \n"]) \
        if rng.random() < 0.15 else " "
    return sep.join(words)


def mutate(rng, text):
    """One random edit — near-duplicate factory. Callers only mutate LONG
    originals (>= 40 tokens): a single edit then keeps 3-gram Jaccard
    ~0.85+, where the k=64/b=16 banding miss probability is ~1e-6 — the
    LSH-family queries (q24/q48/q63, and the splits built on them) promise
    oracle equality only away from the threshold boundary, where banding
    recall is a measured trade (q98/q161), not a bug."""
    ws = text.split(" ")
    op = rng.randrange(3)
    i = rng.randrange(len(ws))
    if op == 0:
        ws[i] = rng.choice(ASCII_VOCAB)
    elif op == 1:
        ws.insert(i, rng.choice(ASCII_VOCAB))
    else:
        ws.pop(i)
    return " ".join(ws)


def gen_corpus(rng, out_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n_docs = rng.randint(30, 250)
    langs = rng.sample(["en", "fr", "de", "es", "zh", "pt", "it", "nl"],
                       rng.randint(2, 6))
    n_sources = rng.randint(3, 15)
    styles = rng.sample(["ascii", "latin", "cjk", "astral", "mixed"],
                        rng.randint(1, 4))
    dup_rate = rng.choice([0.0, 0.05, 0.2, 0.5])
    near_rate = rng.choice([0.0, 0.1, 0.3])
    empty_rate = rng.choice([0.0, 0.02, 0.1])
    sparse_ids = rng.random() < 0.4
    if sparse_ids:
        ids = sorted(rng.sample(range(10 ** 9), n_docs))
    else:
        ids = list(range(n_docs))
    texts = []
    originals = []  # long non-derived texts — the only near-dup sources
    for _ in range(n_docs):
        r = rng.random()
        if texts and r < dup_rate:
            texts.append(rng.choice(texts))
        elif originals and r < dup_rate + near_rate:
            texts.append(mutate(rng, rng.choice(originals)))
        elif r > 1 - empty_rate:
            texts.append(rng.choice(["", " ", "  \t ", "x"]))
        else:
            t = make_text(rng, rng.choice(styles), rng.randint(1, 80))
            texts.append(t)
            if len(t.split()) >= 40:
                originals.append(t)
    # null-lang rows: unlabeled documents are a real corpus shape the
    # fixed testdata never emits (caught the q56 equi-join NULL drop)
    null_lang_rate = rng.choice([0.0, 0.0, 0.1])
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([None if rng.random() < null_lang_rate
                          else rng.choice(langs) for _ in ids], pa.string()),
        "source": pa.array([f"src{rng.randrange(n_sources)}" for _ in ids],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    embs = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [[round(rng.gauss(0, 1), 3) for _ in range(64)] for _ in ids],
            pa.list_(pa.float32())),
        "label": pa.array([rng.randrange(10) for _ in ids], pa.int32()),
    })
    pq.write_table(embs, f"{out_dir}/embeddings.parquet")
    return {"n_docs": n_docs, "styles": styles, "dup": dup_rate,
            "near": near_rate, "empty": empty_rate, "sparse": sparse_ids,
            "null_lang": null_lang_rate}


def gen_assets_corpus(rng, out_dir):
    """ASCII-payload documents probing the multimodal decode/fallback
    boundary (the q31/q32/q101/q122/q123/q127/q168 family). fakeAssets
    carries the text's utf-8 bytes as the payload, and the phash oracles
    rely on ord(char) == byte, so every payload stays in the printable
    ASCII subset. Kinds: plain text, near-valid container headers
    (RIFF/WAVE, GIF87a/89a, BM, .snd, FORM/AIFF), corrupt magics,
    truncated magics, runts/empties, and planted near-dup byte streams
    (a few flipped chars) for the banding family. The certified contract:
    none of these is claimed by a JDK reader — both engines take the
    deterministic fallback; real-decode behavior is pinned in
    MultimodalSpec fixtures instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    n_docs = rng.randint(40, 160)

    def printable(n):
        return "".join(chr(rng.randint(0x20, 0x7E)) for _ in range(n))

    def plain():
        return " ".join(rng.choice(ASCII_VOCAB)
                        for _ in range(rng.randint(1, 60)))

    def header_stream():
        magic = rng.choice([
            "RIFF" + printable(4) + "WAVE",          # wav shape, garbage fmt
            "RIFF" + printable(4) + "WAVEfmt ",      # deeper wav shape
            "RIFX" + printable(4) + "WAVE",          # corrupt magic
            "RIFF" + printable(4) + "WAV0",          # corrupt form type
            "GIF87a", "GIF89a",                      # gif magics
            "GIF8", "RIF", "BM", "B",                # truncated magics
            ".snd" + printable(20),                  # AU header shape
            "FORM" + printable(4) + "AIFF",          # aiff shape
        ])
        return magic + printable(rng.randint(0, 200))

    texts, originals = [], []
    for _ in range(n_docs):
        r = rng.random()
        if originals and r < 0.2:
            # planted near-dup: flip a few chars of an earlier stream
            src = list(rng.choice(originals))
            for _ in range(rng.randint(1, 3)):
                src[rng.randrange(len(src))] = chr(rng.randint(0x20, 0x7E))
            texts.append("".join(src))
        elif r < 0.3:
            texts.append(rng.choice(["", " ", "x", "BM"]))
        else:
            t = header_stream() if rng.random() < 0.6 else plain()
            texts.append(t)
            if len(t) >= 40:
                originals.append(t)
    ids = list(range(n_docs))
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([rng.choice(["en", "fr", "de"]) for _ in ids],
                         pa.string()),
        # include src18/src19 so q123's batch split is non-empty
        "source": pa.array([f"src{rng.randrange(20)}" for _ in ids],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    return {"n_docs": n_docs,
            "headers": sum(1 for t in texts
                           if t[:4] in ("RIFF", "RIFX", "GIF8", ".snd", "FORM")
                           or t[:2] == "BM")}


EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_events_corpus(rng, out_dir):
    """Randomized event stream: ts ties (exact-duplicate timestamps stress
    every tie-break), empty event types, single-user skew, day-span and
    id-sparsity variation — the shapes the temporal family's oracles
    (as-of/range joins, sessionization, funnels, EWMA) must agree on."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    n_events = rng.randint(40, 1200)
    n_users = rng.choice([1, 2, 5, 40])          # 1 = single-user skew
    span_days = rng.choice([1, 3, 10])
    tie_rate = rng.choice([0.0, 0.2, 0.6])
    empty_type_rate = rng.choice([0.0, 0.0, 0.05])
    sparse_ids = rng.random() < 0.4
    ids = (sorted(rng.sample(range(10 ** 9), n_events)) if sparse_ids
           else list(range(n_events)))
    base_us = 1704067200000000  # 2024-01-01T00:00:00Z in micros
    ts, prev = [], base_us
    for _ in range(n_events):
        if ts and rng.random() < tie_rate:
            ts.append(prev)                      # exact tie
        else:
            prev = base_us + rng.randrange(span_days * 86400000000)
            ts.append(prev)
    ts.sort()
    types = ["" if rng.random() < empty_type_rate else rng.choice(EVENT_TYPES)
             for _ in range(n_events)]
    tbl = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([rng.randrange(n_users) for _ in ids], pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([round(rng.uniform(0, 200), 2) for _ in ids],
                          pa.float64()),
        "props": pa.array(['{"k": %d}' % rng.randrange(100) for _ in ids],
                          pa.string()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, f"{out_dir}/events.parquet")
    return {"n_events": n_events, "n_users": n_users, "span_days": span_days,
            "ties": tie_rate, "empty_type": empty_type_rate,
            "sparse": sparse_ids}


def gen_graph_corpus(rng, out_dir):
    """Randomized TPC-H-ish trade/basket tables: uniform / hub-skew /
    island-disconnected / chain topologies, sparse vs dense keys — the
    shapes the graph family's oracles (PageRank, TrustRank, triangles,
    k-core, HITS, harmonic/ANF audits, association rules) must agree on.
    Guarantees one mod-100 supplier WITH an order so the seed families
    (s_suppkey % 10 / % 100) are never empty in the graph (q133's
    personalizedPageRank requires a reachable seed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    topology = rng.choice(["uniform", "hub", "islands", "chain", "whale"])
    # whale: one customer's distinct-supplier basket EXCEEDS the 256
    # quota, so the q136/q143 capped projection (and its capped oracle
    # replay) actually binds — the regime the other topologies can't reach
    n_supp = rng.randint(300, 500) if topology == "whale" else rng.randint(3, 100)
    n_cust = rng.randint(3, 120)
    n_orders = rng.randint(200, 600) if topology == "whale" else rng.randint(10, 500)
    n_parts = rng.randint(3, 80)
    sparse_keys = rng.random() < 0.4

    def keys(n):
        return (sorted(rng.sample(range(10 ** 8), n)) if sparse_keys
                else list(range(n)))

    s_keys, c_keys, o_keys, p_keys = (keys(n_supp), keys(n_cust),
                                      keys(n_orders), keys(n_parts))
    # seed guarantee: at least one supplier key ≡ 0 (mod 100); the
    # replacement key must not collide with an existing sampled key, or
    # the corpus silently stops modeling a unique-key supplier table
    if not any(k % 100 == 0 for k in s_keys):
        existing = set(s_keys)
        repl = rng.randrange(10 ** 6) * 100
        while repl in existing:
            repl = rng.randrange(10 ** 6) * 100
        s_keys[rng.randrange(len(s_keys))] = repl
        s_keys.sort()
    seed_supp = next(k for k in s_keys if k % 100 == 0)
    n_islands = rng.randint(2, 5) if topology == "islands" else 1
    hub = rng.choice(s_keys) if topology == "hub" else None
    base_us = 1704067200000000
    o_cust, o_date, o_total = [], [], []
    whale_cust = c_keys[0] if topology == "whale" else None
    for i, ok in enumerate(o_keys):
        if topology == "islands":
            isl = i % n_islands
            cands = [c for j, c in enumerate(c_keys) if j % n_islands == isl]
            o_cust.append(rng.choice(cands))
        elif topology == "chain":
            o_cust.append(c_keys[min(i % len(c_keys), len(c_keys) - 1)])
        elif topology == "whale" and rng.random() < 0.6:
            o_cust.append(whale_cust)
        else:
            o_cust.append(rng.choice(c_keys))
        o_date.append(base_us + rng.randrange(365 * 86400000000))
        o_total.append(round(rng.uniform(100, 40000), 2))
    li_rows = []
    for i, ok in enumerate(o_keys):
        for ln in range(1, rng.randint(1, 8) + 1):
            if topology == "hub" and rng.random() < 0.5:
                sk = hub
            elif topology == "islands":
                isl = i % n_islands
                cands = [s for j, s in enumerate(s_keys) if j % n_islands == isl]
                sk = rng.choice(cands)
            elif topology == "chain":
                sk = s_keys[min(i % len(s_keys), len(s_keys) - 1)]
            else:
                sk = rng.choice(s_keys)
            li_rows.append((ok, rng.choice(p_keys), sk, ln,
                            float(rng.randint(1, 50)),
                            round(rng.uniform(100, 90000), 2),
                            round(rng.uniform(0, 0.1), 2),
                            round(rng.uniform(0, 0.08), 2),
                            rng.choice("RAN"), rng.choice("OF"),
                            base_us + rng.randrange(365 * 86400000000)))
    # seed guarantee: the mod-100 supplier ships at least one lineitem
    li_rows.append((o_keys[0], rng.choice(p_keys), seed_supp, 99,
                    1.0, 1000.0, 0.0, 0.0, "N", "O", base_us))
    # whale guarantee: one order's owner holds ≥ 280 distinct suppliers,
    # so the 256-per-customer basket quota BINDS on this corpus
    if topology == "whale":
        wo = next((ok for ok, c in zip(o_keys, o_cust) if c == whale_cust),
                  o_keys[0])
        for sk in s_keys[:280]:
            li_rows.append((wo, rng.choice(p_keys), sk, 90,
                            1.0, 1000.0, 0.0, 0.0, "N", "O", base_us))
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(s_keys, pa.int64()),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in s_keys], pa.string()),
        "s_nationkey": pa.array([rng.randrange(25) for _ in s_keys], pa.int32()),
        "s_acctbal": pa.array([round(rng.uniform(-999, 9999), 2)
                               for _ in s_keys], pa.float64()),
    }), f"{out_dir}/supplier.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(c_keys, pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in c_keys], pa.string()),
        "c_nationkey": pa.array([rng.randrange(25) for _ in c_keys], pa.int32()),
        "c_acctbal": pa.array([round(rng.uniform(-999, 9999), 2)
                               for _ in c_keys], pa.float64()),
        "c_mktsegment": pa.array([rng.choice(["BUILDING", "MACHINERY",
                                              "AUTOMOBILE", "FURNITURE",
                                              "HOUSEHOLD"]) for _ in c_keys],
                                 pa.string()),
    }), f"{out_dir}/customer.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(p_keys, pa.int64()),
        "p_name": pa.array([f"part {k}" for k in p_keys], pa.string()),
        "p_brand": pa.array([f"Brand#{rng.randrange(1, 6)}{rng.randrange(1, 6)}"
                             for _ in p_keys], pa.string()),
        "p_type": pa.array([rng.choice(["STANDARD", "SMALL", "MEDIUM",
                                        "LARGE", "ECONOMY", "PROMO"])
                            for _ in p_keys], pa.string()),
        "p_size": pa.array([rng.randrange(1, 51) for _ in p_keys], pa.int32()),
        "p_retailprice": pa.array([round(rng.uniform(900, 2000), 2)
                                   for _ in p_keys], pa.float64()),
    }), f"{out_dir}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(o_keys, pa.int64()),
        "o_custkey": pa.array(o_cust, pa.int64()),
        "o_orderstatus": pa.array([rng.choice("FOP") for _ in o_keys],
                                  pa.string()),
        "o_totalprice": pa.array(o_total, pa.float64()),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": pa.array([rng.choice(["1-URGENT", "2-HIGH",
                                                 "3-MEDIUM", "4-NOT SPECIFIED",
                                                 "5-LOW"]) for _ in o_keys],
                                    pa.string()),
    }), f"{out_dir}/orders.parquet")
    cols = list(zip(*li_rows))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(cols[0], pa.int64()),
        "l_partkey": pa.array(cols[1], pa.int64()),
        "l_suppkey": pa.array(cols[2], pa.int64()),
        "l_linenumber": pa.array(cols[3], pa.int32()),
        "l_quantity": pa.array(cols[4], pa.float64()),
        "l_extendedprice": pa.array(cols[5], pa.float64()),
        "l_discount": pa.array(cols[6], pa.float64()),
        "l_tax": pa.array(cols[7], pa.float64()),
        "l_returnflag": pa.array(cols[8], pa.string()),
        "l_linestatus": pa.array(cols[9], pa.string()),
        "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
    }), f"{out_dir}/lineitem.parquet")
    return {"topology": topology, "n_supp": n_supp, "n_cust": n_cust,
            "n_orders": n_orders, "n_li": len(li_rows), "sparse": sparse_keys}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", type=int, default=10)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--seed", type=int, default=14)
    ap.add_argument("--families", default="docs,events,graph,assets",
                    help="comma list of corpus families to round-robin")
    ap.add_argument("--workdir", default="/tmp/graft_fuzz")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir on success")
    args = ap.parse_args()
    rng = random.Random(args.seed)
    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    corpora = os.path.join(args.workdir, "corpora")
    outs = os.path.join(args.workdir, "out")
    fams = {"docs": (gen_corpus, QUERY_POOL),
            "events": (gen_events_corpus, EVENTS_POOL),
            "graph": (gen_graph_corpus, GRAPH_POOL),
            "assets": (gen_assets_corpus, ASSETS_POOL)}
    picked = [f.strip() for f in args.families.split(",") if f.strip()]
    unknown = [f for f in picked if f not in fams]
    if unknown:
        print(f"[fuzz] unknown families: {unknown} (have {sorted(fams)})")
        return 2
    shapes = {}
    for i in range(args.corpora):
        fam = picked[i % len(picked)]
        gen, pool = fams[fam]
        name = f"c{i:02d}"
        cdir = os.path.join(corpora, name)
        shapes[name] = {"family": fam, **gen(rng, cdir)}
        subset = rng.sample(pool, min(args.queries, len(pool)))
        with open(os.path.join(cdir, "_queries.txt"), "w") as f:
            f.write(",".join(sorted(subset)))
        print(f"[fuzz] {name}: {shapes[name]} queries={len(subset)}")
    print("[fuzz] running graft.FuzzVerify (one JVM, all corpora)")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.FuzzVerify {corpora} {outs}"],
        cwd=REPO)
    if r.returncode != 0:
        print("[fuzz] FuzzVerify failed")
        return 2
    failures = 0
    for name in sorted(shapes):
        print(f"[fuzz] oracle compare {name} {shapes[name]}")
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "oracle_check.py"),
             os.path.join(corpora, name), os.path.join(outs, name)])
        if r.returncode != 0:
            failures += 1
    if failures:
        print(f"[fuzz] {failures}/{len(shapes)} corpora MISMATCH "
              f"(seed={args.seed}, workdir kept at {args.workdir})")
        return 1
    print(f"[fuzz] ALL {len(shapes)} corpora MATCH (seed={args.seed})")
    if not args.keep:
        shutil.rmtree(args.workdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
