#!/usr/bin/env python3
"""Randomized differential fuzzing of the query surface against DuckDB.

The fixed-testdata gate can only catch divergence the testdata's shape
exercises; this harness generates N randomized corpora — sizes, unicode
planes (ASCII / accented Latin / CJK / astral emoji), whitespace and
empty-text skew, exact- and near-duplicate rates, sparse vs dense doc ids —
and replays a rotating subset of SparkEntry.queries on each, comparing
every result against its DuckDB oracle with the SAME oracle_check.py the
driver runs.

Usage:
  tools/fuzz_diff.py [--corpora 10] [--queries 20] [--seed 14]
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
    "q117_bpe_merges", "q120_soft_dedup", "q121_repetition_profile",
    "q124_substring_spans", "q125_substring_cut", "q126_char_coverage",
    "q158_language_id", "q161_banding_scurve", "q162_url_canonicalize",
    "q171_cdc_chunk_dedup", "q175_leak_safe_split",
    "q178_length_percentiles", "q179_split_decontam",
    "q183_window_boundaries", "q185_blocklist_filter",
    "q186_template_inventory", "q188_maximal_runs",
    "q20_embedding_prep", "q27_embedding_topk", "q47_embedding_ivf_topk",
    "q104_ann_recall", "q119_coreset_sample",
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
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([rng.choice(langs) for _ in ids], pa.string()),
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
            "near": near_rate, "empty": empty_rate, "sparse": sparse_ids}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", type=int, default=10)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--seed", type=int, default=14)
    ap.add_argument("--workdir", default="/tmp/graft_fuzz")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir on success")
    args = ap.parse_args()
    rng = random.Random(args.seed)
    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    corpora = os.path.join(args.workdir, "corpora")
    outs = os.path.join(args.workdir, "out")
    shapes = {}
    for i in range(args.corpora):
        name = f"c{i:02d}"
        cdir = os.path.join(corpora, name)
        shapes[name] = gen_corpus(rng, cdir)
        subset = rng.sample(QUERY_POOL, min(args.queries, len(QUERY_POOL)))
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
