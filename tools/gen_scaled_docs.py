"""Generate a scaled-up documents + embeddings pair (the sf1 bench
point, VERDICT r4 next-round #7).

The driver testdata stops at sf0.1 (5,000 docs / 2,000 vectors); the
dedup/ANN plans' scale behavior — in particular the capped bucket
expansion — only shows at ~10x that. This synthesizes a corpus with the
same SHAPE as the driver tables (schema, vocab, token-length range,
lang/source mixes, 64-dim embeddings with 10 labels) plus explicit
duplicate structure (exact-dup and near-dup rates mirroring sf0.1's),
deterministically from a seed. It is a BENCH fixture only — correctness
stays pinned to the driver tables at sf0.01.

Usage: python tools/gen_scaled_docs.py [factor] [out_dir]
       (defaults: 10  /tmp/sf1)
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_DOCS = 5000
BASE_VECS = 2000
LANGS = ["en", "en", "de", "zh", "fr", "es"]  # en-heavy like the base
DIM = 64
LABELS = 10


def _vocab() -> list[str]:
    """Token vocabulary with frequencies, sampled from the base table
    so shingle/minhash distributions look like the driver corpus."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT tok, COUNT(*) c FROM (SELECT unnest(string_split(text, ' ')) tok "
        f"FROM read_parquet('{BASE}/documents.parquet')) GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vocab: list[str] = []
    total = sum(c for _, c in rows)
    for tok, c in rows:
        vocab.extend([tok] * max(1, round(1000 * c / total)))
    return vocab


def gen_documents(factor: int, out_dir: str, seed: int = 7) -> int:
    rng = random.Random(f"scaled-docs:{seed}")
    vocab = _vocab()
    n = BASE_DOCS * factor
    texts: list[str] = []
    ids, langs, sources, n_chars = [], [], [], []
    for i in range(n):
        u = rng.random()
        if i > 100 and u < 0.0016:  # exact duplicate (sf0.1 rate)
            text = texts[rng.randrange(len(texts))]
        elif i > 100 and u < 0.02:  # near duplicate: mutate 2 tokens
            toks = texts[rng.randrange(len(texts))].split(" ")
            for _ in range(2):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            text = " ".join(toks)
        else:
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(10, 100))
            )
        texts.append(text)
        ids.append(i)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
        n_chars.append(len(text))
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return n


def gen_embeddings(factor: int, out_dir: str, seed: int = 7) -> int:
    n = BASE_VECS * factor
    rs = np.random.RandomState(seed)
    centers = rs.randn(LABELS, DIM).astype(np.float32) * 2.0
    labels = rs.randint(0, LABELS, size=n)
    vecs = centers[labels] + rs.randn(n, DIM).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return n


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    nd = gen_documents(factor, out_dir)
    nv = gen_embeddings(factor, out_dir)
    print(f"wrote {nd} docs, {nv} vectors to {out_dir}")


if __name__ == "__main__":
    main()
