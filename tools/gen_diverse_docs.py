"""Generate a DIVERSE-VOCABULARY documents corpus.

The harness's template corpus draws every token from a ~40-word
vocabulary, so essentially every doc pair shares terms and the true
near-dup density is enormous — q99/q102's cost there is an input
property (SCALING.md). Real corpora have Zipf-distributed vocabularies
of 10^4-10^6 types; this generator produces that shape at any doc
count so the AllPairs filter claim ("the prefix/size/positional bounds
prune orders of magnitude on diverse vocabulary", Bayardo et al.
WWW'07) is MEASURED in this repo, not cited.

Corpus shape:
- ``vocab`` word types ``w0..w{V-1}``, Zipf(s=1.1) frequencies — rank-1
  words appear in most docs (stopword-like), the tail is rare.
- 90% background docs: iid Zipf draws, lognormal lengths (median ~80
  tokens, clipped [10, 400]).
- 10% planted near-duplicates: a copy of a random background doc with
  ~5% of tokens resampled — these are the true pairs a near-dup
  pipeline must find (cosine typically >= 0.9).

Deterministic (seeded numpy). Output schema matches the harness's
documents.parquet exactly (doc_id, text, lang, source, n_chars).

Usage: python tools/gen_diverse_docs.py [out_dir] [n_docs] [vocab] [seed]
"""

from __future__ import annotations

import os
import sys


def generate(out_dir: str, n_docs: int = 5000, vocab: int = 30000, seed: int = 7) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    words = np.array([f"w{i}" for i in range(vocab)])

    n_base = int(n_docs * 0.9)
    texts: list[str] = []
    lengths = np.clip(
        rng.lognormal(mean=np.log(80), sigma=0.6, size=n_base), 10, 400
    ).astype(int)
    for L in lengths:
        texts.append(" ".join(words[rng.choice(vocab, size=L, p=probs)]))
    for _ in range(n_docs - n_base):
        src = texts[int(rng.integers(0, n_base))].split(" ")
        k = max(1, int(0.05 * len(src)))
        for j in rng.choice(len(src), size=k, replace=False):
            src[j] = words[int(rng.choice(vocab, p=probs))]
        texts.append(" ".join(src))

    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(
                [f"src{i % 10}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    path = os.path.join(out_dir, "documents.parquet")
    # write-then-rename: a mid-write kill (bench deadline, OOM) must
    # not leave a truncated file that existence-based caching
    # (bench._diverse_sf_dir) would treat as a valid corpus forever
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "diverse_docs",
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    v = int(sys.argv[3]) if len(sys.argv) > 3 else 30000
    s = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    print(generate(out, n, v, s))
