"""Deterministic BPE merge-table trainer (run once; output is frozen).

Trains byte-pair-encoding merges from the sf0.01 documents corpus and
regenerates ``aerovaldb_spark/functions/bpe_merges.py``. The merge
table is FROZEN into the package (like GPT-2's published merges): the
encoder applies a fixed public table at any scale factor, so the
tokenization is reproducible on any engine without retraining — which
is exactly what lets the DuckDB oracle mirror the encode loop.

Determinism: candidate pairs are counted over the word-frequency
vocabulary; each step picks the HIGHEST-count pair, ties broken by
lexicographically smallest (a, b). Merge application is the same
replace-until-fixpoint convention the encoders use.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import collections
import re
import sys

import duckdb

WORD_RE = re.compile(r"[a-z0-9]+")
MAX_WORD_CHARS = 30


def train(texts, n_merges: int) -> list[tuple[str, str]]:
    vocab = collections.Counter()
    for t in texts:
        for w in WORD_RE.findall(t.lower()):
            vocab[w[:MAX_WORD_CHARS]] += 1
    return train_from_vocab(vocab, n_merges)


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping pass, repeated to fixpoint — the
    string-replace convention both encoders use."""
    merged = a + b
    changed = True
    while changed:
        changed = False
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
                changed = True
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pair_counts(syms: list[str]) -> collections.Counter:
    # Overlapping adjacent pairs, the zip convention ("aaa" counts
    # (a,a) twice) — the incremental bookkeeping below must match the
    # original full-rescan counting exactly or argmax ties shift.
    c: collections.Counter = collections.Counter()
    for a, b in zip(syms, syms[1:]):
        c[(a, b)] += 1
    return c


def train_from_vocab(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Merge loop over a word-frequency vocabulary. At scale the vocab
    comes from ONE distributed aggregation
    (aerovaldb_spark.functions.bpe.corpus_word_freqs) — the corpus is
    never re-scanned per merge; only the (tiny relative to corpus)
    vocabulary iterates here.

    Bookkeeping is INCREMENTAL (pair -> containing-words inverted
    index; only words containing the merged pair are rewritten and
    re-counted per step), so a realistic table — 10^4-word vocabulary,
    10^3 merges — trains in seconds instead of rescanning the whole
    vocabulary per merge. The counts and tie-breaking are identical to
    the original full-rescan formulation (the frozen-table determinism
    test replays it)."""
    words = {w: list(w) for w in vocab}
    per_word: dict[str, collections.Counter] = {}
    counts: collections.Counter = collections.Counter()
    occurs: dict[tuple[str, str], set] = collections.defaultdict(set)
    for w, syms in words.items():
        pc = _pair_counts(syms)
        per_word[w] = pc
        f = vocab[w]
        for p, k in pc.items():
            counts[p] += f * k
            occurs[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best, top = None, 0
        for p, c in counts.items():
            if c > top or (c == top and c > 0 and (best is None or p < best)):
                best, top = p, c
        if best is None:
            break
        merges.append(best)
        a, b = best
        for w in list(occurs.get(best, ())):
            new_syms = _apply_merge(words[w], a, b)
            new_pc = _pair_counts(new_syms)
            f = vocab[w]
            for p, k in per_word[w].items():
                counts[p] -= f * k
                if counts[p] <= 0:
                    del counts[p]
                occurs[p].discard(w)
            for p, k in new_pc.items():
                counts[p] += f * k
                occurs[p].add(w)
            words[w] = new_syms
            per_word[w] = new_pc
    return merges


def corpus_fingerprint(vocab: dict[str, int]) -> str:
    """md5 of the sorted (word, freq) vocabulary — recorded next to
    the frozen merges so tests can tell 'corpus regenerated, retrain'
    apart from 'training code broke'."""
    import hashlib

    h = hashlib.md5()
    for w, f in sorted(vocab.items()):
        h.update(f"{w}:{f};".encode())
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    vocab = collections.Counter()
    for t in texts:
        for w in WORD_RE.findall(t.lower()):
            vocab[w[:MAX_WORD_CHARS]] += 1
    merges = train_from_vocab(vocab, n_merges)
    out = "aerovaldb_spark/functions/bpe_merges.py"
    with open(out, "w") as f:
        f.write(
            '"""FROZEN BPE merge table — generated by tools/train_bpe.py;\n'
            "do not hand-edit. Trained on sf0.01 documents, "
            f"{len(merges)} merges,\nties broken lexicographically. "
            'The table ships with the package so\nencoding is '
            "reproducible cross-engine without retraining.\"\"\"\n\n"
            f"N_MERGES = {len(merges)}\n\n"
            "# md5 over the sorted training vocabulary — lets tests\n"
            "# distinguish 'testdata regenerated, rerun tools/train_bpe.py'\n"
            "# from a real regression (q92 parity itself never depends on\n"
            "# this: both engines apply the same frozen table to ANY corpus)\n"
            f"CORPUS_FINGERPRINT = {corpus_fingerprint(vocab)!r}\n\n"
            "MERGES = [\n"
        )
        for a, b in merges:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {out}: {len(merges)} merges")


if __name__ == "__main__":
    main()
